package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data export: deterministic corpus shuffle + shard layout.
  *
  * The last step of a pretraining-data pipeline is writing the cleaned
  * corpus as N shard files in a reproducible pseudo-random order (so
  * every rebuild — and every engine — produces byte-identical shards,
  * and so consecutive documents in a shard are decorrelated from their
  * source/crawl order). A global ORDER BY rand() is neither reproducible
  * nor scalable (one total sort, RNG state per task); the standard
  * layout is hash-sharding:
  *
  *   shard = md5(id) mod N            — map-only, no shuffle
  *   order within shard = md5('s'||id) — a second, independent hash
  *
  * so the only shuffle is the partition-by-shard exchange, each shard's
  * order is a local sort of corpus/N rows, and both are pure functions
  * of the id. At 100 TB: `df.repartition(N, shard).sortWithinPartitions
  * (ord)` + `write.partitionBy` streams each shard through one writer —
  * the `pos` window below materializes the same order as an auditable
  * column at pin scale.
  */
object Export {

  /** Assign every row a shard in [0, nShards) and its position within
    * the shard under the deterministic shuffle order. Engine-portable:
    * md5 hex parses identically everywhere; `pos` counts from 1. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // byte-direct twin of conv(substring(md5(x),1,15),16,10) — parity
    // pinned by TextKernelsSpec
    val shard = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.Md5Prefix(
        org.apache.spark.sql.graft.Bridge.expression(
          col(idCol).cast("string")), 15)) % nShards
    val ord = md5(concat(lit("s"), col(idCol).cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("ord"), col(idCol))
    df.withColumn("shard", shard)
      .withColumn("ord", ord)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .drop("ord")
  }
}
