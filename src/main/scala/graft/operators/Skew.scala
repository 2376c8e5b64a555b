package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-join salting (SURVEY.md §7.4 risk 5: high-degree graph nodes /
  * hot join keys at 100 TB).
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; salting
  * is the plan-level tool when a single key's fan-out must be spread
  * BEFORE the shuffle (e.g. a BFS frontier hitting a celebrity node).
  * `saltedJoin` replicates the build side `salt` times and spreads the
  * probe side uniformly: probe row → (key, hash(row)%salt), build row →
  * (key, 0..salt-1), so one hot key lands on `salt` reducers instead
  * of one.
  */
object Skew {

  /** Inner equi-join `left.key = right.key` with the hot-key fan-out of
    * `left` spread across `salt` partitions; `right` (the smaller /
    * build side) is replicated `salt` times. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt >= 1)
    val spark = left.sparkSession
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(salt)))
    val replicated = right.crossJoin(
      broadcast(spark.range(salt).select(col("id").cast("int").as("__salt"))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(salted("__salt")).drop(replicated("__salt")).drop(replicated(key))
  }
}
