package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column export transforms — the map-only steps between an
  * embedding model's raw output and an ANN/serving store:
  *
  *  - matryoshka truncation (Kusupati et al. 2022): keep the first d
  *    dims of an MRL-trained embedding, then re-normalize — the cheap
  *    way to trade recall for 4-8× less vector storage/bandwidth;
  *  - L2 normalization: unit vectors make cosine ≡ dot ≡ monotone in
  *    euclidean, which is what every downstream tier here assumes;
  *  - SQ8 linear scalar quantization with CORPUS-level per-dimension
  *    ranges (the export twin of [[Quantization]]'s per-query int8
  *    path): codes = round((x − min_d)/(max_d − min_d)·255) − 128.
  *
  * Scale shape: the only aggregation is the per-dimension min/max —
  * dim-sized (64 rows here), one partial+final agg, broadcast back.
  * Everything else is a per-row array transform that fuses into one
  * codegen projection; nothing data-sized shuffles or collects.
  */
object Embeddings {

  /** Array math in double (parquet stores float32; promoting once makes
    * the arithmetic engine-portable). */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def l2(c: Column): Column =
    sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x * x))

  /** First `dim` dimensions, re-normalized to unit length (zero vectors
    * stay zero). Adds `<vec>_trunc` (array<double>) and `<vec>_tnorm`
    * (the pre-normalization norm of the truncated prefix — the retained
    * mass, useful for flagging vectors that lost everything to the
    * cut). */
  def matryoshka(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val t = asDouble(slice(col(vecCol), 1, dim))
    val n = l2(t)
    df.withColumn(s"${vecCol}_tnorm", n)
      .withColumn(s"${vecCol}_trunc",
        when(col(s"${vecCol}_tnorm") === 0.0, t)
          .otherwise(transform(t, x => x / col(s"${vecCol}_tnorm"))))
  }

  /** Unit-normalize in place → `<vec>_unit` (array<double>). */
  def l2Normalize(df: DataFrame, vecCol: String): DataFrame = {
    val t = asDouble(col(vecCol))
    val n = l2(t)
    df.withColumn(s"${vecCol}_unit",
      when(n === 0.0, t).otherwise(transform(t, x => x / n)))
  }

  /** SQ8 export codes with corpus-level per-dimension ranges: adds
    * `<vec>_sq8` (array<int>, each in [−128, 127]). Constant dimensions
    * (max = min) code to 0. The stats frame is dim-sized and broadcasts;
    * the coding itself is map-only. */
  def sq8(df: DataFrame, vecCol: String): DataFrame = {
    val dims = df.select(posexplode(asDouble(col(vecCol))).as(Seq("d", "v")))
      .groupBy("d").agg(min("v").as("mn"), max("v").as("mx"))
      .agg(collect_list(struct(col("d"), col("mn"), col("mx"))).as("s"))
      .select(map_from_arrays(col("s.d"), arrays_zip(col("s.mn"), col("s.mx")))
        .as("ranges"))
    val coded = transform(asDouble(col(vecCol)), (x, i) => {
      val mn = col("ranges")(i)("mn")
      val mx = col("ranges")(i)("mx")
      when(mx === mn, lit(0))
        .otherwise((floor((x - mn) / (mx - mn) * 255.0 + 0.5) - 128.0)
          .cast("int"))
    })
    df.crossJoin(broadcast(dims)).withColumn(s"${vecCol}_sq8", coded)
      .drop("ranges")
  }
}
