package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169), the hashed-n-gram variant, deterministic form:
  * score every raw document by how much more likely its hashed
  * unigram+bigram buckets are under the TARGET distribution (the
  * high-quality subset you want more of) than under the RAW corpus
  * distribution, then keep the top-k by weight. The published method
  * resamples with Gumbel noise; ranking by the same log-importance
  * weight is the deterministic, oracle-checkable special case and is
  * what `orderBy(desc).limit(k)` executes as a top-k heap.
  *
  * weight(doc) = Σ_{gram g ∈ doc} log p̂_target(b(g)) / p̂_raw(b(g)),
  * with add-one-smoothed bucket distributions over `dim` buckets and
  * b(g) the q173 hashing convention (first 15 md5 hex chars mod dim —
  * the cross-engine-stable hash).
  *
  * Scale shape: two passes over the exploded gram stream — one
  * `(fid, side)` count agg to build the two distributions (a
  * dim-bounded table: 2·dim rows no matter the corpus size, broadcast
  * back), one per-doc sum join. No vocabulary, no driver-side model.
  * The per-bucket log-ratio is snapped to integer MICRO units
  * (`floor(x·1e6 + 0.5)`) before the per-doc Σ cnt·c(b), so document
  * weights are exact BIGINT arithmetic — order-independent under any
  * shuffle and comparable across engines.
  */
object Dsir {

  /** Per-doc `(idCol, fid, cnt)` gram-bucket occurrences — the
    * intermediate both DSIR passes read. Derived-once data, not work:
    * callers on a stable corpus should materialize it per content
    * stamp (the shingle-table discipline) and feed
    * [[importanceWeightsFromOcc]], so neither pass re-tokenizes. */
  def occurrences(docs: DataFrame, dim: Int = 4096,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    Classifier.gramFids(docs, textCol, idCol, dim)
      .groupBy(col(idCol), col("fid")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-doc importance weights: `(idCol, n_grams, w_micro)` for every
    * input doc (docs whose text yields no grams weigh 0). `isTarget`
    * is any boolean Column over `docs` rows selecting the target
    * sample (e.g. `col("lang") === "en"`); the raw distribution is the
    * whole input. */
  /** Convenience wrapper: the uncached occurrence plan EXECUTES TWICE
    * (bucket-distribution collect + per-doc agg). Deliberate: occ is
    * corpus-exploded-sized, so checkpointing it costs more at scale
    * than re-running the map side — production callers route through
    * [[importanceWeightsFromOcc]] over the MATERIALIZED occurrence
    * table (the q179 path), which pays the tokenize exactly once. */
  def importanceWeights(docs: DataFrame, isTarget: Column, dim: Int = 4096,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    importanceWeightsFromOcc(docs, occurrences(docs, dim, textCol, idCol),
      isTarget, dim, idCol)

  /** [[importanceWeights]] over a pre-computed (ideally materialized)
    * occurrence table. The bucket distribution is ≤ dim rows no matter
    * the corpus size, so it is COLLECTED and the per-bucket micro
    * log-ratios computed driver-side (the documented k×dim model-state
    * exception — this was always "the 2·dim bucket table broadcast");
    * that turns the old three-shuffle, double-executed plan (the
    * totals scalar collect re-ran the exploded-gram subtree) into ONE
    * distribution agg plus ONE per-doc agg over a broadcast map. */
  def importanceWeightsFromOcc(docs: DataFrame, occ: DataFrame,
      isTarget: Column, dim: Int = 4096,
      idCol: String = "doc_id"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val spark = docs.sparkSession
    val flags = docs.select(col(idCol), isTarget.as("__is_t"))
    val buckets = occ.join(flags, Seq(idCol)).groupBy("fid").agg(
      sum(when(col("__is_t"), col("cnt")).otherwise(0L)).as("ct"),
      sum(col("cnt")).as("cr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nT = buckets.map(_._2).sum
    val nR = buckets.map(_._3).sum
    // same left-to-right float expression the oracle writes (Spark's
    // LOG is java.lang.Math.log — identical here), snapped to the 1e-6
    // grid before any summing
    val bwRows = buckets.map { case (fid, ct, cr) =>
      val x = math.log(ct + 1.0) - math.log((nT + dim).toDouble) -
        math.log(cr + 1.0) + math.log((nR + dim).toDouble)
      (fid, math.floor(x * 1000000L + 0.5).toLong)
    }.toSeq
    import spark.implicits._
    val bw = broadcast(bwRows.toDF("fid", "c_micro"))
    val perDoc = occ.join(bw, Seq("fid"))
      .groupBy(col(idCol)).agg(
        sum(col("cnt")).as("n_grams"),
        sum(col("cnt") * col("c_micro")).as("w_micro"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("w_micro"), lit(0L)).as("w_micro"))
  }

  /** Top-k selection by importance weight (ties break on id) — compiles
    * to TakeOrderedAndProject, never a global rank window. */
  def select(weights: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame =
    weights.orderBy(col("w_micro").desc, col(idCol)).limit(k)
}
