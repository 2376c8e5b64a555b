package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval quality metrics (SURVEY.md §2.13 — reference metrics.rs via
  * lib.rs:223-227: recall@k, precision@k, MRR, NDCG, MAP + latency
  * percentiles).
  *
  * Inputs are DataFrames, so evaluation distributes: `preds(query_id,
  * doc_id, rank)` (rank 1-based) vs `truth(query_id, doc_id)`. Every
  * metric is one join + one groupBy — no driver-side loops. Each metric
  * has a `…Df` form returning the 1-row frame (composable into larger
  * plans — q124 pins them against a DuckDB oracle) and a scalar form
  * that collects it.
  */
object Metrics {

  private def hits(preds: DataFrame, truth: DataFrame, k: Int): DataFrame =
    preds.where(col("rank") <= k)
      .join(truth, Seq("query_id", "doc_id"), "left_semi")

  /** recall@k = |top-k ∩ relevant| / |relevant| per query, then mean. */
  def recallAtKDf(preds: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val rel = truth.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val h = hits(preds, truth, k).groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    rel.join(h, Seq("query_id"), "left")
      .agg(avg(coalesce(col("n_hit"), lit(0L)) / col("n_rel")).as(s"recall_$k"))
  }

  def recallAtK(preds: DataFrame, truth: DataFrame, k: Int): Double =
    recallAtKDf(preds, truth, k).first().getDouble(0)

  /** precision@k = |top-k ∩ relevant| / k per query, then mean. */
  def precisionAtKDf(preds: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val q = preds.select("query_id").distinct()
    val h = hits(preds, truth, k).groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    q.join(h, Seq("query_id"), "left")
      .agg(avg(coalesce(col("n_hit"), lit(0L)) / lit(k.toDouble)).as(s"precision_$k"))
  }

  def precisionAtK(preds: DataFrame, truth: DataFrame, k: Int): Double =
    precisionAtKDf(preds, truth, k).first().getDouble(0)

  /** MRR = mean over queries of 1/rank of the first relevant hit. */
  def mrrDf(preds: DataFrame, truth: DataFrame): DataFrame = {
    val q = preds.select("query_id").distinct()
    val first = preds.join(truth, Seq("query_id", "doc_id"), "left_semi")
      .groupBy("query_id").agg(min(col("rank")).as("first_rank"))
    q.join(first, Seq("query_id"), "left")
      .agg(avg(coalesce(lit(1.0) / col("first_rank"), lit(0.0))).as("mrr"))
  }

  def mrr(preds: DataFrame, truth: DataFrame): Double =
    mrrDf(preds, truth).first().getDouble(0)

  /** NDCG@k with binary gains: DCG = Σ 1/log2(rank+1) over relevant hits;
    * IDCG = Σ_{i=1..min(k,|rel|)} 1/log2(i+1). */
  def ndcgAtKDf(preds: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val dcg = hits(preds, truth, k)
      .groupBy("query_id")
      .agg(sum(lit(1.0) / log2(col("rank") + 1)).as("dcg"))
    val idcg = truth.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
      .withColumn("ideal_n", least(col("n_rel"), lit(k)))
      .withColumn("idcg", expr(
        "aggregate(sequence(1, int(ideal_n)), 0.0D, (acc, i) -> acc + 1.0 / log2(i + 1))"))
    idcg.join(dcg, Seq("query_id"), "left")
      .agg(avg(coalesce(col("dcg"), lit(0.0)) / col("idcg")).as(s"ndcg_$k"))
  }

  def ndcgAtK(preds: DataFrame, truth: DataFrame, k: Int): Double =
    ndcgAtKDf(preds, truth, k).first().getDouble(0)

  /** Latency percentiles over a `(name, seconds)` timing frame
    * (lib.rs:223-227's latency percentile metrics): p50/p90/p99. */
  def latencyPercentiles(timings: DataFrame, valueCol: String = "seconds"): Map[String, Double] = {
    val r = timings.select(
      percentile_approx(col(valueCol), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col(valueCol), lit(0.9), lit(10000)).as("p90"),
      percentile_approx(col(valueCol), lit(0.99), lit(10000)).as("p99")).first()
    Map("p50" -> r.getDouble(0), "p90" -> r.getDouble(1), "p99" -> r.getDouble(2))
  }

  /** MAP@k: mean over queries of average precision at each relevant hit. */
  def mapAtKDf(preds: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    val marked = preds.where(col("rank") <= k)
      .join(truth.select("query_id", "doc_id").distinct()
        .withColumn("rel", lit(1)), Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
      .withColumn("cum_hits", sum(col("rel")).over(w))
      .where(col("rel") === 1)
      .withColumn("prec_at_hit", col("cum_hits") / col("rank"))
    // distinct pairs: duplicated truth rows inflated n_hit/cum_hits
    // into impossible precision values (r15 review finding)
    val nRel = truth.select("query_id", "doc_id").distinct()
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val ap = marked.groupBy("query_id").agg(sum("prec_at_hit").as("sum_prec"))
    val q = preds.select("query_id").distinct()
    q.join(ap, Seq("query_id"), "left").join(nRel, Seq("query_id"), "left")
      .agg(avg(coalesce(col("sum_prec"), lit(0.0)) /
        least(col("n_rel"), lit(k.toLong)).cast("double")).as(s"map_$k"))
  }

  def mapAtK(preds: DataFrame, truth: DataFrame, k: Int): Double =
    mapAtKDf(preds, truth, k).first().getDouble(0)

  /** All five retrieval metrics in ONE plan: a single marked
    * preds⋈truth frame feeds one per-query agg, then one global avg —
    * the per-metric `…Df` forms each rebuild their own join+agg
    * subtree, so composing five of them (the q124 shape) pays ~10
    * stage-floors for 30 rows of data. Same formulas, same output
    * column names as the individual forms.
    *
    * Contract: `preds` and `truth` cover the same query set (the
    * standard eval-harness shape — every query has both a ranking and
    * a truth list). The per-metric forms remain the edge-precise
    * choice when the sets can diverge. */
  def retrievalReport(preds: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    val marked = preds.where(col("rank") <= k)
      .join(truth.select("query_id", "doc_id").distinct()
        .withColumn("rel", lit(1)), Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
      .withColumn("cum_hits", sum(col("rel")).over(w))
    val perq = marked.groupBy("query_id").agg(
      sum(col("rel")).cast("long").as("n_hit"),
      min(when(col("rel") === 1, col("rank"))).as("first_rank"),
      sum(when(col("rel") === 1, lit(1.0) / log2(col("rank") + 1))
        .otherwise(lit(0.0))).as("dcg"),
      sum(when(col("rel") === 1, col("cum_hits") / col("rank"))).as("sum_prec"))
    // distinct pairs: duplicated truth rows inflated n_hit/cum_hits
    // into impossible precision values (r15 review finding)
    val nRel = truth.select("query_id", "doc_id").distinct()
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    perq.join(nRel, Seq("query_id"), "left")
      .withColumn("idcg", expr(
        s"aggregate(sequence(1, int(least(n_rel, $k))), 0.0D, (acc, i) -> acc + 1.0 / log2(i + 1))"))
      .agg(
        avg(col("n_hit") / col("n_rel")).as(s"recall_$k"),
        avg(col("n_hit") / lit(k.toDouble)).as(s"precision_$k"),
        avg(coalesce(lit(1.0) / col("first_rank"), lit(0.0))).as("mrr"),
        avg(coalesce(col("dcg"), lit(0.0)) / col("idcg")).as(s"ndcg_$k"),
        avg(coalesce(col("sum_prec"), lit(0.0)) /
          least(col("n_rel"), lit(k.toLong)).cast("double")).as(s"map_$k"))
  }
}
