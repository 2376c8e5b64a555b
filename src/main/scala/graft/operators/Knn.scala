package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact vector search operators (SURVEY.md §2.3).
  *
  * Reference: `vector NEAR $v LIMIT k` (grammar.pest:169-171, exec
  * collection/search/vector.rs:18-59) and `similarity(field,$v) OP t`
  * threshold filters with metric-direction inversion
  * (query/mod.rs:163-230, 396-417).
  *
  * Spark shape: score column + `orderBy(score).limit(k)` — Catalyst
  * compiles this to `TakeOrderedAndProject`, a per-partition size-k heap
  * + driver merge: no global sort, no full shuffle, scales linearly with
  * executors. The reference's over-fetch heuristics (4×/10×) are
  * unnecessary: we filter BEFORE the top-k, so results are exact.
  */
object Knn {

  /** Score every row against `query` under `metric`; appends `score`. */
  def scored(df: DataFrame, vecCol: String, query: Seq[Float], metric: String): DataFrame = {
    val (fn, _) = VectorFunctions.metrics(metric)
    df.withColumn("score", fn(col(vecCol), VectorFunctions.vecLit(query)))
  }

  /** Exact top-k by metric direction, deterministic tie-break on `idCol`. */
  def topK(df: DataFrame, vecCol: String, query: Seq[Float], k: Int,
      metric: String = "cosine", idCol: String = "id",
      filter: Option[Column] = None): DataFrame = {
    val (_, higherIsBetter) = VectorFunctions.metrics(metric)
    val base = filter.map(df.where).getOrElse(df)
    val s = scored(base, vecCol, query, metric)
    val ord = if (higherIsBetter) col("score").desc else col("score").asc
    s.orderBy(ord, col(idCol).asc).limit(k)
  }

  /** V10: batch search — one exact top-k leg per (query, optional
    * per-query filter) pair (collection/search/batch.rs:26-128: each
    * BatchQuery carries its own filter). Legs are independent
    * filter→TakeOrderedAndProject passes over the same frame, unioned
    * with a `query_id` — one distributed plan, no driver loop. */
  def batch(df: DataFrame, vecCol: String,
      queries: Seq[(Seq[Float], Option[Column])], k: Int,
      metric: String = "cosine", idCol: String = "id"): DataFrame =
    queries.zipWithIndex.map { case ((q, f), i) =>
      topK(df, vecCol, q, k, metric, idCol, f)
        .select(lit(i).as("query_id"), col(idCol), col("score"))
    }.reduce(_ unionAll _)

  /** `similarity(field,$v) OP t` threshold filter. For distance metrics the
    * reference inverts the comparison (`similarity > t` ≡ `distance < t`,
    * query/mod.rs:396-417) — callers pass similarity-space semantics. */
  def thresholdFilter(df: DataFrame, vecCol: String, query: Seq[Float],
      threshold: Double, metric: String = "cosine",
      op: String = ">"): DataFrame = {
    val (_, higherIsBetter) = VectorFunctions.metrics(metric)
    val s = scored(df, vecCol, query, metric)
    val effOp = if (higherIsBetter) op else op match {
      case ">" => "<"
      case ">=" => "<="
      case "<" => ">"
      case "<=" => ">="
      case other => other
    }
    val cond = effOp match {
      case ">" => col("score") > threshold
      case ">=" => col("score") >= threshold
      case "<" => col("score") < threshold
      case "<=" => col("score") <= threshold
      case "=" => col("score") === threshold
      case "!=" => col("score") =!= threshold
    }
    s.where(cond)
  }

  /** k-NN classification — batch scoring with a labeled corpus: each
    * test row's prediction is the majority label of its `k` nearest
    * train rows (vote ties break to the smallest label, the scikit
    * convention). Beyond-reference pipeline tier: similarity search as
    * a classifier (weak labeling / nearest-neighbor eval harness).
    *
    * Scale shape: the TEST batch broadcasts (queries are the small
    * side); ONE pass over train scores |train|×|test| candidates, and
    * the top-k runs two-phase — phase 1 ranks inside (salt, query)
    * groups so each query's candidate stream spreads over `fanout`
    * reducers instead of one, phase 2 ranks only the k×fanout
    * survivors. Global top-k = top-k of per-salt top-k, exactly.
    *
    * Determinism (oracle parity): ranking uses the 6-dp-rounded score
    * as a BIGINT key with train-id tie-break — see the Clustering
    * scaladoc for why rounded keys make cross-engine rank stable. */
  def classify(train: DataFrame, test: DataFrame, vecCol: String,
      labelCol: String, idCol: String, k: Int,
      metric: String = "cosine", fanout: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (fn, higherIsBetter) = VectorFunctions.metrics(metric)
    val q = broadcast(test.select(col(idCol).as("__qid"), col(vecCol).as("__qv")))
    val raw = fn(col(vecCol), col("__qv"))
    val rounded = floor(raw * lit(1000000L) + lit(0.5)).cast("long")
    // distance metrics rank ascending — negate once so both directions
    // share the same descending window
    val rs = if (higherIsBetter) rounded else -rounded
    val scored = train.crossJoin(q)
      .select(col("__qid"), col(idCol).as("__tid"),
        col(labelCol).as("__lbl"), rs.as("__rs"))
    val w1 = Window.partitionBy(col("__salt"), col("__qid"))
      .orderBy(col("__rs").desc, col("__tid"))
    val w2 = Window.partitionBy(col("__qid"))
      .orderBy(col("__rs").desc, col("__tid"))
    val top = scored
      .withColumn("__salt", pmod(xxhash64(col("__tid")), lit(fanout)))
      .withColumn("__r1", row_number().over(w1)).where(col("__r1") <= k)
      .withColumn("__rk", row_number().over(w2)).where(col("__rk") <= k)
    val votes = top.groupBy(col("__qid"), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
    val wv = Window.partitionBy("__qid").orderBy(col("votes").desc, col("__lbl"))
    votes.withColumn("__vr", row_number().over(wv)).where(col("__vr") === 1)
      .select(col("__qid").as(idCol), col("__lbl").as("pred_label"),
        col("votes"))
  }
}
