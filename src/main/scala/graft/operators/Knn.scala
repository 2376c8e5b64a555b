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
}
