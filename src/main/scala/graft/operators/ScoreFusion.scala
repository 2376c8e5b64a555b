package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-score breakdown fusion (SURVEY.md §2.8 F5 — reference
  * search/query/score_fusion.rs:14-41, 144-227: a `ScoreBreakdown` struct
  * with vector_similarity / graph_distance / path_score / metadata_boost /
  * recency_boost components, fused by Rrf / Weighted / Max / Min /
  * Product / Average strategies, with boosts applied multiplicatively).
  *
  * Spark shape: the breakdown is a struct column; every strategy is a
  * scalar expression over its fields — stays in whole-stage codegen.
  */
object ScoreFusion {

  /** Build the breakdown struct from per-component columns (missing
    * components default to neutral values). */
  def breakdown(vectorSim: Column, graphDist: Column = lit(0.0),
      pathScore: Column = lit(0.0), metadataBoost: Column = lit(1.0),
      recencyBoost: Column = lit(1.0)): Column =
    struct(vectorSim.as("vector_similarity"), graphDist.as("graph_distance"),
      pathScore.as("path_score"), metadataBoost.as("metadata_boost"),
      recencyBoost.as("recency_boost"))

  /** Fuse a breakdown struct under a strategy; boosts multiply the fused
    * base score (score_fusion.rs:144-227). */
  def fuse(b: Column, strategy: String,
      weights: Map[String, Double] = Map.empty): Column = {
    val v = b.getField("vector_similarity")
    val g = b.getField("graph_distance")
    val p = b.getField("path_score")
    val base = strategy.toLowerCase match {
      case "average" => (v + g + p) / 3.0
      case "max" => greatest(v, g, p)
      case "min" => least(v, g, p)
      case "product" => v * g * p
      case "weighted" =>
        v * weights.getOrElse("vector", 1.0 / 3) +
          g * weights.getOrElse("graph", 1.0 / 3) +
          p * weights.getOrElse("path", 1.0 / 3)
      case "rrf" => // component scores as pseudo-ranks (1-based contribution)
        lit(1.0) / (lit(60.0) + v) + lit(1.0) / (lit(60.0) + g) + lit(1.0) / (lit(60.0) + p)
      case other => throw new IllegalArgumentException(s"unknown strategy $other")
    }
    base * b.getField("metadata_boost") * b.getField("recency_boost")
  }
}
