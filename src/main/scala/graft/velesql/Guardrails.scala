package graft.velesql

import Ast._

/** Query-cost admission control (SURVEY.md §2.13 — reference
  * collection/query_cost/mod.rs:1-42, guardrails.rs: estimate a cost and
  * reject above max_cost before executing).
  *
  * Spark-side the estimate is catalog-stat-driven: base cost = row count
  * of the FROM table, multiplied per structural feature (joins multiply,
  * filters discount, top-k caps). Deliberately coarse — the point is the
  * pre-flight rejection hook, not a CBO.
  */
class Guardrails(rowCounts: Map[String, Long], maxCost: Long = Long.MaxValue) {

  final case class CostEstimate(rows: Long, cost: Long, admitted: Boolean)

  def estimate(q: Query): CostEstimate = {
    val cost = q match {
      case Query(Some(sel), compound, _) =>
        val base = rowCounts.getOrElse(sel.from, 1000000L)
        val joined = sel.joins.foldLeft(base) { (acc, j) =>
          // equi-join: assume FK fan-out of ~1, cost = sum of sides
          acc + rowCounts.getOrElse(j.table, 1000000L)
        }
        val filtered = if (sel.where.isDefined) math.max(joined / 10, 1L) else joined
        val capped = sel.limit.map(l => math.min(filtered, l * 100L)).getOrElse(filtered)
        capped + compound.map(c => estimate(Query(Some(c.right), None, None)).cost).getOrElse(0L)
      case Query(_, _, Some(m)) =>
        val base = rowCounts.getOrElse("edges", 1000000L)
        val hops = m.pattern.rels.map(r => r.maxHops.toLong).sum.max(1L)
        base * hops
      case _ => 0L
    }
    CostEstimate(cost, cost, cost <= maxCost)
  }

  /** Throws if the query exceeds max_cost (the reference's reject path). */
  def admit(q: Query): Unit = {
    val e = estimate(q)
    if (!e.admitted)
      throw new IllegalStateException(
        s"query rejected by guardrails: estimated cost ${e.cost} > max $maxCost")
  }
}
