package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph storage + traversal operators (SURVEY.md §2.10).
  *
  * Reference model: `GraphEdge { id, source, target, label, properties }`
  * with outgoing/incoming/by-label hash indexes
  * (collection/graph/edge.rs:36-42, 119-131). Spark shape: an `edges`
  * DataFrame `(src, dst, label)`; the reference's four hash indexes are
  * superseded by partition pruning + shuffle-on-key joins (bucket the
  * edges table by `src` for 100 TB co-located traversal joins).
  *
  * Traversal (match_exec.rs:104-218; graph/streaming.rs:158-243) is BFS.
  * Here: an iterative loop of joins — `frontier_{d+1} = frontier_d ⋈
  * edges` with per-depth dedup and a visited anti-join, which is exact
  * cycle handling (better than the reference's approximate visited-set
  * overflow mode past 100k nodes). Depth is capped at 10 like the
  * reference (match_exec.rs:310).
  */
object Graph {

  /** Offsets keep node id spaces disjoint across entity types. */
  val OrderOffset = 10000000L
  val PartOffset = 20000000L
  val SuppOffset = 30000000L

  /** The derived property graph over the TPC-H tables:
    * customer -placed-> order -contains-> part -supplied_by-> supplier. */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(spark, dir, "orders")
    val l = Tables.table(spark, dir, "lineitem")
    val placed = o.select(col("o_custkey").as("src"),
      (col("o_orderkey") + OrderOffset).as("dst"), lit("placed").as("label"))
    val contains = l.select((col("l_orderkey") + OrderOffset).as("src"),
      (col("l_partkey") + PartOffset).as("dst"), lit("contains").as("label")).distinct()
    val suppliedBy = l.select((col("l_partkey") + PartOffset).as("src"),
      (col("l_suppkey") + SuppOffset).as("dst"), lit("supplied_by").as("label")).distinct()
    placed.unionAll(contains).unionAll(suppliedBy)
  }

  /** Same graph as DuckDB SQL (for oracles). */
  val edgesSql: String =
    """SELECT o_custkey AS src, o_orderkey + 10000000 AS dst, 'placed' AS label FROM orders
      |  UNION ALL
      |  SELECT DISTINCT l_orderkey + 10000000, l_partkey + 20000000, 'contains' FROM lineitem
      |  UNION ALL
      |  SELECT DISTINCT l_partkey + 20000000, l_suppkey + 30000000, 'supplied_by' FROM lineitem""".stripMargin

  /** Var-length BFS `-[*1..maxDepth]->` from `starts(start)` over
    * `edges(src,dst,label)`: returns (start, node, depth) with the MINIMUM
    * depth per (start, node) — first arrival wins, visited nodes are
    * never re-expanded (exact cycle handling).
    *
    * The loop runs on the driver but every step is a distributed join;
    * each depth shuffles the frontier by `node` against edges by `src`.
    * Reference: match_exec.rs:104-218 (BFS, depth cap 10). */
  def bfsVarLength(edges: DataFrame, starts: DataFrame, maxDepth: Int,
      relTypes: Seq[String] = Nil): DataFrame = {
    require(maxDepth <= 10, "depth capped at 10 (match_exec.rs:310)")
    // the edge frame is joined once per depth — cache it across iterations
    // (at cluster scale: persist bucketed by src instead)
    val e = (if (relTypes.nonEmpty) edges.where(col("label").isin(relTypes: _*))
             else edges).select("src", "dst").cache()
    var frontier = starts.select(col("start"), col("start").as("node")).distinct()
    var visited = frontier
    var acc: DataFrame = null
    for (d <- 1 to maxDepth) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(frontier("start"), e("dst").as("node")).distinct()
      // first-arrival-wins: drop nodes already reached at a smaller depth.
      // The eager per-depth checkpoint does double duty: truncates lineage
      // AND regenerates attribute ids so re-joining the same edge frame
      // next depth isn't an ambiguous self-join.
      val fresh = next.join(visited,
          next("start") === visited("start") && next("node") === visited("node"),
          "left_anti")
        .localCheckpoint(eager = true)
      val step = fresh.withColumn("depth", lit(d))
      acc = if (acc == null) step else acc.unionAll(step)
      visited = visited.unionAll(fresh).localCheckpoint(eager = true)
      frontier = fresh
    }
    // every depth is materialized, so the cached edges are no longer
    // referenced — release them (callers may loop over many BFS's)
    e.unpersist(blocking = false)
    acc
  }
}
