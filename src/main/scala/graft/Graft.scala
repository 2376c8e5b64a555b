package graft

import graft.velesql.{Ast, Catalog, Compiler, Explain, Guardrails, Parser}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine facade — what a VelesDB user instantiates after switching.
  *
  * Mirrors the reference's `Database` + per-collection query API
  * (lib.rs:230-346, collection/search/query/mod.rs:78) in one object:
  * VelesQL text in, DataFrame out, with an LRU parse cache
  * (velesql/cache.rs:56-110: cache keyed by query string) and optional
  * cost guardrails (query_cost/mod.rs).
  *
  * {{{
  * val g = Graft(spark, "/data/collections")
  * val hits = g.sql("SELECT * FROM docs WHERE vector NEAR \$q LIMIT 10",
  *                  Map("q" -> queryVec))
  * }}}
  */
class Graft(
    val spark: SparkSession,
    dataDir: String,
    maxCost: Long = Long.MaxValue,
    parseCacheSize: Int = 256) {

  val catalog = new Catalog(spark, dataDir)
  val collections = new Collections(spark, dataDir)

  /** LRU parse cache (velesql/cache.rs:56-110) — parsing is pure, so the
    * AST is safely shared across executions with different params. */
  private val parseCache =
    new java.util.LinkedHashMap[String, Ast.Query](parseCacheSize, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Ast.Query]): Boolean =
        size() > parseCacheSize
    }

  def parse(sql: String): Ast.Query = parseCache.synchronized {
    val cached = parseCache.get(sql)
    if (cached != null) cached
    else {
      val q = Parser.parse(sql)
        .fold(e => throw new velesql.SyntaxError(e), identity)
      parseCache.put(sql, q)
      q
    }
  }

  private lazy val guardrails: Guardrails = {
    val counts = catalog.meta.keys.flatMap { n =>
      try Some(n -> catalog.table(n).count()) catch { case _: Exception => None }
    }.toMap
    new Guardrails(counts, maxCost)
  }

  /** Execute VelesQL text with optional parameters. Errors follow the
    * reference taxonomy (velesql/error.rs): SyntaxError from the parser,
    * NotFoundError for unknown collections, SemanticError for invalid
    * plans, CostLimitError from guardrails. */
  def sql(query: String, params: Map[String, Any] = Map.empty,
      fixedNowEpoch: Option[Long] = None): DataFrame = {
    val ast = parse(query)
    ast.select.foreach { sel =>
      (sel.from +: sel.joins.map(_.table)).foreach { t =>
        if (!catalog.meta.contains(t))
          throw new velesql.NotFoundError(s"collection not found: $t")
      }
    }
    if (maxCost != Long.MaxValue) {
      try guardrails.admit(ast)
      catch { case e: IllegalStateException =>
        throw new velesql.CostLimitError(e.getMessage) }
    }
    try new Compiler(spark, catalog, params, fixedNowEpoch).compile(ast)
    catch {
      case e: velesql.VelesError => throw e
      case e: IllegalArgumentException => throw new velesql.SemanticError(e.getMessage)
    }
  }

  /** Plan-intent summary (velesql/explain.rs shape). */
  def explain(query: String): String = Explain.render(parse(query))
}

object Graft {
  def apply(spark: SparkSession, dataDir: String): Graft = new Graft(spark, dataDir)
}
