package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Knn
import graft.queries.{ClusteringQueries, ExportQueries, GraphQueries, PipelineQueries, RelationalQueries, TextQueries, VectorQueries, VelesqlQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All verifiable operator queries, each with its DuckDB oracle when
    * SQL-expressible. Assembled from per-area modules. */
  def allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ VectorQueries.defs ++ TextQueries.defs ++
      GraphQueries.defs ++ VelesqlQueries.defs ++ PipelineQueries.defs ++
      ClusteringQueries.defs ++ ExportQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * VelesDB's own flagship shape (reference README.md:163-176):
    * similarity threshold + metadata filter + top-k ordered by similarity. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.table(spark, dir, "embeddings")
    val docs = Tables.table(spark, dir, "documents")
    val q = VectorFunctions.syntheticQuery(64)
    val top = Knn.topK(emb, "embedding", q, k = 10, metric = "cosine", idCol = "vec_id")
    top.join(docs, top("vec_id") === docs("doc_id"))
      .where(col("n_chars") > 0)
      .select(col("vec_id"), col("score"), col("lang"), col("source"))
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
