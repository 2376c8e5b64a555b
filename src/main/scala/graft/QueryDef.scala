package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
