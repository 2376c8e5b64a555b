package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver's parquet test tables.
  *
  * Mirrors the reference's `Database { data_dir, collections }`
  * (reference: crates/velesdb-core/src/lib.rs:230-235) — a directory of
  * named collections — except collections are parquet-backed DataFrames
  * and the SparkSession catalog supersedes the hand-rolled registry.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): with
    // spark.sql.legacy.parquet.nanosAsLong=true it arrives as Long nanos —
    // re-derive the micros-precision timestamp (matches DuckDB's ns→µs
    // truncation of the same column).
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType)) {
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else df
  }

  /** Register every table as a temp view so spark.sql() works against it. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
