package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the r18 LPA driver-local finish: the 3-round communities
  * build over the materialized co-purchase projection, local (default
  * gate) vs distributed (gate 0 ≈ the r17 shape plus one count job).
  * Usage: Test/runMain graft.tools.LpaLab <sfDir>
  */
object LpaLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.table(spark, sfDir, "lineitem").count()
    // the copurchase projection exactly as GraphQueries builds it
    val op = graft.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = op.as("x")
      .join(op.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= 2).select("a", "b")
      .localCheckpoint(true) // isolate the LPA cost from the projection
    println(s"pairs: ${pairs.count()}")
    for (mode <- Seq("local", "dist", "local", "dist")) {
      if (mode == "dist") spark.conf.set("graft.lpa.localFinishEdges", "0")
      else spark.conf.unset("graft.lpa.localFinishEdges")
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val res = graft.operators.Graph.lpaCommunities(pairs, iters = 3)
        graft.Bench.force(res)
        val t = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.CheckpointBlocks.unpersist(res)
        t
      }
      println(f"lpa3 $mode%-5s min=${times.min}%.3f reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
