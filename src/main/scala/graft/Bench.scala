package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract → BENCH_r{N}.json).
  *
  * A warmup pass (schema reads + one tiny query per table) runs before
  * the timed loop so the first timed query doesn't absorb JVM/codegen
  * warmup (~4-5 s of JIT + whole-stage-codegen compilation).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + exercise codegen/shuffle machinery once
    Tables.All.foreach(n => Tables.table(spark, sfDir, n).count())
    SparkEntry.queries.get("q01_tpch_q1").foreach(f => f(spark, sfDir).count())
    SparkEntry.queries.get("q40_knn_cosine").foreach(f => f(spark, sfDir).count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that cache intermediates (shingles, BFS edges) must not
      // bleed block-manager pressure into later measurements
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
