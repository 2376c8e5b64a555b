package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal-JVM shuffle-floor calibration (see Scratch). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.All.foreach(n => graft.Tables.table(spark, sfDir, n).count())
    def run(label: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"S2 $label min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    for (pf <- Seq("false", "true")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      run(s"q159 pf=$pf")(graft.SparkEntry.queries("q159_approx_quantiles")(spark, sfDir)
        .queryExecution.toRdd.count())
      run(s"q151 pf=$pf")(graft.SparkEntry.queries("q151_approx_distinct")(spark, sfDir)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
