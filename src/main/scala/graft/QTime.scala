package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // driver-generated parquet stamps tz-naive timestamp[us]; read as
      // TIMESTAMP (UTC instants) so unix_micros/watermarks keep working
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.All.foreach(n => Tables.table(spark, sfDir, n).count())
    args.drop(1).foreach { q =>
      // Bench's honest protocol: rebuild the frame per rep (a re-counted
      // RDD would reuse its own shuffle files — skipped stages time ~0),
      // force the full physical plan, min of 3
      Bench.force(SparkEntry.queries(q)(spark, sfDir)) // untimed warm
      spark.catalog.clearCache()
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        Bench.force(df)
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (t, tBuild)
      }
      println(f"TIMED $q ${reps.map(_._1).min}%.3f s  reps=${reps.map(r => f"${r._1}%.3f(b${r._2}%.2f)").mkString(",")}")
    }
    spark.stop()
  }
}
