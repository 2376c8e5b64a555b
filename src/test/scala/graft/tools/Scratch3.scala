package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-pin micro-batch breakdown (see Scratch). */
object Scratch3 {
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
    graft.Tables.All.foreach(n => graft.Tables.table(spark, sfDir, n).count())

    // warm
    graft.SparkEntry.queries("q131_streaming_sessions")(spark, sfDir).collect()

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    val agg = graft.streaming.StreamingOps.sessionAgg(
      graft.streaming.StreamingOps.eventsStream(spark, sfDir), "30 minutes", "1 hour")
    val qn = "s3_sink"
    val t0 = System.nanoTime()
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val total = (System.nanoTime() - t0) / 1e9
    println(f"S3 total=${total}%.3f")
    q.recentProgress.foreach { p =>
      println(s"S3 batch=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${p.durationMs} states=${p.stateOperators.map(so => so.numRowsTotal).mkString(",")}")
    }
    q.stop()
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.stop()
  }
}
