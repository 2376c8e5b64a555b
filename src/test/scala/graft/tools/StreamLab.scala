package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 lab: the HONEST streaming comparator (r12 ask #6, r13 VERDICT ask
  * #5). q131/q147's bench rows compare a micro-batch Structured Streaming
  * execution against a DuckDB BATCH recomputation — apples/oranges by
  * construction (the streaming run pays checkpointing, state-store
  * management and trigger scheduling that the batch oracle never does).
  * This lab measures the apples-to-apples pair: the SAME work in the SAME
  * engine, batch vs micro-batch —
  *   q131: session_window aggregation over events, Spark BATCH vs the
  *         shipped AvailableNow micro-batch pipeline (memory sink)
  *   q147: interval click→purchase join, Spark BATCH vs the shipped
  *         watermarked stream-stream join
  * The batch twin is value-checked against the streaming result first, so
  * the ratio is between two runs producing identical rows.
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.tools.StreamLab"
  */
object StreamLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def events: DataFrame = graft.Tables.table(spark, sfDir, "events")

    /** q131's exact output shape, batch session_window. */
    def sessionsBatch(): DataFrame =
      events
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), round(col("session_value"), 4).as("session_value"))
        .orderBy(col("user_id"), col("session_start"))

    /** q147's exact output shape, batch interval join. */
    def joinBatch(): DataFrame = {
      val c = events.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
      val p = events.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_uid"),
          col("ts").as("pts"), col("value"))
      c.join(p, col("user_id") === col("p_uid") &&
          col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          round(col("value"), 4).as("purchase_value"))
        .orderBy(col("click_id"), col("purchase_id"))
    }

    def shipped(name: String): DataFrame =
      graft.SparkEntry.queries(name)(spark, sfDir)

    def rowsOf(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq

    // value cross-check: the batch twins produce identical rows
    println(s"STREAMLAB q131_equal=${rowsOf(sessionsBatch()) == rowsOf(shipped("q131_streaming_sessions"))}")
    println(s"STREAMLAB q147_equal=${rowsOf(joinBatch()) == rowsOf(shipped("q147_streaming_join"))}")

    def measure(name: String, mk: () => DataFrame): Double = {
      graft.Bench.force(mk()) // warm
      spark.catalog.clearCache()
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.force(mk())
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"STREAMLAB $name%-24s min=${times.min}%.3fs all=[${times.map(t => f"$t%.3f").mkString(",")}]")
      times.min
    }

    val sb = measure("q131_batch_twin", () => sessionsBatch())
    val ss = measure("q131_streaming", () => shipped("q131_streaming_sessions"))
    val jb = measure("q147_batch_twin", () => joinBatch())
    val js = measure("q147_streaming", () => shipped("q147_streaming_join"))
    println(f"STREAMLAB q131 streaming/batch = ${ss / sb}%.2f  q147 = ${js / jb}%.2f")

    // how much of the streaming cost is the partition count the shipped
    // def pins (4 — sized for sf0.1's state-file overhead)?
    def sessionsStreamAt(parts: Int): DataFrame = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        val agg = graft.streaming.StreamingOps.sessionAgg(
          graft.streaming.StreamingOps.eventsStream(spark, sfDir),
          "30 minutes", "1 hour")
        val qn = s"sl131_${System.nanoTime()}"
        val shm = new java.io.File("/dev/shm")
        val ckBase = if (shm.isDirectory && shm.canWrite) "/dev/shm" else
          sys.props("java.io.tmpdir")
        val ck = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(ckBase), "sl131-").toString
        try {
          val q = agg.writeStream.format("memory").queryName(qn)
            .option("checkpointLocation", ck)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          try require(q.awaitTermination(300000)) finally q.stop()
          val out = spark.table(qn).localCheckpoint(true)
          spark.catalog.dropTempView(qn)
          out
        } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ck))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    for (p <- Seq(4, 16, 32))
      measure(s"q131_streaming_sp$p", () => sessionsStreamAt(p))
    spark.stop()
  }
}
