package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming tier: watermarked windows, session windows,
  * keyed state — driven end-to-end through micro-batch execution. */
class StreamingSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed aggregation over the events file stream (trigger=AvailableNow)") {
    val stream = StreamingOps.eventsStream(spark, sfDir)
    assert(stream.isStreaming)
    val agg = StreamingOps.windowedAgg(stream, "6 hours", "6 hours", "1 hour")
    val qn = s"win_agg_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table(qn)
    // batch equivalence: same aggregation over the same data, batch mode
    val batch = Tables.table(spark, sfDir, "events")
      .groupBy(window(col("ts"), "6 hours", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(got.count() == batch.count())
    assert(got.agg(sum("cnt")).first().getLong(0) ==
      Tables.table(spark, sfDir, "events").count())
  }

  test("transforms are mode-agnostic: the batch twin IS the same function") {
    // applied to a BATCH frame, sessionAgg/intervalJoin yield the
    // one-shot batch plan (watermarks no-op outside streaming) — the
    // 10-15x-cheaper twin PERF_r14 §4 recommends for one-shot work
    val ev = Tables.table(spark, sfDir, "events")
    val sessions = StreamingOps.sessionAgg(ev, "30 minutes", "1 hour")
    assert(!sessions.isStreaming)
    val viaSql = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(sessions.count() == viaSql.count())
    val joined = StreamingOps.intervalJoin(ev)
    assert(!joined.isStreaming)
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val expect = c.join(p, col("cu") === col("pu") &&
      col("pts") >= col("cts") &&
      col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES")).count()
    assert(joined.count() == expect)
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:10:00"), 1L, 2.0), // same session (gap 30m)
      (ts("2024-01-01 12:00:00"), 1L, 3.0), // new session
      (ts("2024-01-01 10:05:00"), 2L, 4.0))
    val events = mem.toDF().toDF("ts", "user_id", "value")
    val qn = s"sessions_${System.nanoTime()}"
    val q = StreamingOps.sessionAgg(events, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName(qn)
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(qn).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("session_value"))).toSet
    assert(rows == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }

  test("mapGroupsWithState keeps running per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.UserEvent]
    val qn = s"user_state_${System.nanoTime()}"
    val q = StreamingOps.runningUserState(mem.toDS())
      .writeStream.format("memory").queryName(qn)
      .outputMode("update").start()
    mem.addData(StreamingOps.UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      StreamingOps.UserEvent(1L, ts("2024-01-01 10:01:00"), 2.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.UserEvent(1L, ts("2024-01-01 10:05:00"), 4.0))
    q.processAllAvailable()
    q.stop()
    val snaps = spark.table(qn).as[StreamingOps.UserSnapshot].collect()
      .filter(_.user_id == 1L).sortBy(_.n_events)
    // first batch snapshot: 2 events / 3.0; second: state carried → 3 / 7.0
    assert(snaps.map(s => (s.n_events, s.total_value)).toSeq ==
      Seq((2L, 3.0), (3L, 7.0)))
  }

  test("streaming exact dedup keeps first arrival per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val qn = s"dedup_${System.nanoTime()}"
    val q = StreamingOps.dedupStream(docs, "1 hour")
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    val body = "the quick brown fox jumps over the lazy dog again"
    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, body),
      (ts("2024-01-01 10:05:00"), 2L, body), // dup of doc 1 (same batch)
      (ts("2024-01-01 10:10:00"), 3L, "an entirely different document body"))
    q.processAllAvailable()
    mem.addData(
      (ts("2024-01-01 10:20:00"), 4L, body)) // dup of doc 1 (later batch)
    q.processAllAvailable()
    q.stop()
    val kept = spark.table(qn).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"got $kept")
  }

  test("streaming ingest upserts micro-batches into a collection (merge by id)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt").toString
    val cols = new Collections(spark, dir)
    cols.create("stream_pts", idCol = "id", vectorCol = Some("embedding"))
    val mem = MemoryStream[(Long, Seq[Float], String)]
    val batches = mem.toDF().toDF("id", "embedding", "tag")
    val q = StreamingOps.ingestStream(batches, cols, "stream_pts", ckpt)
    mem.addData((1L, Seq(1.0f, 0.0f), "a"), (2L, Seq(0.0f, 1.0f), "b"))
    q.processAllAvailable()
    assert(cols.count("stream_pts") == 2)
    mem.addData((2L, Seq(0.5f, 0.5f), "b2"), (3L, Seq(0.9f, 0.1f), "c"))
    q.processAllAvailable()
    q.stop()
    // merge-by-id: 3 points, id 2 carries the LATER batch's values
    assert(cols.count("stream_pts") == 3)
    val g = Graft(spark, dir)
    val tag2 = g.sql("SELECT tag FROM stream_pts WHERE id = 2")
      .collect().map(_.getString(0)).toSeq
    assert(tag2 == Seq("b2"), s"got $tag2")
    // and the ingested collection is NEAR-searchable
    val top = g.sql("SELECT id FROM stream_pts WHERE vector NEAR $q LIMIT 2",
      Map("q" -> Seq(1.0f, 0.0f))).collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 3L), s"got $top")
  }

  test("stream-stream interval join matches the batch join, emitted once") {
    import org.apache.spark.sql.functions._
    val joined = StreamingOps.intervalJoin(StreamingOps.eventsStream(spark, sfDir))
    val qn = s"sj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qn)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try require(q.awaitTermination(120000), "interval join timed out")
    finally q.stop()
    val got = spark.table(qn)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.catalog.dropTempView(qn)
    val ev = Tables.table(spark, sfDir, "events")
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), col("ts").as("cts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val want = c.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 minutes"))
      .select("cid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted, s"stream ${got.size} vs batch ${want.size}")
    assert(got.distinct.size == got.size, "append mode must emit each pair once")
  }
}
