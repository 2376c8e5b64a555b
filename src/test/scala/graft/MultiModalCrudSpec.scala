package graft

import graft.operators.MultiModal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing + collection CRUD lifecycle. */
class MultiModalCrudSpec extends SparkSpecBase {

  test("media table has the binary schema and deterministic content") {
    val media = MultiModal.mediaFromDocuments(spark, sfDir)
    assert(media.schema("bytes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val r = media.where(col("media_id") === 1).first()
    assert(r.getAs[String]("kind") == "audio") // 1 % 3 = 1 → audio
    assert(r.getAs[Array[Byte]]("bytes").nonEmpty)
  }

  test("stub feature extraction: histogram sums to 1, bytes column dropped") {
    val media = MultiModal.mediaFromDocuments(spark, sfDir)
    val feats = MultiModal.extractFeatures(media)
    assert(!feats.columns.contains("bytes"))
    val r = feats.where(col("media_id") === 0).first()
    val hist = r.getSeq[Double](r.fieldIndex("feat_hist"))
    assert(hist.length == 16)
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    assert(r.getAs[Double]("feat_mean") > 0.0)
    // deterministic across runs
    val again = MultiModal.extractFeatures(media)
      .where(col("media_id") === 0).first()
    assert(again.getSeq[Double](again.fieldIndex("feat_hist")) == hist)
  }

  test("frame sampling explodes video rows into declared_frames chunks") {
    val media = MultiModal.mediaFromDocuments(spark, sfDir)
    val frames = MultiModal.sampleFrames(media)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
    val expected = media.where(col("kind") === "video")
      .select(col("media_id"), col("meta.declared_frames").as("n"))
    val joined = perVideo.as("got").join(expected.as("exp"), "media_id")
      .where(col("got.n") =!= col("exp.n"))
    assert(joined.count() == 0)
  }

  test("agent memory: typed views, TTL expiry, vector recall") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_agent").toString
    val cols = new Collections(spark, dir)
    val mem = new AgentMemory(spark, cols)
    mem.create()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, "semantic", "spark is an engine", Seq(1.0f, 0.0f), t0, null.asInstanceOf[java.lang.Long]),
      (2L, "episodic", "ran q1 at 9am", Seq(0.0f, 1.0f), t0, java.lang.Long.valueOf(3600L)),
      (3L, "procedural", "to bench: sbt run", Seq(0.7f, 0.7f), t0, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "kind", "content", "embedding", "ts", "ttl_seconds")
    mem.remember(rows)
    val now = t0.toInstant.getEpochSecond + 7200 // 2h later: episodic expired
    assert(mem.live(now).count() == 2)
    assert(mem.episodic(now).count() == 0)
    assert(mem.semantic(now).count() == 1)
    val recalled = mem.recall("semantic", Seq(0.9f, 0.1f), 1, now).collect()
    assert(recalled.head.getAs[Long]("id") == 1L)
    mem.expire(now)
    assert(cols.count("agent_memory") == 2) // dead row physically gone
    cols.drop("agent_memory")
  }

  test("agent memory snapshot/restore: recall works over a restored state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_agent_snap").toString
    val cols = new Collections(spark, dir)
    val mem = new AgentMemory(spark, cols)
    mem.create()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val now = t0.toInstant.getEpochSecond
    mem.remember(Seq(
      (1L, "semantic", "v1 fact", Seq(1.0f, 0.0f), t0, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "kind", "content", "embedding", "ts", "ttl_seconds"))
    mem.snapshot("v1")
    // mutate past the snapshot: overwrite 1, add 2
    mem.remember(Seq(
      (1L, "semantic", "v2 fact", Seq(0.0f, 1.0f), t0, null.asInstanceOf[java.lang.Long]),
      (2L, "semantic", "new fact", Seq(0.5f, 0.5f), t0, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "kind", "content", "embedding", "ts", "ttl_seconds"))
    assert(cols.count("agent_memory") == 2)
    assert(mem.listSnapshots() == Seq("v1"))
    // restore: state is exactly the v1 snapshot again
    mem.restore("v1")
    assert(cols.count("agent_memory") == 1)
    val rec = mem.recall("semantic", Seq(1.0f, 0.0f), 1, now).collect()
    assert(rec.head.getAs[Long]("id") == 1L)
    assert(rec.head.getAs[String]("content") == "v1 fact")
    // restore is a publish: later writes build on the restored state
    mem.remember(Seq(
      (3L, "semantic", "post-restore", Seq(0.2f, 0.8f), t0, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "kind", "content", "embedding", "ts", "ttl_seconds"))
    assert(cols.count("agent_memory") == 2)
    // unknown snapshot → NotFoundError; snapshots survive until dropped
    intercept[graft.velesql.NotFoundError] { mem.restore("nope") }
    cols.dropSnapshot("agent_memory", "v1")
    assert(mem.listSnapshots().isEmpty)
    cols.drop("agent_memory")
  }

  test("snapshotTable is a read-only time-travel view; live state untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_read").toString
    val cols = new Collections(spark, dir)
    cols.create("docs")
    cols.upsert("docs", Seq((1L, "old")).toDF("id", "body"))
    cols.snapshot("docs", "v1")
    cols.upsert("docs", Seq((1L, "new"), (2L, "more")).toDF("id", "body"))
    // time travel sees the v1 state…
    val then_ = cols.snapshotTable("docs", "v1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(then_ == Seq(1L -> "old"))
    // …and reading did not publish: the live frame still has both rows
    val now = cols.table("docs").get.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(now == Seq(1L -> "new", 2L -> "more"))
    // edges frame appears in the snapshot once edges exist
    cols.upsertEdges("docs", Seq((10L, 1L, 2L, "ref")).toDF("id", "src", "dst", "label"))
    cols.snapshot("docs", "v2")
    assert(cols.snapshotEdges("docs", "v2").get.count() == 1)
    assert(cols.snapshotEdges("docs", "v1").isEmpty) // points-only era
    // traversal tags can't escape the snapshots dir
    intercept[IllegalArgumentException] { cols.snapshotTable("docs", "..") }
    intercept[IllegalArgumentException] { cols.snapshot("docs", "..") }
    intercept[graft.velesql.NotFoundError] { cols.snapshotTable("docs", "nope") }
    cols.drop("docs")
  }

  test("deleteWhere keeps rows whose predicate is NULL (not TRUE ≠ delete)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delwhere").toString
    val cols = new Collections(spark, dir)
    cols.create("notes")
    // score is NULL for id=2 — `score > 5` is NULL there, so the row must
    // SURVIVE a deleteWhere(score > 5) (the predicate didn't match)
    cols.upsert("notes", Seq(
      (1L, java.lang.Double.valueOf(9.0)),
      (2L, null.asInstanceOf[java.lang.Double]),
      (3L, java.lang.Double.valueOf(1.0))).toDF("id", "score"))
    cols.deleteWhere("notes", col("score") > 5)
    val left = cols.table("notes").get.select("id").collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(2L, 3L)) // only id=1 matched; NULL row kept
    cols.drop("notes")
  }

  test("upsert widens: a batch with a new payload field null-fills old rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_widen").toString
    val cols = new Collections(spark, dir)
    cols.create("docs")
    cols.upsert("docs", Seq((1L, "a"), (2L, "b")).toDF("id", "body"))
    // the reference payload is an open JSON map and the REST route infers
    // each batch's schema from its own JSON — so a later batch may carry
    // a field earlier batches lacked (and may omit earlier fields)
    cols.upsert("docs", Seq((3L, "c", "en")).toDF("id", "body", "lang"))
    val t = cols.table("docs").get
    assert(t.columns.sorted.toSeq == Seq("body", "id", "lang"))
    assert(t.where(col("lang").isNull).count() == 2) // old rows null-fill
    assert(t.where(col("id") === 3 && col("lang") === "en").count() == 1)
    cols.drop("docs")
  }

  test("collection CRUD lifecycle: create/upsert/get/delete/drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_collections").toString
    val cols = new Collections(spark, dir)
    cols.create("points", idCol = "id", vectorCol = Some("vec"))
    assert(cols.list() == Seq("points"))
    assert(cols.count("points") == 0)

    cols.upsert("points", Seq((1L, "a"), (2L, "b")).toDF("id", "payload"))
    assert(cols.count("points") == 2)

    // upsert replaces by id (crud.rs:19-127)
    cols.upsert("points", Seq((2L, "b2"), (3L, "c")).toDF("id", "payload"))
    assert(cols.count("points") == 3)
    assert(cols.get("points", Seq(2L)).select("payload").first().getString(0) == "b2")

    cols.delete("points", Seq(1L))
    assert(cols.count("points") == 2)
    assert(cols.get("points", Seq(1L)).count() == 0)

    cols.drop("points")
    assert(cols.list().isEmpty)
  }
}
