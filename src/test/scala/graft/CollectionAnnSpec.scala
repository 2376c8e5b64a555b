package graft

import graft.server.RestServer

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.functions._

/** Materialized ANN structures over USER collections (the reference's
  * auto-indexed-collection surface, index/hnsw/native_index.rs:317):
  * LSH buckets / IVF cells / PQ codes stamp on the current points
  * generation and rebuild after a publish. Recall + rebuild semantics
  * are oracle-pinned by q142_collection_ann; these specs pin plan
  * structure, generation invalidation, and REST reachability. */
class CollectionAnnSpec extends SparkSpecBase {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-colann")
  private lazy val g = {
    val g0 = Graft(spark, tmp.toString)
    import spark.implicits._
    val rows = (1L to 200L).map { i =>
      (i, (0 until 16).map(d => math.sin(i * 0.37 + d * 1.3).toFloat))
    }
    g0.collections.create("vecs", idCol = "id", vectorCol = Some("vec"))
    g0.collections.upsert("vecs", rows.toDF("id", "vec"))
    g0
  }
  private val q: Seq[Float] = (0 until 16).map(d => math.cos(d * 0.7).toFloat)

  test("probed collection search scans the materialized bucket index, pruned") {
    val df = g.sql("SELECT id, score FROM vecs WHERE vector NEAR $q LIMIT 10 " +
      "WITH (mode = 'accurate')", Map("q" -> q))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bucket"), s"expected the bucket index scan in:\n$plan")
    assert(df.collect().length == 10)
  }

  test("ivf tier on a collection probes cells, not the base frame") {
    val df = g.sql("SELECT id FROM vecs WHERE vector NEAR $q LIMIT 10 " +
      "WITH (mode = 'accurate', index = 'ivf')", Map("q" -> q))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cell"), s"expected the cell index scan in:\n$plan")
    assert(df.collect().length == 10)
  }

  test("a publish invalidates the materialized index (new generation stamp)") {
    import spark.implicits._
    // the q vector itself lands after the index was first materialized
    g.collections.upsert("vecs", Seq((999L, q)).toDF("id", "vec"))
    val after = g.sql("SELECT id FROM vecs WHERE vector NEAR $q LIMIT 3 " +
      "WITH (mode = 'accurate')", Map("q" -> q))
      .collect().map(_.getLong(0)).toSeq
    assert(after.headOption.contains(999L),
      s"rebuilt index must surface the upserted exact match, got $after")
    // and the exact scan agrees on the winner
    val exact = g.sql("SELECT id FROM vecs WHERE vector NEAR $q LIMIT 1",
      Map("q" -> q)).collect().map(_.getLong(0)).toSeq
    assert(exact == Seq(999L))
  }

  test("never-written collections fall back cleanly (no index source)") {
    g.collections.create("emptycol", idCol = "id", vectorCol = Some("vec"))
    // LSH tier: on-the-fly signature path over the empty declared frame
    val lsh = g.sql("SELECT id FROM emptycol WHERE vector NEAR $q LIMIT 5 " +
      "WITH (mode = 'accurate')", Map("q" -> q))
    assert(lsh.collect().isEmpty)
    // trained structures need data: loud failure, not a silent empty
    val e = intercept[Exception] {
      g.sql("SELECT id FROM emptycol WHERE vector NEAR $q LIMIT 5 " +
        "WITH (mode = 'accurate', index = 'ivf')", Map("q" -> q))
    }
    assert(e.getMessage.contains("written user collection"))
  }

  test("concurrent first-touch probes race one index build safely") {
    import spark.implicits._
    // a FRESH collection so no index exists yet: N threads all trigger
    // the materialize; the synchronized build + atomic publish must
    // yield one index and identical, correct results for every thread
    g.collections.create("racecol", idCol = "id", vectorCol = Some("vec"))
    val rows = (1L to 120L).map { i =>
      (i, (0 until 16).map(d => math.sin(i * 0.53 + d * 0.9).toFloat))
    }
    g.collections.upsert("racecol", rows.toDF("id", "vec"))
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (1 to 4).map(_ => Future {
        g.sql("SELECT id FROM racecol WHERE vector NEAR $q LIMIT 5 " +
          "WITH (mode = 'accurate')", Map("q" -> q))
          .collect().map(_.getLong(0)).toSeq
      })
      val results = Await.result(Future.sequence(futures), 120.seconds)
      assert(results.distinct.size == 1,
        s"racing probes disagreed: ${results.distinct}")
      assert(results.head.size == 5)
    } finally pool.shutdown()
  }

  test("superseded index generations are pruned (keep current + one)") {
    import spark.implicits._
    g.collections.create("gc", idCol = "id", vectorCol = Some("vec"))
    // r11: the LSH index over a bucketed collection is maintained PER
    // STORAGE PIECE (Ann.materializedIndexPieces) — retention applies
    // per piece: each bucket keeps its current cache plus at most the
    // one superseded sibling
    def pieceGens(): Map[String, Int] = {
      val parent = java.nio.file.Paths.get(
        s"${sys.props("java.io.tmpdir")}/graft-derived")
      val token = s"${tmp.toString}_col_gc".replaceAll("[^A-Za-z0-9._-]", "_")
      // v4 key shape: v4_<len>k<kind>_<len>t<token>__<stamp>
      val piece = s"^v4_\\d+k(lsh6_p\\d+)_gc_\\d+t${java.util.regex.Pattern.quote(token)}__.*$$".r
      val s = java.nio.file.Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).flatMap {
          case piece(p) => Some(p)
          case _ => None
        }.toSeq.groupBy(identity).view.mapValues(_.size).toMap
      } finally s.close()
    }
    for (round <- 1 to 3) {
      val rows = (1L to (50L * round)).map { i =>
        (i, (0 until 16).map(d => math.sin(i * 0.29 + d * 1.1).toFloat))
      }
      g.collections.upsert("gc", rows.toDF("id", "vec"))
      g.sql("SELECT id FROM gc WHERE vector NEAR $q LIMIT 5 " +
        "WITH (mode = 'accurate')", Map("q" -> q)).collect()
    }
    val gens = pieceGens()
    assert(gens.nonEmpty, "current piece caches must survive")
    gens.foreach { case (p, n) =>
      assert(n <= 2, s"stale index generations not pruned for $p: $n")
    }
  }

  test("REST search reaches the probed tiers on a user collection") {
    val srv = new RestServer(g, port = 0).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .header("Content-Type", "application/json").build(),
          HttpResponse.BodyHandlers.ofString())
      val body = s"""{"vector": [${q.mkString(", ")}], "top_k": 3,
                    | "mode": "accurate", "index": "ivf"}""".stripMargin
      val r = post("/collections/vecs/search", body)
      assert(r.statusCode() == 200, r.body())
      val ids = """"id":(\d+)""".r.findAllMatchIn(r.body()).map(_.group(1).toLong).toSeq
      assert(ids.nonEmpty, r.body())
      // hnsw is a valid kind since r11 — without a probing mode it is
      // still a loud 400 (no silent no-op); truly unknown kinds reject
      // at the route layer before any VelesQL is generated
      val bad = post("/collections/vecs/search",
        s"""{"vector": [${q.mkString(", ")}], "top_k": 3, "index": "hnsw"}""")
      assert(bad.statusCode() == 400 && bad.body().contains("probing mode"))
      val unknown = post("/collections/vecs/search",
        s"""{"vector": [${q.mkString(", ")}], "top_k": 3, "index": "btree"}""")
      assert(unknown.statusCode() == 400 && unknown.body().contains("unknown index"))
    } finally srv.stop()
  }
}
