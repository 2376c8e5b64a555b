package graft

import graft.server.RestServer

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrency stress over ONE Graft instance through the real REST
  * surface (reference parity: velesdb-core stress_concurrency_tests.rs
  * and its loom-model-checked write paths). Twelve client threads —
  * wider than the server's 8-thread HTTP pool — mix batch upserts,
  * single-point replaces, deletes, point GETs, VelesQL count queries,
  * and a compact/vacuum maintenance pass against one collection, all
  * racing the generation-publish machinery. Invariants:
  *  - no route ever answers 5xx or a torn body while publishes race;
  *  - every read sees a CONSISTENT generation: the count never drops
  *    below the untouched 40-row seed floor;
  *  - serialized writers lose nothing: each id is owned by exactly one
  *    thread, so the end state is deterministic — last write per id,
  *    minus the deletes — and is asserted exactly;
  *  - the manifest stays resolvable and exact after the storm.
  */
class StressSpec extends SparkSpecBase {

  private val client = HttpClient.newHttpClient()

  test("parallel upsert/replace/delete/get/query/compact over one instance") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val g = Graft(spark, tmp)
    val srv = new RestServer(g, port = 0).start()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val b = s"http://127.0.0.1:${srv.boundPort}"
      def send(r: HttpRequest) = client.send(r, HttpResponse.BodyHandlers.ofString())
      def post(path: String, body: String) =
        send(HttpRequest.newBuilder(URI.create(s"$b$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .header("Content-Type", "application/json").build())
      def get(path: String) =
        send(HttpRequest.newBuilder(URI.create(s"$b$path")).GET().build())
      def del(path: String) =
        send(HttpRequest.newBuilder(URI.create(s"$b$path")).DELETE().build())

      assert(post("/collections", """{"name": "st"}""").statusCode() == 200)
      val seed = (1 to 40)
        .map(i => s"""{"id": $i, "payload": {"v": "seed$i", "owner": 0}}""")
        .mkString(",")
      assert(post("/collections/st/points", s"""{"points": [$seed]}""")
        .statusCode() == 200)

      val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      def check(r: HttpResponse[String], where: String): HttpResponse[String] = {
        if (r.statusCode() >= 500)
          bad.add(s"$where -> ${r.statusCode()}: ${r.body().take(150)}")
        r
      }

      // 3 writers with disjoint id ranges t*100+1..t*100+20:
      // batch A → 5 single-point replaces → batch B → 5 deletes.
      // Final truth per thread: ids +1..+15 present with v = "w{t}_b".
      val writers = (1 to 3).map { t =>
        Future {
          val ids = (1 to 20).map(i => t * 100 + i)
          def batch(tag: String) = ids
            .map(id => s"""{"id": $id, "payload": {"v": "w${t}_$tag", "owner": $t}}""")
            .mkString("[", ",", "]")
          check(post("/collections/st/points", s"""{"points": ${batch("a")}}"""), s"w$t batchA")
          ids.take(5).foreach { id =>
            check(post("/collections/st/points",
              s"""{"points": [{"id": $id, "payload": {"v": "w${t}_r", "owner": $t}}]}"""),
              s"w$t replace")
          }
          check(post("/collections/st/points", s"""{"points": ${batch("b")}}"""), s"w$t batchB")
          ids.takeRight(5).foreach(id => check(del(s"/collections/st/points/$id"), s"w$t del"))
        }
      }
      // 1 maintenance thread: generation churn from the OTHER publish
      // paths (compact rewrites the layout, vacuum drops old generations)
      val maintenance = Future {
        Thread.sleep(300)
        g.collections.compact("st", numFiles = 2)
        g.collections.vacuum("st")
      }
      // 5 readers hammer /query (plan memo + twin sessions) and point GETs
      @volatile var stop = false
      val readers = (1 to 5).map { rix =>
        Future {
          var n = 0
          while (!stop) {
            n += 1
            val c = check(post("/query",
              """{"query": "SELECT count(*) AS c FROM st"}"""), s"r$rix count")
            if (c.statusCode() == 200)
              "\"c\":(\\d+)".r.findFirstMatchIn(c.body()).foreach { m =>
                // a torn generation undershoots the untouched seed floor
                if (m.group(1).toLong < 40L) bad.add(s"torn count ${m.group(1)}")
              }
            // seeds are never deleted: GET must always answer 200
            val gr = check(get(s"/collections/st/points/${1 + n % 40}"), s"r$rix get")
            if (gr.statusCode() == 404) bad.add(s"seed point ${1 + n % 40} vanished")
          }
        }
      }

      Await.result(Future.sequence(writers), 300.seconds)
      Await.result(maintenance, 120.seconds)
      stop = true
      Await.result(Future.sequence(readers), 60.seconds)
      assert(bad.isEmpty, s"${bad.size} violations: " +
        bad.toArray.take(5).mkString("; "))

      // deterministic end state: 40 seeds + 3×15 surviving writer rows
      assert(g.collections.count("st") == 85L)
      val rows = g.collections.table("st").get
        .selectExpr("id", "v").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      (1 to 3).foreach { t =>
        (1 to 15).foreach { i =>
          assert(rows.get(t * 100L + i).contains(s"w${t}_b"),
            s"id ${t * 100 + i}: ${rows.get(t * 100L + i)} != w${t}_b")
        }
        (16 to 20).foreach { i =>
          assert(!rows.contains(t * 100L + i), s"id ${t * 100 + i} not deleted")
          assert(get(s"/collections/st/points/${t * 100 + i}").statusCode() == 404)
        }
      }
      (1 to 40).foreach(i => assert(rows.get(i.toLong).contains(s"seed$i")))
      // manifest resolvable and exact after the storm
      assert(g.collections.get("st", Seq(101L)).count() == 1)
    } finally {
      srv.stop()
      pool.shutdown()
      Collections.deleteRec(java.nio.file.Paths.get(tmp))
    }
  }

  test("8 concurrent mode=stream analytics run in parallel on private sessions") {
    // r17 VERDICT #4: the stream-mode conf flip used to run under a
    // session-global lock held for each stream's whole lifetime — the
    // REST pool's 8 threads serialized. Now every request clones the
    // session and flips noDataMicroBatches on the CLONE only. Two pins:
    //  - the SHARED session's conf is never observed flipped while the
    //    8-way storm runs (the old code held it at false for ~all of it);
    //  - all 8 results are identical to the batch twin (parity).
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val batchRows = graft.streaming.StreamingOps
      .eventsAnalytics(spark, sfDir, "window", "batch")
      .collect().map(_.toString).sorted.toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val flips = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val watcher = Future {
      while (!done.get()) {
        if (spark.conf.get(ndKey, "true") != "true") flips.incrementAndGet()
        Thread.sleep(5)
      }
    }(ExecutionContext.global)
    try {
      val runs = Future.sequence((1 to 8).map(_ => Future {
        graft.streaming.StreamingOps
          .eventsAnalytics(spark, sfDir, "window", "stream")
          .collect().map(_.toString).sorted.toSeq
      }))
      val results = Await.result(runs, 300.seconds)
      done.set(true)
      Await.result(watcher, 10.seconds)
      results.foreach(r => assert(r == batchRows,
        s"stream rows diverge from batch twin (${r.size} vs ${batchRows.size})"))
      assert(flips.get() == 0,
        s"shared session conf observed flipped ${flips.get()} times — " +
          "stream requests are mutating shared state again")
    } finally {
      done.set(true)
      pool.shutdown()
    }
  }
}
