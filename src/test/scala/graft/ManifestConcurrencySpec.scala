package graft

import org.apache.spark.sql.functions._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrency contract of the manifest storage layer (the generation
  * guarantees [[Collections.publish]]'s scaladoc promises): readers that
  * resolved a manifest keep addressing immutable dirs across concurrent
  * publishes (retention keeps the superseded generation one cycle), the
  * manifest symlink swap is atomic (a reader never sees a torn or
  * half-written state), and serialized writers never lose an update. */
class ManifestConcurrencySpec extends SparkSpecBase {
  import spark.implicits._

  test("readers race writers across publishes without errors or torn states") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-conc").toString
    val cols = new Collections(spark, tmp)
    cols.create("c", buckets = 4)
    cols.upsert("c", (1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      @volatile var stop = false
      val readerErrors = new java.util.concurrent.atomic.AtomicInteger()
      val badCounts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val readers = (1 to 4).map(_ => Future {
        while (!stop) {
          try {
            // resolve + plan + execute while publishes happen underneath;
            // count() sees a CONSISTENT generation: 100 rows + however
            // many of the writer's fresh ids landed — never a partial
            // bucket set (which would undershoot 100)
            val n = cols.table("c").get.count()
            if (n < 100) badCounts.add(n)
          } catch { case _: Throwable => readerErrors.incrementAndGet() }
        }
      })
      val writer = Future {
        (101L to 130L).foreach { i =>
          cols.upsert("c", Seq((i, s"w$i")).toDF("id", "payload"))
        }
      }
      Await.result(writer, 120.seconds)
      stop = true
      Await.result(Future.sequence(readers), 60.seconds)
      assert(readerErrors.get() == 0, s"${readerErrors.get()} reader failures")
      assert(badCounts.isEmpty, s"torn reads (count < 100): $badCounts")
      assert(cols.count("c") == 130)
      (101L to 130L).foreach { i =>
        assert(cols.get("c", Seq(i)).count() == 1, s"lost update id=$i")
      }
    } finally { pool.shutdown(); Collections.deleteRec(java.nio.file.Paths.get(tmp)) }
  }

  test("grace window: a plan MANY publishes behind still reads; grace=0 reclaims") {
    // r16 StressSpec finding: the count-based retention window alone let
    // rapid successive publishes delete parquet under an in-flight plan
    // (FAILED_READ_FILE). Deletion now also requires age > grace.
    val tmp = java.nio.file.Files.createTempDirectory("graft-grace").toString
    val cols = new Collections(spark, tmp) // default grace: 10 min
    cols.create("c", buckets = 4)
    cols.upsert("c", (1L to 50L).map(i => (i, i * 2)).toDF("id", "score"))
    val before = cols.table("c").get
    before.count() // resolve + list files
    // push the resolved plan FOUR publishes behind (retention keeps 2)
    (1 to 4).foreach(i => cols.upsert("c", Seq((i.toLong, 9000L + i)).toDF("id", "score")))
    // the old plan still executes: its generation is unreferenced but
    // younger than the grace window
    assert(before.count() == 50)
    assert(before.where(col("id") === 1L).select("score").first().getLong(0) == 2L)
    Collections.deleteRec(java.nio.file.Paths.get(tmp))

    // grace = 0 restores immediate reclamation (bounded disk for churny
    // batch jobs that never hold stale plans): identical operations on a
    // zero-grace store leave strictly fewer generation dirs on disk
    def churn(grace: Long): Int = {
      val t = java.nio.file.Files.createTempDirectory(s"graft-grace$grace").toString
      val c = new Collections(spark, t, generationGraceMs = grace)
      c.create("c", buckets = 4)
      (1 to 5).foreach(i => c.upsert("c", Seq((i.toLong, s"v$i")).toDF("id", "v")))
      assert(c.count("c") == 5)
      val n = Collections.children(java.nio.file.Paths.get(t, "c"))
        .count(_.getFileName.toString.startsWith("points-g"))
      Collections.deleteRec(java.nio.file.Paths.get(t))
      n
    }
    assert(churn(0L) < churn(600000L),
      "zero grace must reclaim unreferenced dirs immediately")
  }

  test("grace retention is COUNT-capped: a publish storm cannot retain unbounded copies") {
    // r16 ADVICE: age-only grace made steady-state disk = publish-rate ×
    // grace × collection size (a streaming sink retained a full copy per
    // publish for 10 minutes). Beyond graceRetainMax the oldest
    // unreferenced generations delete regardless of age.
    def storm(cap: Int): Int = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-gracecap$cap").toString
      val cols = new Collections(spark, tmp,
        generationGraceMs = 600000L, graceRetainMax = cap)
      cols.create("c", buckets = 2)
      (1 to 12).foreach(i => cols.upsert("c", Seq((i.toLong, s"v$i")).toDF("id", "v")))
      assert(cols.count("c") == 12)
      // the current generation still reads fine after the capped GC
      assert(cols.table("c").get.count() == 12)
      val n = Collections.children(java.nio.file.Paths.get(tmp, "c"))
        .count(_.getFileName.toString.startsWith("points-g"))
      Collections.deleteRec(java.nio.file.Paths.get(tmp))
      n
    }
    // capped: ≤ cap grace-held + dirs the retained manifests reference
    // (2 manifests × up to 2 buckets); uncapped: one full copy per
    // publish survives the whole window
    val capped = storm(3)
    val uncapped = storm(1000)
    assert(capped <= 3 + 4, s"storm retained $capped generation dirs (cap 3 + ≤4 referenced)")
    assert(uncapped > capped,
      s"cap had no effect: capped=$capped uncapped=$uncapped")
  }

  test("a plan resolved before a publish still reads (retention window)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-conc2").toString
    val cols = new Collections(spark, tmp)
    cols.create("c", buckets = 4)
    cols.upsert("c", (1L to 50L).map(i => (i, i * 2)).toDF("id", "score"))
    // resolve a frame (manifest read + file listing happen at plan time)
    val before = cols.table("c").get
    before.count() // force file listing
    cols.upsert("c", Seq((1L, 999L)).toDF("id", "score"))
    // the superseded generation survives exactly one publish — the old
    // plan still executes and sees the OLD value
    val oldVal = before.where(col("id") === 1L).select("score").first().getLong(0)
    assert(oldVal == 2L, s"pre-publish plan must read its own generation, got $oldVal")
    // the new plan sees the new value
    assert(cols.get("c", Seq(1L)).select("score").first().getLong(0) == 999L)
    Collections.deleteRec(java.nio.file.Paths.get(tmp))
  }
}
