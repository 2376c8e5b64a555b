package graft

import org.apache.spark.sql.functions._

/** Round-4 hardening: Materialize safety + empty-collection schema.
  * (WITH rerank plumbing and WITH-key validation landed in round 5 —
  * [[R5FeaturesSpec]].) */
class R4FeaturesSpec extends SparkSpecBase {

  test("Materialize fails fast on a missing source (no silent 0_0 stamp)") {
    val e = intercept[IllegalArgumentException] {
      Materialize(spark, "/nonexistent-dir", "bogus", Seq("documents"), None) {
        spark.range(1).toDF("id")
      }
    }
    assert(e.getMessage.contains("missing source"))
  }

  test("Materialize rebuilds when a source file changes (listing stamp)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mat").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/documents.parquet")
    val first = Materialize(spark, dir, "matspec", Seq("documents"), None) {
      spark.read.parquet(s"$dir/documents.parquet")
    }
    assert(first.count() == 1)
    // rewrite the source with different content → different listing hash
    // → the derived table must REBUILD, not serve the 1-row cache
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write
      .mode("overwrite").parquet(s"$dir/documents.parquet")
    val second = Materialize(spark, dir, "matspec", Seq("documents"), None) {
      spark.read.parquet(s"$dir/documents.parquet")
    }
    assert(second.count() == 2)
  }

  test("Materialize.memo runs once per content stamp and re-runs on change") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-memo").toString
    val src = java.nio.file.Paths.get(s"$dir/documents.parquet")
    Seq((1L, "a")).toDF("id", "v").write.parquet(src.toString)
    var runs = 0
    def fetch(): Int =
      Materialize.memo("memospec", dir, Seq(src)) { runs += 1; runs }
    assert(fetch() == 1 && fetch() == 1 && runs == 1,
      "same stamp must serve the memo without re-running")
    // source rewrite → new listing stamp → the memo must recompute
    // (a stale quantizer table silently served would be a wrong answer)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write
      .mode("overwrite").parquet(src.toString)
    assert(fetch() == 2 && runs == 2,
      "a changed source stamp must invalidate the memo")
  }

  test("never-written user collection queries as zero rows with declared schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-emptycol").toString
    val g = Graft(spark, tmp)
    g.collections.create("fresh", idCol = "id", vectorCol = Some("embedding"))
    // referencing declared columns must analyze and return zero rows —
    // not throw an unresolved-column error (reference: empty collection)
    assert(g.sql("SELECT id FROM fresh WHERE id > 0").count() == 0)
    assert(g.sql("SELECT id, score FROM fresh WHERE vector NEAR $q LIMIT 5",
      Map("q" -> Seq(1.0f, 0.0f))).count() == 0)
  }
}
