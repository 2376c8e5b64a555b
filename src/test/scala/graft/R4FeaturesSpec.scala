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
