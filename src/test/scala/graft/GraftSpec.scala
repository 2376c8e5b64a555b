package graft

import graft.operators.Quantization
import org.apache.spark.sql.functions._

/** Engine facade: VelesQL in → DataFrame out, parse cache, explain,
  * guardrails wiring; SQ8 quantization round-trip. */
class GraftSpec extends SparkSpecBase {

  private lazy val g = Graft(spark, sfDir)

  test("facade runs VelesQL end-to-end with params") {
    val q = graft.functions.VectorFunctions.syntheticQuery(64)
    val rows = g.sql(
      "SELECT vec_id, score FROM embeddings WHERE vector NEAR $q LIMIT 5",
      Map("q" -> q)).collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("parse cache returns the identical AST instance on a hit") {
    val sql = "SELECT c_custkey FROM customer WHERE c_acctbal > 100"
    val a1 = g.parse(sql)
    val a2 = g.parse(sql)
    assert(a1 eq a2) // cache.rs:88-110 — hit avoids re-parsing
  }

  test("explain is available through the facade") {
    val out = g.explain("SELECT * FROM orders WHERE o_totalprice > 10 LIMIT 3")
    assert(out.contains("TableScan(orders)") && out.contains("Limit(3)"))
  }

  test("guardrails wired through the facade reject huge queries") {
    val strict = new Graft(spark, sfDir, maxCost = 1L)
    intercept[IllegalStateException] {
      strict.sql("SELECT * FROM lineitem")
    }
  }

  test("SQ8 quantization round-trips within one code step") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val dec = Quantization.sq8Decode(Quantization.withSq8(emb, "embedding"))
    val r = dec.select("embedding", "vec_approx", "sq8_scale").first()
    val orig = r.getSeq[Float](0)
    val approx = r.getSeq[Float](1)
    val step = r.getDouble(2)
    orig.zip(approx).foreach { case (o, a) =>
      assert(math.abs(o - a) <= step * 0.51 + 1e-6,
        s"dequantized $a too far from $o (step $step)")
    }
  }

  test("SQ8 codes stay within [0, 255]") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val sq = Quantization.withSq8(emb, "embedding")
    val bad = sq.select(explode(col("sq8_codes")).as("c"))
      .where(col("c") < 0 || col("c") > 255)
    assert(bad.count() == 0)
  }
}
