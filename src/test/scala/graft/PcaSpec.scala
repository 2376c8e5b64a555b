package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** [[graft.operators.Pca]] — fit recovers a planted dominant direction,
  * components are orthonormal and variance-ordered, the sign fix makes
  * fits deterministic, and transform is the exact affine projection. */
class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  // points spread along (1,1,0)/√2 (variance ~8) with small z noise
  private lazy val planted = (0 until 64).map { i =>
    val t = (i % 9) - 4.0
    (i.toLong, Seq((t + 3.0).toFloat, (t + 5.0).toFloat,
      ((i % 3) * 0.1f - 0.1f)))
  }.toDF("id", "v")

  test("fit recovers the planted direction, orthonormal and ordered") {
    val m = Pca.fit(planted, "v", k = 3)
    // the z noise has period 3 vs the main pattern's 9, so it is not
    // perfectly uncorrelated — the top component tilts by ~0.0075
    val top = m.components(0)
    assert(math.abs(top(0) - math.sqrt(0.5)) < 1e-2 &&
      math.abs(top(1) - math.sqrt(0.5)) < 1e-2 &&
      math.abs(top(2)) < 5e-2, top)
    // orthonormal rows
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until 3).map(i => m.components(a)(i) * m.components(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
    // eigen-descending, non-negative
    assert(m.explainedVariance == m.explainedVariance.sortBy(-_))
    assert(m.explainedVariance.forall(_ >= -1e-12))
    // deterministic (sign fix): an identical refit yields the same model
    assert(Pca.fit(planted, "v", k = 3) == m)
  }

  test("transform projects (x − μ)·Wᵀ exactly; mean row maps to ~0") {
    val m = Pca.fit(planted, "v", k = 2)
    val out = Pca.transform(planted, "v", m)
      .select("id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rows = planted.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { case (id, v) =>
      val expect = m.components.map(w =>
        v.indices.map(i => (v(i) - m.mean(i)) * w(i)).sum)
      out(id).zip(expect).foreach { case (a, e) => assert(math.abs(a - e) < 1e-9) }
    }
    // distributed variance along pc1 ≈ its eigenvalue
    val v1 = Pca.transform(planted, "v", m)
      .agg(var_samp(element_at(col("pca"), 1))).head.getDouble(0)
    assert(math.abs(v1 - m.explainedVariance(0)) < 1e-6 * (1 + v1))
  }

  test("fit rejects bad k") {
    intercept[IllegalArgumentException] { Pca.fit(planted, "v", 0) }
    intercept[IllegalArgumentException] { Pca.fit(planted, "v", 4) }
  }
}
