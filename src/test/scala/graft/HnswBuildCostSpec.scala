package graft

import graft.operators.Hnsw
import org.apache.spark.sql.functions._

/** Build-cost contract of the r12 insertion build (r11 VERDICT ask #3):
  * kernel evaluations grow ~LINEARLY in cell size, not quadratically.
  * The r11 half-matrix build paid exactly n·(n−1)/2 evals per cell; the
  * search-then-link insertion pays O(n·ef·m). Pinned on the
  * [[Hnsw.buildKernelEvals]] counter (exact in local mode), not wall
  * time, so the assert is host-noise-immune.
  */
class HnswBuildCostSpec extends SparkSpecBase {
  import spark.implicits._

  /** Deterministic pseudo-random vectors in one cell (cell = 0) — a
    * hash spread, NOT a periodic function (sin(0.7·i) repeats every ~9
    * ids, collapsing the corpus to ~9 distinct points whose universal
    * score ties defeat any beam search). */
  private def cellFrame(n: Int) = {
    def h(i: Int, d: Int): Float = {
      var z = i.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5).toFloat
    }
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(16)(d => h(i, d)).toSeq)
    }.toDF("id", "vec").withColumn("cell", lit(0))
  }

  private def evalsFor(n: Int): Long = {
    val before = Hnsw.buildKernelEvals.sum()
    Hnsw.buildGraph(cellFrame(n), "vec", "id", "cosine", m = 4,
      efConstruction = 32).foreach(_ => ())
    Hnsw.buildKernelEvals.sum() - before
  }

  test("kernel evals scale ~linearly in |cell| (4x rows -> well under 16x evals)") {
    val small = evalsFor(500)
    val large = evalsFor(2000)
    assert(small > 0 && large > 0)
    // quadratic would give 16x; linear gives ~4x. Accept anything
    // strictly separated from quadratic (insertion search cost can
    // drift slightly super-linearly as the graph deepens).
    val ratio = large.toDouble / small
    assert(ratio < 8.0,
      f"4x rows cost ${ratio}%.1fx kernel evals - quadratic-like growth " +
        f"(half-matrix 2000 rows would be ${2000L * 1999 / 2}%d; measured $large%d)")
    // and the absolute count stays far under the half-matrix bound
    assert(large < 2000L * 1999 / 2,
      s"insertion build ($large evals) must undercut the O(n^2/2) half-matrix")
  }

  test("insertion graph keeps the walk contract (top-1 reachable)") {
    // sanity: the cheaper build still yields a navigable graph - the
    // exact nearest neighbor of a member vector is found by the walk
    val g = Hnsw.buildGraph(cellFrame(300), "vec", "id", "cosine", m = 8,
      efConstruction = 64).cache()
    try {
      // the production tier's parameters (m=8, ef up to 96): the exact
      // match (cosine 1.0) of a member vector must be reached — on
      // uniform random data that requires the m-dense graph, which is
      // exactly the navigability the contract promises
      val row42 = cellFrame(300).where(col("id") === 42)
        .select("vec").collect()(0).getSeq[Float](0)
      val got = Hnsw.walkCandidates(g, "vec", "id", "cosine", row42, ef = 96)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got.contains(42L), "walk must reach the query's exact match")
    } finally g.unpersist()
  }
}
