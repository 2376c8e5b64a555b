package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** [[Dsir.importanceWeights]] — hashed-n-gram importance weighting:
  * direction (target-like text outweighs raw-only text), exact-integer
  * weight arithmetic, empty-doc zeroing, and top-k selection. */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta alpha beta alpha beta", true), // target vocab
    (2L, "alpha beta gamma alpha beta gamma", true),
    (3L, "alpha beta alpha beta gamma gamma", false), // target-like raw doc
    (4L, "omega psi chi omega psi chi", false), // raw-only vocab
    (5L, "???", false)) // no tokens
    .toDF("doc_id", "text", "is_t")

  private lazy val w = Dsir
    .importanceWeights(docs, col("is_t"), dim = 1024)
    .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("target-vocab docs outweigh raw-only docs; empty doc weighs zero") {
    assert(w.size == 5)
    // what DSIR guarantees is the RANKING: the closer a doc's gram
    // distribution sits to the target, the higher its weight. (Absolute
    // signs are not meaningful at toy counts — the target is a subset
    // of raw, so shared buckets always have ct < cr.)
    assert(w(1L)._2 > w(3L)._2 && w(2L)._2 > w(3L)._2,
      s"pure target vocab must outrank the mixed doc: $w")
    assert(w(3L)._2 > w(4L)._2,
      s"target-like doc must outrank the raw-only doc: $w")
    // raw-only grams never occur in the target → strictly negative
    assert(w(4L)._2 < 0, s"raw-only doc should score < 0, got ${w(4L)}")
    assert(w(5L) == ((0L, 0L)))
  }

  test("weights are reproducible bit-for-bit (exact integer sums)") {
    val again = Dsir.importanceWeights(docs, col("is_t"), dim = 1024)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == w)
  }

  test("select keeps the top-k by weight with id tie-break") {
    val top = Dsir.select(
      Dsir.importanceWeights(docs, col("is_t"), dim = 1024), k = 3)
      .collect().map(_.getLong(0)).toSeq
    val expected = w.toSeq.sortBy { case (id, (_, wm)) => (-wm, id) }
      .take(3).map(_._1)
    assert(top == expected, s"got $top, expected $expected")
  }

  test("dim must be positive") {
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(docs, col("is_t"), dim = 0))
  }
}
