package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, DotProduct, EuclideanDistance, HammingDistance, JaccardSimilarity}

/** Session-extension entry point: injects the five distance metrics into
  * a session's function registry at build time, so `spark.sql("SELECT
  * cosine_sim(a, b) …")` works with no imperative registration call.
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("cosine_sim", es => CosineSimilarity(es(0), es(1))))
    e.injectFunction(fn("dot_product", es => DotProduct(es(0), es(1))))
    e.injectFunction(fn("l2_dist", es => EuclideanDistance(es(0), es(1))))
    e.injectFunction(fn("hamming_dist", es => HammingDistance(es(0), es(1))))
    e.injectFunction(fn("jaccard_sim", es => JaccardSimilarity(es(0), es(1))))
    // opt-in ANN top-k rewrite (SURVEY §4.3): bucket-prunes similarity
    // sorts over LSH-indexed frames when graft.ann.rewrite=true
    e.injectPreCBORule { session =>
      org.apache.spark.sql.graft.AnnTopKRule(() => (
        session.conf.get("graft.ann.rewrite", "false").toBoolean,
        session.conf.get("graft.ann.planes", "6").toInt,
        session.conf.get("graft.ann.radius", "2").toInt))
    }
    // exact rewrite, on by default: CAST(sum(CAST(x AS DECIMAL(≤18,s)))
    // AS DOUBLE) → the int128 FixedPointSum (bit-identical, ~2× at 18M
    // rows); graft.dsum.rewrite=false to escape
    e.injectPreCBORule { session =>
      // marker for VectorFunctions.register(): a session built with the
      // extensions already carries this rule, so the imperative path
      // must not add a second copy (r15 review finding)
      session.conf.set("graft.extensions.installed", "true")
      org.apache.spark.sql.graft.FixedPointSumRule(() =>
        session.conf.get("graft.dsum.rewrite", "true").toBoolean)
    }
  }
}
