package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.{Bridge, CosineSimilarity, DotProduct, EuclideanDistance, EuclideanDistanceDouble, HammingDistance, JaccardSimilarity}

/** Column-API + SQL-registration facade over the codegen'd distance
  * expressions, mirroring the reference's metric dispatch
  * (distance.rs:64-72) and its `higher_is_better` direction flag
  * (distance.rs:76-81) used for ORDER BY direction and threshold
  * comparison inversion (query/mod.rs:396-417).
  */
object VectorFunctions {
  import org.apache.spark.sql.functions.typedlit

  private def wrap(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    Bridge.column(f(Bridge.expression(a), Bridge.expression(b)))

  def cosine_sim(a: Column, b: Column): Column = wrap(CosineSimilarity.apply)(a, b)
  def dot_product(a: Column, b: Column): Column = wrap(DotProduct.apply)(a, b)
  def l2_dist(a: Column, b: Column): Column = wrap(EuclideanDistance.apply)(a, b)
  def hamming_dist(a: Column, b: Column): Column = wrap(HammingDistance.apply)(a, b)
  def jaccard_sim(a: Column, b: Column): Column = wrap(JaccardSimilarity.apply)(a, b)

  /** Elementwise half-precision round-trip (`fmt` = "f16"/"bf16") over
    * an `array<float>` column — the write-path kernel for the f16/bf16
    * collection storage modes (half_precision.rs). */
  def half_round(v: Column, fmt: String): Column =
    Bridge.column(org.apache.spark.sql.graft.HalfRound(Bridge.expression(v), fmt))

  /** Double-typed L2 — the k-means/silhouette kernel (same IEEE fold as
    * the HOF chain it replaces; see EuclideanDistanceDouble). */
  def l2_dist_d(a: Column, b: Column): Column =
    wrap(EuclideanDistanceDouble.apply)(a, b)

  /** Literal query vector as ArrayType(FloatType) column. */
  def vecLit(v: Seq[Float]): Column = typedlit(v)

  /** Literal centroid as ArrayType(DoubleType) column. */
  def vecLitD(v: Seq[Double]): Column = typedlit(v)

  /** Deterministic synthetic query vector (for tests/benches/oracles). */
  def syntheticQuery(dim: Int): Seq[Float] =
    (0 until dim).map(i => (math.sin(i * 0.7) * 0.5 + 0.1).toFloat)

  /** Metric → (scoreFn, higherIsBetter). Encodes distance.rs:76-81 once. */
  val metrics: Map[String, ((Column, Column) => Column, Boolean)] = Map(
    "cosine" -> ((cosine_sim _, true)),
    "dot" -> ((dot_product _, true)),
    "euclidean" -> ((l2_dist _, false)),
    "hamming" -> ((hamming_dist _, false)),
    "jaccard" -> ((jaccard_sim _, true)))

  /** Register the metric expressions for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def create(name: String, b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")
    create("cosine_sim", es => CosineSimilarity(es(0), es(1)))
    create("dot_product", es => DotProduct(es(0), es(1)))
    create("l2_dist", es => EuclideanDistance(es(0), es(1)))
    create("hamming_dist", es => HammingDistance(es(0), es(1)))
    create("jaccard_sim", es => JaccardSimilarity(es(0), es(1)))
    // exact money/quantity sum as SQL: dsum(x, scale) — the int128
    // fixed-point aggregate behind the relational defs. Input is taken
    // as DOUBLE and scaled by the oracle-exact rint cast
    // (DoubleToScaledLong), the same semantics as the DataFrame-side
    // FixedPointSum.dsumD — one function, one rounding contract.
    create("dsum", es => {
      if (es.length != 2)
        throw new IllegalArgumentException(
          s"dsum expects exactly (value, scale), got ${es.length} argument(s)")
      val scale = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"dsum scale must be an integer literal, got $other")
      }
      org.apache.spark.sql.graft.FixedPointSum(
        org.apache.spark.sql.graft.DoubleToScaledLong(
          org.apache.spark.sql.catalyst.expressions.Cast(es(0),
            org.apache.spark.sql.types.DoubleType),
        scale), scale).toAggregateExpression()
    })
    // the imperative twin of GraftExtensions' optimizer injection: an
    // ALREADY-BUILT session (REST Serve, REPL, notebook) gets the exact
    // decimal-sum rewrite too — extraOptimizations appends to the
    // optimizer's user-rule batch; idempotent across repeat calls
    // skip when the session was built WITH GraftExtensions (which
    // injects the rule pre-CBO): a second copy in extraOptimizations is
    // output-identical but pattern-matches every plan twice (r15
    // review). The extensions marker is the conf the injector sets.
    val exp = spark.experimental
    val viaExtensions =
      spark.conf.getOption("graft.extensions.installed").contains("true")
    if (!viaExtensions && !exp.extraOptimizations.exists(
        _.isInstanceOf[org.apache.spark.sql.graft.FixedPointSumRule]))
      exp.extraOptimizations = exp.extraOptimizations :+
        org.apache.spark.sql.graft.FixedPointSumRule(() =>
          spark.conf.get("graft.dsum.rewrite", "true").toBoolean)
  }
}
