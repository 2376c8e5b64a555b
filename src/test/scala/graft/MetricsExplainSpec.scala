package graft

import graft.operators.Metrics
import graft.velesql.{Explain, Guardrails, Parser}

/** Eval metrics vs hand-computed values; EXPLAIN rendering; guardrails. */
class MetricsExplainSpec extends SparkSpecBase {

  import spark.implicits._

  // two queries; truth: q0 → {1,2,3}, q1 → {10}
  private lazy val truth = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 10L))
    .toDF("query_id", "doc_id")
  // preds: q0 ranks [1(hit),4,2(hit)], q1 ranks [11,12,10(hit)]
  private lazy val preds = Seq(
    (0L, 1L, 1), (0L, 4L, 2), (0L, 2L, 3),
    (1L, 11L, 1), (1L, 12L, 2), (1L, 10L, 3))
    .toDF("query_id", "doc_id", "rank")

  test("recall@k / precision@k match hand computation") {
    // recall@3: q0 = 2/3, q1 = 1/1 → 5/6
    assert(math.abs(Metrics.recallAtK(preds, truth, 3) - 5.0 / 6) < 1e-12)
    // precision@3: q0 = 2/3, q1 = 1/3 → 1/2
    assert(math.abs(Metrics.precisionAtK(preds, truth, 3) - 0.5) < 1e-12)
    // recall@1: q0 = 1/3, q1 = 0 → 1/6
    assert(math.abs(Metrics.recallAtK(preds, truth, 1) - 1.0 / 6) < 1e-12)
  }

  test("MRR matches hand computation") {
    // q0 first hit rank 1 → 1.0; q1 first hit rank 3 → 1/3; mean = 2/3
    assert(math.abs(Metrics.mrr(preds, truth) - 2.0 / 3) < 1e-12)
  }

  test("NDCG@3 matches hand computation") {
    def l2(x: Double) = math.log(x) / math.log(2.0)
    // q0: DCG = 1/log2(2) + 1/log2(4) = 1.5; IDCG(3 rel) = 1 + 1/log2(3) + 0.5
    val q0 = 1.5 / (1.0 + 1.0 / l2(3.0) + 0.5)
    // q1: DCG = 1/log2(4) = 0.5; IDCG(1 rel) = 1
    val expect = (q0 + 0.5) / 2
    assert(math.abs(Metrics.ndcgAtK(preds, truth, 3) - expect) < 1e-12)
  }

  test("MAP@3 matches hand computation") {
    // q0: hits at rank1 (prec 1/1) and rank3 (prec 2/3); AP = (1 + 2/3)/3
    // q1: hit at rank3 (prec 1/3); AP = (1/3)/1
    val expect = ((1.0 + 2.0 / 3) / 3 + 1.0 / 3) / 2
    assert(math.abs(Metrics.mapAtK(preds, truth, 3) - expect) < 1e-12)
  }

  test("retrievalReport: one-plan report equals the five individual metric frames") {
    val r = Metrics.retrievalReport(preds, truth, 3).first()
    assert(r.schema.fieldNames.toSeq ==
      Seq("recall_3", "precision_3", "mrr", "ndcg_3", "map_3"))
    assert(math.abs(r.getDouble(0) - Metrics.recallAtK(preds, truth, 3)) < 1e-12)
    assert(math.abs(r.getDouble(1) - Metrics.precisionAtK(preds, truth, 3)) < 1e-12)
    assert(math.abs(r.getDouble(2) - Metrics.mrr(preds, truth)) < 1e-12)
    assert(math.abs(r.getDouble(3) - Metrics.ndcgAtK(preds, truth, 3)) < 1e-12)
    assert(math.abs(r.getDouble(4) - Metrics.mapAtK(preds, truth, 3)) < 1e-12)
  }

  test("EXPLAIN renders the plan-intent tree (explain.rs node names)") {
    val out = Explain.explain(
      "SELECT id FROM docs WHERE similarity(vector, $v) > 0.8 AND category = 'tech' ORDER BY id LIMIT 10")
      .fold(e => fail(e), identity)
    assert(out.contains("TableScan(docs)"))
    assert(out.contains("SimilarityFilter(vector > 0.8)"))
    assert(out.contains("Limit(10)"))
    val g = Explain.explain("MATCH (a:P)-[:KNOWS*1..3]->(b) RETURN a.id LIMIT 5")
      .fold(e => fail(e), identity)
    assert(g.contains("MatchTraversal"))
    assert(g.contains("*1..3"))
    // r2 surfaces: WITH options, rel properties, named paths render
    val w = Explain.explain(
      "SELECT id FROM docs WHERE vector NEAR $v LIMIT 5 WITH (mode = 'fast', timeout_ms = 100)")
      .fold(e => fail(e), identity)
    assert(w.contains("With(") && w.contains("mode=fast") && w.contains("timeout_ms=100"))
    val rp = Explain.explain(
      "MATCH p = (a)-[r:KNOWS {since: 2020}]->(b) RETURN p")
      .fold(e => fail(e), identity)
    assert(rp.contains("since=2020") && rp.contains("path=p"))
  }

  test("guardrails reject above max_cost, admit below") {
    val q = Parser.parse("SELECT * FROM lineitem JOIN orders ON lineitem.l_orderkey = orders.o_orderkey")
      .toOption.get
    val counts = Map("lineitem" -> 6000000L, "orders" -> 1500000L)
    val strict = new Guardrails(counts, maxCost = 1000L)
    intercept[IllegalStateException](strict.admit(q))
    new Guardrails(counts, maxCost = Long.MaxValue).admit(q) // no throw
    val est = strict.estimate(q)
    assert(est.cost > 0 && !est.admitted)
  }
}
