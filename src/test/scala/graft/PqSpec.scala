package graft

import graft.operators.{Knn, Pq}
import graft.velesql.{Catalog, Compiler, SemanticError}
import org.apache.spark.sql.functions._

/** Product quantization (beyond-reference V11+): per-subspace codebooks,
  * narrow codes index, ADC ordering, two-phase exact rerank — the
  * `WITH (quantization = 'pq')` path. Recall itself is oracle-pinned by
  * q133_pq_recall; these specs pin structure and semantics. */
class PqSpec extends SparkSpecBase {

  private val dim = 64
  private lazy val emb = Tables.table(spark, sfDir, "embeddings")

  test("training is deterministic and shapes are m × k × dim/m") {
    val a = Pq.train(emb, "embedding", dim, m = 4, k = 8)
    val b = Pq.train(emb, "embedding", dim, m = 4, k = 8)
    assert(a.length == 4 && a.forall(_.length == 8) &&
      a.forall(_.forall(_.length == dim / 4)))
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq,
      "same data must train identical codebooks")
    intercept[IllegalArgumentException] {
      Pq.train(emb, "embedding", dim, m = 7, k = 8) // 64 % 7 != 0
    }
  }

  test("materialized codes index is narrow (id + codes only)") {
    val (cb, codes) = Pq.materializedIndex(spark, sfDir, "embeddings",
      "embedding", "vec_id", dim, m = 8, k = 32)
    assert(codes.columns.toSeq == Seq("vec_id", "codes"),
      "phase-1 must scan a narrow table, not the base columns")
    assert(cb.length == 8 && cb.forall(_.length == 32))
    val c = codes.select("codes").first().getSeq[Int](0)
    assert(c.length == 8 && c.forall(code => code >= 0 && code < 32))
  }

  test("pq via the language: exact reranked scores, filter-then-search") {
    val q = functions.VectorFunctions.syntheticQuery(dim)
    val c = new Compiler(spark, new Catalog(spark, sfDir), Map("q" -> q))
    val rows = c.run(
      "SELECT vec_id, score FROM embeddings WHERE vector NEAR $q LIMIT 5 " +
        "WITH (quantization = 'pq', oversampling = 16)").collect()
    assert(rows.length == 5)
    // scores are EXACT cosines (rerank phase), not ADC approximations
    val byId = Knn.topK(emb, "embedding", q, emb.count().toInt, "cosine",
      idCol = "vec_id").select("vec_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - byId(r.getLong(0))) < 1e-9)
    }
    // filter-then-search: a residual WHERE bounds the candidate pool
    val filtered = c.run(
      "SELECT vec_id, score FROM embeddings WHERE label = 3 AND vector NEAR $q " +
        "LIMIT 5 WITH (quantization = 'pq', oversampling = 16)").collect()
    val label3 = emb.where(col("label") === 3).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(filtered.nonEmpty && filtered.forall(r => label3(r.getLong(0))))
  }

  test("pq validation: probing-mode conflict and unsupported metric fail loudly") {
    val q = functions.VectorFunctions.syntheticQuery(dim)
    val c = new Compiler(spark, new Catalog(spark, sfDir), Map("q" -> q))
    intercept[Exception] { // SemanticError via Graft.sql; raw IAE here
      c.run("SELECT vec_id FROM embeddings WHERE vector NEAR $q LIMIT 5 " +
        "WITH (quantization = 'pq', mode = 'fast')")
    }
    val cb = Pq.train(emb, "embedding", dim, m = 4, k = 8)
    intercept[IllegalArgumentException] {
      Pq.adcOrdering(col("codes"), q.toArray, cb, "hamming")
    }
  }
}
