package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Export-stage pins — the steps between a cleaned corpus and the
  * artifacts a training run actually reads: the deterministic shard
  * layout ([[graft.operators.Export]]) and the embedding-column export
  * transforms ([[graft.operators.Embeddings]]).
  */
object ExportQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.table(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- Deterministic corpus shuffle + shard assignment (the export
    // layout step): shard = md5 bucket (map-only), in-shard order = an
    // independent salted md5 — reproducible across engines and runs,
    // no global sort, the only shuffle is the partition-by-shard
    // window. DuckDB replays both hashes directly.
    QueryDef(
      "q170_shuffle_shard",
      """SELECT doc_id, shard, pos FROM (
        |  SELECT doc_id, shard,
        |    CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
        |  FROM (SELECT doc_id,
        |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 8 AS shard,
        |          md5(concat('s', CAST(doc_id AS VARCHAR))) AS h FROM documents))
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.Export
        .shuffleShards(t(s, d, "documents").select("doc_id"), "doc_id", 8)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    },

    // ---- Embedding export transforms, value-level: matryoshka
    // truncation to 16 dims (retained-mass norm + first re-normalized
    // element) and corpus-range SQ8 codes for the first two dimensions.
    // All math promotes float32 → double once, then runs the IDENTICAL
    // expression in both engines; 6-dp floor-rounding guards the two
    // division results (ulp-sensitive), while the int8 codes are pinned
    // EXACT — the quantization grid must not wobble across engines.
    QueryDef(
      "q171_embedding_export",
      """WITH t AS (SELECT vec_id, list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS tv,
        |                  CAST(embedding[1] AS DOUBLE) AS e0, CAST(embedding[2] AS DOUBLE) AS e1
        |           FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_sum(list_transform(tv, x -> x*x))) AS tn, tv[1] AS t0, e0, e1 FROM t),
        |st AS (SELECT i, min(v) AS mn, max(v) AS mx FROM (
        |        SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
        |               generate_subscripts(embedding, 1) AS i FROM embeddings)
        |       WHERE i <= 2 GROUP BY i)
        |SELECT vec_id,
        |  floor(tn*1000000+0.5)/1000000.0 AS tnorm,
        |  floor((t0/tn)*1000000+0.5)/1000000.0 AS n0,
        |  CAST(floor((e0 - s1.mn)/(s1.mx - s1.mn)*255 + 0.5) - 128 AS BIGINT) AS c0,
        |  CAST(floor((e1 - s2.mn)/(s2.mx - s2.mn)*255 + 0.5) - 128 AS BIGINT) AS c1
        |FROM n, (SELECT mn, mx FROM st WHERE i=1) s1(mn,mx), (SELECT mn,mx FROM st WHERE i=2) s2(mn,mx)
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      import graft.operators.Embeddings
      val emb = t(s, d, "embeddings")
      val r6 = (c: org.apache.spark.sql.Column) =>
        floor(c * lit(1000000L) + lit(0.5)) / lit(1000000.0)
      Embeddings.sq8(Embeddings.matryoshka(emb, "embedding", 16), "embedding")
        .select(col("vec_id"),
          r6(col("embedding_tnorm")).as("tnorm"),
          r6(element_at(col("embedding_trunc"), 1)).as("n0"),
          element_at(col("embedding_sq8"), 1).cast(LongType).as("c0"),
          element_at(col("embedding_sq8"), 2).cast(LongType).as("c1"))
        .orderBy("vec_id")
    },

    // ---- PCA (lifecycle pin): the one-pass covariance fit + map-only
    // projection must satisfy PCA's own contracts, asserted DISTRIBUTED
    // on the real embeddings: orthonormal components, eigen-descending
    // variances, per-component projected variance ≡ its eigenvalue
    // (the fit's covariance and the projection agree end to end),
    // sign-fixed determinism, and PCA optimality — the top-8 components
    // capture at least as much variance as the first 8 raw dimensions
    // (the data-driven cut beats the positional matryoshka cut).
    QueryDef.lifecyclePin("q176_pca",
      "SELECT CAST(1 AS INT) AS pca_ok") { (s, d) =>
      import graft.operators.Pca
      val k = 8
      val emb = t(s, d, "embeddings")
      val m = Pca.fit(emb, "embedding", k)
      val orthoOk = (0 until k).forall { a =>
        (a until k).forall { b =>
          val dot = m.components(a).zip(m.components(b)).map(p => p._1 * p._2).sum
          math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9
        }
      }
      val orderOk = m.explainedVariance == m.explainedVariance.sortBy(-_) &&
        m.explainedVariance.forall(_ >= 0.0)
      val proj = Pca.transform(emb, "embedding", m)
      val vs = proj.agg(
        var_samp(element_at(col("pca"), 1)).as("v"),
        (2 to k).map(i => var_samp(element_at(col("pca"), i)).as(s"v$i")): _*)
        .head
      val varOk = (0 until k).forall { i =>
        math.abs(vs.getDouble(i) - m.explainedVariance(i)) <=
          1e-6 * (1.0 + m.explainedVariance(i))
      }
      val rawHead = emb.agg(
        var_samp(element_at(col("embedding"), 1).cast("double")).as("r"),
        (2 to k).map(i =>
          var_samp(element_at(col("embedding"), i).cast("double")).as(s"r$i")): _*)
        .head
      val optOk = m.explainedVariance.sum >=
        (0 until k).map(rawHead.getDouble).sum - 1e-9
      val detOk = Pca.fit(emb, "embedding", k) == m
      val ok = orthoOk && orderOk && varOk && optOk && detOk
      s.range(1).select(lit(if (ok) 1 else 0).cast("int").as("pca_ok"))
    }
  )
}
