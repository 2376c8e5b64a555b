package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions
import graft.operators.Knn
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector search + fusion operator surface (SURVEY.md §2.3, §2.8).
  *
  * All exact mode: score every row with a codegen'd distance expression,
  * then `orderBy(score).limit(k)` — Catalyst compiles that to
  * `TakeOrderedAndProject` (per-partition size-k heap + driver merge: no
  * global sort, no shuffle of the scored rows; scales linearly with
  * executors at 100 TB). The reference's over-fetch heuristics
  * (4×/10× — query/mod.rs:163-230) are unnecessary in exact mode.
  *
  * DuckDB oracles compute the same metric over `CAST(embedding AS
  * DOUBLE[])` — float→double widening is exact, and both engines
  * accumulate in f64, so values agree to the last bit (verified ≤1e-16).
  *
  * Reference semantics: `vector NEAR $v` (grammar.pest:169-171),
  * `similarity(field,$v) OP t` with metric-direction inversion
  * (query/mod.rs:396-417), fusion strategies (fusion/strategy.rs:155-300),
  * RRF rank is 1-based: score = Σ 1/(k + rank) (strategy.rs:230-250).
  */
object VectorQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.table(s, d, n)

  /** Exact double value of each float rendered for SQL (Float.toString
    * would round-trip as float but NOT as double — 0.1f ≠ 0.1d). */
  private def sqlVec(v: Seq[Float]): String =
    v.map(_.toDouble.toString).mkString("[", ",", "]::DOUBLE[]")

  private val q64: Seq[Float] = VectorFunctions.syntheticQuery(64)
  /** Second/third query vectors for batch + fused search. */
  private val q64b: Seq[Float] = (0 until 64).map(i => (math.cos(i * 0.31) * 0.4 - 0.05).toFloat)
  private val q64c: Seq[Float] = (0 until 64).map(i => (math.sin(i * 1.3 + 0.5) * 0.3).toFloat)

  private val E = "CAST(embedding AS DOUBLE[])"

  val defs: Seq[QueryDef] = Seq(

    // ---- V1: `vector NEAR $v LIMIT k` — exact top-k, cosine
    QueryDef(
      "q40_knn_cosine",
      s"""SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Knn.topK(t(s, d, "embeddings"), "embedding", q64, 10, "cosine", idCol = "vec_id")
        .select("vec_id", "score")
    },

    // ---- V1: euclidean — lower is better, ORDER BY ASC (distance.rs:95-103)
    QueryDef(
      "q41_knn_l2",
      s"""SELECT vec_id, list_distance($E, ${sqlVec(q64)}) AS score
         |FROM embeddings ORDER BY score ASC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Knn.topK(t(s, d, "embeddings"), "embedding", q64, 10, "euclidean", idCol = "vec_id")
        .select("vec_id", "score")
    },

    // ---- V1: dot product
    QueryDef(
      "q42_knn_dot",
      s"""SELECT vec_id, list_dot_product($E, ${sqlVec(q64)}) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Knn.topK(t(s, d, "embeddings"), "embedding", q64, 10, "dot", idCol = "vec_id")
        .select("vec_id", "score")
    },

    // ---- V7: filtered ANN (search_with_filter, vector.rs:164-239) — we
    // filter BEFORE top-k: exact, no 4× over-fetch
    QueryDef(
      "q43_knn_filtered",
      s"""SELECT vec_id, label, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |FROM embeddings WHERE label IN (1, 3, 5)
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Knn.topK(t(s, d, "embeddings"), "embedding", q64, 10, "cosine", idCol = "vec_id",
          filter = Some(col("label").isin(1, 3, 5)))
        .select("vec_id", "label", "score")
    },

    // ---- V2: similarity(field,$v) > t threshold filter
    QueryDef(
      "q44_sim_threshold",
      s"""SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |FROM embeddings
         |WHERE list_cosine_similarity($E, ${sqlVec(q64)}) > 0.25""".stripMargin) { (s, d) =>
      Knn.thresholdFilter(t(s, d, "embeddings"), "embedding", q64, 0.25, "cosine", ">")
        .select("vec_id", "score")
    },

    // ---- V2: metric-direction inversion — similarity > t under euclidean
    // becomes distance < t (query/mod.rs:396-417)
    QueryDef(
      "q45_sim_threshold_l2",
      s"""SELECT vec_id, list_distance($E, ${sqlVec(q64)}) AS score
         |FROM embeddings
         |WHERE list_distance($E, ${sqlVec(q64)}) < 2.4""".stripMargin) { (s, d) =>
      Knn.thresholdFilter(t(s, d, "embeddings"), "embedding", q64, 2.4, "euclidean", ">")
        .select("vec_id", "score")
    },

    // ---- V4: NOT similarity(...) — full scan, inverted threshold
    // (query/mod.rs:635-748)
    QueryDef(
      "q46_not_similarity",
      s"""SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |FROM embeddings
         |WHERE NOT (list_cosine_similarity($E, ${sqlVec(q64)}) > 0.25)""".stripMargin) { (s, d) =>
      val sc = Knn.scored(t(s, d, "embeddings"), "embedding", q64, "cosine")
      sc.where(!(col("score") > 0.25)).select("vec_id", "score")
    },

    // ---- V5: similarity() OR metadata union mode — score keeps the
    // similarity when the vector leg matched, else constant 1.0
    // (query/mod.rs:434-529: dedup by id keeping similarity score)
    QueryDef(
      "q47_union_mode",
      s"""SELECT vec_id,
         |  CASE WHEN list_cosine_similarity($E, ${sqlVec(q64)}) > 0.3
         |       THEN list_cosine_similarity($E, ${sqlVec(q64)}) ELSE 1.0 END AS score
         |FROM embeddings
         |WHERE list_cosine_similarity($E, ${sqlVec(q64)}) > 0.3 OR label = 7""".stripMargin) { (s, d) =>
      val sc = Knn.scored(t(s, d, "embeddings"), "embedding", q64, "cosine")
      sc.where(col("score") > 0.3 || col("label") === 7)
        .select(col("vec_id"),
          when(col("score") > 0.3, col("score")).otherwise(lit(1.0)).as("score"))
    },

    // ---- V12: hamming metric (count of differing positions)
    QueryDef(
      "q48_knn_hamming",
      s"""SELECT vec_id,
         |  CAST(len(list_filter(range(1, len(embedding) + 1),
         |       i -> $E[i] <> (${sqlVec(q64)})[i])) AS DOUBLE) AS score
         |FROM embeddings ORDER BY score ASC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Knn.topK(t(s, d, "embeddings"), "embedding", q64, 10, "hamming", idCol = "vec_id")
        .select("vec_id", "score")
    },

    // ---- V12: jaccard over non-zero support sets
    QueryDef(
      "q49_knn_jaccard",
      s"""SELECT vec_id,
         |  len(list_filter(range(1, len(embedding) + 1),
         |      i -> embedding[i] <> 0 AND (${sqlVec(q64)})[i] <> 0)) * 1.0
         |  / len(list_filter(range(1, len(embedding) + 1),
         |      i -> embedding[i] <> 0 OR (${sqlVec(q64)})[i] <> 0)) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Knn.topK(t(s, d, "embeddings"), "embedding", q64, 10, "jaccard", idCol = "vec_id")
        .select("vec_id", "score")
    },

    // ---- V10: batch search — one scored pass per query vector, per-query
    // top-5 via ranked window (the distributed batch-knn shape: partition
    // by query id, no driver loop)
    QueryDef(
      "q50_batch_search",
      s"""SELECT * FROM (
         |  SELECT 0 AS query_id, vec_id,
         |         list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 5)
         |UNION ALL
         |SELECT * FROM (
         |  SELECT 1 AS query_id, vec_id,
         |         list_cosine_similarity($E, ${sqlVec(q64b)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 5)
         |UNION ALL
         |SELECT * FROM (
         |  SELECT 2 AS query_id, vec_id,
         |         list_cosine_similarity($E, ${sqlVec(q64c)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 5)""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Knn.batch(emb, "embedding",
        Seq(q64, q64b, q64c).map(q => (q, None)), 5, idCol = "vec_id")
    },

    // ---- V10: batch search with PER-QUERY filters (batch.rs:26-128 —
    // each BatchQuery carries its own filter; r1 legs shared one frame)
    QueryDef(
      "q57_batch_filtered",
      s"""SELECT * FROM (
         |  SELECT 0 AS query_id, vec_id,
         |         list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |  FROM embeddings WHERE label IN (1, 2)
         |  ORDER BY score DESC, vec_id LIMIT 5)
         |UNION ALL
         |SELECT * FROM (
         |  SELECT 1 AS query_id, vec_id,
         |         list_cosine_similarity($E, ${sqlVec(q64b)}) AS score
         |  FROM embeddings WHERE label IN (3, 4)
         |  ORDER BY score DESC, vec_id LIMIT 5)
         |UNION ALL
         |SELECT * FROM (
         |  SELECT 2 AS query_id, vec_id,
         |         list_cosine_similarity($E, ${sqlVec(q64c)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 5)""".stripMargin) { (s, d) =>
      Knn.batch(t(s, d, "embeddings"), "embedding",
        Seq((q64, Some(col("label").isin(1, 2))),
          (q64b, Some(col("label").isin(3, 4))),
          (q64c, None)), 5, idCol = "vec_id")
    },

    // ---- V8: LSH ANN tier end-to-end at FULL probe radius — probing
    // every Hamming bucket recovers exact search, so the DuckDB oracle
    // is the plain exact top-k (partial-radius recall is spec-gated:
    // AnnSpec monotone-recall tests)
    QueryDef(
      "q58_lsh_fullprobe",
      s"""SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      // index built ONCE per dataset behind Materialize (bucket-clustered
      // — same insert-time-build contract as q59's IVF); the query is
      // probe + rerank only
      val idx = graft.operators.Ann.materializedIndex(s, d, "embeddings",
        "embedding", nPlanes = 6, dim = q64.length)
      graft.operators.Ann.search(idx, "embedding", q64, 10, nPlanes = 6,
          radius = 6, idCol = "vec_id")
        .select("vec_id", "score")
    },

    // ---- IVF ANN tier end-to-end at FULL nprobe — probing every cell
    // recovers exact search (k-means training is deterministic; partial
    // nprobe recall is spec-gated in AnnSpec)
    QueryDef(
      "q59_ivf_fullprobe",
      s"""SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      import graft.operators.Ivf
      // train ONCE per dataset behind Materialize; the query is probe +
      // rerank only (insert-time index build, index/hnsw/native_index.rs:317)
      val (cents, cells) = Ivf.materializedIndex(s, d, "embeddings", "embedding", k = 8)
      Ivf.search(cells, "embedding", q64, 10, cents, nprobe = 8, idCol = "vec_id")
        .select("vec_id", "score")
    },

    // ---- F1: RRF fusion of two legs (cosine top-20, dot top-20);
    // rank is 1-based, score = Σ 1/(60 + rank) — strategy.rs:230-250
    QueryDef(
      "q51_fusion_rrf",
      s"""WITH la AS (
         |  SELECT vec_id, row_number() OVER (
         |    ORDER BY list_cosine_similarity($E, ${sqlVec(q64)}) DESC, vec_id) AS rnk
         |  FROM embeddings QUALIFY rnk <= 20),
         |lb AS (
         |  SELECT vec_id, row_number() OVER (
         |    ORDER BY list_dot_product($E, ${sqlVec(q64)}) DESC, vec_id) AS rnk
         |  FROM embeddings QUALIFY rnk <= 20)
         |SELECT vec_id, sum(1.0 / (60 + rnk)) AS score
         |FROM (SELECT * FROM la UNION ALL SELECT * FROM lb)
         |GROUP BY vec_id""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      // top-20 per leg via TakeOrderedAndProject FIRST, then rank the
      // 20-row result — the r1 global rank window over every row is gone
      def leg(metric: String): DataFrame = {
        val (_, hib) = VectorFunctions.metrics(metric)
        val ord = if (hib) col("score").desc else col("score").asc
        Knn.topK(emb, "embedding", q64, 20, metric, idCol = "vec_id")
          .select(col("vec_id"),
            row_number().over(
              Window.partitionBy(graft.operators.Ranks.one(col("vec_id")))
                .orderBy(ord, col("vec_id"))).as("rnk"))
      }
      leg("cosine").unionAll(leg("dot"))
        .groupBy("vec_id")
        .agg(sum(lit(1.0) / (lit(60) + col("rnk"))).as("score"))
    },

    // ---- F2: average fusion (mean of per-leg scores where doc appears —
    // strategy.rs:170-203)
    QueryDef(
      "q52_fusion_avg",
      s"""WITH la AS (
         |  SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 20),
         |lb AS (
         |  SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64b)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 20)
         |SELECT vec_id, avg(score) AS score
         |FROM (SELECT * FROM la UNION ALL SELECT * FROM lb)
         |GROUP BY vec_id""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val la = Knn.topK(emb, "embedding", q64, 20, "cosine", idCol = "vec_id")
        .select("vec_id", "score")
      val lb = Knn.topK(emb, "embedding", q64b, 20, "cosine", idCol = "vec_id")
        .select("vec_id", "score")
      la.unionAll(lb).groupBy("vec_id").agg(avg(col("score")).as("score"))
    },

    // ---- F2: maximum fusion (strategy.rs:205-221)
    QueryDef(
      "q53_fusion_max",
      s"""WITH la AS (
         |  SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 20),
         |lb AS (
         |  SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64b)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 20)
         |SELECT vec_id, max(score) AS score
         |FROM (SELECT * FROM la UNION ALL SELECT * FROM lb)
         |GROUP BY vec_id""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val la = Knn.topK(emb, "embedding", q64, 20, "cosine", idCol = "vec_id")
        .select("vec_id", "score")
      val lb = Knn.topK(emb, "embedding", q64b, 20, "cosine", idCol = "vec_id")
        .select("vec_id", "score")
      la.unionAll(lb).groupBy("vec_id").agg(max(col("score")).as("score"))
    },

    // ---- F3: weighted fusion — avg_w·avg + max_w·max + hit_w·(hits/legs),
    // weights sum to 1 (strategy.rs:252-300; ast/fusion.rs:80-106)
    QueryDef(
      "q54_fusion_weighted",
      s"""WITH la AS (
         |  SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 20),
         |lb AS (
         |  SELECT vec_id, list_cosine_similarity($E, ${sqlVec(q64b)}) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id LIMIT 20)
         |SELECT vec_id,
         |  0.5 * avg(score) + 0.3 * max(score) + 0.2 * (count(*) / 2.0) AS score
         |FROM (SELECT * FROM la UNION ALL SELECT * FROM lb)
         |GROUP BY vec_id""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val la = Knn.topK(emb, "embedding", q64, 20, "cosine", idCol = "vec_id")
        .select("vec_id", "score")
      val lb = Knn.topK(emb, "embedding", q64b, 20, "cosine", idCol = "vec_id")
        .select("vec_id", "score")
      la.unionAll(lb).groupBy("vec_id")
        .agg((lit(0.5) * avg(col("score")) + lit(0.3) * max(col("score"))
          + lit(0.2) * (count(lit(1)) / lit(2.0))).as("score"))
    },

    // ---- V6: NEAR_FUSED multi-vector — exact mode scores EVERY row per
    // query vector then fuses (average), so no tiered over-fetch
    // (batch.rs:231-352) is needed; top-10 of the fused score
    QueryDef(
      "q55_near_fused_avg",
      s"""SELECT vec_id,
         |  (list_cosine_similarity($E, ${sqlVec(q64)})
         |   + list_cosine_similarity($E, ${sqlVec(q64b)})
         |   + list_cosine_similarity($E, ${sqlVec(q64c)})) / 3.0 AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      def sim(q: Seq[Float]): Column =
        VectorFunctions.cosine_sim(col("embedding"), VectorFunctions.vecLit(q))
      emb.select(col("vec_id"),
          ((sim(q64) + sim(q64b) + sim(q64c)) / lit(3.0)).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },

    // ---- §2.13 retrieval metrics as a CORRECTNESS row (metrics.rs via
    // lib.rs:223-227): preds = cosine top-10 per query (2 queries),
    // truth = cosine top-15 restricted to labels 0-4 (binary relevance;
    // a top-10 pred is relevant iff its label qualifies, so hits land
    // strictly between 0 and 10 and every metric is non-degenerate —
    // dot/euclidean truth sets collapsed to 1.0 because the synthetic
    // vectors share norms and all three orderings agree). The oracle
    // replays recall@10 / precision@10 / MRR / NDCG@10 / MAP@10 in SQL —
    // one row, five doubles, 6dp-rounded hash compare.
    QueryDef(
      "q124_retrieval_metrics", {
      val (q0, q1) = (sqlVec(q64), sqlVec(q64b))
      s"""WITH pr AS (
         |  SELECT * FROM (
         |    SELECT 0 AS query_id, vec_id AS doc_id, row_number() OVER (
         |      ORDER BY list_cosine_similarity($E, $q0) DESC, vec_id) AS rnk
         |    FROM embeddings QUALIFY rnk <= 10)
         |  UNION ALL
         |  SELECT * FROM (
         |    SELECT 1, vec_id, row_number() OVER (
         |      ORDER BY list_cosine_similarity($E, $q1) DESC, vec_id) AS rnk
         |    FROM embeddings QUALIFY rnk <= 10)),
         |tr AS (
         |  SELECT * FROM (
         |    SELECT 0 AS query_id, vec_id AS doc_id FROM embeddings WHERE label <= 4
         |    ORDER BY list_cosine_similarity($E, $q0) DESC, vec_id LIMIT 15)
         |  UNION ALL
         |  SELECT * FROM (
         |    SELECT 1, vec_id FROM embeddings WHERE label <= 4
         |    ORDER BY list_cosine_similarity($E, $q1) DESC, vec_id LIMIT 15)),
         |marked AS (
         |  SELECT pr.query_id, pr.rnk,
         |    CASE WHEN tr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
         |  FROM pr LEFT JOIN tr
         |    ON tr.query_id = pr.query_id AND tr.doc_id = pr.doc_id),
         |perq AS (
         |  SELECT query_id, sum(rel) AS n_hit,
         |    min(CASE WHEN rel = 1 THEN rnk END) AS first_rank,
         |    sum(CASE WHEN rel = 1 THEN 1.0 / log2(rnk + 1) ELSE 0 END) AS dcg
         |  FROM marked GROUP BY query_id),
         |mapq AS (
         |  SELECT query_id, sum(prec) / 10.0 AS ap FROM (
         |    SELECT query_id, rel,
         |      CAST(sum(rel) OVER (PARTITION BY query_id ORDER BY rnk) AS DOUBLE) / rnk AS prec
         |    FROM marked) WHERE rel = 1 GROUP BY query_id),
         |idcgv AS (SELECT sum(1.0 / log2(i + 1)) AS idcg FROM range(1, 11) t(i))
         |SELECT avg(n_hit / 15.0) AS recall_10, avg(n_hit / 10.0) AS precision_10,
         |  avg(coalesce(1.0 / first_rank, 0)) AS mrr, avg(dcg / idcg) AS ndcg_10,
         |  avg(coalesce(ap, 0.0)) AS map_10
         |FROM perq LEFT JOIN mapq USING (query_id) CROSS JOIN idcgv""".stripMargin
    }) { (s, d) =>
      import graft.operators.{Metrics, Ranks}
      val emb = t(s, d, "embeddings")
      def pred(q: Seq[Float], qid: Int): DataFrame =
        Knn.topK(emb, "embedding", q, 10, "cosine", idCol = "vec_id")
          .select(lit(qid).as("query_id"), col("vec_id").as("doc_id"),
            row_number().over(Window.partitionBy(Ranks.one(col("vec_id")))
              .orderBy(col("score").desc, col("vec_id"))).as("rank"))
      def rel(q: Seq[Float], qid: Int): DataFrame =
        Knn.topK(emb, "embedding", q, 15, "cosine", idCol = "vec_id",
            filter = Some(col("label") <= 4))
          .select(lit(qid).as("query_id"), col("vec_id").as("doc_id"))
      // Eager localCheckpoint on TRUTH only: it is read twice inside
      // the report plan (the marked join + the n_rel agg). preds is
      // consumed once, so its two top-k scans stay in-plan. cache()
      // would leak entries into the shared session's cache registry for
      // the rest of a CORRECTNESS run; checkpoint blocks (20 rows) are
      // freed by the ContextCleaner once the returned frame is
      // unreferenced. All five metrics then come from ONE plan
      // (retrievalReport) instead of five cross-joined agg subtrees.
      val preds = pred(q64, 0).unionAll(pred(q64b, 1))
      val truth = rel(q64, 0).unionAll(rel(q64b, 1)).localCheckpoint(true)
      Metrics.retrievalReport(preds, truth, 10)
    },

    // ---- F5: multi-score breakdown fusion — weighted strategy with a
    // multiplicative metadata boost (score_fusion.rs:14-41,144-227)
    QueryDef(
      "q56_score_breakdown",
      s"""SELECT vec_id,
         |  (list_cosine_similarity($E, ${sqlVec(q64)}) * 0.6
         |   + list_cosine_similarity($E, ${sqlVec(q64b)}) * 0.3
         |   + 0.5 * 0.1)
         |  * (CASE WHEN label IN (1, 2) THEN 1.2 ELSE 1.0 END) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      import graft.operators.ScoreFusion
      def sim(q: Seq[Float]): Column =
        VectorFunctions.cosine_sim(col("embedding"), VectorFunctions.vecLit(q))
      val b = ScoreFusion.breakdown(
        vectorSim = sim(q64), graphDist = sim(q64b), pathScore = lit(0.5),
        metadataBoost = when(col("label").isin(1, 2), lit(1.2)).otherwise(lit(1.0)))
      t(s, d, "embeddings")
        .select(col("vec_id"), ScoreFusion.fuse(b, "weighted",
          Map("vector" -> 0.6, "graph" -> 0.3, "path" -> 0.1)).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(10)
    },

    // ---- MMR diversified top-k (Knn.mmr): 5 greedy picks from the 30
    // nearest candidates at λ = 0.7. The oracle unrolls the greedy loop
    // as one CTE per step (the q149/q161 fixed-iteration shape); every
    // similarity is 6-dp-rounded before use and λ enters as
    // CAST(0.7 AS DOUBLE) so (1 − λ) is the same IEEE double both
    // sides (the q149 damping-constant lesson).
    QueryDef("q167_mmr_diversify", mmrChainSql(k = 5, candN = 30)) { (s, d) =>
      Knn.mmr(t(s, d, "embeddings"), "embedding", q64, k = 5,
          lambda = 0.7, candN = 30, idCol = "vec_id")
        .orderBy("rank")
    }
  )

  /** Unrolled MMR greedy chain in DuckDB SQL — mirrors [[Knn.mmr]]'s
    * driver loop step for step. */
  private def mmrChainSql(k: Int, candN: Int): String = {
    val L = "CAST(0.7 AS DOUBLE)"
    val sb = new StringBuilder(
      s"""WITH c0 AS (
         |  SELECT vec_id, $E AS v,
         |    CAST(floor(list_cosine_similarity($E, ${sqlVec(q64)})
         |      * 1000000.0 + 0.5) AS BIGINT) AS rel6
         |  FROM embeddings ORDER BY rel6 DESC, vec_id LIMIT $candN),
         |c AS (SELECT vec_id, v, rel6 / 1000000.0 AS rel FROM c0),
         |p1 AS (SELECT vec_id, v, CAST(1 AS BIGINT) AS rank,
         |    CAST(floor(($L * rel) * 1000000.0 + 0.5) AS BIGINT) AS key
         |  FROM c ORDER BY key DESC, vec_id LIMIT 1),
         |s1 AS (SELECT vec_id, v FROM p1)""".stripMargin)
    for (i <- 2 to k) {
      sb ++= s""",
                |p$i AS (SELECT vec_id, v, CAST($i AS BIGINT) AS rank,
                |    CAST(floor(($L * c.rel - (1 - $L) *
                |      (SELECT max(floor(list_cosine_similarity(c.v, s.v)
                |         * 1000000.0 + 0.5) / 1000000.0) FROM s${i - 1} s))
                |      * 1000000.0 + 0.5) AS BIGINT) AS key
                |  FROM c WHERE c.vec_id NOT IN (SELECT vec_id FROM s${i - 1})
                |  ORDER BY key DESC, vec_id LIMIT 1),
                |s$i AS (SELECT vec_id, v FROM s${i - 1}
                |  UNION ALL SELECT vec_id, v FROM p$i)""".stripMargin
    }
    sb ++= "\n" + (1 to k).map(i =>
      s"SELECT vec_id, rank, key / 1000000.0 AS mmr_score FROM p$i")
      .mkString("", "\nUNION ALL\n", "\nORDER BY rank")
    sb.toString
  }
}
