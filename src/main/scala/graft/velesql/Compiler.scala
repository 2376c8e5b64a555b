package graft.velesql

import graft.functions.VectorFunctions
import graft.operators.{Bm25, Graph, Knn}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Ast._

/** VelesQL → DataFrame compiler.
  *
  * This is the architectural inversion of the reference: where VelesDB
  * interprets the AST directly over in-memory structures (match-arm
  * dispatch at collection/search/query/mod.rs:163-336), we LOWER the AST
  * to declarative DataFrame transformations and let Catalyst pick the
  * physical plan — filters push into the parquet scan, top-k compiles to
  * TakeOrderedAndProject, joins broadcast/shuffle by size.
  *
  * Replicated reference semantics:
  *  - `Neq` is TRUE on a missing/NULL field (filter/matching.rs:9-43
  *    `is_none_or`) → compiled as `col.isNull || col =!= v`.
  *  - metric-direction inversion for similarity thresholds and ORDER BY
  *    (query/mod.rs:396-417, distance.rs:76-103).
  *  - LIMIT defaults to 10 when NEAR is present, capped at 100_000
  *    (query/mod.rs:61, 84-87).
  *  - HAVING chains fold strictly left-to-right with no AND/OR precedence
  *    (query/aggregation.rs:611-644).
  *  - aggregate result naming: `count` / `{fn}_{col}` / alias
  *    (query/aggregation.rs:273-289).
  *  - interval months = 30 days (ast/values.rs:136-163).
  *  - scan score = 1.0 (query/mod.rs:778-819); similarity score wins on
  *    the score column when a similarity condition is present.
  */
class Compiler(
    spark: SparkSession,
    catalog: Catalog,
    params: Map[String, Any] = Map.empty,
    /** NOW() folded once per query for determinism (reference folds at
      * eval time — ast/values.rs:102-122). Epoch seconds. */
    fixedNowEpoch: Option[Long] = None) {

  private val LimitCap = 100000
  private val NearDefaultLimit = 10
  /** Per-leg candidate pool for rank-based fusion (RRF/hybrid). The
    * reference fetches a bounded candidate set per leg (text.rs:133-134);
    * ranking only the top-K per leg keeps the rank window over K rows
    * instead of single-tasking the whole collection.
    * Join-back note (measured, r5): the fused/hybrid leg frames are
    * ≤2×CandidateK rows, but broadcast-hinting their join back to the
    * collection is consistently a bit SLOWER in local mode (driver
    * round-trip beats nothing when the "shuffle" is in-process, and the
    * hint overrides AQE). On a real cluster the broadcast shape wins —
    * one-line hint, revisit there. */
  private val CandidateK = 2000
  /** WITH keys consumed ONLY by the plain vector NEAR branch — rejected
    * with a clear error anywhere else (fused/hybrid/non-vector), because
    * an accepted-but-ignored option is a silent no-op. */
  private val VectorOnlyWithKeys = Seq("mode", "ef_search", "rerank",
    "quantization", "oversampling", "index")
  /** The closed WITH-option vocabulary (ast/with_clause.rs:82-131 +
    * aggregation caps); anything else is a SemanticError. One derived
    * set: adding a vector key above keeps both checks in sync. */
  private val KnownWithKeys =
    VectorOnlyWithKeys.toSet ++ Set("timeout_ms", "max_groups", "group_limit")

  def run(sql: String): DataFrame =
    Parser.parse(sql).fold(e => throw new IllegalArgumentException(e), compile)

  def compile(q: Query): DataFrame = q match {
    case Query(Some(sel), None, None) => compileSelect(sel)
    case Query(Some(sel), Some(Compound(op, right)), None) =>
      val l = compileSelect(sel)
      val r = compileSelect(right)
      op match {
        case "union" => l.union(r).distinct()
        case "union_all" => l.unionAll(r)
        case "intersect" => l.intersect(r)
        case "except" => l.except(r)
      }
    case Query(None, None, Some(m)) => compileMatch(m)
    case other => throw new IllegalArgumentException(s"unsupported query: $other")
  }

  // =================== SELECT ===================

  def compileSelect(sel: Select): DataFrame = {
    // validation parity (validation.rs:226-257): >1 vector-search legs
    // OR-combined is rejected (needs a union of vector searches); one
    // similarity() OR metadata stays supported (union mode, q47)
    sel.where.foreach { w =>
      if (countVectorConds(w) > 1 && hasMultiSimInOr(w))
        fail("Multiple similarity() in OR are not supported. Use AND instead.")
    }
    // WITH keys are a closed set (ast/with_clause.rs:82-131: mode,
    // ef_search, timeout_ms, rerank, quantization, oversampling; plus the
    // aggregation caps, aggregation.rs:87-88). A typo'd key silently
    // changing nothing is worse than an error — reject loudly.
    sel.withOptions.keys.find(!KnownWithKeys.contains(_)).foreach { k =>
      fail(s"unknown WITH option '$k' (supported: ${KnownWithKeys.toSeq.sorted.mkString(", ")})")
    }
    val meta = catalog.metaOf(sel.from)
    // alias every frame by its table name (or AS alias) so qualified
    // refs like `customer.c_nationkey` resolve
    var df = catalog.table(sel.from).as(sel.fromAlias.getOrElse(sel.from))

    // joins (grammar.pest:99-107; reference executes only the PK inner
    // join — query/join.rs:123-198; we execute all four types + USING)
    for (j <- sel.joins) {
      val right = catalog.table(j.table).as(j.alias.getOrElse(j.table))
      df =
        if (j.using.nonEmpty) df.join(right, j.using, j.joinType)
        else {
          val (lc, rc) = j.on.get
          df.join(right, resolve(df, lc) === col(rc), j.joinType)
        }
    }

    // WHERE: extract NEAR / NEAR_FUSED (top-k drivers), compile the rest
    val (near, residual) = sel.where.map(extractNear).getOrElse((None, None))
    val simScore = sel.where.flatMap(lastSimilarity)
    val textScore = sel.where.flatMap(firstTextMatch)

    // hybrid text+vector search (F4, text.rs:113-203): `MATCH … AND
    // vector NEAR … USING FUSION(…)` merges the two legs by weighted RRF
    // (vector leg w/(k+rank), text leg (1-w)/(k+rank), w default 0.5) —
    // the MATCH is a leg, not a filter, so it leaves the residual tree.
    // Only a TOP-LEVEL AND conjunct qualifies as the leg; MATCHes under
    // OR/NOT (and any second MATCH) stay filters.
    val hybridText: Option[TextMatch] =
      if (sel.fusion.isDefined && near.exists(_.isInstanceOf[VectorNear]))
        sel.where.flatMap(hybridTextLeg)
      else None

    // no-silent-no-op for the fusion clause itself: USING FUSION must be
    // consumed by NEAR_FUSED (strategy/params) or by a hybrid MATCH+NEAR
    // pair — anything else used to silently ignore it (r15 review finding)
    if (sel.fusion.isDefined && hybridText.isEmpty &&
        !near.exists(_.isInstanceOf[VectorNearFused]))
      fail("USING FUSION applies only to NEAR_FUSED or a hybrid " +
        "MATCH + NEAR pair (the MATCH must be a top-level AND conjunct)")

    // vector-search-only WITH keys are CONSUMED only by the plain NEAR
    // branch; accepting them on fused/hybrid/non-vector queries would be
    // the silent no-op the closed-set key check exists to prevent
    if (!(near.exists(_.isInstanceOf[VectorNear]) && hybridText.isEmpty)) {
      VectorOnlyWithKeys
        .find(sel.withOptions.contains)
        .foreach(k => fail(s"WITH $k applies only to plain vector NEAR queries " +
          "(not NEAR_FUSED, hybrid fusion, or non-vector queries)"))
    }

    // residual predicate (metadata + similarity thresholds + text match);
    // in hybrid mode the FUSED MATCH conjunct leaves the filter tree —
    // and only that one: other MATCHes keep filtering
    val residualAll = residual.orElse(sel.where.filter(_ => near.isEmpty))
      .flatMap(c => hybridText match {
        case Some(leg) => stripConjunct(c, leg)
        case None => Some(c)
      })

    // CORRELATED scalar subqueries (top-level AND conjuncts) decorrelate
    // to groupBy-on-correlation-keys + join (subquery_optimizer.rs
    // RewriteAsJoin — the distributed strategy; PerRow is a driver loop)
    val (corrConjs, residualCond) = residualAll match {
      case Some(cond) if near.isEmpty =>
        val (corr, plain) = flattenAnd(cond).partition {
          case Compare(_, _, SubqueryValue(sq)) => isCorrelated(sq)
          case _ => false
        }
        // a correlated subquery buried under OR/NOT can't decorrelate to
        // a key join — reject with a real error, not an unresolved column
        def buried(c: Condition): Boolean = c match {
          case Compare(_, _, SubqueryValue(sq)) => isCorrelated(sq)
          case And(l, r) => buried(l) || buried(r)
          case Or(l, r) => buried(l) || buried(r)
          case Not(i) => buried(i)
          case _ => false
        }
        if (plain.exists(buried))
          fail("correlated scalar subqueries must be AND-composed at the top level of WHERE")
        (corr, plain.reduceOption(And.apply))
      case other => (Seq.empty[Condition], other)
    }

    // Set when a branch below already applied `residualCond` (the
    // filter-before-top-k contract) / left-joined a BM25 match flag.
    var residualApplied = false
    var scoredTm: Option[(TextMatch, Column)] = None

    // score column (reference score conventions: W1/V2/S6)
    val scored: DataFrame = near match {
      case Some(VectorNear(v)) if hybridText.isDefined =>
        val vec = vecOf(v)
        val (fn, hib) = VectorFunctions.metrics(meta.metric)
        val vcolName = meta.vectorCol.getOrElse(fail("hybrid NEAR needs a vector column"))
        val fusion = sel.fusion.get
        val kParam = fusion.params.getOrElse("k", 60.0)
        val w = fusion.params.getOrElse("vector_weight", 0.5)
        val sim = fn(col(vcolName), VectorFunctions.vecLit(vec))
        // filter-then-search parity with plain NEAR (vector.rs:164-239):
        // the residual WHERE restricts BOTH legs BEFORE the bounded
        // candidate fetch, so a selective filter on a collection larger
        // than CandidateK can't starve the legs and WHERE means the same
        // thing across NEAR, hybrid, and NEAR_FUSED.
        val dfH = residualCond match {
          case Some(c) => residualApplied = true; df.where(compileCond(c, df, meta))
          case None => df
        }
        // candidate-K legs: top-K per leg via TakeOrderedAndProject, THEN
        // rank the K-row result. Rows in neither leg's top-K are not
        // candidates (reference parity: bounded fetch per leg,
        // text.rs:133-134) — and no global rank window over the table.
        val kCand = math.max(sel.limit.getOrElse(NearDefaultLimit), CandidateK)
        val vOrd = if (hib) col("__vs").desc else col("__vs").asc
        val vLeg = dfH.select(col(meta.idCol).as("__vid"), sim.as("__vs"))
          .orderBy(vOrd, col("__vid")).limit(kCand)
          .select(col("__vid"), row_number().over(
            Window.partitionBy(graft.operators.Ranks.one(col("__vid")))
              .orderBy(vOrd, col("__vid"))).as("__vrank"))
        // text leg: BM25 scores come from the corpus-wide materialized
        // postings, and the top-kCand fetch + rank run over the FILTERED
        // doc set. Corpus-wide (not filtered-N/avgdl/df like q61's
        // searchIndexFiltered) is DELIBERATE reference fidelity: the
        // reference's own hybrid_search_with_filter ranks against the
        // global text index and applies the filter afterwards
        // (text.rs:221-280) — only the standalone filtered text search
        // re-derives stats over the filtered set. We improve on the
        // post-filter (candidates draw from the filtered frame so a
        // selective filter can't starve the legs) without changing the
        // scoring contract.
        val tScores =
          if (residualApplied)
            bm25Scores(df, sel, meta, hybridText.get.query, 0)
              .join(dfH.select(col(meta.idCol).as("__fsel")),
                col("doc_id") === col("__fsel"), "left_semi")
              .orderBy(col("score").desc, col("doc_id")).limit(kCand)
          else bm25Scores(df, sel, meta, hybridText.get.query, kCand)
        val tLeg = tScores
          .select(col("doc_id").as("__tid"), row_number().over(
            Window.partitionBy(graft.operators.Ranks.one(col("doc_id")))
              .orderBy(col("score").desc, col("doc_id")))
            .as("__trank"))
        val legs = vLeg.join(tLeg, col("__vid") === col("__tid"), "full_outer")
          .select(coalesce(col("__vid"), col("__tid")).as("__cid"),
            (coalesce(lit(w) / (lit(kParam) + col("__vrank")), lit(0.0))
              + coalesce(lit(1.0 - w) / (lit(kParam) + col("__trank")), lit(0.0)))
              .as("score"))
        // Join-back elision (r6 verdict #5): both legs already draw from
        // the FILTERED frame, so `legs` ids ⊆ dfH ids and the join back to
        // dfH exists only to re-attach payload columns. When the SELECT
        // list (and ORDER BY) needs nothing beyond id + score, skip it —
        // one less scan of the collection and one less join in the plan
        // (measured ~25% off q104's steady time at sf0.1).
        val needsOnlyIdScore = (sel.selectList match {
          case SelectItems(items) => items.forall {
            case Left(ColumnItem(n, _)) => n == meta.idCol || n == "score"
            case _ => false
          }
          case SelectAll => false
        }) && sel.orderBy.forall(_.expr match {
          case OrderByColumn(n) => n == meta.idCol || n == "score"
          case _ => false
        }) && sel.groupBy.isEmpty
        if (needsOnlyIdScore) legs.select(col("__cid").as(meta.idCol), col("score"))
        else dfH.join(legs, dfH(meta.idCol) === col("__cid")).drop("__cid")
      case Some(VectorNear(v)) =>
        val vec = vecOf(v)
        val (fn, hib) = VectorFunctions.metrics(meta.metric)
        val vcolName = meta.vectorCol.getOrElse(
          fail("NEAR on a collection without a vector column"))
        // Residual filters run BEFORE the sketch/top-k phase (the
        // filter-then-search contract — Knn.scala, vector.rs:164-239);
        // a post-filter could empty the k×oversampling candidate pool.
        val dfF0 = residualCond match {
          case Some(c) => residualApplied = true; df.where(compileCond(c, df, meta))
          case None => df
        }
        // WITH (mode=…) / (ef_search=N) routes the ANN tier through the
        // language: the reference's quality tiers (vector.rs:84-91 —
        // ef ≤64 Fast, ≤128 Balanced, ≤256 Accurate, else Perfect) map
        // to the LSH probe radius; 'perfect' / absent = exact scan.
        val tier: Option[String] = sel.withOptions.get("mode")
          .orElse(sel.withOptions.get("ef_search").map(_.toDouble.toInt match {
            case e if e <= 64 => "fast"
            case e if e <= 128 => "balanced"
            case e if e <= 256 => "accurate"
            case _ => "perfect"
          }))
        // WITH (index = 'lsh' | 'ivf') picks the ANN structure behind the
        // quality tiers: LSH Hamming-ball probe (default) or the trained
        // IVF cell probe (both materialized once per dataset). The key is
        // only meaningful on a probing tier — on 'perfect'/absent it
        // would be a silent no-op, which the closed-set validation
        // explicitly forbids.
        val indexKind = sel.withOptions.get("index").map {
          case k @ ("lsh" | "ivf" | "hnsw") => k
          case other => fail(s"unknown WITH index '$other' (supported: lsh, ivf, hnsw)")
        }
        if (indexKind.isDefined && !tier.exists(Set("fast", "balanced", "accurate")))
          fail("WITH index requires a probing mode (fast/balanced/accurate)")
        val dfF = tier match {
          case Some(t @ ("fast" | "balanced" | "accurate"))
              if indexKind.contains("hnsw") =>
            // Partitioned HNSW (reference index/hnsw/native_index.rs:230):
            // the IVF centroid router picks the same nprobe cells as the
            // 'ivf' tier, but inside each probed cell an ef-bounded
            // navigable-graph walk collects ≤ ef candidates instead of
            // scanning the whole cell — fewer scored candidates at equal
            // recall (HnswSpec asserts the count; q195_ann_recall_hnsw
            // pins recall@10 ≥ 0.95 at the accurate tier).
            import graft.operators.{Hnsw, Ivf}
            val src = (if (sel.joins.isEmpty) catalog.indexSource(sel.from) else None)
              .getOrElse(fail("WITH index='hnsw' needs a dataset table or a " +
                "written user collection (the graph index is materialized " +
                "per source; joins/derived frames can't use it)"))
            val kCells = spark.conf.get("graft.ivf.cells", "8").toInt
            val m = spark.conf.get("graft.hnsw.m", "8").toInt
            // nprobe mirrors the ivf tiers; ef is the walk budget
            // (calibrated via RecallProbe on the near-uniform worst-case
            // testdata: accurate = nprobe 7, ef 96 → ≥29/30 recall@10)
            val nprobe = t match { case "fast" => 2; case "balanced" => 4; case _ => kCells - 1 }
            // The IVF half is the centroid router AND the cost-aware
            // fallback target; resolving it first yields the corpus
            // count WITHOUT touching the graph (Hnsw.materializedIndexAt
            // builds on the same memoized artifact, so nothing doubles).
            val (cents, ivfCells) = Ivf.materializedIndexAt(spark, src.token,
              src.paths, sel.from, src.frame(), vcolName, kCells,
              modelSources = src.modelPaths, pieces = src.pieces)
            // Corpus count: known the moment the index materializes, so
            // it is persisted per content stamp (Materialize.countMemo)
            // — NO Spark job on any later compile, including fresh-JVM
            // serving with a new query vector per request (r16 VERDICT
            // #1 / ADVICE: the unconditional per-compile count() doubled
            // q195). The kind is deliberately index-family-agnostic
            // (every family's count is the same non-null-vector corpus),
            // so any future consumer can share the persisted value —
            // since the r17 residual-PQ rework dropped its corpus-size
            // knob, this routing decision is the only consumer.
            val corpusN = graft.Materialize.countMemo(
              s"corpusn_${vcolName}_${sel.from}", src.token, src.paths)(
              ivfCells.count())
            val cellsToProbe = Hnsw.probeCells(cents, vec.toArray, nprobe)
            // Cost-aware tier routing (r16 VERDICT #2, widened to every
            // tier in r17): the batch walk reads every probed row anyway
            // (mapPartitions materializes the cell) — its only saving is
            // exact-kernel evals, and the measured per-visit bookkeeping
            // exceeds a codegen eval at every dim tested. Above the
            // calibration corpus that trade never pays, on EITHER axis:
            //  - accurate: recall at a FIXED ef decays as cells grow —
            //    ef must scale as ~corpus/96 (RecallCurve r16; the
            //    reference scales the same knob, HnswParams::
            //    for_dataset_size params.rs:72-102) — and a linearly-
            //    growing ef is a strictly worse linear scan (100K×768D:
            //    662 ms walk at 0.96 vs the probed exact scan at 1.0);
            //  - fast/balanced: their fixed small ef keeps the cost
            //    DOWN but the recall collapses with cell size (0.31 /
            //    0.48 on the tile at 512/500 ms — dominated by the
            //    nprobe-matched cell scan at 1.0 recall and ~70 ms,
            //    PERF_r17_ann).
            // So once corpus > 96·96 every tier routes to the per-cell
            // EXACT scan over its OWN nprobe probe set (the ivf-tier
            // plan — the probe width stays the speed/recall knob), and
            // the adjacency never builds. At calibration scale the walk
            // keeps the reference's navigable-graph semantics (HnswSpec;
            // q195's recall pin path).
            if (corpusN > 96L * 96L) {
              val idx = ivfCells.as(sel.fromAlias.getOrElse(sel.from))
              val idxF = residualCond match {
                case Some(c) => idx.where(compileCond(c, idx, meta))
                case None => idx
              }
              idxF.where(col("cell").isin(cellsToProbe: _*)).drop("cell")
            } else {
              val (_, graph) = Hnsw.materializedIndexAt(spark, src.token,
                src.paths, sel.from, src.frame(), vcolName, meta.idCol,
                meta.metric, kCells, m,
                modelSources = src.modelPaths, pieces = src.pieces)
              val ef = t match {
                case "fast" => 24
                case "balanced" => 48
                // the sf-scale calibration floor; larger corpora routed
                // to the exact scan above, so the walk never pays an
                // asymptotically-linear ef
                case _ => 96
              }
              val idx = graph.as(sel.fromAlias.getOrElse(sel.from))
              // filter-then-search: the residual predicate gates ACCEPTANCE
              // inside the walk (navigation still crosses non-matching
              // nodes — filtered-HNSW), so survivors all satisfy it
              val (probedIdx, keepCol) = residualCond match {
                case Some(c) =>
                  (idx.withColumn("__keep", compileCond(c, idx, meta)), Some("__keep"))
                case None => (idx, None)
              }
              Hnsw.walkCandidates(
                probedIdx.where(col("cell").isin(cellsToProbe: _*)),
                vcolName, meta.idCol, meta.metric, vec, ef, keepCol,
                // the materialized graph is written clustered by cell, so
                // the walk may skip its co-locating shuffle when no
                // parquet file can split (walkCandidates gates on file
                // sizes; the residual __keep projection doesn't change
                // the underlying scan's files)
                cellClusteredFiles = true)
                .drop("cell", "neighbors", "neighbors1", "level", "__keep")
            }
          case Some(t @ ("fast" | "balanced" | "accurate"))
              if indexKind.contains("ivf") =>
            import graft.operators.Ivf
            val src = (if (sel.joins.isEmpty) catalog.indexSource(sel.from) else None)
              .getOrElse(fail("WITH index='ivf' needs a dataset table or a " +
                "written user collection (the trained index is materialized " +
                "per source; joins/derived frames can't use it)"))
            val k = spark.conf.get("graft.ivf.cells", "8").toInt
            // nprobe per tier, calibrated like the LSH radii (RecallProbe,
            // same worst-case near-uniform testdata): fast=2 ≈ 0.43-0.53,
            // balanced=4 ≈ 0.77-0.8, accurate=7 ≥ 0.95 — the reference's
            // Accurate bar, oracle-pinned by q125_ann_recall_ivf
            val nprobe = t match { case "fast" => 2; case "balanced" => 4; case _ => k - 1 }
            val (cents, cells) = Ivf.materializedIndexAt(spark, src.token,
              src.paths, sel.from, src.frame(), vcolName, k,
              modelSources = src.modelPaths, pieces = src.pieces)
            val probeCells = cents
              .map { case (c, cen) =>
                (c, graft.functions.VectorKernels.l2Squared(vec.toArray, cen)) }
              .sortBy { case (c, dist) => (dist, c) }
              .take(nprobe).map(_._1)
            val idx = cells.as(sel.fromAlias.getOrElse(sel.from))
            val idxF = residualCond match {
              case Some(c) => idx.where(compileCond(c, idx, meta))
              case None => idx
            }
            idxF.where(col("cell").isin(probeCells.toIndexedSeq: _*)).drop("cell")
          case Some(t @ ("fast" | "balanced" | "accurate")) =>
            import graft.operators.Ann
            val nPlanes = spark.conf.get("graft.ann.planes", "6").toInt
            // Tier → probe radius, calibrated on the testdata embeddings
            // (near-uniform directions — the ANN worst case; RecallProbe
            // measured recall@10 over 3 queries): fast r=1 ≈ 0.25,
            // balanced r=2 ≈ 0.45-0.57, accurate r=4 ≥ 0.95 — the
            // reference's Accurate-tier recall bar (docs/BENCHMARKS.md:
            // 96-102), oracle-pinned by q123_ann_recall. On clustered
            // real-world embeddings the same radii probe far fewer rows.
            val radius = t match { case "fast" => 1; case "balanced" => 2; case _ => 4 }
            val sig = Ann.signature(vec.toArray, Ann.planes(nPlanes, vec.length))
            val probes = Ann.probeBuckets(sig, nPlanes, radius)
            val srcOpt = if (sel.joins.isEmpty) catalog.indexSource(sel.from) else None
            if (srcOpt.isDefined) {
              // probe the MATERIALIZED bucket-clustered index: `bucket IN
              // (probes)` pushes into the parquet scan and prunes row
              // groups — no per-query re-hash of every vector, no scan
              // outside the Hamming ball (the 100 TB shape; on-the-fly
              // signature filtering below is a full scan per query).
              // Dataset tables AND written user collections both resolve
              // an indexSource; derived frames fall to on-the-fly.
              val src = srcOpt.get
              // bucketed user collections maintain the LSH index PER
              // STORAGE PIECE — a publish rebuilds only the pieces it
              // re-pointed (Ann.materializedIndexPieces scaladoc)
              val idx0 = src.pieces match {
                case Some((ps, schema)) => Ann.materializedIndexPieces(
                  spark, src.token, ps, schema, sel.from, vcolName, nPlanes,
                  vec.length)
                case None => Ann.materializedIndexAt(spark, src.token,
                  src.paths, sel.from, src.frame(), vcolName, nPlanes,
                  vec.length)
              }
              val idx = idx0.as(sel.fromAlias.getOrElse(sel.from))
              val idxF = residualCond match {
                case Some(c) => idx.where(compileCond(c, idx, meta))
                case None => idx
              }
              idxF.where(col("bucket").isin(probes: _*)).drop("bucket")
            } else
              dfF0.where(Ann.signatureCol(col(vcolName), nPlanes, vec.length)
                .isin(probes: _*))
          case Some("perfect") | Some("exact") | None => dfF0
          case Some(other) => fail(s"unknown WITH mode '$other'")
        }
        // WITH (quantization=…, oversampling=N, rerank=true) selects the
        // two-phase sketch path (ast/with_clause.rs:106-131): hamming
        // prefilter keeps k×oversampling candidates, exact scores rerank.
        // `rerank=true` alone also routes two-phase (search_with_rerank,
        // index/hnsw/index/search.rs:118-159; candidate pool = k×multiplier,
        // default 2 — config.rs:228,240). Quantization value names follow
        // QuantizationMode::parse (with_clause.rs:27-35) plus our 'binary'
        // sketch; unknown values are an error, not a silent exact scan.
        // the collection's create-time storage mode is the default
        // quantization regime (StorageMode, collection/types.rs:32-61,
        // quantization.rs:20-29); an explicit WITH overrides it — incl.
        // WITH (quantization='full') to force exact on an SQ8 collection
        // ("full" storage is the exact default — dropped here so a bare
        // WITH rerank=true keeps its sketch-prefilter meaning on it)
        // f16/bf16 are WRITE-time storage modes (precision applied at
        // publish, Collections.halfRoundIfConfigured) — dropped here
        // exactly like "full" so a bare WITH rerank=true keeps its
        // sketch-prefilter meaning on a half-precision collection; as a
        // READ-time WITH quantization value they stay an error below.
        val quant0: Option[String] = sel.withOptions.get("quantization")
          .orElse(meta.storageMode.filterNot(m =>
            m == "full" || m == "f16" || m == "bf16")).map {
          case q @ ("binary" | "dual" | "hybrid" | "int8" | "sq8" | "quantized" | "pq") => q
          case "f32" | "full" | "exact" | "auto" | "default" => "f32"
          case other => fail(s"unknown WITH quantization '$other'")
        }
        // an IMPLICIT storage-mode 'pq' yields to an explicitly requested
        // probing tier it can't compose with (the LSH tiers): the user
        // asked for mode=…, not for PQ — erroring a query that works on
        // every other collection (or wasting the already-built bucket
        // probe) would make the storage default a trap. An EXPLICIT
        // WITH (quantization='pq') still conflicts loudly below.
        val quant: Option[String] =
          if (quant0.contains("pq") && sel.withOptions.get("quantization").isEmpty &&
              tier.exists(Set("fast", "balanced", "accurate")) &&
              !indexKind.contains("ivf")) None
          else quant0
        val rerank: Boolean = sel.withOptions.get("rerank") match {
          case Some("true") | Some("1") => true
          case Some("false") | Some("0") => false
          case Some(other) => fail(s"WITH rerank expects true/false, got '$other'")
          case None => false
        }
        // Three quantization regimes (QuantizationMode, with_clause.rs:12-22):
        //   binary/dual/hybrid (+ bare rerank=true) → sketch prefilter,
        //     exact rerank (Dual: "int8 for candidates, f32 for rerank");
        //   int8/sq8/quantized + rerank=true → SQ8-approx candidate
        //     ordering, exact rerank;
        //   int8/sq8/quantized alone → "int8 only (fast, approximate)":
        //     scores ARE the dequantized-vector scores, no rerank.
        val isInt8 = quant.exists(q => q == "int8" || q == "sq8" || q == "quantized")
        val isSketch = quant.exists(q => q == "binary" || q == "dual" || q == "hybrid")
        val isPq = quant.contains("pq")
        // PQ's calibrated operating point (RecallProbe / q133_pq_recall)
        // only reaches the >=0.95 recall bar at oversampling=16 for the
        // default m=8/k=32 — a plain WITH (quantization='pq') must land
        // there, not at the generic sketch default of 4.
        // composed IVF-PQ loses a little recall to the coarse probe, so
        // its calibrated default is higher: nprobe=7, oversampling=64 →
        // 29/30 at sf0.01 AND 30/30 at sf0.1 (RecallProbe; 32 measures
        // 29/30 and 28/30 — the pool must grow with the corpus fraction
        // it represents, and 64 holds the bar at both scales)
        val pqProbing = quant.contains("pq") &&
          tier.exists(Set("fast", "balanced", "accurate"))
        val oversample = sel.withOptions.get("oversampling")
          .map(_.toDouble.toInt)
          .getOrElse(if (pqProbing) 64 else if (isPq) 16
            else if (quant.isDefined) 4 else 2)
        val k = sel.limit.getOrElse(NearDefaultLimit)
        import graft.operators.Quantization
        if (isPq) {
          // Beyond-reference fourth regime: product quantization. Phase 1
          // orders the NARROW materialized codes table (id + m ints) by
          // the ADC lookup score — the scan never touches vectors or
          // payloads — and the top k×oversampling ids join back to the
          // filtered frame for exact rerank. ADC is ordering-only, so
          // 'pq' is two-phase by construction (rerank implicit). On the
          // near-uniform testdata (the ANN worst case), m=8 k=32
          // oversampling=16 measures recall@10 = 29/30 (RecallProbe) —
          // pinned by q133_pq_recall.
          val pqSrc = (if (sel.joins.isEmpty) catalog.indexSource(sel.from) else None)
            .getOrElse(fail("WITH quantization='pq' needs a dataset table " +
              "or a written user collection (the trained codebooks are " +
              "materialized per source)"))
          val probing = tier.exists(Set("fast", "balanced", "accurate"))
          if (probing && !indexKind.contains("ivf"))
            fail("quantization='pq' composes only with index='ivf' probing " +
              "(the LSH buckets aren't trained with the codebooks); add " +
              "index='ivf' or drop the mode for a full-codes ADC scan")
          import graft.operators.{IvfPq, Pq}
          // (m, k) adapt to the vector width: ~8 dims/subspace, 256
          // centroids — the classic 8-bit PQ operating point (64D keeps
          // the historical m=8). A fixed m=8 quantized 768D vectors to
          // noise (r16 RecallCurve), and the r16 (dim/16, k=32) point
          // still needed a corpus-proportional candidate pool (r17
          // RecallCurve); conf still overrides both.
          val m = spark.conf.getOption("graft.pq.m").map(_.toInt)
            .getOrElse(Pq.defaultM(vec.length))
          val kc = spark.conf.get("graft.pq.k", "256").toInt
          val cellsN = spark.conf.get("graft.ivf.cells", "8").toInt
          // ONE residual-code artifact serves both pq regimes (IvfPq
          // scaladoc): codes quantize v − centroid[cell], so ADC ranks
          // tightly inside clusters and a FIXED candidate pool holds the
          // recall bar at every corpus size — the r16 corpus-adaptive
          // pool (rows/200, 512 reranked ids at 100K) and its count job
          // are gone (r16 VERDICT #3).
          //  - probing (tier + index='ivf'): phase 1 scans only the
          //    probed cells — row-group-pruned by the cell clustering —
          //    and rerank joins back to dfF, which the tier match above
          //    already scoped to the same probed cells (+ residual
          //    filter). q139_ivfpq_recall pins the accurate tier.
          //  - plain pq: same table, ADC over ALL cells. q133 pins the
          //    EXPLICIT-oversampling contract at 16.
          val (cents, cb, combined) = IvfPq.materializedIndexAt(spark,
            pqSrc.token, pqSrc.paths, sel.from, pqSrc.frame(), vcolName,
            meta.idCol, vec.length, cellsN, m, kc,
            modelSources = pqSrc.modelPaths, pieces = pqSrc.pieces)
          val codes =
            if (probing) {
              val nprobe = tier.get match {
                case "fast" => 2; case "balanced" => 4; case _ => cellsN - 1
              }
              val probes = IvfPq.probeCells(cents, vec.toArray, nprobe)
              combined.where(col("cell").isin(probes: _*))
            } else combined
          // fixed default pool, calibrated on residual codes (RecallCurve
          // 100K×768D: recall@10 ≥0.95 at os=64; near-uniform sf-scale
          // worst case holds its floor at 16 — q133's explicit pin)
          val osEff = sel.withOptions.get("oversampling").map(_.toDouble.toInt)
            .getOrElse(64)
          // query-independent ADC tables (|cb|², cent×cb cross, |cent|²)
          // memoized per model stamp, like the codebooks: rebuilding the
          // nCells×m×k cross table per request would be the same
          // per-request floor the r16 count job was, and memoizing lets
          // every cached plan share one array object
          val adcModel = graft.Materialize.memo(
            s"ivfpqr${cellsN}_${m}x${kc}_adctables_${sel.from}", pqSrc.token,
            pqSrc.modelPaths.getOrElse(pqSrc.paths)) {
            Pq.adcModelTables(cb, cents)
          }
          val (ord, asc) = Pq.adcOrderingResidual(col("codes"), col("cell"),
            vec.toArray, cb, cents, meta.metric, model = Some(adcModel))
          // filter-then-search: with a residual WHERE, candidates come
          // from the filtered frame's ids only
          val scoped = residualCond match {
            case Some(_) => codes.join(dfF.select(col(meta.idCol)), meta.idCol :: Nil)
            case None => codes
          }
          val candIds = scoped.withColumn("__adc", ord)
            .orderBy(if (asc) col("__adc").asc else col("__adc").desc,
              col(meta.idCol).asc)
            .limit(k * osEff)
            .select(meta.idCol)
          dfF.join(candIds, meta.idCol :: Nil)
            .withColumn("score", fn(col(vcolName), VectorFunctions.vecLit(vec)))
        } else if (isInt8 && !rerank) {
          Quantization.sq8Decode(Quantization.withSq8(dfF, vcolName))
            .withColumn("score", fn(col("vec_approx"), VectorFunctions.vecLit(vec)))
            .drop("vec_approx", "sq8_codes", "sq8_min", "sq8_scale")
        } else {
          val base =
            if (isSketch || (rerank && quant.isEmpty)) {
              val sk = Quantization.withBinarySketch(dfF, vcolName, vec.length)
              Quantization.hammingToQuery(sk, vec)
                .orderBy(col("__ham").asc, col(meta.idCol).asc)
                .limit(k * oversample)
                .drop("__ham", "sketch")
            } else if (isInt8) { // int8 + rerank=true
              val approx = fn(col("vec_approx"), VectorFunctions.vecLit(vec))
              val ord = if (hib) col("__as").desc else col("__as").asc
              Quantization.sq8Decode(Quantization.withSq8(dfF, vcolName))
                .withColumn("__as", approx)
                .orderBy(ord, col(meta.idCol).asc)
                .limit(k * oversample)
                .drop("__as", "vec_approx", "sq8_codes", "sq8_min", "sq8_scale")
            } else dfF // 'f32' / absent → exact scan
          base.withColumn("score", fn(col(vcolName), VectorFunctions.vecLit(vec)))
        }
      case Some(VectorNearFused(vs, fusion0)) =>
        // condition-level fusion clause wins; a select-level USING
        // FUSION is the same user intent and used to be silently
        // ignored here (r15 review finding)
        val fusion = fusion0.orElse(sel.fusion)
        val vecs = vs.map(vecOf)
        val (fn, hib) = VectorFunctions.metrics(meta.metric)
        val vcol = col(meta.vectorCol.getOrElse(fail("NEAR_FUSED needs a vector column")))
        val sims = vecs.map(v => fn(vcol, VectorFunctions.vecLit(v)))
        // filter-then-search, same contract as plain NEAR: candidate legs
        // draw from the WHERE-filtered frame (vector.rs:164-239)
        val dfF = residualCond match {
          case Some(c) => residualApplied = true; df.where(compileCond(c, df, meta))
          case None => df
        }
        val strategy = fusion.map(_.strategy).getOrElse("average")
        strategy match {
          case "average" =>
            dfF.withColumn("score", sims.reduce(_ + _) / lit(sims.size.toDouble))
          case "maximum" =>
            dfF.withColumn("score", greatest(sims: _*))
          case "rrf" =>
            // RRF over candidate-K legs: each leg keeps its top-K
            // (TakeOrderedAndProject), ranks those K rows, fused =
            // Σ 1/(k + rank) over legs the row appears in
            // (strategy.rs:224-250; bounded candidate fetch as in hybrid)
            val kParam = fusion.flatMap(_.params.get("k")).getOrElse(60.0)
            val kCand = math.max(sel.limit.getOrElse(NearDefaultLimit), CandidateK)
            val ord = (c: Column) => if (hib) c.desc else c.asc
            val legs = sims.map { sim =>
              dfF.select(col(meta.idCol).as("__fid"), sim.as("__fs"))
                .orderBy(ord(col("__fs")), col("__fid")).limit(kCand)
                .select(col("__fid"), row_number().over(
                  Window.partitionBy(graft.operators.Ranks.one(col("__fid")))
                    .orderBy(ord(col("__fs")), col("__fid")))
                  .as("__frank"))
            }
            val fused = legs.reduce(_ unionAll _)
              .groupBy("__fid")
              .agg(sum(lit(1.0) / (lit(kParam) + col("__frank"))).as("score"))
            dfF.join(fused, dfF(meta.idCol) === col("__fid")).drop("__fid")
          case "weighted" =>
            // weighted combination over candidate-K legs (fusion/strategy
            // .rs:67-78): avg_weight×avg + max_weight×max + hit_weight×
            // hit_ratio, hit_ratio = legs containing the doc / total legs
            val aw = fusion.flatMap(_.params.get("avg_weight")).getOrElse(0.5)
            val mw = fusion.flatMap(_.params.get("max_weight")).getOrElse(0.3)
            val hw = fusion.flatMap(_.params.get("hit_weight")).getOrElse(0.2)
            val kCand = math.max(sel.limit.getOrElse(NearDefaultLimit), CandidateK)
            val ord = (c: Column) => if (hib) c.desc else c.asc
            val legs = sims.map { sim =>
              dfF.select(col(meta.idCol).as("__fid"), sim.as("__fs"))
                .orderBy(ord(col("__fs")), col("__fid")).limit(kCand)
            }
            val fused = legs.reduce(_ unionAll _)
              .groupBy("__fid")
              .agg((lit(aw) * avg(col("__fs")) + lit(mw) * max(col("__fs"))
                + lit(hw) * (count(lit(1)) / lit(sims.size.toDouble))).as("score"))
            dfF.join(fused, dfF(meta.idCol) === col("__fid")).drop("__fid")
          case other => fail(s"unknown fusion strategy $other")
        }
      case _ =>
        (simScore, textScore) match {
          case (Some(SimilarityCond(field, v, _, _)), _) =>
            val (fn, _) = VectorFunctions.metrics(meta.metric)
            df.withColumn("score", fn(col(field), VectorFunctions.vecLit(vecOf(v))))
          case (None, Some(tm @ TextMatch(_, qtext))) =>
            // MATCH is an ordinary boolean leaf of WHERE: LEFT-join the
            // BM25 scores so rows with no matching term survive for
            // NOT/OR branches (reference filter semantics evaluate MATCH
            // per-row); score falls back to 0.0 when the text leg missed.
            // The `__tm` flag feeds the residual filter, so a top-level
            // AND MATCH lets Catalyst convert the join back to inner.
            val scores = bm25Scores(df, sel, meta, qtext, 0)
              .select(col("doc_id").as("__bm25_id"), col("score"))
            scoredTm = Some((tm, col("__tm")))
            df.join(scores, df(meta.idCol) === col("__bm25_id"), "left")
              .withColumn("__tm", col("__bm25_id").isNotNull)
              .withColumn("score", coalesce(col("score"), lit(0.0)))
              .drop("__bm25_id")
          case _ => df.withColumn("score", lit(1.0)) // scan score (S6)
        }
    }

    val filtered0 = residualCond match {
      case Some(cond) if !residualApplied =>
        scored.where(compileCond(cond, scored, meta, scoredTm))
      case _ => scored
    }
    val filtered1 = if (scoredTm.isDefined) filtered0.drop("__tm") else filtered0
    // decorrelated scalar-subquery conjuncts: aggregate ⋈ outer + compare
    val filtered = corrConjs.foldLeft(filtered1) {
      case (acc0, Compare(outerCol, op, SubqueryValue(sq))) =>
        applyCorrelatedScalar(acc0, outerCol, op, sq)
      case (_, other) => fail(s"unsupported correlated condition $other")
    }

    // aggregation or plain projection
    val hasAggs = sel.selectList match {
      case SelectItems(items) => items.exists(_.isRight)
      case _ => false
    }

    // HAVING outside an aggregation used to be silently dropped —
    // compileAgg (which owns the filter) never ran (r15 review
    // finding); the reference rejects it (aggregation.rs:144-149)
    if (sel.having.isDefined && sel.groupBy.isEmpty && !hasAggs)
      fail("HAVING requires GROUP BY or an aggregate select list")

    var out: DataFrame =
      if (sel.groupBy.nonEmpty || hasAggs) compileAgg(sel, filtered)
      else filtered

    // ORDER BY
    if (sel.orderBy.nonEmpty) {
      val sorts = sel.orderBy.map(o => orderCol(o, meta))
      out = out.orderBy(sorts: _*)
    } else if (near.isDefined) {
      // NEAR default ordering by metric direction (distance.rs:95-103);
      // fused scores (RRF/hybrid) are always higher-is-better
      val fusedScore = hybridText.isDefined ||
        near.exists(_.isInstanceOf[VectorNearFused])
      val (_, hib) = VectorFunctions.metrics(meta.metric)
      val ord = if (hib || fusedScore) col("score").desc else col("score").asc
      out = out.orderBy(ord, col(meta.idCol).asc)
    }

    // projection (after ORDER BY so sort can reference unselected cols)
    if (!hasAggs && sel.groupBy.isEmpty) {
      sel.selectList match {
        case SelectAll =>
          // DISTINCT * dedups by id (search/query/distinct.rs:12-35: `*`
          // dedups on point id, not the full row)
          if (sel.distinct) out = out.dropDuplicates(meta.idCol)
        case SelectItems(items) =>
          val cols = items.collect { case Left(ColumnItem(n, a)) =>
            val c = resolve(out, n)
            a.map(c.as).getOrElse(c)
          }
          out = out.select(cols: _*)
          if (sel.distinct) out = out.dropDuplicates()
      }
    }

    // LIMIT / OFFSET (+ NEAR default 10, cap 100_000 — query/mod.rs:61,84-87)
    val effLimit = sel.limit.map(l => math.min(l, LimitCap))
      .orElse(if (near.isDefined) Some(NearDefaultLimit) else None)
    sel.offset.foreach(o => out = out.offset(o))
    effLimit.foreach(l => out = out.limit(l))
    out
  }

  private def compileAgg(sel: Select, df: DataFrame): DataFrame = {
    val items = sel.selectList match {
      case SelectItems(is) => is
      case SelectAll => fail("SELECT * with GROUP BY is not valid VelesQL")
    }
    val aggs = items.collect { case Right(a) => a } ++
      sel.having.toSeq.flatMap(h => (h.first +: h.rest.map(_._2)).map(_.agg)) ++
      sel.orderBy.collect { case OrderByItem(OrderByAggregate(a), _) => a }
    val aggCols = aggs.distinctBy(_.resultName).map(aggColumn)
    val hasGroup = sel.groupBy.nonEmpty

    // alias each group expression to its literal path so projections can
    // re-reference it (indexed paths like items[0].sku aren't re-resolvable
    // against the aggregated frame)
    var out =
      if (aggCols.isEmpty)
        // GROUP BY with no aggregate anywhere (select list, HAVING or
        // ORDER BY): the grouped result is the distinct group keys —
        // non-group select items then fail ANALYSIS with a typed error
        // instead of aggCols.head crashing here (found by ParserFuzzSpec)
        df.select(sel.groupBy.map(g => resolve(df, g).as(g)): _*).distinct()
      else if (hasGroup) df.groupBy(sel.groupBy.map(g => resolve(df, g).as(g)): _*)
        .agg(aggCols.head, aggCols.tail: _*)
      else df.agg(aggCols.head, aggCols.tail: _*)

    // WITH (max_groups=N | group_limit=N): error when the aggregation
    // produces more groups (aggregation.rs:87-88, 405-407; hard cap 1M).
    // Divergence, documented: WITHOUT the option we are unlimited — the
    // reference's default 10k cap protects its in-memory hash map, while
    // Spark aggregation spills; the guardrail only runs when asked for.
    val maxGroups = sel.withOptions.get("max_groups")
      .orElse(sel.withOptions.get("group_limit"))
      .map(v => math.min(math.max(v.toDouble.toLong, 1L), 1000000L))
    maxGroups.foreach { mg =>
      if (!hasGroup) fail("max_groups requires GROUP BY")
      val gc = out.agg(count(lit(1)).as("__gc"))
      out = out.crossJoin(broadcast(gc))
        .where(assert_true(col("__gc") <= mg,
          lit(s"Too many groups (limit: $mg)")).isNull)
        .drop("__gc")
    }

    // HAVING: strictly left-to-right fold (query/aggregation.rs:611-644);
    // HAVING without GROUP BY is an error (aggregation.rs:144-149)
    sel.having.foreach { h =>
      if (!hasGroup) fail("HAVING requires GROUP BY")
      val first = havingCol(h.first)
      val folded = h.rest.foldLeft(first) { case (acc, (op, term)) =>
        if (op == "AND") acc && havingCol(term) else acc || havingCol(term)
      }
      out = out.where(folded)
    }

    // project in declared order: group cols (exact-name lookup — they were
    // aliased to their literal paths above) + aggregates
    val proj = items.map {
      case Left(ColumnItem(n, a)) =>
        val c = if (sel.groupBy.contains(n)) out.col(s"`$n`") else resolve(out, n)
        a.map(c.as).getOrElse(c)
      case Right(a) => col(a.resultName)
    }
    out.select(proj: _*)
  }

  private def aggColumn(a: AggregateItem): Column = {
    val c = a match {
      case AggregateItem("count", "*", _) => count(lit(1))
      case AggregateItem("count", arg, _) => count(resolveName(arg))
      case AggregateItem("sum", arg, _) => sum(resolveName(arg))
      case AggregateItem("avg", arg, _) => avg(resolveName(arg))
      case AggregateItem("min", arg, _) => min(resolveName(arg))
      case AggregateItem("max", arg, _) => max(resolveName(arg))
      case other => fail(s"unknown aggregate $other")
    }
    c.as(a.resultName)
  }

  private def havingCol(t: HavingTerm): Column =
    cmp(col(t.agg.resultName), t.op, literal(t.value))

  private def orderCol(o: OrderByItem, meta: CollectionMeta): Column = {
    val base = o.expr match {
      case OrderByColumn(n) => col(n)
      case OrderByAggregate(a) => col(a.resultName)
      case OrderBySimilarity(field, v) =>
        val (fn, hib) = VectorFunctions.metrics(meta.metric)
        val c = fn(col(field), VectorFunctions.vecLit(vecOf(v)))
        // distance metrics invert the direction (ordering.rs:147-162)
        return o.ascending match {
          case Some(true) => if (hib) c.asc else c.desc
          case _ => if (hib) c.desc else c.asc
        }
    }
    o.ascending match {
      case Some(true) | None => base.asc
      case Some(false) => base.desc
    }
  }

  /** BM25 scores for a text leg: known text collections go through a
    * MATERIALIZED index (build once per dataset — T2, index/bm25.rs
    * posting lists); anything else tokenizes in-query. The corpus
    * collection needs its own index: its doc set (docs WITH embeddings)
    * has different N/avgdl/df stats than the full documents table. */
  private def bm25Scores(df: DataFrame, sel: Select, meta: CollectionMeta,
      qtext: String, k: Int): DataFrame =
    if (sel.from == "documents" && meta.textCol.contains("text"))
      Bm25.searchIndex(Bm25.indexFor(spark, catalog.dir), qtext, k)
    else if (sel.from == "corpus" && meta.textCol.contains("text"))
      Bm25.searchIndex(Bm25.materializedIndex(spark, catalog.dir, "bm25corpus",
        Seq("documents", "embeddings"))(catalog.table("corpus")), qtext, k)
    else Bm25.score(df, qtext, k, meta.idCol, meta.textCol.getOrElse("text"))

  // =================== conditions ===================

  /** Pull a top-level (AND-composed) NEAR/NEAR_FUSED out of the tree. */
  private def extractNear(c: Condition): (Option[Condition], Option[Condition]) = c match {
    case n: VectorNear => (Some(n), None)
    case n: VectorNearFused => (Some(n), None)
    case And(l, r) =>
      val (nl, rl) = extractNear(l)
      val (nr, rr) = extractNear(r)
      // two AND-composed NEARs would silently drop one — reject like the
      // OR-composed case (use NEAR_FUSED for multi-vector queries)
      if (nl.isDefined && nr.isDefined)
        fail("multiple NEAR conditions in one WHERE — use NEAR_FUSED")
      val near = nl.orElse(nr)
      val residual = (rl, rr) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
      (near, residual)
    case other => (None, Some(other))
  }

  /** Last similarity() condition (its score wins — query/mod.rs:419-425). */
  private def lastSimilarity(c: Condition): Option[SimilarityCond] = c match {
    case s: SimilarityCond => Some(s)
    case And(l, r) => lastSimilarity(r).orElse(lastSimilarity(l))
    case Or(l, r) => lastSimilarity(r).orElse(lastSimilarity(l))
    case Not(i) => lastSimilarity(i)
    case _ => None
  }

  /** The TextMatch eligible to become a hybrid fusion leg: a TOP-LEVEL
    * AND conjunct only. A MATCH under OR/NOT is a boolean filter arm —
    * fusing it (and stripping it from the residual) would silently
    * delete the OR branch (r15 review finding); it stays a filter. */
  private def hybridTextLeg(c: Condition): Option[TextMatch] = c match {
    case t: TextMatch => Some(t)
    case And(l, r) => hybridTextLeg(l).orElse(hybridTextLeg(r))
    case _ => None
  }

  /** Remove exactly `target` from the top-level AND tree (the one
    * conjunct hybrid mode fuses instead of filtering); every OTHER
    * condition — including additional MATCH conjuncts, which remain
    * ordinary filters — survives. None if nothing remains. */
  private def stripConjunct(c: Condition, target: Condition): Option[Condition] =
    c match {
      case t if t == target => None
      case And(l, r) => (stripConjunct(l, target), stripConjunct(r, target)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
      case other => Some(other)
    }

  private def firstTextMatch(c: Condition): Option[TextMatch] = c match {
    case t: TextMatch => Some(t)
    case And(l, r) => firstTextMatch(l).orElse(firstTextMatch(r))
    case Or(l, r) => firstTextMatch(l).orElse(firstTextMatch(r))
    case Not(i) => firstTextMatch(i)
    case _ => None
  }

  def compileCond(c: Condition, df: DataFrame, meta: CollectionMeta,
      scoredTm: Option[(TextMatch, Column)] = None): Column = c match {
    case Compare(column, op, v) =>
      val cc = resolve(df, column)
      op match {
        // Neq passes on missing field (matching.rs is_none_or)
        case "!=" | "<>" => cc.isNull || cc =!= literal(v)
        case _ => cmp(cc, op, literal(v))
      }
    case In(column, vs) => resolve(df, column).isin(vs.map(rawLiteral): _*)
    case Between(column, lo, hi) =>
      resolve(df, column).between(literal(lo), literal(hi))
    case Like(column, pat, ci) =>
      if (ci) resolve(df, column).ilike(pat) else resolve(df, column).like(pat)
    case IsNull(column, neg) =>
      if (neg) resolve(df, column).isNotNull else resolve(df, column).isNull
    case And(l, r) =>
      compileCond(l, df, meta, scoredTm) && compileCond(r, df, meta, scoredTm)
    case Or(l, r) =>
      compileCond(l, df, meta, scoredTm) || compileCond(r, df, meta, scoredTm)
    case Not(i) => !compileCond(i, df, meta, scoredTm)
    case SimilarityCond(field, v, op, t) =>
      val (fn, hib) = VectorFunctions.metrics(meta.metric)
      val score = fn(col(field), VectorFunctions.vecLit(vecOf(v)))
      // metric-direction inversion (query/mod.rs:396-417)
      val effOp = if (hib) op else op match {
        case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
        case o => o
      }
      cmp(score, effOp, lit(t))
    case t: TextMatch if scoredTm.exists(_._1 == t) =>
      // the scored frame already carries this MATCH's membership flag
      // (left-joined BM25 hit) — no per-row re-tokenization
      scoredTm.get._2
    case TextMatch(_, qtext) =>
      // membership in the BM25 match set (any query term present)
      val terms = qtext.toLowerCase.split("[^a-z0-9]+").filter(_.length > 1)
      val toks = filter(split(lower(col(meta.textCol.getOrElse("text"))), "[^a-z0-9]+"),
        t => length(t) > 1)
      terms.map(t => array_contains(toks, t)).reduce(_ || _)
    case _: VectorNear | _: VectorNearFused =>
      fail("NEAR must be AND-composed at the top level of WHERE")
  }

  // ---- validation (validation.rs:226-257 parity) ----

  private def countVectorConds(c: Condition): Int = c match {
    case _: SimilarityCond | _: VectorNear | _: VectorNearFused => 1
    case And(l, r) => countVectorConds(l) + countVectorConds(r)
    case Or(l, r) => countVectorConds(l) + countVectorConds(r)
    case Not(i) => countVectorConds(i)
    case _ => 0
  }

  private def hasMultiSimInOr(c: Condition): Boolean = c match {
    case Or(l, r) => (countVectorConds(l) > 0 && countVectorConds(r) > 0) ||
      hasMultiSimInOr(l) || hasMultiSimInOr(r)
    case And(l, r) => hasMultiSimInOr(l) || hasMultiSimInOr(r)
    case Not(i) => hasMultiSimInOr(i)
    case _ => false
  }

  // ---- correlated scalar subqueries (ast/values.rs CorrelatedColumn,
  //      subquery_optimizer.rs strategies) ----

  private def flattenAnd(c: Condition): Seq[Condition] = c match {
    case And(l, r) => flattenAnd(l) ++ flattenAnd(r)
    case other => Seq(other)
  }

  /** Tables/aliases visible inside the subquery's own scope. */
  private def subScope(sq: Select): Set[String] =
    Set(sq.from) ++ sq.fromAlias ++ sq.joins.map(_.table) ++ sq.joins.flatMap(_.alias)

  private def isOuterRef(sq: Select, name: String): Boolean = {
    val parts = name.split("\\.")
    parts.length > 1 && !subScope(sq).contains(parts.head)
  }

  private def isCorrelated(sq: Select): Boolean = {
    def walk(c: Condition): Boolean = c match {
      case Compare(_, _, ColumnRef(n)) => isOuterRef(sq, n)
      case And(l, r) => walk(l) || walk(r)
      case Or(l, r) => walk(l) || walk(r)
      case Not(i) => walk(i)
      case _ => false
    }
    sq.where.exists(walk)
  }

  /** Decorrelate `outerCol OP (SELECT agg(x) FROM t WHERE t.k = outer.k
    * AND …)` into `groupBy(k).agg ⋈ outer` + compare — ONE distributed
    * aggregation and a key join instead of a per-row subquery
    * (subquery_optimizer.rs RewriteAsJoin; PerRow would be a driver
    * loop). Join type tracks SQL empty-group semantics: for sum/avg/min/
    * max an empty scalar subquery is NULL → comparison false → inner
    * join. COUNT over an empty group is 0, not NULL — outer rows with no
    * matching inner rows must compare against 0, so count uses a LEFT
    * join + coalesce(__sq, 0). */
  private def applyCorrelatedScalar(outer: DataFrame, outerCol: String,
      op: String, sq: Select): DataFrame = {
    if (sq.groupBy.nonEmpty || sq.having.isDefined || sq.joins.nonEmpty ||
        sq.limit.isDefined || sq.orderBy.nonEmpty)
      fail("correlated scalar subquery supports the single-table aggregate shape")
    val aggItem = sq.selectList match {
      case SelectItems(Seq(Right(a))) => a
      case _ => fail("correlated scalar subquery must select exactly one aggregate")
    }
    val conjs = sq.where.map(flattenAnd).getOrElse(Nil)
    val (corrs, innerPreds) = conjs.partition {
      case Compare(_, "=", ColumnRef(n)) => isOuterRef(sq, n)
      case _ => false
    }
    if (corrs.isEmpty) fail("correlated subquery: no equality correlation found")
    val pairs = corrs.collect { case Compare(ic, _, ColumnRef(on)) => (ic, on) }
    val subMeta = catalog.metaOf(sq.from)
    val sub0 = catalog.table(sq.from).as(sq.fromAlias.getOrElse(sq.from))
    val sub = innerPreds.reduceOption(And.apply)
      .map(c => sub0.where(compileCond(c, sub0, subMeta))).getOrElse(sub0)
    val keyCols = pairs.zipWithIndex.map { case ((ic, _), i) =>
      resolve(sub, ic).as(s"__ck$i") }
    val grouped = sub.groupBy(keyCols: _*).agg(aggColumn(aggItem))
      .withColumnRenamed(aggItem.resultName, "__sq")
    val cond = pairs.zipWithIndex.map { case ((_, on), i) =>
      grouped(s"__ck$i") === resolve(outer, on) }.reduce(_ && _)
    val isCount = aggItem match {
      case AggregateItem("count", _, _) => true
      case _ => false
    }
    val sqVal = if (isCount) coalesce(col("__sq"), lit(0L)) else col("__sq")
    outer.join(grouped, cond, if (isCount) "left" else "inner")
      .where(cmp(resolve(outer, outerCol), op, sqVal))
      .drop("__sq")
      .drop(pairs.indices.map(i => s"__ck$i"): _*)
  }

  private def cmp(c: Column, op: String, v: Column): Column = op match {
    // conscious divergence (SURVEY §7.4.3): the reference compares floats
    // with |a−b| < f64::EPSILON (filter/matching.rs:64) — a ±1-ulp
    // tolerance around 1.0-scale values. We use SQL exact equality: it is
    // what every SQL engine (and the DuckDB oracle) does, and the ulp
    // tolerance is unobservable for values that were parsed, not computed.
    case "=" => c === v
    case "!=" | "<>" => c =!= v
    case ">" => c > v
    case ">=" => c >= v
    case "<" => c < v
    case "<=" => c <= v
  }

  // =================== values ===================

  private def vecOf(v: VectorValue): Seq[Float] = v match {
    case VectorValue(Some(lit), _) => lit
    case VectorValue(_, Some(p)) => params.get(p) match {
      case Some(s: Seq[_]) => s.map(x => x.asInstanceOf[Number].floatValue())
      case Some(a: Array[Float]) => a.toSeq
      case other => fail(s"parameter $$$p is not a vector: $other")
    }
    case _ => fail("empty vector value")
  }

  def literal(v: Value): Column = v match {
    case IntValue(x) => lit(x)
    case FloatValue(x) => lit(x)
    case StringValue(x) => lit(x)
    case BoolValue(x) => lit(x)
    case NullValue => lit(null)
    case Parameter(name) => params.get(name) match {
      case Some(x) => lit(x)
      case None => fail(s"unbound parameter $$$name")
    }
    case TemporalValue(t) => timestamp_seconds(lit(epochOf(t)))
    case ColumnRef(n) => resolveName(n)
    case SubqueryValue(sq) =>
      // NATIVE Spark scalar subquery (subquery_optimizer.rs CacheResult
      // strategy): the subquery plan executes inside the outer query —
      // Catalyst evaluates an uncorrelated scalar subquery once and
      // broadcasts the value. The r1 shape collect()ed at compile time.
      org.apache.spark.sql.graft.Bridge.scalarSubquery(compileSelect(sq))
  }

  private def rawLiteral(v: Value): Any = v match {
    case IntValue(x) => x
    case FloatValue(x) => x
    case StringValue(x) => x
    case BoolValue(x) => x
    case NullValue => null
    case Parameter(name) => params.getOrElse(name, fail(s"unbound parameter $$$name"))
    case other => fail(s"unsupported IN value $other")
  }

  /** Evaluate temporal arithmetic to epoch seconds (ast/values.rs:91-163;
    * month = 30 days at values.rs:136-163). */
  private def epochOf(t: Temporal): Long = t match {
    case Now => fixedNowEpoch.getOrElse(System.currentTimeMillis() / 1000)
    case Interval(raw) => intervalSeconds(raw)
    case TemporalArith(l, op, r) =>
      val (a, b) = (epochOf(l), epochOf(r))
      if (op == '+') a + b else a - b
  }

  private def intervalSeconds(raw: String): Long = {
    val m = """(\d+)\s*(\w+)""".r.findFirstMatchIn(raw.trim)
      .getOrElse(fail(s"bad interval '$raw'"))
    val n = m.group(1).toLong
    m.group(2).toLowerCase match {
      case s if s.startsWith("sec") => n
      case s if s.startsWith("min") => n * 60
      case s if s.startsWith("hour") => n * 3600
      case s if s.startsWith("day") => n * 86400
      case s if s.startsWith("week") => n * 604800
      case s if s.startsWith("month") => n * 2592000 // 30 days (values.rs:163)
      case u => fail(s"unknown interval unit $u")
    }
  }

  // =================== MATCH (graph) ===================

  /** Compile a Cypher-subset MATCH to joins over nodes/edges
    * (match_exec.rs:104-218). Fixed-length hops become per-hop joins;
    * var-length hops use the BFS loop. */
  def compileMatch(m0: MatchQuery): DataFrame = {
    // G10 leg-order heuristic (the reference's start-node selection,
    // match_exec.rs start filtering): when the pattern's FIRST node is
    // unconstrained but its LAST carries labels/properties, compile the
    // REVERSED pattern (rel directions flipped) so the traversal fans
    // out from the selective end — semantically identical, and at scale
    // the first join's probe side is the filtered frame, not the whole
    // node table. Skipped for var-length hops (BFS direction is part of
    // min-depth semantics) and named paths (the id array is ordered).
    val m = {
      val p = m0.pattern
      def sel(np: NodePattern) = np.properties.size * 2 + np.labels.size
      val reversible = p.nodes.size > 1 && p.name.isEmpty &&
        p.rels.forall(r => r.minHops == 1 && r.maxHops == 1)
      if (reversible && sel(p.nodes.head) == 0 && sel(p.nodes.last) > 0)
        m0.copy(pattern = GraphPattern(p.nodes.reverse,
          p.rels.reverse.map(r => r.copy(direction = r.direction match {
            case "out" => "in"
            case "in" => "out"
            case other => other
          })), p.name))
      else m0
    }
    val nodes = catalog.graphNodes
    val edges = catalog.graphEdges

    // internal binding columns use `alias__prop` (dots would collide with
    // Spark's nested-field resolution); RETURN restores `alias.prop` names
    def nodeFrame(np: NodePattern, idx: Int): DataFrame = {
      val alias = np.alias.getOrElse(s"_n$idx")
      var df = nodes
      np.labels.foreach(l => df = df.where(array_contains(col("labels"), l)))
      np.properties.foreach { case (k, v) => df = df.where(col(k) === literal(v)) }
      df.select(df.columns.toIndexedSeq.map(c => col(c).as(s"${alias}__$c")): _*)
    }

    val aliases = m.pattern.nodes.zipWithIndex.map { case (np, i) =>
      np.alias.getOrElse(s"_n$i")
    }
    var acc = nodeFrame(m.pattern.nodes.head, 0)
    for (((rel, node), i) <- m.pattern.rels.zip(m.pattern.nodes.tail).zipWithIndex) {
      val fromAlias = aliases(i)
      val toAlias = node.alias.getOrElse(s"_n${i + 1}")
      val nf = nodeFrame(node, i + 1)
      val e0 = if (rel.types.nonEmpty) edges.where(col("label").isin(rel.types: _*)) else edges
      // `[r:TYPE {prop: v}]` — equality filters on edge properties,
      // applied to the edge frame before the join (graph_pattern.rs:86-87)
      val e1 = rel.properties.foldLeft(e0) { case (f, (k, v)) =>
        f.where(col(k) === literal(v))
      }
      if (rel.minHops == 1 && rel.maxHops == 1) {
        // a bound rel alias `[r:…]` carries the edge's property columns
        // into the match frame as r__<prop> (WHERE r.weight > …, RETURN)
        val propCols = rel.alias.toSeq.flatMap { a =>
          e1.columns.filterNot(c => c == "src" || c == "dst").toSeq
            .map(c => col(c).as(s"${a}__$c"))
        }
        val (sCol, dCol) = rel.direction match {
          case "in" => ("dst", "src")
          case _ => ("src", "dst") // undirected treated as outgoing + reverse union
        }
        val e =
          if (rel.direction == "undirected")
            e1.select(col("src").as("s") +: col("dst").as("d") +: propCols: _*)
              .unionAll(e1.select(col("dst").as("s") +: col("src").as("d") +: propCols: _*))
          else e1.select(col(sCol).as("s") +: col(dCol).as("d") +: propCols: _*)
        acc = acc.join(e, col(s"${fromAlias}__id") === col("s"))
          .join(nf, col("d") === col(s"${toAlias}__id"))
          .drop("s", "d")
      } else {
        // var-length: BFS from the current binding of `fromAlias`; a
        // property filter constrains EVERY traversed edge
        val starts = acc.select(col(s"${fromAlias}__id").as("start")).distinct()
        val reach = Graph.bfsVarLength(e1, starts, rel.maxHops, rel.types)
          .where(col("depth") >= rel.minHops)
          .select(col("start"), col("node"))
        acc = acc.join(reach, col(s"${fromAlias}__id") === col("start"))
          .join(nf, col("node") === col(s"${toAlias}__id"))
          .drop("start", "node")
      }
    }

    m.where.foreach { w =>
      acc = acc.where(compileMatchCond(w, acc))
    }

    // `p = (a)-[…]->(b)`: the named path binds to the array of node ids
    // along the pattern's bound nodes (graph_pattern.rs:24-25)
    def pathArray: Column = array(aliases.map(a => col(s"${a}__id")): _*)
    def simColOf(field: String, v: VectorValue): Column =
      VectorFunctions.cosine_sim(mcol(field), VectorFunctions.vecLit(vecOf(v)))

    var out = acc
    if (m.returns.exists(_.expr == ReturnAll)) {
      // keep all bound columns
    } else {
      val cols = m.returns.map { r =>
        r.expr match {
          case ReturnProperty(a, p) => col(s"${a}__$p").as(r.as.getOrElse(s"$a.$p"))
          case ReturnAlias(a) if m.pattern.name.contains(a) =>
            pathArray.as(r.as.getOrElse(a))
          case ReturnAlias(a) => col(s"${a}__id").as(r.as.getOrElse(a))
          // RETURN similarity(alias.field, $v) (match_exec.rs:61-81)
          case ReturnSimilarityOf(f, v) =>
            simColOf(f, v).as(r.as.getOrElse("similarity"))
          // bare similarity(): the score of the WHERE clause's similarity
          case ReturnSimilarity => m.where.flatMap(lastSimilarity) match {
            case Some(SimilarityCond(f, v, _, _)) =>
              simColOf(f, v).as(r.as.getOrElse("similarity"))
            case None =>
              fail("similarity() RETURN requires similarity(field, $v) or a similarity() in WHERE")
          }
          case ReturnAll => col("*")
        }
      }
      out = out.select(cols: _*)
    }
    m.orderBy.foreach { o => out = out.orderBy(orderCol(o, CollectionMeta())) }
    m.limit.foreach(l => out = out.limit(l))
    out
  }

  /** MATCH WHERE over `alias.property` columns (match_exec.rs:340-399). */
  private def compileMatchCond(c: Condition, df: DataFrame): Column = c match {
    // a ColumnRef VALUE is another alias's bound property — it needs
    // the same alias__prop rewrite as the left side (a bare
    // resolveName produced an unresolvable `b.age` against the joined
    // frame's `b__age`; r15 review finding)
    case Compare(column, op, ColumnRef(ref)) => cmp(mcol(column), op, mcol(ref))
    case Compare(column, op, v) => cmp(mcol(column), op, literal(v))
    case In(column, vs) => mcol(column).isin(vs.map(rawLiteral): _*)
    case Between(column, lo, hi) => mcol(column).between(literal(lo), literal(hi))
    case Like(column, p, ci) => if (ci) mcol(column).ilike(p) else mcol(column).like(p)
    case IsNull(column, neg) => if (neg) mcol(column).isNotNull else mcol(column).isNull
    case And(l, r) => compileMatchCond(l, df) && compileMatchCond(r, df)
    case Or(l, r) => compileMatchCond(l, df) || compileMatchCond(r, df)
    case Not(i) => !compileMatchCond(i, df)
    case SimilarityCond(field, v, op, t) =>
      // similarity(alias.embedding, $v) on node payloads
      // (match_exec.rs:340-399); cosine — higher is better, no inversion
      val score = VectorFunctions.cosine_sim(mcol(field),
        VectorFunctions.vecLit(vecOf(v)))
      cmp(score, op, lit(t))
    case other => fail(s"unsupported MATCH condition $other")
  }

  private def mcol(name: String): Column = col(name.replace(".", "__"))

  // =================== util ===================

  /** Resolve a possibly alias-qualified column path against `df`,
    * including `items[0].sku`-style array indices (json_path.rs:36-61,
    * 0-based like the reference). */
  private def resolve(df: DataFrame, name: String): Column = resolveName(name)

  private val segRx = """([^\[\]]+)(?:\[(\d+)\])?""".r
  private def resolveName(name: String): Column =
    if (!name.contains("[")) col(name)
    else {
      // everything up to (and including) the first indexed segment's
      // NAME resolves as one dotted reference — Spark's own resolution
      // handles frame qualifiers (o.items) and struct fields alike.
      // Hand-folding from col(firstSegment) broke alias-qualified
      // indexed paths: col("o") is a frame alias, not a column
      // (r15 review finding).
      val segs = name.split("\\.").toSeq
      val firstIdx = segs.indexWhere(_.contains("["))
      val m0 = segRx.findFirstMatchIn(segs(firstIdx))
        .getOrElse(fail(s"bad path segment '${segs(firstIdx)}' in $name"))
      val base0 = col((segs.take(firstIdx) :+ m0.group(1)).mkString("."))
      val indexed = Option(m0.group(2)).map(i => base0.getItem(i.toInt)).getOrElse(base0)
      segs.drop(firstIdx + 1).foldLeft(indexed) { (acc, seg) =>
        val m = segRx.findFirstMatchIn(seg)
          .getOrElse(fail(s"bad path segment '$seg' in $name"))
        val base = acc.getField(m.group(1))
        Option(m.group(2)).map(i => base.getItem(i.toInt)).getOrElse(base)
      }
    }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"VelesQL: $msg")
}
