package graft.operators

import graft.functions.VectorKernels
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Partitioned HNSW ANN tier (SURVEY.md §2.3 V8; reference
  * index/hnsw/native_index.rs:230,338 — a single-node navigable
  * small-world pointer graph).
  *
  * The reference's structure can't ship to a cluster as pointers, but
  * its two load-bearing ideas can:
  *
  *  1. PARTITION the space coarsely (reuse the IVF k-means cells — the
  *     same router the `index='ivf'` tier probes), so a query touches
  *     `nprobe` cells' files only (pushed `cell IN (…)` scan pruning);
  *  2. inside each cell, search a NAVIGABLE GRAPH instead of scanning:
  *     each node stores its `m` nearest neighbors (level 0) and a
  *     deterministic ~1/`levelStride` sample of nodes forms level 1
  *     with its own neighbor links (the "hierarchy" — a coarse mesh to
  *     find a good entry point fast). A greedy descent on level 1
  *     followed by a best-first, `ef`-bounded expansion on level 0
  *     evaluates O(ef·m) distances per cell, not O(|cell|).
  *
  * The graph is built batch-side (one distributed pass, per-cell
  * in-task construction) and serialized as a parquet adjacency table
  * clustered by `cell` — the index IS a DataFrame, like the LSH/IVF
  * tiers. Per-query cost: prune to probed cells, one small shuffle to
  * co-locate each cell's adjacency in a task, walk, exact-rerank ≤
  * nprobe·ef survivors. vs IVF at equal recall the scan volume matches
  * (same probed cells) but the SCORED candidate set shrinks from every
  * probed row to the walk's frontier — asserted by HnswSpec.
  *
  * Scale note: a cell's adjacency must fit one task (the same bound the
  * per-cell k-means/PQ training already assumes); size `graft.ivf.cells`
  * so cells stay ~10⁵-10⁶ rows at the target scale. Graph build is
  * O(|cell|²/2) kernel evals per cell — the price of HNSW-quality
  * neighborhoods, paid once per content stamp at build time (the
  * reference pays 52 s for 100K×768 single-node, benchmarks/README.md).
  */
object Hnsw {

  /** Metric name → (kernel, higherIsBetter) — the driver-side twin of
    * [[graft.functions.VectorFunctions.metrics]] (distance.rs:76-81). */
  private def kernelOf(metric: String)
      : ((Array[Float], Array[Float]) => Double, Boolean) = metric match {
    case "cosine" => (VectorKernels.cosine, true)
    case "dot" => (VectorKernels.dot, true)
    case "euclidean" => (VectorKernels.l2, false)
    case "hamming" => (VectorKernels.hamming, false)
    case "jaccard" => (VectorKernels.jaccard, true)
    case other => throw new IllegalArgumentException(s"unknown metric '$other'")
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => throw new IllegalArgumentException(
      s"HNSW needs an integral id column, got ${Option(other).map(_.getClass).orNull}")
  }

  /** Deterministic level-1 membership: ~1/stride of nodes by id hash —
    * no RNG state, same sample on every rebuild. */
  private def isLevel1(id: Long, stride: Int): Boolean = {
    var z = id * 0x9E3779B97F4A7C15L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    ((z ^ (z >>> 27)) & Long.MaxValue) % stride == 0
  }

  /** Build the adjacency frame over an IVF-cell-assigned frame: input
    * columns + `neighbors` (m nearest ids at level 0, made bidirectional
    * by unioning reverse links — ≤ 2m total), `neighbors1` (m nearest
    * among level-1 nodes; empty for level-0 nodes) and `level` (0/1).
    * Each cell's graph is built inside its task — O(|cell|²/2) kernel
    * evals, per-node bounded-size heaps. */
  def buildGraph(cells: DataFrame, vecCol: String, idCol: String,
      metric: String, m: Int = 8, levelStride: Int = 16): DataFrame = {
    val inSchema = cells.schema
    val outSchema = inSchema
      .add("neighbors", ArrayType(LongType, containsNull = false))
      .add("neighbors1", ArrayType(LongType, containsNull = false))
      .add("level", IntegerType)
    val idIdx = inSchema.fieldIndex(idCol)
    val vecIdx = inSchema.fieldIndex(vecCol)
    val cellIdx = inSchema.fieldIndex("cell")
    val (kern, hib) = kernelOf(metric)
    val mm = m
    val stride = levelStride
    cells.repartition(col("cell")).mapPartitions { it =>
      val all = it.toArray
      all.groupBy(_.getInt(cellIdx)).iterator.flatMap { case (_, rows) =>
        val n = rows.length
        val ids = Array.tabulate(n)(i => asLong(rows(i).get(idIdx)))
        val vecs = Array.tabulate(n)(i => rows(i).getSeq[Float](vecIdx).toArray)
        // per-node best-m heaps filled from a half-matrix pass: each
        // pair evaluated once, both endpoints updated
        final class TopM {
          // parallel arrays, linear insert (m is small)
          val nid = new Array[Long](mm)
          val nsc = new Array[Double](mm)
          var size = 0
          def worst: Double = nsc(size - 1)
          def add(id: Long, s: Double): Unit = {
            if (size < mm) { nid(size) = id; nsc(size) = s; size += 1; siftUp(size - 1) }
            else if (better(s, worst) || (s == worst && id < nid(size - 1))) {
              nid(size - 1) = id; nsc(size - 1) = s; siftUp(size - 1)
            }
          }
          private def better(a: Double, b: Double): Boolean = if (hib) a > b else a < b
          private def siftUp(from: Int): Unit = {
            var i = from
            while (i > 0 && (better(nsc(i), nsc(i - 1)) ||
                (nsc(i) == nsc(i - 1) && nid(i) < nid(i - 1)))) {
              val ti = nid(i); val ts = nsc(i)
              nid(i) = nid(i - 1); nsc(i) = nsc(i - 1)
              nid(i - 1) = ti; nsc(i - 1) = ts
              i -= 1
            }
          }
          def result: Seq[Long] = nid.take(size).toSeq
        }
        val l0 = Array.fill(n)(new TopM)
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val s = kern(vecs(i), vecs(j))
            l0(i).add(ids(j), s)
            l0(j).add(ids(i), s)
            j += 1
          }
          i += 1
        }
        // bidirectional links (HNSW's add-then-reverse step): a pure
        // kNN DIgraph need not be navigable — a node nobody points to
        // is unreachable from any entry. Union each node's kNN list
        // with its reverse links, kNN first, capped at 2m.
        val reverse = Array.fill(n)(List.empty[Long])
        val idxOf = scala.collection.mutable.LongMap.empty[Int]
        var ri = 0
        while (ri < n) { idxOf(ids(ri)) = ri; ri += 1 }
        var fi = 0
        while (fi < n) {
          l0(fi).result.foreach { nb =>
            val j = idxOf(nb)
            reverse(j) = ids(fi) :: reverse(j)
          }
          fi += 1
        }
        def undirected(i: Int): Seq[Long] = {
          val fwd = l0(i).result
          val fwdSet = fwd.toSet
          fwd ++ reverse(i).filterNot(fwdSet).distinct.sorted.take(mm)
        }
        val lvl1Idx = (0 until n).filter(i => isLevel1(ids(i), stride))
        val l1 = scala.collection.mutable.LongMap.empty[TopM]
        lvl1Idx.foreach(i => l1(ids(i)) = new TopM)
        var a = 0
        while (a < lvl1Idx.length) {
          var b = a + 1
          while (b < lvl1Idx.length) {
            val (ia, ib) = (lvl1Idx(a), lvl1Idx(b))
            val s = kern(vecs(ia), vecs(ib))
            l1(ids(ia)).add(ids(ib), s)
            l1(ids(ib)).add(ids(ia), s)
            b += 1
          }
          a += 1
        }
        (0 until n).iterator.map { i =>
          val lvl = if (l1.contains(ids(i))) 1 else 0
          val nb1 = if (lvl == 1) l1(ids(i)).result else Seq.empty[Long]
          Row.fromSeq(rows(i).toSeq :+ undirected(i) :+ nb1 :+ lvl)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Walk the probed cells' graphs: per cell, greedy descent on level 1
    * picks the entry, then a best-first `ef`-bounded expansion on level
    * 0 collects the candidate set. Emits each cell's ≤`ef` best rows
    * (rows whose optional `keepCol` is false are NAVIGATED but never
    * EMITTED — filtered-HNSW acceptance, the filter-then-search
    * contract). Output schema = input schema. */
  def walkCandidates(probed: DataFrame, vecCol: String, idCol: String,
      metric: String, query: Seq[Float], ef: Int,
      keepCol: Option[String] = None): DataFrame = {
    val inSchema = probed.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val vecIdx = inSchema.fieldIndex(vecCol)
    val cellIdx = inSchema.fieldIndex("cell")
    val nbIdx = inSchema.fieldIndex("neighbors")
    val nb1Idx = inSchema.fieldIndex("neighbors1")
    val lvlIdx = inSchema.fieldIndex("level")
    val keepIdx = keepCol.map(inSchema.fieldIndex)
    val (kern, hib) = kernelOf(metric)
    val q = query.toArray
    val efN = ef
    val maxVisited = ef * 16 // hard bound on pathological meshes
    probed.repartition(col("cell")).mapPartitions { it =>
      val all = it.toArray
      all.groupBy(_.getInt(cellIdx)).iterator.flatMap { case (_, rows) =>
        val byId = scala.collection.mutable.LongMap.empty[Row]
        rows.foreach(r => byId(asLong(r.get(idIdx))) = r)
        def vecOf(r: Row) = r.getSeq[Float](vecIdx).toArray
        def score(r: Row) = kern(q, vecOf(r))
        def better(a: Double, b: Double) = if (hib) a > b else a < b
        if (rows.isEmpty) Iterator.empty
        else {
          // entry: greedy descent on the level-1 mesh from the smallest
          // level-1 id (deterministic); cells too small to have one
          // start from the smallest id outright
          val lvl1 = rows.filter(_.getInt(lvlIdx) == 1)
          var cur = (if (lvl1.nonEmpty) lvl1 else rows)
            .minBy(r => asLong(r.get(idIdx)))
          var curScore = score(cur)
          var moved = true
          while (moved && lvl1.nonEmpty) {
            moved = false
            cur.getSeq[Long](nb1Idx).foreach { nb =>
              byId.get(nb).foreach { r =>
                val s = score(r)
                if (better(s, curScore)) { cur = r; curScore = s; moved = true }
              }
            }
          }
          // level-0 best-first with an ef-bounded ACCEPTED result set:
          // navigation visits any node (graph connectivity), results
          // admit only rows passing the optional keep predicate
          // (filtered-HNSW acceptance)
          val ordCand = Ordering.by[(Double, Long), (Double, Long)] {
            case (s, id) => (if (hib) s else -s, -id)
          } // dequeue = best (goodness, then smaller id)
          val candidates = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ordCand)
          // results: reversed ordering → head/dequeue = worst accepted
          val results = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ordCand.reverse)
          val visited = scala.collection.mutable.HashSet.empty[Long]
          def accepted(r: Row): Boolean =
            keepIdx.forall(ki => !r.isNullAt(ki) && r.getBoolean(ki))
          def offer(r: Row, s: Double, id: Long): Unit =
            if (accepted(r)) {
              results.enqueue((s, id))
              if (results.size > efN) results.dequeue()
            }
          val entryId = asLong(cur.get(idIdx))
          visited.add(entryId)
          candidates.enqueue((curScore, entryId))
          offer(cur, curScore, entryId)
          var evals = 1
          var done = false
          while (!done && candidates.nonEmpty && evals < maxVisited) {
            val (cs, cid) = candidates.dequeue()
            if (results.size >= efN && better(results.head._1, cs)) done = true
            else byId(cid).getSeq[Long](nbIdx).foreach { nb =>
              if (!visited.contains(nb)) {
                visited.add(nb)
                byId.get(nb).foreach { r =>
                  val s = score(r)
                  evals += 1
                  if (results.size < efN || better(s, results.head._1) ||
                      s == results.head._1) {
                    candidates.enqueue((s, nb))
                    offer(r, s, nb)
                  }
                }
              }
            }
          }
          val keep = results.iterator.map(_._2).toSet
          rows.iterator.filter(r => keep.contains(asLong(r.get(idIdx))))
        }
      }
    }(Encoders.row(inSchema))
  }

  /** The materialized partitioned-HNSW index for a source: the IVF
    * centroid router (shared with the `index='ivf'` tier — same cells,
    * same probe routing) plus the cell-clustered adjacency table. Built
    * once per content stamp; a collection publish re-stamps and the
    * next query rebuilds (the reference's insert-time index update,
    * native_index.rs:317, as build-on-read). */
  def materializedIndexAt(spark: SparkSession, token: String,
      sources: Seq[java.nio.file.Path], name: String, base: => DataFrame,
      vecCol: String, idCol: String, metric: String, kCells: Int,
      m: Int = 8, levelStride: Int = 16)
      : (Array[(Int, Array[Float])], DataFrame) = {
    val (cents, cells) = Ivf.materializedIndexAt(spark, token, sources,
      name, base, vecCol, kCells)
    val graph = graft.Materialize.atPaths(spark, token,
      s"hnsw${m}s${levelStride}_${metric}_$name", sources, Some("cell")) {
      buildGraph(cells, vecCol, idCol, metric, m, levelStride)
    }
    (cents, graph)
  }

  /** Cells nearest the query (same router as [[Ivf.search]]). */
  def probeCells(centroids: Array[(Int, Array[Float])], query: Array[Float],
      nprobe: Int): Seq[Int] =
    centroids.map { case (c, cen) => (c, VectorKernels.l2Squared(query, cen)) }
      .sortBy { case (c, d) => (d, c) }
      .take(nprobe).map(_._1).toSeq

  /** ANN top-k through the graph: probe cells, walk, exact-rerank. */
  def search(graph: DataFrame, centroids: Array[(Int, Array[Float])],
      vecCol: String, query: Seq[Float], k: Int, nprobe: Int, ef: Int,
      metric: String = "cosine", idCol: String = "id"): DataFrame = {
    val cells = probeCells(centroids, query.toArray, nprobe)
    val cand = walkCandidates(
      graph.where(col("cell").isin(cells: _*)),
      vecCol, idCol, metric, query, ef)
      .drop("cell", "neighbors", "neighbors1", "level")
    Knn.topK(cand, vecCol, query, k, metric, idCol)
  }
}
