package graft.operators

import graft.functions.{VectorFunctions, VectorKernels}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the second scale path beside LSH
  * (SURVEY.md §2.3 V1 "batch-built HNSW/IVF partitions", §7.1 step 8).
  *
  * Shape: k-means-lite centroids (deterministic seeding, fixed Lloyd
  * iterations, all distributed aggregations) partition the vector space;
  * every vector is assigned to its nearest centroid (`cell` column).
  * Search scores the query against the tiny centroid table on the driver,
  * probes the `nprobe` nearest cells — partition pruning when the index
  * is written `partitionBy("cell")` — and exact-reranks candidates.
  * `nprobe` is the recall/latency knob (the reference's ef analogue).
  */
object Ivf {

  /** Deterministic k-means: seeds = hash-spread sample, `iters` Lloyd
    * rounds, each an aggregation over the data (no driver loops over
    * rows — only centroids, which are k×dim small). */
  def trainCentroids(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 5): Array[(Int, Array[Float])] = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    // deterministic seed pick: k rows with the smallest xxhash of the vector
    var centroids: Array[(Int, Array[Float])] = df
      .select(col(vecCol), xxhash64(col(vecCol).cast("string")).as("h"))
      .orderBy(col("h")).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).toArray) }
    for (_ <- 1 to iters) {
      val bc = df.sparkSession.sparkContext.broadcast(centroids)
      val assignExpr = udfAssign(bc.value)
      // per-dimension means as ONE partial+final aggregation producing a
      // single row per cell — the driver receives k rows, not k×dim (the
      // r1 posexplode shape). For dims beyond ~1k, swap the dim avg
      // columns for a TypedImperativeAggregate over float arrays.
      val meanCols = (0 until dim).map(i =>
        avg(element_at(col(vecCol), i + 1)).as(s"m$i"))
      val means = df
        .withColumn("cell", assignExpr(col(vecCol)))
        .groupBy("cell").agg(meanCols.head, meanCols.tail: _*)
        .collect()
      val byCell = means.map(r => r.getInt(0) -> r).toMap
      centroids = centroids.map { case (c, old) =>
        byCell.get(c) match {
          case Some(r) => (c, Array.tabulate(dim)(i => r.getDouble(i + 1).toFloat))
          case None => (c, old) // empty cell keeps its centroid
        }
      }
    }
    centroids
  }

  /** Nearest-centroid assignment as a UDF over the broadcast centroid
    * set (k is small — tens to thousands; the loop is per-row O(k·dim),
    * same cost shape as FAISS IVF assignment). */
  private def udfAssign(cs: Array[(Int, Array[Float])]) =
    udf { (v: Seq[Float]) =>
      val a = v.toArray
      var best = -1
      var bestD = Double.MaxValue
      cs.foreach { case (c, cen) =>
        val d = VectorKernels.l2Squared(a, cen)
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }

  /** Index = data + `cell` column (persist `partitionBy("cell")` so
    * probing prunes partitions). */
  def buildIndex(df: DataFrame, vecCol: String,
      centroids: Array[(Int, Array[Float])]): DataFrame =
    df.withColumn("cell", udfAssign(centroids)(col(vecCol)))

  /** ANN top-k: probe the `nprobe` nearest cells, exact-rerank inside. */
  def search(index: DataFrame, vecCol: String, query: Seq[Float], k: Int,
      centroids: Array[(Int, Array[Float])], nprobe: Int,
      metric: String = "cosine", idCol: String = "id"): DataFrame = {
    val q = query.toArray
    val cells = centroids
      .map { case (c, cen) => (c, VectorKernels.l2Squared(q, cen)) }
      .sortBy { case (c, d) => (d, c) }
      .take(nprobe).map(_._1)
    val cands = index.where(col("cell").isin(cells.toIndexedSeq: _*))
    Knn.topK(cands, vecCol, query, k, metric, idCol)
  }
}
