package graft.operators

import graft.functions.VectorKernels
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
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
  *
  * Training + assignment happen at INDEX BUILD time ([[materializedIndex]]
  * — the reference builds its index at insert, index/hnsw/native_index
  * .rs:317), never inside a query: queries are probe + rerank only.
  */
object Ivf {

  /** Deterministic k-means: seeds = hash-spread sample, `iters` Lloyd
    * rounds, each ONE distributed aggregation over the data (no driver
    * loops over rows — only centroids, which are k×dim small). */
  def trainCentroids(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 5): Array[(Int, Array[Float])] = {
    // deterministic seed pick: k rows with the smallest xxhash of the vector
    // rows without a vector are unsearchable by vector and excluded
    // from the model and the index alike (the exact path scores them
    // null); an unfiltered null previously NPEd the whole build
    val dfv = df.where(col(vecCol).isNotNull)
    var centroids: Array[(Int, Array[Float])] = dfv
      .select(col(vecCol), xxhash64(col(vecCol).cast("string")).as("h"))
      .orderBy(col("h")).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).toArray) }
    for (_ <- 1 to iters) {
      // centroids ride the udf closure (k×dim-small, serialized once
      // per stage); the old sparkContext.broadcast was dereferenced on
      // the DRIVER (bc.value into the closure), so it shipped the raw
      // array anyway and leaked one undestroyed broadcast per round
      val means = cellMeans(
        dfv.withColumn("cell", udfAssign(centroids)(col(vecCol))), vecCol)
      centroids = centroids.map { case (c, old) =>
        (c, means.getOrElse(c, old)) // empty cell keeps its centroid
      }
    }
    centroids
  }

  /** Per-cell element-wise mean as ONE typed aggregation column — a
    * single (sums, count) buffer per group regardless of dimension. The
    * r2 shape emitted one `avg` column per dimension, which at 768d was
    * a 768-column aggregate plan. Partial aggregation still applies
    * (ObjectHashAggregate merges buffers map-side). */
  private def cellMeans(dfWithCell: DataFrame, vecCol: String): Map[Int, Array[Float]] = {
    val ss = dfWithCell.sparkSession
    import ss.implicits._
    val vecAvg = new Aggregator[(Int, Array[Double]), (Array[Double], Long), Array[Double]] {
      def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
      def reduce(b: (Array[Double], Long), a: (Int, Array[Double])): (Array[Double], Long) = {
        val v = a._2
        val s = if (b._1.isEmpty) new Array[Double](v.length) else b._1
        var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
        (s, b._2 + 1)
      }
      def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
        if (x._1.isEmpty) y
        else if (y._1.isEmpty) x
        else {
          var i = 0
          while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
          (x._1, x._2 + y._2)
        }
      def finish(b: (Array[Double], Long)): Array[Double] =
        if (b._2 == 0) Array.empty[Double] else b._1.map(_ / b._2)
      def bufferEncoder: Encoder[(Array[Double], Long)] = implicitly
      def outputEncoder: Encoder[Array[Double]] = implicitly
    }
    dfWithCell
      .select(col("cell"), col(vecCol).cast("array<double>").as("v"))
      .as[(Int, Array[Double])]
      .groupByKey(_._1)
      .agg(vecAvg.toColumn.name("mean"))
      .collect()
      .collect { case (c, m) if m.nonEmpty => c -> m.map(_.toFloat) }
      .toMap
  }

  /** Nearest-centroid cell for ONE vector — the single assignment rule,
    * shared by the build-time UDF and the residual encoders ([[Pq]]):
    * residual codes only decode correctly against the centroid their
    * row was assigned to, so assignment and encoding must never
    * diverge. */
  private[operators] def assignCell(cs: Array[(Int, Array[Float])],
      a: Array[Float]): Int = {
    var best = -1
    var bestD = Double.MaxValue
    cs.foreach { case (c, cen) =>
      val d = VectorKernels.l2Squared(a, cen)
      if (d < bestD) { bestD = d; best = c }
    }
    best
  }

  /** Nearest-centroid assignment as a UDF over the broadcast centroid
    * set (k is small — tens to thousands; the loop is per-row O(k·dim),
    * same cost shape as FAISS IVF assignment). */
  private[operators] def udfAssign(cs: Array[(Int, Array[Float])]) =
    udf { (v: Seq[Float]) => assignCell(cs, v.toArray) }

  /** Index = data + `cell` column (persist `partitionBy("cell")` so
    * probing prunes partitions). */
  def buildIndex(df: DataFrame, vecCol: String,
      centroids: Array[(Int, Array[Float])]): DataFrame =
    // vector-less rows are unsearchable by vector and excluded from the
    // index (exact-path parity: kernels score them null); unfiltered
    // nulls NPEd the assignment udf (r15 review finding)
    df.where(col(vecCol).isNotNull)
      .withColumn("cell", udfAssign(centroids)(col(vecCol)))

  /** The IVF index for a dataset-dir table, materialized ONCE per
    * dataset (keyed on the source parquet's file listing, like the BM25
    * postings and dedup shingle tables): a tiny `(cell, centroid)`
    * table plus the cell-clustered assignment table. Queries collect the
    * centroid table (k rows) and go straight to probe + rerank — no
    * per-query Lloyd rounds. At cluster scale the cells table is the
    * partitionBy("cell") parquet layout ([[buildIndex]] scaladoc). */
  def materializedIndex(spark: SparkSession, dir: String, table: String,
      vecCol: String, k: Int,
      iters: Int = 2): (Array[(Int, Array[Float])], DataFrame) =
    materializedIndexAt(spark, dir,
      Seq(java.nio.file.Paths.get(s"$dir/$table.parquet")), table,
      graft.Tables.table(spark, dir, table), vecCol, k, iters)

  /** Path-stamped variant (user collections: stamp = the current points
    * generation, so a publish rebuilds on next query). `name` (the
    * table/collection) is part of the cache kind — two vector tables in
    * one dir must never share a key prefix, or generation pruning would
    * delete one table's live index when the other rebuilds.
    *
    * `modelSources` (when set) stamps the TRAINED centroids instead of
    * `sources` — user collections pass their index-epoch sidecar, so
    * the model FREEZES across publishes (centroids are corpus
    * statistics, stable under small batches) and only re-trains when
    * [[graft.Collections.retrainIndexes]] bumps the epoch. `pieces`
    * (bucketed layouts) then re-encodes ONLY touched buckets against
    * the frozen model: each piece's cell assignment caches per
    * (bucket dir, model stamp) — O(touched buckets) index upkeep per
    * publish, the r11 VERDICT's remaining ingest scale-killer. */
  /** The coarse quantizer ALONE — trained/collected/memoized per model
    * stamp, WITHOUT touching the cell-assignment table. Consumers that
    * only route on centroids (residual PQ's encode + ADC constants,
    * [[IvfPq]]) must not pay a corpus-sized full-width cells build as a
    * side effect (r17 review finding: plain `quantization='pq'` wrote a
    * complete corpus copy it never read). Collected table is k×dim-small
    * — the in-memory quantizer cache every ANN engine keeps. */
  def materializedCentroidsAt(spark: SparkSession, token: String,
      sources: Seq[java.nio.file.Path], name: String, base: => DataFrame,
      vecCol: String, k: Int,
      iters: Int = 2,
      modelSources: Option[Seq[java.nio.file.Path]] = None)
      : Array[(Int, Array[Float])] = {
    import spark.implicits._
    val modelSrc = modelSources.getOrElse(sources)
    graft.Materialize.memo(
        s"ivf${k}_centroids_$name", token, modelSrc) {
      graft.Materialize.atPaths(spark, token,
        s"ivf${k}_centroids_$name", modelSrc, None) {
        trainCentroids(base, vecCol, k, iters)
          .toSeq.map { case (c, cen) => (c, cen.toSeq) }.toDF("cell", "centroid")
      }.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
    }
  }

  def materializedIndexAt(spark: SparkSession, token: String,
      sources: Seq[java.nio.file.Path], name: String, base: => DataFrame,
      vecCol: String, k: Int,
      iters: Int = 2,
      modelSources: Option[Seq[java.nio.file.Path]] = None,
      pieces: Option[(Seq[(Int, java.nio.file.Path)],
        org.apache.spark.sql.types.StructType)] = None)
      : (Array[(Int, Array[Float])], DataFrame) = {
    val centroids = materializedCentroidsAt(spark, token, sources, name,
      base, vecCol, k, iters, modelSources)
    val modelSrc = modelSources.getOrElse(sources)
    val cells = pieces match {
      case Some((ps, schema)) =>
        graft.Materialize.pieces(spark, token,
          b => s"ivf${k}_cells_p${b}_$name", ps, schema, modelSrc,
          Some("cell"))(buildIndex(_, vecCol, centroids))
      case None =>
        // modelSrc in the key: a retrain must invalidate the assignment
        // table too, or frozen-then-retrained centroids get probed
        // against rows assigned under the OLD model (r15 review finding;
        // the pieces branch already carries modelSrc)
        graft.Materialize.atPaths(spark, token, s"ivf${k}_cells_$name",
          (sources ++ modelSrc).distinct, Some("cell")) {
          buildIndex(base, vecCol, centroids)
        }
    }
    (centroids, cells)
  }

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
