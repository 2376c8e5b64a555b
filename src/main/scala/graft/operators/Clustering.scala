package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Embedding-space clustering for the semantic tier of a training-data
  * pipeline: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) and
  * prototype-distance data pruning (Sorscher et al. 2022,
  * arXiv:2206.14486) both cluster first and then work INSIDE clusters,
  * so the quadratic pair term is bounded by Σ|cluster|², never corpus².
  *
  * Reference scope: velesdb ships vector search, not clustering — this
  * module is the beyond-reference pipeline tier the build brief names
  * (embedding near-dup at 100 TB needs a partitioner; k-means IS that
  * partitioner).
  *
  * Engine-portability discipline (what makes the q161-q163 oracle pins
  * hash-exact vs DuckDB): seeds are the k smallest-id vectors taken
  * verbatim (float→double is exact), every centroid update rounds each
  * coordinate with floor(x·1e6 + 0.5)/1e6 — the same IEEE double ops in
  * any engine — and assignment minimizes the ROUNDED distance key
  * floor(L2·1e6 + 0.5) with the centroid id as tie-break. Rounding at
  * both places means a cross-engine difference in the last bits of a
  * float sum cannot flip a label unless the true value sits within
  * ~1e-12 of a 0.5e-6 grid boundary.
  */
object Clustering {

  /** floor(x·1e6 + 0.5)/1e6 — the repo's cross-engine 6-dp rounding
    * (same IEEE ops in Spark, Scala and DuckDB; see TextQueries.r6). */
  private def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Centroids as (cid, coordinates); cids survive empty-cluster death
    * (standard Lloyd's degeneracy — the id keeps its value, the slot is
    * not renumbered, mirroring what a grouped update naturally yields). */
  type Centroids = Seq[(Int, IndexedSeq[Double])]

  /** Deterministic seeds: the k smallest-`idCol` vectors, cid = rank. */
  private def seed(df: DataFrame, vecCol: String, idCol: String,
      k: Int): Centroids =
    df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast(ArrayType(DoubleType))).collect()
      .zipWithIndex
      .map { case (r, j) => (j, r.getSeq[Double](0).toIndexedSeq) }
      .toSeq

  /** The per-row argmin struct: (rounded L2 sort key, cid). Map-only —
    * centroids ride into the plan as broadcast literals; the in-order
    * zip_with/aggregate fold reproduces the same left-associated double
    * sum as any engine's loop, and sqrt is IEEE-exact. */
  /** Per-centroid candidate structs (rounded L2 key, cid, raw d) — the
    * ONE kernel both the argmin assignment and the silhouette use (two
    * hand-maintained copies invited silent label drift between predict
    * and silhouette; r15 review finding). `d` rides third, so the
    * lexicographic struct compare never reaches it (cid is unique). */
  private def candStructs(vecCol: String, centroids: Centroids): Seq[Column] = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    centroids.map { case (cid, c) =>
      // codegen'd double-L2 kernel — same left-to-right IEEE fold as the
      // zip_with/aggregate HOF chain it replaces (k×dim interpreted
      // lambdas per row), so assignments are bit-identical
      val d = graft.functions.VectorFunctions.l2_dist_d(
        v, graft.functions.VectorFunctions.vecLitD(c))
      struct(floor(d * lit(1000000L) + lit(0.5)).as("rd"),
        lit(cid).as("cid"), d.as("d"))
    }
  }

  private def nearestStruct(vecCol: String, centroids: Centroids): Column =
    array_min(array(candStructs(vecCol, centroids): _*))

  /** Lloyd's iterations: `iters - 1` assign→update rounds, returning
    * the final centroids (the ones the `iters`-th assignment uses).
    * Public as the model-fitting half of the API: fit once on a corpus
    * sample, then [[predict]] any frame (including a stream — the
    * assignment is a stateless map) against the returned model.
    *
    * Scale shape (the MLlib KMeans layout): driver state is k×dim
    * centroid doubles — the only data that ever leaves the executors —
    * assignment is a map-only pass against broadcast-literal centroids,
    * and each update is ONE partially-aggregated shuffle whose reduce
    * side is k×dim cells regardless of corpus size. */
  def fit(df0: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int): Centroids = {
    require(k >= 1 && iters >= 1, "k-means needs k >= 1 and iters >= 1")
    // rows without a vector are outside the embedding-space tier — a
    // null previously rode the argmin into cluster 0 with a NULL sort
    // key (r15 review finding)
    val df = df0.where(col(vecCol).isNotNull)
    var centroids = seed(df, vecCol, idCol, k)
    for (_ <- 1 until iters) {
      val upd = df
        .withColumn("cid", nearestStruct(vecCol, centroids).getField("cid"))
        .select(col("cid"),
          posexplode(col(vecCol).cast(ArrayType(DoubleType))).as(Seq("p", "v")))
        .groupBy("cid", "p").agg(avg(col("v")).as("m"))
        .collect()
      centroids = upd.groupBy(_.getInt(0)).toSeq.map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(r => r6d(r.getDouble(2))).toIndexedSeq)
      }.sortBy(_._1)
    }
    centroids
  }

  /** Nearest-centroid assignment of ANY frame against a fitted model —
    * kmeans.predict. Map-only (no shuffle, no state), so it composes
    * with batch and Structured Streaming sources alike. Appends `cid`
    * to the input columns. */
  def predict(df: DataFrame, vecCol: String, centroids: Centroids): DataFrame =
    // vector-less rows pass through with a NULL cid (they have no
    // position in embedding space), never a fabricated cluster 0
    df.withColumn("cid", when(col(vecCol).isNotNull,
      nearestStruct(vecCol, centroids).getField("cid")))

  /** Fixed-iteration deterministic k-means: returns `(idCol, cid)` for
    * every row. See the object scaladoc for the portability contract
    * and [[fit]] for the 100 TB shape. */
  def kmeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, model: Option[Centroids] = None): DataFrame = {
    val centroids = model.getOrElse(fit(df, vecCol, idCol, k, iters))
    predict(df, vecCol, centroids).select(col(idCol), col("cid"))
  }

  /** SemDeDup (Abbas et al. 2023): k-means partition, then inside each
    * cluster drop every row whose cosine similarity to a smaller-id row
    * of the same cluster reaches `threshold` (the kept row is the
    * smallest id of its semantic group — deterministic, no RNG).
    * Returns `(idCol, cid, keep)` for every input row.
    *
    * Scale: the pairwise term is Σ|cluster|² — k is the knob that
    * trades cluster size against centroid count; at 100 TB raise k so
    * clusters stay join-able (the paper runs k in the tens of
    * thousands) and the cid shuffle partitions the whole job. */
  def semDedup(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, threshold: Double,
      model: Option[Centroids] = None): DataFrame = {
    val centroids = model.getOrElse(fit(df, vecCol, idCol, k, iters))
    // NOT cached/checkpointed although three branches read it: asg is
    // corpus-sized × dim, so materializing it costs more at scale than
    // re-running the map-only assignment per branch (the joins, not the
    // map, dominate) — adjudicated r15 review
    val asg = df.where(col(vecCol).isNotNull)
      .withColumn("cid", nearestStruct(vecCol, centroids).getField("cid"))
      .select(col(idCol), col("cid"), col(vecCol))
    val a = asg.select(col(idCol).as("a"), col("cid"), col(vecCol).as("va"))
    val b = asg.select(col(idCol).as("b"), col("cid"), col(vecCol).as("vb"))
    val dup = a.join(b, Seq("cid")).where(col("a") < col("b"))
      .where(graft.functions.VectorFunctions
        .cosine_sim(col("va"), col("vb")) >= threshold)
      .select(col("b").as(idCol)).distinct()
      .withColumn("__dup", lit(true))
    asg.join(dup, Seq(idCol), "left")
      .select(col(idCol), col("cid"),
        coalesce(col("__dup"), lit(false)).unary_!.as("keep"))
  }

  /** Simplified silhouette (centroid-based — the O(n·k) variant every
    * large-scale eval uses instead of the O(n²) pairwise original):
    * per point, a = distance to its OWN centroid, b = the nearest OTHER
    * centroid's distance, s = (b − a) / max(a, b) (0 when both are 0).
    * Returns per-cluster `(cid, n, silhouette)` — the fit-quality
    * report that closes the fit → evaluate → prune loop; near-zero or
    * negative cluster means its members sit closer to a neighbor.
    *
    * Scale shape: map-only against broadcast-literal centroids (same
    * as [[predict]]) plus ONE k-group aggregation — no shuffle of
    * anything data-sized. Output rounds to 6 dp for the cross-engine
    * pin; the per-point math is raw doubles. */
  def silhouetteByCluster(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, model: Option[Centroids] = None): DataFrame = {
    require(k >= 2, "silhouette needs k >= 2 (b is over OTHER clusters)")
    val centroids = model.getOrElse(fit(df, vecCol, idCol, k, iters))
    // the LIVE model must carry >= 2 centroids too: seeds can collide
    // and clusters die in the update, and a 1-centroid model makes b a
    // silent NULL instead of an error (r15 review finding)
    require(centroids.size >= 2,
      s"silhouette needs >= 2 live centroids, model has ${centroids.size}")
    val arr = array(candStructs(vecCol, centroids): _*)
    // same (rounded key, cid) argmin as [[predict]] — labels agree
    val assigned = array_min(arr)
    val a = assigned.getField("d")
    val acid = assigned.getField("cid")
    val b = array_min(transform(
      filter(arr, s => s.getField("cid") =!= acid), s => s.getField("d")))
    val sil = when(greatest(a, b) > lit(0.0),
      (b - a) / greatest(a, b)).otherwise(lit(0.0))
    df.where(col(vecCol).isNotNull).select(acid.as("cid"), sil.as("__s"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n"),
        (floor(avg(col("__s")) * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
          .as("silhouette"))
  }

  /** Prototype-distance pruning (Sorscher et al. 2022): rank each row
    * inside its cluster by rounded distance to its OWN centroid (id
    * tie-break; rank 1 = most prototypical) and keep the nearest
    * `keepFraction` of every cluster. Returns
    * `(idCol, cid, rank, kept)`. One window shuffle on cid; the
    * rank/count comparison `rank/n <= keepFraction` is the same IEEE
    * division in any engine, so the kept set is reproducible. */
  def prototypicalityPrune(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, keepFraction: Double,
      model: Option[Centroids] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = model.getOrElse(fit(df, vecCol, idCol, k, iters))
    val near = nearestStruct(vecCol, centroids)
    // null-vector rows ranked FIRST (null __rd sorts ahead) and crowded
    // real rows out of the kept fraction (r15 review finding)
    val asg = df.where(col(vecCol).isNotNull).withColumn("__n", near)
      .select(col(idCol), col("__n.cid").as("cid"), col("__n.rd").as("__rd"))
    val w = Window.partitionBy("cid").orderBy(col("__rd"), col(idCol))
    val wc = Window.partitionBy("cid")
    asg
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .select(col(idCol), col("cid"), col("rank"),
        (col("rank").cast("double") / col("__cnt") <= keepFraction).as("kept"))
  }
}
