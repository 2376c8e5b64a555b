package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — beyond-reference scale path for
  * similarity search (the reference's StorageMode stops at SQ8/Binary,
  * quantization.rs:20-29; PQ is the classic third tier: FAISS-style
  * m-subspace codebooks).
  *
  * Shape: the vector is split into `m` subvectors; each subspace gets a
  * `k`-centroid codebook (deterministic k-means, reusing [[Ivf]]'s
  * trainer on sliced frames); a vector is stored as `m` small codes
  * (8 ints vs 64+ floats — the codes table is the ONLY thing the
  * phase-1 scan reads). At query time the driver computes tiny m×k
  * lookup tables against the query once, and the asymmetric-distance
  * (ADC) ordering is pure codegen array lookups — no per-row float
  * math. Top k×oversampling candidate ids join back to the base table
  * for exact rerank, same two-phase contract as the binary-sketch path
  * (SURVEY §2.3 V11).
  *
  * Training + encoding happen at INDEX BUILD time ([[materializedIndex]],
  * once per dataset, content-stamped like the IVF/LSH/BM25 tables);
  * queries never train.
  */
object Pq {

  /** Dimension-adaptive subspace count: ~16 dims per subspace (the
    * classic PQ operating band), floor 8 subspaces, snapped down to a
    * divisor of dim. At 64D this is the historical m=8 (8-dim
    * subvectors — every committed calibration and oracle pin
    * unchanged); at 768D it is 48. The old FIXED m=8 left 96-dim
    * subspaces at 768D, which quantize to noise: recall@10 = 0.02 on
    * the 100K×768D tile (r16 RecallCurve) vs ≥0.95 after adaptation.
    * `graft.pq.m` still overrides. */
  def defaultM(dim: Int): Int = {
    val target = math.max(8, dim / 16)
    (target to 1 by -1).find(dim % _ == 0).getOrElse(1)
  }

  /** Per-subspace codebooks: `m` × `k` centroids of `dim/m` floats.
    * Each subspace trains with [[Ivf.trainCentroids]] over the SLICED
    * frame — deterministic seeding, distributed Lloyd rounds. */
  def train(df: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
      iters: Int = 2): Array[Array[Array[Float]]] = {
    require(dim % m == 0, s"PQ: dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    Array.tabulate(m) { i =>
      val sliced = df.select(slice(col(vecCol), i * sub + 1, sub).as("sub"))
      Ivf.trainCentroids(sliced, "sub", k, iters)
        .sortBy(_._1).map(_._2)
    }
  }

  /** Nearest-centroid code per subspace (build-time UDF over the
    * broadcast codebooks — same cost shape as [[Ivf]] assignment). */
  private[operators] def udfEncode(cb: Array[Array[Array[Float]]]) =
    udf { (v: Seq[Float]) =>
      val a = v.toArray
      val m = cb.length
      val sub = a.length / m
      Array.tabulate(m) { i =>
        var best = 0
        var bd = Double.MaxValue
        var j = 0
        while (j < cb(i).length) {
          var d = 0.0
          var t = 0
          while (t < sub) {
            val diff = a(i * sub + t) - cb(i)(j)(t); d += diff * diff; t += 1
          }
          if (d < bd) { bd = d; best = j }
          j += 1
        }
        best
      }
    }

  /** The PQ index for a dataset-dir table, materialized once per
    * dataset: a tiny codebook table (m×k rows) + the NARROW codes table
    * `(id, codes)` — deliberately without payload/vector columns, so the
    * phase-1 ADC scan reads ~8× less than the base table. */
  def materializedIndex(spark: SparkSession, dir: String, table: String,
      vecCol: String, idCol: String, dim: Int, m: Int, k: Int)
      : (Array[Array[Array[Float]]], DataFrame) =
    materializedIndexAt(spark, dir,
      Seq(java.nio.file.Paths.get(s"$dir/$table.parquet")), table,
      graft.Tables.table(spark, dir, table), vecCol, idCol, dim, m, k)

  /** Path-stamped variant (user collections: stamp = the current points
    * generation, so a publish rebuilds on next query). `name` is part of
    * the cache kind — see [[Ivf.materializedIndexAt]]'s pruning note.
    * `modelSources`/`pieces` follow the same epoch-freeze contract as
    * [[Ivf.materializedIndexAt]]: codebooks frozen per epoch, per-bucket
    * incremental code encoding against the frozen model. */
  def materializedIndexAt(spark: SparkSession, token: String,
      sources: Seq[java.nio.file.Path], name: String, base: => DataFrame,
      vecCol: String, idCol: String, dim: Int, m: Int, k: Int,
      modelSources: Option[Seq[java.nio.file.Path]] = None,
      pieces: Option[(Seq[(Int, java.nio.file.Path)],
        org.apache.spark.sql.types.StructType)] = None)
      : (Array[Array[Array[Float]]], DataFrame) = {
    import spark.implicits._
    val modelSrc = modelSources.getOrElse(sources)
    // Collected codebooks are m×k-small; memoized per model stamp so
    // repeat queries skip the read+collect job (see [[Ivf]] centroids).
    val codebooks = graft.Materialize.memo(
        s"pq${m}x${k}_codebooks_$name", token, modelSrc) {
      val rows = graft.Materialize.atPaths(spark, token,
        s"pq${m}x${k}_codebooks_$name", modelSrc, None) {
        train(base, vecCol, dim, m, k)
          .zipWithIndex.flatMap { case (book, i) =>
            book.zipWithIndex.map { case (cen, j) => (i, j, cen.toSeq) }
          }.toSeq.toDF("sub", "code", "centroid")
      }.collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
      Array.tabulate(m)(i => rows.filter(_._1 == i).sortBy(_._2).map(_._3))
    }
    val codes = pieces match {
      case Some((ps, schema)) =>
        graft.Materialize.pieces(spark, token,
          b => s"pq${m}x${k}_codes_p${b}_$name", ps, schema, modelSrc, None)(
          _.where(col(vecCol).isNotNull)
            .select(col(idCol), udfEncode(codebooks)(col(vecCol)).as("codes")))
      case None =>
        // modelSrc in the key (see Ivf): codes encoded against retired
        // codebooks must not be served under fresh ones
        graft.Materialize.atPaths(spark, token,
          s"pq${m}x${k}_codes_$name", (sources ++ modelSrc).distinct, None) {
          base.where(col(vecCol).isNotNull)
            .select(col(idCol), udfEncode(codebooks)(col(vecCol)).as("codes"))
        }
    }
    (codebooks, codes)
  }

  /** Calibration helper ([[graft.RecallProbe]]): id + codes frame from
    * in-memory codebooks, without the Materialize layer. */
  def encodeForProbe(df: DataFrame, vecCol: String, idCol: String,
      codebooks: Array[Array[Array[Float]]]): DataFrame =
    df.select(col(idCol), udfEncode(codebooks)(col(vecCol)).as("codes"))

  /** ADC ordering column over a `codes` column: the driver computes
    * m×k dot/norm tables against the query ONCE; the per-row cost is m
    * array lookups (codegen `transform`/`aggregate`, no UDF). Returns
    * (orderingColumn, ascending). Ordering-only — exact scores come
    * from the rerank phase. */
  def adcOrdering(codesCol: Column, query: Array[Float],
      codebooks: Array[Array[Array[Float]]], metric: String): (Column, Boolean) = {
    val m = codebooks.length
    val k = codebooks(0).length
    val sub = query.length / m
    def dot(a: Array[Float], off: Int, b: Array[Float]): Double = {
      var s = 0.0; var t = 0
      while (t < b.length) { s += a(off + t) * b(t); t += 1 }
      s
    }
    val dotFlat = (for (i <- 0 until m; j <- 0 until k)
      yield dot(query, i * sub, codebooks(i)(j))).toIndexedSeq
    val normFlat = (for (i <- 0 until m; j <- 0 until k)
      yield codebooks(i)(j).map(x => x.toDouble * x).sum).toIndexedSeq
    def lookupSum(flat: Seq[Double]): Column = aggregate(
      transform(sequence(lit(0), lit(m - 1)),
        i => element_at(typedlit(flat), i * k + element_at(codesCol, i + 1) + 1)),
      lit(0.0), (acc, x) => acc + x)
    val adcDot = lookupSum(dotFlat)
    val adcNormSq = lookupSum(normFlat)
    metric match {
      case "dot" => (adcDot, false)
      // "euclidean" is the engine's canonical L2 name
      // (VectorFunctions.metrics); the bare "l2" spelling stays as an
      // alias — matching only "l2" made every euclidean-metric PQ
      // query throw (r15 review finding)
      case "l2" | "euclidean" => (adcNormSq - lit(2.0) * adcDot, true)
      case "cosine" =>
        // |q| is constant for ordering; guard the zero-vector cell
        (when(adcNormSq > 0.0, adcDot / sqrt(adcNormSq)).otherwise(lit(-2.0)),
          false)
      case other =>
        throw new IllegalArgumentException(
          s"PQ supports cosine/l2/dot, not '$other'")
    }
  }
}
