package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Quantized two-phase search (SURVEY.md §2.3 V11).
  *
  * Reference: StorageMode::{Full, SQ8, Binary} (quantization.rs:20-29) —
  * binary = sign-bit packing (quantization.rs:48-58), SQ8 = per-vector
  * min/max u8 (quantization.rs:209-216); dual-precision search = quantized
  * candidate generation + f32 rerank with an oversampling factor
  * (ast/with_clause.rs:112-131).
  *
  * Spark shape: the binary sketch is a packed LongType column (64 dims →
  * one long); phase 1 ranks by Hamming distance on `bit_count(a XOR b)` —
  * pure codegen integer ops, 32× less data than the float vectors — and
  * keeps `k × oversampling` candidates; phase 2 exact-reranks only those.
  * At 100 TB the sketch column is the only thing the phase-1 scan reads
  * (column pruning), so the heavy vector column is touched for candidates
  * only.
  */
object Quantization {

  /** 64-bit words needed for `dim` sign bits. */
  def words(dim: Int): Int = (dim + 63) / 64

  /** Sign-bit sketch column: one packed long for dims ≤ 64, an
    * `array<bigint>` of ⌈dim/64⌉ words above that (reference quantizes
    * any dimension — quantization.rs:48-58; real embeddings are 768+). */
  def withBinarySketch(df: DataFrame, vecCol: String, dim: Int,
      sketchCol: String = "sketch"): DataFrame = {
    def word(w: Int) = {
      val bits = (w * 64 until math.min(dim, w * 64 + 64)).map { i =>
        when(element_at(col(vecCol), i + 1) >= 0.0f, lit(1L << (i % 64)))
          .otherwise(lit(0L))
      }
      bits.reduce(_ + _).cast(LongType)
    }
    if (dim <= 64) df.withColumn(sketchCol, word(0))
    else df.withColumn(sketchCol, array((0 until words(dim)).map(word): _*))
  }

  /** Sketch of a ≤64-dim query vector (single-long packing). */
  def sketchOf(q: Seq[Float]): Long = {
    var s = 0L
    q.zipWithIndex.foreach { case (x, i) => if (x >= 0.0f) s |= (1L << (i % 64)) }
    s
  }

  /** Sketch words of a query vector of any dimension. */
  def sketchWordsOf(q: Seq[Float]): Array[Long] = {
    val ws = new Array[Long](words(q.length))
    q.zipWithIndex.foreach { case (x, i) => if (x >= 0.0f) ws(i / 64) |= (1L << (i % 64)) }
    ws
  }

  /** Hamming distance of the `sketchCol` to `query`'s sketch as `outCol`
    * — `bit_count(xor)` per word, summed; pure codegen integer ops. */
  def hammingToQuery(df: DataFrame, query: Seq[Float],
      sketchCol: String = "sketch", outCol: String = "__ham"): DataFrame =
    if (query.length <= 64)
      df.withColumn(outCol, bit_count(col(sketchCol).bitwiseXOR(lit(sketchOf(query)))))
    else {
      val ham = sketchWordsOf(query).zipWithIndex.map { case (w, i) =>
        bit_count(element_at(col(sketchCol), i + 1).bitwiseXOR(lit(w)))
      }.reduce(_ + _)
      df.withColumn(outCol, ham)
    }

  /** SQ8 scalar quantization (quantization.rs:209-216: per-vector min/max
    * + 256-level codes). Adds `sq8_codes` (int array of 0..255 values —
    * signed tinyint cannot hold 255, so the 4× shrink vs float32 is
    * realized at the STORAGE layer through parquet's bit-packing of the
    * 8-bit value range, not in the in-memory column width), `sq8_min`,
    * `sq8_scale`. */
  def withSq8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("sq8_min", array_min(col(vecCol)).cast("double"))
      .withColumn("sq8_scale",
        when(array_max(col(vecCol)) > array_min(col(vecCol)),
          (array_max(col(vecCol)) - array_min(col(vecCol))).cast("double") / 255.0)
          .otherwise(lit(1.0)))
      .withColumn("sq8_codes", transform(col(vecCol), x =>
        round((x.cast("double") - col("sq8_min")) / col("sq8_scale")).cast("int")))

  /** Dequantized approximate vector from SQ8 codes (for candidate scoring
    * or storage-dropped rerank). */
  def sq8Decode(df: DataFrame, outCol: String = "vec_approx"): DataFrame =
    df.withColumn(outCol, transform(col("sq8_codes"), c =>
      (c.cast("double") * col("sq8_scale") + col("sq8_min")).cast("float")))

  /** Two-phase search: Hamming-on-sketch candidate generation with
    * `oversampling`, then exact rerank under `metric`. Callers apply any
    * metadata filter to `df` BEFORE this (filter-then-search contract —
    * a post-filter could empty the candidate pool). */
  def search(df: DataFrame, vecCol: String, query: Seq[Float], k: Int,
      oversampling: Int = 4, metric: String = "cosine",
      idCol: String = "id", sketchCol: String = "sketch"): DataFrame = {
    val phase1 = hammingToQuery(df, query, sketchCol)
      .orderBy(col("__ham").asc, col(idCol).asc)
      .limit(k * oversampling)
      .drop("__ham")
    Knn.topK(phase1, vecCol, query, k, metric, idCol)
  }
}
