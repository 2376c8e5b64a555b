package graft.functions

/** Scalar distance kernels over primitive float arrays.
  *
  * Reference semantics: crates/velesdb-core/src/distance.rs:16-81 — five
  * metrics (Cosine | Euclidean | DotProduct | Hamming | Jaccard) with a
  * `higher_is_better` direction flag (true for Cosine/Dot/Jaccard, false
  * for Euclidean/Hamming). The reference dispatches to SIMD; here plain
  * `while` loops over `Array[Float]` JIT-autovectorize inside Spark
  * whole-stage codegen (these are invoked from generated Java — keep them
  * static-forwardable, i.e. a top-level object with no companion class).
  *
  * Accumulation is in Double for cross-engine determinism.
  *
  * Length discipline (r15 review finding): the algebraic metrics
  * (dot/cosine/L2) THROW on dimension mismatch — silent min-length
  * truncation returned plausible-but-wrong scores when a query vector's
  * width disagreed with the stored column. Hamming/Jaccard keep their
  * documented mixed-length semantics (the reference generalizes both to
  * set/positional views where extra positions are meaningful).
  */
object VectorKernels {

  private def requireSameDim(a: Array[Float], b: Array[Float]): Unit =
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.length} vs ${b.length}")

  /** Null-element-checked ArrayData→float[] (the bulk toFloatArray reads
    * a NULL slot as 0.0f on the unsafe path and NPEs on the generic
    * path — both wrong; r15 review finding). Called from generated code:
    * keep static-forwardable. */
  def toFloats(a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Float] = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"vector contains a NULL element at index $i")
      i += 1
    }
    a.toFloatArray()
  }

  def dot(a: Array[Float], b: Array[Float]): Double = {
    requireSameDim(a, b)
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    requireSameDim(a, b)
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      s += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else s / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2(a: Array[Float], b: Array[Float]): Double = {
    requireSameDim(a, b)
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val dd = a(i).toDouble - b(i).toDouble
      s += dd * dd
      i += 1
    }
    math.sqrt(s)
  }

  def l2Squared(a: Array[Float], b: Array[Float]): Double = {
    requireSameDim(a, b)
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val dd = a(i).toDouble - b(i).toDouble
      s += dd * dd
      i += 1
    }
    s
  }

  /** DOUBLE-typed L2 — the k-means / silhouette kernel: bit-identical to
    * the left-to-right `aggregate(zip_with(v, c, _-_), 0.0, acc+d*d)`
    * HOF fold it replaces (same IEEE accumulation order), ~30× cheaper
    * (no per-element lambda dispatch or array allocation). */
  def l2Double(a: Array[Double], b: Array[Double]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val dd = a(i) - b(i)
      s += dd * dd
      i += 1
    }
    math.sqrt(s)
  }

  /** Hamming distance: count of positions whose values differ
    * (distance.rs Hamming over binary vectors generalized to f32 inequality). */
  def hamming(a: Array[Float], b: Array[Float]): Double = {
    var c = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) != b(i)) c += 1; i += 1 }
    c.toDouble + math.abs(a.length - b.length).toDouble
  }

  /** Jaccard similarity over binary-ized vectors: |a∧b| / |a∨b| treating
    * any non-zero component as set membership (distance.rs Jaccard). */
  def jaccard(a: Array[Float], b: Array[Float]): Double = {
    var inter = 0L; var union = 0L
    var i = 0
    val n = math.max(a.length, b.length)
    while (i < n) {
      val x = i < a.length && a(i) != 0.0f
      val y = i < b.length && b(i) != 0.0f
      if (x && y) inter += 1
      if (x || y) union += 1
      i += 1
    }
    if (union == 0L) 1.0 else inter.toDouble / union.toDouble
  }

  // ---- Half-precision storage kernels (reference: half_precision.rs —
  // f16 IEEE 754 binary16 and bf16 with round-to-nearest-even). The
  // Spark shape stores the ROUNDED f32 values (the exact value set a
  // half-precision store holds; scoring stays f32, matching the
  // reference's to_f32_vec() read path). Hand-rolled because
  // Float.floatToFloat16 only exists from Java 20.

  /** f32 → IEEE 754 binary16 bits, round-to-nearest-even (including
    * subnormals; overflow → ±Inf; NaN → canonical half NaN). */
  def floatToHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val x = bits & 0x7FFFFFFF
    if (x >= 0x7F800000) { // Inf / NaN
      (sign | (if (x > 0x7F800000) 0x7E00 else 0x7C00)).toShort
    } else {
      val exp = x >>> 23 // biased f32 exponent
      if (exp >= 113) { // normal half range (unbiased >= -14)
        var mant = x & 0x7FFFFF
        var e = exp
        // round to nearest even on the 13 dropped mantissa bits
        mant += 0xFFF + ((mant >>> 13) & 1)
        if ((mant & 0x800000) != 0) { mant = 0; e += 1 }
        if (e >= 143) (sign | 0x7C00).toShort // rounded past max → Inf
        else (sign | ((e - 112) << 10) | (mant >>> 13)).toShort
      } else { // subnormal half or zero
        val shift = 126 - exp // >= 14
        if (shift > 24) sign.toShort // below half of the smallest subnormal
        else {
          val mant24 = (x & 0x7FFFFF) | 0x800000
          val m = (mant24 + ((1 << (shift - 1)) - 1) +
            ((mant24 >>> shift) & 1)) >>> shift
          (sign | m).toShort // m may carry into the exponent field — still correct
        }
      }
    }
  }

  /** IEEE 754 binary16 bits → the exactly-represented f32. */
  def halfToFloat(h: Short): Float = {
    val bits = h & 0xFFFF
    val sign = (bits & 0x8000) << 16
    val exp = (bits >>> 10) & 0x1F
    val mant = bits & 0x3FF
    if (exp == 31)
      java.lang.Float.intBitsToFloat(sign | 0x7F800000 | (mant << 13))
    else if (exp == 0) {
      // subnormal: mant × 2⁻²⁴ is exact in f32
      val v = mant * java.lang.Float.intBitsToFloat(0x33800000) // 2^-24
      if (sign != 0) -v else v
    } else
      java.lang.Float.intBitsToFloat(sign | ((exp + 112) << 23) | (mant << 13))
  }

  /** Round-trip one f32 through binary16 (the value a half-precision
    * store would hold). */
  def f16RoundScalar(f: Float): Float = halfToFloat(floatToHalf(f))

  /** Round one f32 to bfloat16 (truncate to the upper 16 bits with
    * round-to-nearest-even; NaN kept, overflow → ±Inf). */
  def bf16RoundScalar(f: Float): Float = {
    val x = java.lang.Float.floatToRawIntBits(f)
    if ((x & 0x7FFFFFFF) > 0x7F800000) f // NaN unchanged
    else java.lang.Float.intBitsToFloat(
      (x + 0x7FFF + ((x >>> 16) & 1)) & 0xFFFF0000)
  }

  /** Elementwise f16 round-trip — called from generated code. */
  def f16Round(v: Array[Float]): Array[Float] = {
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { out(i) = f16RoundScalar(v(i)); i += 1 }
    out
  }

  /** Elementwise bf16 round-trip — called from generated code. */
  def bf16Round(v: Array[Float]): Array[Float] = {
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { out(i) = bf16RoundScalar(v(i)); i += 1 }
    out
  }

  /** Residual-PQ ADC ordering score over one row's (codes, cell) — the
    * per-row half of [[graft.operators.Pq.adcOrderingResidual]]. The
    * driver folds every query-dependent term into the flat tables
    * (dot(q, cb) / |cb|² shared across cells; dot(q, cent), |cent|² and
    * the cent×cb cross table per cell); this kernel is m array reads
    * per table plus two scalar reads by cell. Called from generated
    * code (PqAdcScore): keep static-forwardable. `mode`: 0 = dot
    * (higher better), 1 = l2 (lower better), 2 = cosine (higher
    * better, −2 sentinel for the zero vector — below any true cosine). */
  def adcScore(codes: org.apache.spark.sql.catalyst.util.ArrayData,
      cell: Int, dotFlat: Array[Double], normFlat: Array[Double],
      crossFlat: Array[Double], dotQC: Array[Double], normC: Array[Double],
      k: Int, mode: Int): Double = {
    val m = codes.numElements()
    var dot = dotQC(cell)
    var norm = normC(cell)
    val cbase = cell * m * k
    var i = 0
    while (i < m) {
      val idx = i * k + codes.getInt(i)
      dot += dotFlat(idx)
      norm += 2.0 * crossFlat(cbase + idx) + normFlat(idx)
      i += 1
    }
    if (mode == 0) dot
    else if (mode == 1) norm - 2.0 * dot
    else if (norm > 0) dot / math.sqrt(norm)
    else -2.0
  }

  /** Reject null ELEMENTS before a kernel's toFloatArray — called from
    * generated code (HalfRound). Without this, ArrayData.toFloatArray
    * throws an opaque NPE on `[1.0, null]`; a vector with null
    * components has no half-precision value, so fail with a message
    * that names the problem. */
  def requireNoNullElements(a: org.apache.spark.sql.catalyst.util.ArrayData,
      op: String): Unit = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$op: vector contains a null element at position $i — " +
          "half-precision rounding needs a fully-populated float vector")
      i += 1
    }
  }
}
