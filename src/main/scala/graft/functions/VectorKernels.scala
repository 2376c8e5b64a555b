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
  */
object VectorKernels {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      s += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else s / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val dd = a(i).toDouble - b(i).toDouble
      s += dd * dd
      i += 1
    }
    math.sqrt(s)
  }

  def l2Squared(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val dd = a(i).toDouble - b(i).toDouble
      s += dd * dd
      i += 1
    }
    s
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
}
