package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-gram kernels behind the classifier/DSIR feature convention
  * `fid = conv(substring(md5(gram), 1, 15), 16, 10) % dim` — the first
  * 60 bits of the md5 digest, reduced mod dim. These compute the SAME
  * value from the digest bytes directly: the first 15 hex chars are the
  * first 60 bits, i.e. (first 8 digest bytes as unsigned big-endian)
  * >>> 4 — no 32-char hex string, no substring, no base-16 string
  * parse, no per-gram boxing (the built-in chain allocates all three
  * per gram; at ~200 grams/doc that dominated q173's serving path —
  * r16 lab). Bit-equality with the built-in chain is pinned by
  * TextKernelsSpec over random unicode strings.
  */
object TextKernels {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def top60(digest: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4 // first 15 hex nibbles = top 60 bits, always non-negative
  }

  /** fid of one gram: top-60-bits-of-md5(utf8 bytes) % dim. */
  def fid(gram: UTF8String, dim: Int): Long = {
    val md = md5.get()
    md.reset()
    md.update(gram.getBytes)
    top60(md.digest()) % dim
  }

  /** First `nibbles` (1..15) hex chars of md5(g) as a non-negative long —
    * the generalized convention behind `conv(substring(md5(g), 1, N),
    * 16, 10)`: nibbles=15 is the 60-bit dedup/shingle hash, nibbles=8
    * the simhash 32-bit bit source. Computed from the digest bytes
    * directly (no hex string, no substring, no base-16 parse per row);
    * bit-parity with the built-in chain is pinned by TextKernelsSpec.
    * 16 nibbles would read the sign bit — callers stay ≤ 15 so the
    * value is always non-negative, matching conv's unsigned parse. */
  def md5Prefix(g: UTF8String, nibbles: Int): Long = {
    val md = md5.get()
    md.reset()
    md.update(g.getBytes)
    val d = md.digest()
    var v = 0L
    var i = 0
    val nb = (nibbles + 1) / 2
    while (i < nb) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    if ((nibbles & 1) == 1) v >>> 4 else v
  }

  private val SpaceByte = ' '.toByte

  /** Per-document hashed-gram margin: Σ weights[fid(gram)] over the
    * unigrams of `tokens` in order, then the adjacent bigrams
    * ("a b", single space) in order — the exact gram order (and
    * left-to-right IEEE summation) of the `aggregate(gramsOf(w))` HOF
    * path this kernel replaces. Bigram digests are fed bytes directly
    * (update(a); update(' '); update(b)) — no intermediate string. */
  def gramMargin(tokens: ArrayData, weights: Array[Double], dim: Int): Double = {
    val n = tokens.numElements()
    val md = md5.get()
    var acc = 0.0
    var i = 0
    while (i < n) {
      md.reset()
      md.update(tokens.getUTF8String(i).getBytes)
      acc += weights((top60(md.digest()) % dim).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      md.reset()
      md.update(tokens.getUTF8String(i).getBytes)
      md.update(SpaceByte)
      md.update(tokens.getUTF8String(i + 1).getBytes)
      acc += weights((top60(md.digest()) % dim).toInt)
      i += 1
    }
    acc
  }

  /** Null-element guard shared by the expressions (a null token would
    * NPE opaquely inside the digest loop). */
  def requireNoNullElements(a: ArrayData, what: String): Unit = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"$what: token array contains a null element at index $i")
      i += 1
    }
  }
}
