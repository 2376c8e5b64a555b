package graft

import graft.operators.Bpe

/** [[graft.operators.Bpe]] — merge learning on hand-computed corpora
  * (argmax counts, lexicographic tie-break, minCount early stop,
  * overlapping-pair counting) and encode/tokenize semantics
  * (left-to-right non-overlapping merge application). */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("train learns hand-computed merges in order") {
    // aaab×3: pairs (a,a)=6 (overlapping), (a,b)=3; ab×2: (a,b)=2.
    // iter 1: (a,a)=6 wins → aaab = [aa, a, b]
    // iter 2: (aa,a)=3, (a,b)=3+2=5 → (a,b) wins
    val words = Seq(("aaab", 3L), ("ab", 2L)).toDF("word", "freq")
    val m = Bpe.train(words, nMerges = 2)
    assert(m.merges == Seq(("a", "a"), ("a", "b")))
  }

  test("argmax tie-breaks lexicographically") {
    val words = Seq(("cd", 2L), ("ab", 2L)).toDF("word", "freq")
    val m = Bpe.train(words, nMerges = 1)
    assert(m.merges == Seq(("a", "b")))
  }

  test("minCount stops before memorizing hapax pairs") {
    val words = Seq(("xy", 1L)).toDF("word", "freq")
    assert(Bpe.train(words, nMerges = 5).merges.isEmpty)
    assert(Bpe.train(words, nMerges = 5, minCount = 1L).merges.nonEmpty)
  }

  test("tokenize applies merges left-to-right, non-overlapping") {
    val m = Bpe.Model(Seq(("a", "a"), ("a", "b")))
    assert(m.tokenize("aaab") == Seq("aa", "ab"))
    assert(m.tokenize("aaa") == Seq("aa", "a"))  // no overlap reuse
    assert(m.tokenize("b") == Seq("b"))
    assert(m.tokenize("zq") == Seq("z", "q"))    // unseen chars survive
  }

  test("encode tokenizes whole documents through the learned model") {
    val m = Bpe.Model(Seq(("a", "a"), ("a", "b")))
    val docs = Seq((1L, "Aaab ab!"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Bpe.encode(docs, "text", m)
      .select("id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("aa", "ab", "ab"))
    assert(out(2L) == Seq.empty)
    assert(out(3L) == Seq.empty)
  }

  test("end-to-end: corpus freqs → train → encode shrinks token count") {
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "the hat"))
      .toDF("doc_id", "text")
    val words = Bpe.wordFreqs(docs, "text")
    assert(words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L, "ran" -> 1L, "hat" -> 1L))
    val m = Bpe.train(words, nMerges = 3)
    assert(m.merges.nonEmpty)
    val enc = Bpe.encode(docs, "text", m).select("tokens")
      .collect().map(_.getSeq[String](0))
    val chars = Seq("thecatsat", "thecatran", "thehat").map(_.length)
    enc.map(_.length).zip(chars).foreach { case (t, c) => assert(t < c) }
  }
}
