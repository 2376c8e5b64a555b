package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich et al.
  * 2016, arXiv:1508.07909) — the learn-the-vocabulary step of a
  * pretraining pipeline (q74 counts tokens under a fixed BPE-ish regex;
  * this module LEARNS the merge table from the corpus).
  *
  * Scale shape — the standard two-level factoring that makes corpus
  * size irrelevant to the training loop:
  *  1. the ONLY corpus-sized pass is [[wordFreqs]] (tokenize + one
  *     partial+final count agg → a VOCABULARY-sized (word, freq) table,
  *     Zipf-bounded: ~millions of rows at 100 TB);
  *  2. each merge iteration runs over the vocabulary table only —
  *     explode adjacent symbol pairs, one freq-weighted count agg, and
  *     the driver pulls exactly ONE row (the argmax pair). The merge
  *     rewrite is a map over the same vocabulary-sized table, kept on
  *     an eager localCheckpoint chain (the house iterative-op
  *     discipline) so lineage doesn't stack across iterations.
  *
  * Determinism: the argmax pair tie-breaks lexicographically on
  * (symbol-a, symbol-b), so a re-run — or any other engine replaying
  * the same counts — learns the identical merge list. The merges ARE
  * the model (driver-sized, like [[Clustering]]'s centroids).
  *
  * Word-internal merge application is an inherently sequential
  * left-to-right scan, so [[encode]] uses a Scala UDF — the documented
  * exception to the functions-not-UDFs rule (an unrolled per-merge
  * expression chain would re-materialize the symbol array once per
  * merge with no codegen win). The UDF memoizes per-word tokenizations
  * in a task-local cache: under a Zipfian word distribution the hit
  * rate makes encoding effectively dictionary-lookup speed.
  */
object Bpe {

  /** A trained merge list, in training order. */
  final case class Model(merges: Seq[(String, String)]) {
    /** Tokenize one word by replaying the merges in training order —
      * the exact inverse-direction twin of how [[train]] built them. */
    def tokenize(word: String): Seq[String] = {
      var sym: Seq[String] = word.map(_.toString)
      merges.foreach { case (a, b) => sym = mergePair(sym, a, b) }
      sym
    }
  }

  /** Replace every non-overlapping adjacent (a, b) with a+b, scanning
    * left to right — one training/encoding merge step on one word. */
  private[operators] def mergePair(sym: Seq[String], a: String, b: String): Seq[String] = {
    if (sym.length < 2) return sym
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += a + b; i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toSeq
  }

  /** The corpus-sized pass: lowercase, split on non-alphanumerics
    * (the repo's BM25/token convention), count word frequencies.
    * Everything downstream runs on this vocabulary-sized result. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => length(t) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).cast(LongType).as("freq"))

  /** Learn up to `nMerges` merges from a (word, freq) table. Stops
    * early when the best remaining pair occurs fewer than `minCount`
    * times (weighted by word freq) — merging hapax pairs only memorizes
    * noise. */
  def train(words: DataFrame, nMerges: Int, minCount: Long = 2L): Model = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    val ckpt = org.apache.spark.sql.graft.CheckpointBlocks
    var syms = words
      .select(split(col("word"), "").as("sym"), col("freq").cast(LongType).as("freq"))
      .localCheckpoint(true)
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < nMerges) {
      val best = syms.where(size(col("sym")) > 1)
        .select(col("freq"),
          explode(sequence(lit(1), size(col("sym")) - 1)).as("i"),
          col("sym"))
        .select(col("freq"),
          element_at(col("sym"), col("i")).as("a"),
          element_at(col("sym"), col("i") + 1).as("b"))
        .groupBy("a", "b").agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val mu = udf((s: Seq[String]) => mergePair(s, a, b))
        val next = syms.withColumn("sym", mu(col("sym"))).localCheckpoint(true)
        ckpt.unpersist(syms)
        syms = next
      }
    }
    ckpt.unpersist(syms)
    Model(merges.toSeq)
  }

  /** Tokenizer closure with a task-local memo (deserialized once per
    * task; the cache field rebuilds empty on each executor and fills
    * over the task's rows — Zipf makes that a near-perfect hit rate). */
  private final class Tokenizer(merges: Seq[(String, String)])
      extends (String => Seq[String]) with Serializable {
    @transient private lazy val cache =
      new java.util.HashMap[String, Seq[String]]()
    private def word(w: String): Seq[String] = {
      val hit = cache.get(w)
      if (hit != null) hit
      else {
        val t = Model(merges).tokenize(w)
        if (cache.size < 200000) cache.put(w, t)
        t
      }
    }
    def apply(text: String): Seq[String] =
      if (text == null) Seq.empty
      else "[^a-z0-9]+".r.split(text.toLowerCase)
        .iterator.filter(_.nonEmpty).flatMap(word).toSeq
  }

  /** Map-only: adds `outCol` (array<string>) with the learned-BPE
    * tokenization of `textCol`. The merge table rides the closure
    * (driver-sized, broadcast with the task). */
  def encode(df: DataFrame, textCol: String, model: Model,
      outCol: String = "tokens"): DataFrame = {
    val tok = udf(new Tokenizer(model.merges))
    df.withColumn(outCol, tok(col(textCol)))
  }
}
