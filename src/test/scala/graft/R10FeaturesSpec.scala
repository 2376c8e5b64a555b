package graft

/** Round-10 features, value-level vs in-process brute force on
  * sf0.001: the boilerplate n-gram report (q184 — within-source
  * template detection) and the per-source unigram KL drift report
  * (q185 — mixture monitoring). Both brute forces replay the exact
  * arithmetic contract (same IEEE ops, same nano/micro snapping), so
  * the assertions are == on every row, not approximate.
  */
class R10FeaturesSpec extends SparkSpecBase {

  private def qdef(name: String): QueryDef =
    SparkEntry.allDefs.find(_.name.startsWith(name))
      .getOrElse(fail(s"no QueryDef named $name*"))

  private lazy val docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "source", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  /** The BM25-family tokenizer: lowercase, split on non-alphanumeric,
    * keep len > 1 — same contract as TextQueries.tokens. */
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.length > 1).toSeq

  test("q184 boilerplate report matches a brute-force recompute") {
    val grams = docs.map { case (id, src, text) =>
      val t = toks(text)
      val g =
        if (t.length >= 3)
          (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
        else Set.empty[String]
      (id, src, g)
    }
    val df = grams.toSeq.flatMap { case (_, src, g) => g.map(x => (src, x)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = grams.map { case (id, src, g) =>
      val ng = g.size.toLong
      val nb = g.count(x => df((src, x)) >= 2).toLong
      val frac = math.floor(nb * 1.0 / math.max(ng, 1L) * 1e6 + 0.5) / 1e6
      id -> ((ng, nb, frac))
    }.toMap
    val got = qdef("q184").fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got == expected)
    // boilerplate exists at this sf and never exceeds the gram count
    assert(got.values.exists(_._2 > 0))
    got.values.foreach { case (ng, nb, frac) =>
      assert(nb <= ng && frac >= 0.0 && frac <= 1.0)
    }
  }

  test("q185 per-source KL matches a brute-force recompute; KL is nonnegative") {
    val counts = docs.toSeq
      .flatMap { case (_, src, text) => toks(text).map(tk => (src, tk)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bySrc = counts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val byTerm = counts.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val total = counts.values.sum
    val expected = counts.toSeq.groupBy(_._1._1).map { case (src, entries) =>
      val n = bySrc(src)
      val nanos = entries.map { case ((_, term), c) =>
        val p = c * 1.0 / n
        val q = byTerm(term) * 1.0 / total
        math.floor(p * math.log(p / q) * 1e9 + 0.5).toLong
      }.sum
      src -> ((n, nanos / 1e9))
    }
    val got = qdef("q185").fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    // Gibbs: KL(P‖Q) >= 0 up to the nano snapping of each term
    got.values.foreach { case (_, kl) => assert(kl >= -1e-6) }
  }

  test("incrementalBloom matches incrementalExact on a STRING key (md5)") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    // the regression shape: a non-long key must not be silently cast
    // to null — the bloom probe hashes it, the exact join uses it raw
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val key = md5(substring(col("text"), 1, 40))
    val batch = docs.where(col("doc_id") % 2 === 1)
    val corpus = docs.where(col("doc_id") % 2 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "dup_corpus", "dup_batch", "keep").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toSet
    val exact = rows(Dedup.incrementalExact(batch, corpus, key))
    val gated = rows(Dedup.incrementalBloom(batch, corpus, key))
    assert(exact.nonEmpty && gated == exact)
  }
}
