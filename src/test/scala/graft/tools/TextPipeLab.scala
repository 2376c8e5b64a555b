package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Same-session A/B for the r17 continuation targets:
  *   1. q153 tf-idf: df-per-term as a WINDOW over tf (ships every tf row
  *      through an Exchange(term)) vs a groupBy(term) + broadcast join
  *      (partial agg collapses to vocab before the wire — guide §2.3).
  *   2. q135 salted join: build-side replicate via crossJoin(broadcast
  *      (range)) (BNLJ + extra broadcast job) vs explode(sequence) —
  *      one Generate, no extra job (guide §2.4).
  *   3. q69 simhash attribution: full query vs a dummy-hash twin (same
  *      shape, xxhash64 instead of the md5 hex/conv chain) vs
  *      tokenize+tf only — how much of the row is the md5 chain?
  * Usage: Test/runMain graft.tools.TextPipeLab <sfDir>
  */
object TextPipeLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.All.foreach(n => graft.Tables.table(spark, sfDir, n).count())

    def time(name: String, reps: Int = 5)(mk: => DataFrame): Double = {
      graft.Bench.force(mk) // warm (codegen compile)
      spark.catalog.clearCache()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.force(mk)
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"TIMED $name%-34s min=${ts.min}%.3f  reps=${ts.map(t => f"$t%.3f").mkString(",")}")
      ts.min
    }

    val docs = graft.Tables.table(spark, sfDir, "documents")
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000L) + lit(0.5)) / lit(1000000.0)

    // ---------- 1. q153 tf-idf ----------
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"),
      explode(expr("filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)"))
        .as("term"))
    def tfidfTail(withDf: DataFrame): DataFrame = {
      val nd = docs.where(col("text").rlike("[a-zA-Z0-9]"))
        .agg(count(lit(1)).as("n"))
      val scored = withDf.crossJoin(broadcast(nd))
        .withColumn("score",
          r6(col("c") * (log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))) + lit(1.0))))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("score"))
        .orderBy("doc_id", "term")
    }
    def tfidfWindow(): DataFrame = {
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      tfidfTail(tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term"))))
    }
    def tfidfBroadcast(): DataFrame = {
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tfidfTail(tf.join(broadcast(dfq), Seq("term")))
    }
    // value parity first (the rewrite must be provably identical)
    val aRows = tfidfWindow().collect().map(_.toSeq).toSeq
    val bRows = tfidfBroadcast().collect().map(_.toSeq).toSeq
    println(s"q153 parity: ${aRows == bRows} (${aRows.size} rows)")
    time("q153 window-df (current)")(tfidfWindow())
    time("q153 broadcast-df (candidate)")(tfidfBroadcast())

    // ---------- 2. q135 salted join ----------
    val li = docsToLineitem(spark, sfDir)
    val ord = graft.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    def q135Tail(joined: DataFrame): DataFrame =
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(org.apache.spark.sql.graft.FixedPointSum
            .dsumD(col("l_quantity"), 4), 4).as("qty"))
        .orderBy(col("o_orderpriority"))
    def saltedCross(): DataFrame =
      q135Tail(graft.operators.Skew.saltedJoin(li, ord, "k", salt = 8))
    def saltedExplode(): DataFrame = {
      val salt = 8
      val salted = li.withColumn("__salt",
        pmod(xxhash64(li.columns.map(col).toIndexedSeq: _*),
          lit(salt.toLong)).cast("int"))
      val replicated = ord.withColumn("__salt",
        explode(sequence(lit(0), lit(salt - 1))))
      q135Tail(salted.join(replicated,
          salted("k") === replicated("k") && salted("__salt") === replicated("__salt"))
        .drop(salted("__salt")).drop(replicated("__salt")).drop(replicated("k")))
    }
    val a135 = saltedCross().collect().map(_.toSeq).toSeq
    val b135 = saltedExplode().collect().map(_.toSeq).toSeq
    println(s"q135 parity: ${a135 == b135} (${a135.size} rows)")
    time("q135 crossJoin replicate (cur)")(saltedCross())
    time("q135 explode replicate (cand)")(saltedExplode())
    // r18 join-strategy variants (guide §3.1): SHUFFLE_HASH on the
    // replicated build side (no sort), and the broadcast EXIT — when the
    // build side fits the broadcast threshold, salting is strictly
    // dominated by broadcasting it (same skew immunity, ZERO exchanges)
    def saltedShj(): DataFrame = {
      val salt = 8
      val salted = li.withColumn("__salt",
        pmod(xxhash64(li.columns.map(col).toIndexedSeq: _*),
          lit(salt.toLong)).cast("int"))
      val replicated = ord.crossJoin(
        broadcast(spark.range(salt).select(col("id").cast("int").as("__salt"))))
        .hint("shuffle_hash")
      q135Tail(salted.join(replicated,
          salted("k") === replicated("k") && salted("__salt") === replicated("__salt"))
        .drop(salted("__salt")).drop(replicated("__salt")).drop(replicated("k")))
    }
    def saltedBcast(): DataFrame =
      q135Tail(li.join(broadcast(ord), li("k") === ord("k")).drop(ord("k")))
    val c135 = saltedShj().collect().map(_.toSeq).toSeq
    val d135 = saltedBcast().collect().map(_.toSeq).toSeq
    println(s"q135 shj parity: ${a135 == c135}  bcast parity: ${a135 == d135}")
    time("q135 shuffle-hash build (cand)")(saltedShj())
    time("q135 broadcast exit (cand)")(saltedBcast())

    // ---------- 1b. q143 unigram logprob: one tokenize pass ----------
    val tok143 = docs.select(col("doc_id"),
      explode(expr("filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)"))
        .as("term"))
    def q143Current(): DataFrame = {
      val tf = tok143.groupBy("term").agg(count(lit(1)).as("c"))
      val tot = tf.agg(sum(col("c")).as("n"))
      tok143.join(broadcast(tf), "term").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(r6(avg(-log2(col("c") * lit(1.0) / col("n")))).as("bits_per_token"))
        .orderBy("doc_id")
    }
    // candidate: per-(doc,term) counts ONCE (checkpointed), tf and the
    // probe both read the blocks — one corpus tokenize instead of two;
    // avg becomes the cnt-weighted mean (same doubles, reassociated —
    // r6 rounding is the declared tolerance, parity checked below)
    def q143OnePass(): DataFrame = {
      val g = tok143.groupBy("doc_id", "term").agg(count(lit(1)).as("k"))
        .localCheckpoint(false)
      val tf = g.groupBy("term").agg(sum(col("k")).as("c"))
      val tot = tf.agg(sum(col("c")).as("n"))
      g.join(broadcast(tf), "term").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(r6(sum(col("k") * -log2(col("c") * lit(1.0) / col("n")))
          / sum(col("k"))).as("bits_per_token"))
        .orderBy("doc_id")
    }
    val a143 = q143Current().collect().map(_.toSeq).toSeq
    val b143 = q143OnePass().collect().map(_.toSeq).toSeq
    println(s"q143 parity(r6): ${a143 == b143} (${a143.size} rows)")
    time("q143 two-pass (current)")(q143Current())
    time("q143 one-pass ckpt (cand)")(q143OnePass())

    // ---------- 3. q69 attribution ----------
    val tok69 = docs.select(col("doc_id"),
      explode(expr("filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 1)"))
        .as("term"))
    def simhash(h: org.apache.spark.sql.Column): DataFrame = {
      val tf = tok69.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("h", h)
      val wCols = (0 until 32).map(j =>
        sum(col("tf") * (lit(2) * (shiftright(col("h"), j) % 2) - 1)).as(s"w$j"))
      val sim = (0 until 32).map(j =>
        when(col(s"w$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
      tf.groupBy("doc_id").agg(wCols.head, wCols.tail: _*)
        .select(col("doc_id"), sim.as("simhash"))
    }
    time("q69 md5 chain (current)")(
      simhash(conv(substring(md5(col("term")), 1, 8), 16, 10).cast(LongType)))
    time("q69 xxhash dummy (attribution)")(simhash(xxhash64(col("term"))))
    time("q69 tf-only (attribution)")(
      tok69.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    time("q69 tokenize-only (attribution)")(tok69)

    spark.stop()
  }

  private def docsToLineitem(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
}
