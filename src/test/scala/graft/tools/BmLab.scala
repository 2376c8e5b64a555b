package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger

/** r14 lab: q61 filtered-BM25 variants (r13 VERDICT ask #2 — the
  * single-termStats rework regressed q61 0.25 → 0.33 s). Hypothesis:
  * `termStats = dfreq ⨯ stats` serializes the corpus-sized stats agg
  * INTO the tf-side broadcast build's critical path, where the r12
  * chain built `broadcast(stats)` concurrently with the tf side and
  * applied it after the probe join. Variants measured, each with pin
  * on/off:
  *   r12chain  — two broadcasts, stats crossJoined after the dl⋈tf join
  *   r12+idsJ  — r12 chain but ONE shared explicit ids broadcast
  *   r13chain  — shipped r13 (single termStats broadcast)
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.tools.BmLab"
  */
object BmLab {
  import graft.operators.Bm25.{K1, B}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })

    val queryTerms = Seq("vector", "query")
    def index = graft.operators.Bm25.indexFor(spark, sfDir)
    def keepIds = graft.Tables.table(spark, sfDir, "documents")
      .where(col("lang") === "en").select("doc_id")

    def fits: Boolean = {
      val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
      def est(df: DataFrame) =
        try df.queryExecution.optimizedPlan.stats.sizeInBytes
        catch { case _: Throwable => BigInt(Long.MaxValue) }
      thr > 0 && est(index.postings.where(col("term").isin(queryTerms: _*))) +
        est(keepIds) <= thr
    }

    def scoreOf(dl: DataFrame, tfJoined: DataFrame, withStats: DataFrame => DataFrame): DataFrame = {
      val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      withStats(if (fits) dl.join(broadcast(tfJoined), "doc_id")
                else tfJoined.join(dl, "doc_id"))
        .withColumn("term_score",
          idf * (col("tf") * (lit(K1) + 1.0))
            / (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("dlen") / col("avgdl"))))
        .groupBy("doc_id").agg(sum(col("term_score")).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10)
    }

    /** shipped r12: per-join ids, two broadcasts (dfreq inside the tf
      * side, stats applied AFTER the probe join). */
    def r12chain(): DataFrame = {
      val ids = keepIds
      val dl = index.docStats.join(ids, "doc_id")
      val stats = dl.agg(count(lit(1)).as("n"), avg(col("dlen").cast("double")).as("avgdl"))
      val tf = index.postings.where(col("term").isin(queryTerms: _*)).join(ids, "doc_id")
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      scoreOf(dl, tf.join(broadcast(dfreq), "term"), _.crossJoin(broadcast(stats)))
    }

    /** r12 chain + ONE shared explicit ids broadcast (the good half of
      * the r13 change). */
    def r12idsJ(): DataFrame = {
      val idsJ = if (fits) broadcast(keepIds) else keepIds
      val dl = index.docStats.join(idsJ, "doc_id")
      val stats = dl.agg(count(lit(1)).as("n"), avg(col("dlen").cast("double")).as("avgdl"))
      val tf = index.postings.where(col("term").isin(queryTerms: _*)).join(idsJ, "doc_id")
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      scoreOf(dl, tf.join(broadcast(dfreq), "term"), _.crossJoin(broadcast(stats)))
    }

    /** shipped r13: single folded termStats broadcast. */
    def r13chain(): DataFrame =
      graft.operators.Bm25.searchIndexFiltered(index, keepIds,
        queryTerms.mkString(" "), 10)

    def measure(name: String, mk: () => DataFrame, pin: Boolean): Unit = {
      def frame(): DataFrame =
        if (pin) graft.SessionTuning.pinStaticPlan(mk()) else mk()
      graft.Bench.force(frame()) // warm
      val runs = (1 to 5).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        graft.Bench.force(frame())
        ((System.nanoTime() - t0) / 1e9, jobs.get() - j0)
      }
      val best = runs.minBy(_._1)
      println(f"BMLAB $name%-12s pin=$pin%-5s min=${best._1}%.3fs jobs=${best._2} " +
        s"all=[${runs.map(r => f"${r._1}%.3f").mkString(",")}]")
    }

    // correctness cross-check: all variants produce identical top-10
    val ref = r13chain().collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
    Seq("r12chain" -> r12chain _, "r12idsJ" -> r12idsJ _).foreach { case (n, mk) =>
      val got = mk().collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
      println(s"BMLAB equal($n)=${ref.sameElements(got)}")
    }

    for (pin <- Seq(false, true); (n, mk) <- Seq(
        "r12chain" -> (() => r12chain()),
        "r12idsJ" -> (() => r12idsJ()),
        "r13chain" -> (() => r13chain())))
      measure(n, mk, pin)
    spark.stop()
  }
}
