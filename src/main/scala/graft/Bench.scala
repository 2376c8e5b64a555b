package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract → BENCH_r{N}.json).
  *
  * Per-query methodology: one UNTIMED warm run (absorbs whole-stage-
  * codegen/janino compilation — ~0.3-1 s per distinct plan on this JVM,
  * a one-time cost that amortizes to zero for any repeated query — and
  * any once-per-dataset derived-table builds), then REPS timed runs of
  * which the MIN is reported. The min-of-N is the self-adjudication
  * against host co-tenancy: this sandbox's neighbors add ±25%+ noise to
  * any single pass (PERF_r5.md), and the minimum is the estimator least
  * contaminated by external load while still paying every real cost of
  * the plan (scan, shuffle, job scheduling). The first-run total is
  * reported as `cold_total_sec` alongside, so both steady-state and
  * first-touch costs are visible; `reps` records the methodology.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + exercise codegen/shuffle machinery once
    Tables.All.foreach(n => Tables.table(spark, sfDir, n).count())
    SparkEntry.queries.get("q01_tpch_q1").foreach(f => f(spark, sfDir).count())
    SparkEntry.queries.get("q40_knn_cosine").foreach(f => f(spark, sfDir).count())

    // SPARK_GRAFT_BENCH_ONLY=q82,q105 → time only matching queries
    // (local iteration; the driver runs unfiltered)
    // a set-but-empty filter means "no filter", not "run nothing"
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    val reps = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3))
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val cold = (System.nanoTime() - t0) / 1e9
      // drop per-query cached intermediates so each timed run pays its
      // own caching cost (and doesn't bleed memory pressure forward)
      spark.catalog.clearCache()
      // a failed rep must never win the min (its fast time-to-error would
      // masquerade as a good run) — it counts as +∞; all-reps-failed
      // reports -1 so the record shows failure instead of a bogus time
      val times = (1 to reps).map { _ =>
        val t1 = System.nanoTime()
        val failed = try { fn(spark, sfDir).count(); false } catch { case _: Throwable => true }
        val t = (System.nanoTime() - t1) / 1e9
        spark.catalog.clearCache()
        if (failed) Double.PositiveInfinity else t
      }
      val warm = if (times.min.isInfinity) -1.0 else times.min
      (name, cold, warm)
    }
    val qs = results.map { case (k, _, w) => s"\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total_sec":$coldTotal,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
