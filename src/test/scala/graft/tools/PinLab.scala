package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.atomic.AtomicInteger

/** r14 lab: generic pin A/B — for each named query, measure the def's
  * frame as-is vs re-rooted on the no-AQE twin (SessionTuning
  * .pinStaticPlan). Tells whether a def should adopt pinIfSmall without
  * touching it. Don't point it at defs that already pin internally
  * (q61/q62/q149/q193) — those would pin twice (harmless, meaningless).
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.tools.PinLab q82 q148 q105"
  */
object PinLab {
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
    graft.Tables.All.foreach(n => graft.Tables.table(spark, sfDir, n).count())

    val selected = graft.SparkEntry.allDefs.sortBy(_.name)
      .filter(q => args.nonEmpty && args.exists(q.name.startsWith))
    require(selected.nonEmpty, "name at least one query")

    def measure(name: String, mk: () => DataFrame): Unit = {
      graft.Bench.force(mk()) // warm
      spark.catalog.clearCache()
      val runs = (1 to 5).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        graft.Bench.force(mk())
        val r = ((System.nanoTime() - t0) / 1e9, jobs.get() - j0)
        spark.catalog.clearCache()
        r
      }
      val best = runs.minBy(_._1)
      println(f"PINLAB $name%-34s min=${best._1}%.3fs jobs=${best._2} " +
        s"all=[${runs.map(r => f"${r._1}%.3f").mkString(",")}]")
    }

    selected.foreach { q =>
      // value parity first: pinned == unpinned rows
      val a = q.fn(spark, sfDir).collect().map(_.toString).sorted
      val b = graft.SessionTuning.pinStaticPlan(q.fn(spark, sfDir))
        .collect().map(_.toString).sorted
      println(s"PINLAB equal(${q.name})=${a.sameElements(b)}")
      measure(s"${q.name}/plain", () => q.fn(spark, sfDir))
      measure(s"${q.name}/pinned", () =>
        graft.SessionTuning.pinStaticPlan(q.fn(spark, sfDir)))
    }
    spark.stop()
  }
}
