package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger

/** r13 lab: PageRank superstep variants (q149 is the one non-streaming
  * bench row still over 2x DuckDB). Compares the current two-join
  * superstep against a folded one-join form and AQE-off execution.
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.tools.PrLab"
  */
object PrLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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
    import graft.operators.Graph

    val nodes = graft.Materialize(spark, sfDir, "pr_nodes",
      Seq("orders", "lineitem"), Some("node")) {
      val e = Graph.edges(spark, sfDir).select("src", "dst")
      e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct()
    }
    val eDeg = graft.Materialize(spark, sfDir, "pr_edeg",
      Seq("orders", "lineitem"), Some("src")) {
      val e = Graph.edges(spark, sfDir).select("src", "dst")
      e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
        .select(col("src"), col("dst"), col("deg"))
    }
    val d = 0.85

    def tail(r: DataFrame): DataFrame =
      r.select(col("node"),
        floor(col("rank") * 10000 + 0.5).cast("long").as("rank_e4"))
        .orderBy("node")

    /** r14 variant: one-partition in-partition sort — no RangePartitioner
      * sampling pass (which re-executes the whole superstep chain under a
      * pinned static plan) and no range exchange. */
    def tailCoalesced(r: DataFrame): DataFrame =
      r.select(col("node"),
        floor(col("rank") * 10000 + 0.5).cast("long").as("rank_e4"))
        .coalesce(1).sortWithinPartitions("node")

    def current(): DataFrame =
      tail(Graph.pageRank(Graph.edges(spark, sfDir), iters = 3,
        invariants = Some((nodes, eDeg))))

    /** Folded: rank_i is an EXPRESSION over (eDeg left-join contrib_{i-1}),
      * not a materialized node frame — one broadcast join per superstep
      * instead of two. Same arithmetic per edge: ((1-d)*base + d*c)/deg. */
    def folded(): DataFrame = {
      var contrib = eDeg
        .groupBy(col("dst").as("cnode"))
        .agg(sum(lit(1.0) / col("deg")).as("c"))
      for (_ <- 2 to 3) {
        contrib = eDeg
          .join(broadcast(contrib), col("src") === col("cnode"), "left")
          .groupBy(col("dst").as("cnode"))
          .agg(sum((lit(1 - d) + lit(d) * coalesce(col("c"), lit(0.0))) / col("deg")).as("c"))
      }
      tail(nodes.join(broadcast(contrib), col("node") === col("cnode"), "left")
        .select(col("node"),
          (lit(1 - d) + lit(d) * coalesce(col("c"), lit(0.0))).as("rank")))
    }

    /** The shipped r14 shape: folded supersteps through the PUBLIC
      * operator, one-partition sorted delivery, statically pinned. */
    def shipped(): DataFrame =
      graft.SessionTuning.pinStaticPlan(tailCoalesced(
        Graph.pageRank(Graph.edges(spark, sfDir), iters = 3,
          invariants = Some((nodes, eDeg)))))

    def foldedCoalesced(): DataFrame = {
      var contrib = eDeg
        .groupBy(col("dst").as("cnode"))
        .agg(sum(lit(1.0) / col("deg")).as("c"))
      for (_ <- 2 to 3) {
        contrib = eDeg
          .join(broadcast(contrib), col("src") === col("cnode"), "left")
          .groupBy(col("dst").as("cnode"))
          .agg(sum((lit(1 - d) + lit(d) * coalesce(col("c"), lit(0.0))) / col("deg")).as("c"))
      }
      tailCoalesced(nodes.join(broadcast(contrib), col("node") === col("cnode"), "left")
        .select(col("node"),
          (lit(1 - d) + lit(d) * coalesce(col("c"), lit(0.0))).as("rank")))
    }

    def measure(name: String, mk: () => DataFrame, aqe: Boolean,
        pin: Boolean = false): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      try {
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
        println(f"PRLAB $name%-22s min=${best._1}%.3fs jobs=${best._2} aqe=$aqe pin=$pin " +
          s"all=[${runs.map(r => f"${r._1}%.3f").mkString(",")}]")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // correctness cross-check before timing: folded == current == coalesced
    val a = current().collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = folded().collect().map(r => (r.getLong(0), r.getLong(1)))
    val c = foldedCoalesced().collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"PRLAB equal=${a.sameElements(b)} coalesced_equal=${a.sameElements(c)} rows=${a.length}")

    measure("current", () => current(), aqe = true)
    measure("folded", () => folded(), aqe = true)
    measure("folded_pin", () => folded(), aqe = true, pin = true)
    measure("foldedCo", () => foldedCoalesced(), aqe = true)
    measure("foldedCo_pin", () => foldedCoalesced(), aqe = true, pin = true)
    measure("shipped", () => shipped(), aqe = true)
    // pinned plans are gate-certified small: do their node-sized
    // exchanges even need 32 reduce partitions? (aqe=false emulates the
    // pin here — the twin session's conf snapshots at first use, so the
    // session toggle can't reach it)
    for (p <- Seq("4", "8", "16")) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try measure(s"foldedCo_noaqe_sp$p", () => foldedCoalesced(), aqe = false)
      finally spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    }
    measure("foldedCo_noaqe_sp32", () => foldedCoalesced(), aqe = false)
    spark.stop()
  }
}
