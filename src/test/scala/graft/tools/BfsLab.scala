package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger

/** r14 lab: A/B the shallow-BFS unroll shapes on the floor-class rows
  * (q82/q83-shaped traversals). Variants:
  *   - dist:      per-level distinct (shipped)
  *   - nodist:    dedup only at the final min-depth agg
  *   - nodist+bc: nodist + broadcast-hinted frontier each level
  *   - dist+bc:   shipped + broadcast-hinted frontier
  * Value parity asserted against the shipped operator first.
  * Usage: sbt "Test/runMain graft.tools.BfsLab"
  */
object BfsLab {
  def unroll(e0: DataFrame, starts: DataFrame, maxDepth: Int,
      relTypes: Seq[String], perLevelDistinct: Boolean,
      hintBroadcast: Boolean, broadcastEdges: Boolean = false,
      skipLevel1Distinct: Boolean = false): DataFrame = {
    val e = (if (relTypes.nonEmpty) e0.where(col("label").isin(relTypes: _*))
             else e0).select("src", "dst")
    val startsFrontier =
      starts.select(col("start"), col("start").as("node")).distinct()
    var level = startsFrontier
    var acc: DataFrame = null
    for (d <- 1 to maxDepth) {
      val eD = e.select(col("src").as("__esrc"), col("dst").as("__edst"))
      val lvl = if (hintBroadcast) broadcast(level) else level
      val eDh = if (broadcastEdges) broadcast(eD) else eD
      val joined = lvl.join(eDh, lvl("node") === col("__esrc"))
        .select(lvl("start"), col("__edst").as("node"))
      val next = if (perLevelDistinct && !(skipLevel1Distinct && d == 1))
        joined.distinct() else joined
      acc = {
        val step = next.withColumn("depth", lit(d))
        if (acc == null) step else acc.unionAll(step)
      }
      level = next
    }
    acc.groupBy("start", "node").agg(min("depth").as("depth"))
      .where(col("node") =!= col("start"))
  }

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

    val e = graft.operators.Graph.edges(spark, sfDir)
    def starts(lim: Int): DataFrame =
      graft.Tables.table(spark, sfDir, "customer")
        .where(col("c_custkey") < lim).select(col("c_custkey").as("start"))
    val shapes = Seq(
      ("q82shape", 3, Seq.empty[String], 20),
      ("q83shape", 2, Seq("placed", "contains"), 50))

    def measure(name: String, mk: () => DataFrame): Unit = {
      graft.Bench.force(mk()) // warm
      val runs = (1 to 5).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        graft.Bench.force(mk())
        ((System.nanoTime() - t0) / 1e9, jobs.get() - j0)
      }
      val best = runs.minBy(_._1)
      println(f"BFSLAB $name%-26s min=${best._1}%.3fs jobs=${best._2} " +
        s"all=[${runs.map(r => f"${r._1}%.3f").mkString(",")}]")
    }

    shapes.foreach { case (nm, depth, types, lim) =>
      val shipped = graft.operators.Graph
        .bfsVarLength(e, starts(lim), depth, types)
        .select("start", "node", "depth")
      val ref = shipped.collect().map(_.toString).sorted
      Seq(("dist", true, false), ("nodist", false, false),
          ("nodist+bc", false, true), ("dist+bc", true, true))
        .foreach { case (vn, d, bc) =>
          val got = unroll(e, starts(lim), depth, types, d, bc)
            .collect().map(_.toString).sorted
          println(s"BFSLAB equal($nm/$vn)=${got.sameElements(ref)}")
        }
      // one shared EDGE broadcast (ReuseExchange serves all depths)
      // instead of a sequential frontier broadcast build per depth
      val gotE = unroll(e, starts(lim), depth, types,
        perLevelDistinct = true, hintBroadcast = false, broadcastEdges = true)
        .collect().map(_.toString).sorted
      println(s"BFSLAB equal($nm/dist+bce)=${gotE.sameElements(ref)}")
      measure(s"$nm/shipped", () => graft.operators.Graph
        .bfsVarLength(e, starts(lim), depth, types).select("start", "node", "depth"))
      Seq(("dist", true, false), ("nodist", false, false),
          ("nodist+bc", false, true), ("dist+bc", true, true))
        .foreach { case (vn, d, bc) =>
          measure(s"$nm/$vn", () => unroll(e, starts(lim), depth, types, d, bc))
        }
      measure(s"$nm/dist+bce", () => unroll(e, starts(lim), depth, types,
        perLevelDistinct = true, hintBroadcast = false, broadcastEdges = true))
      // level-1 distinct skipped: with distinct starts, level-1 dups
      // require parallel (src,dst) edges, and the final min-depth agg
      // absorbs any -- the distinct only bounds frontier growth
      val gotS = unroll(e, starts(lim), depth, types, perLevelDistinct = true,
        hintBroadcast = true, broadcastEdges = false, skipLevel1Distinct = true)
        .collect().map(_.toString).sorted
      println(s"BFSLAB equal($nm/dist1skip+bc)=${gotS.sameElements(ref)}")
      measure(s"$nm/dist1skip+bc", () => unroll(e, starts(lim), depth, types,
        perLevelDistinct = true, hintBroadcast = true, broadcastEdges = false,
        skipLevel1Distinct = true))
      // the robust-gated variant: pay an eager bounded distinct-starts
      // count (the safety gate for the broadcast hint) on every build
      measure(s"$nm/dist+bc+gate", () => {
        val s0 = starts(lim)
        val ok = s0.select(col("start")).distinct().limit(513).count() <= 512
        unroll(e, s0, depth, types, perLevelDistinct = true, hintBroadcast = ok)
      })
    }
    spark.stop()
  }
}
