package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session diagnostic for q182's kCore: where does the wall time
  * go (symmetrize+count, per-round keep/prune/count, final agg), how
  * many peel rounds run at the given SF, and how many Spark jobs each
  * phase schedules. Usage: runMain graft.tools.KcoreLab <sfDir>
  */
object KcoreLab {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    // the same materialized co-purchase pairs q182 reads
    val pairs = graft.Materialize(spark, sfDir, "copurchase", Seq("lineitem"), Some("a")) {
      val op = graft.Tables.table(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      op.as("x")
        .join(op.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("a"), col("y.p").as("b"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2).select("a", "b")
    }
    pairs.count() // warm the artifact
    def phase[T](name: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-28s ${dt}%7.3f s  jobs=${jobs.get() - j0}")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val t0 = System.nanoTime(); val j0 = jobs.get()
      val e0 = pairs.select(col("a").cast("long").as("u"), col("b").cast("long").as("v"))
      var edges = phase("symmetrize+ckpt+count") {
        val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
          .localCheckpoint(false)
        e.count(); e
      }
      var nEdges = edges.count()
      var it = 0; var converged = nEdges == 0
      val smallKeep = true
      while (!converged && it < 30) {
        val (pruned, n) = phase(s"round ${it + 1}") {
          val keep = broadcast(edges.groupBy("u").agg(count(lit(1)).as("deg"))
            .where(col("deg") >= 2).select(col("u").as("__n")))
          val p = edges
            .join(keep, edges("u") === col("__n")).drop("__n")
            .join(keep, edges("v") === col("__n")).drop("__n")
            .localCheckpoint(false)
          val c = p.count(); (p, c)
        }
        org.apache.spark.sql.graft.CheckpointBlocks.unpersist(edges)
        converged = n == nEdges || n == 0L
        println(f"  edges $nEdges -> $n")
        edges = pruned; nEdges = n; it += 1
      }
      val out = phase("final agg+ckpt") {
        val o = edges.groupBy(col("u").as("node"))
          .agg(count(lit(1)).as("core_deg")).localCheckpoint(true)
        o
      }
      org.apache.spark.sql.graft.CheckpointBlocks.unpersist(edges)
      phase("orderBy+force") {
        graft.Bench.force(out.orderBy("node"))
      }
      org.apache.spark.sql.graft.CheckpointBlocks.unpersist(out)
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs.get() - j0}  rounds=$it")
    }
    spark.stop()
  }
}
