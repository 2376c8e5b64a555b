package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session diagnostic for the dedup-clusters artifact build (the
  * cold path of q73/q146 and the REST dedup route): where does the
  * build go — shingle table, similarity-join pairs, or the components
  * label-propagation loop — and how many jobs/rounds the loop runs.
  * Usage: Test/runMain graft.tools.ComponentsLab <sfDir> [localFinishEdges]
  * (second arg overrides graft.components.localFinishEdges — pass 0 to
  * force every round distributed, isolating the local-finish delta on
  * identical code)
  */
object ComponentsLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gate = if (args.length > 1) Some(args(1)) else None
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
    gate.foreach(g => spark.conf.set("graft.components.localFinishEdges", g))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def phase[T](name: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-28s ${dt}%7.3f s  jobs=${jobs.get() - j0}")
      r
    }
    val docs = graft.Tables.table(spark, sfDir, "documents")
    docs.count()
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      // the same shape as TextQueries.shinglesTab -> clustersTab, built
      // fresh each rep (no Materialize cache) so the phases are visible
      val sh = phase("shingles build+ckpt") {
        val tks = docs.select(col("doc_id"),
          expr("filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 1)").as("tks"))
          .where(size(col("tks")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(tks) - 3), i -> concat(tks[i], ' ', tks[i+1], ' ', tks[i+2]))"))
            .as("shingle"))
          .distinct()
          .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
          .localCheckpoint(false)
        tks.count(); tks
      }
      val pairs = phase("jaccard pairs+ckpt") {
        val p = graft.operators.Dedup.ngramJaccardPairs(sh, 0.8)
          .localCheckpoint(false)
        val n = p.count()
        println(s"  pairs=$n")
        p
      }
      phase("components loop") {
        val c = graft.operators.Dedup.components(pairs)
        println(s"  clusters rows=${graft.Bench.force(c)}")
        org.apache.spark.sql.graft.CheckpointBlocks.unpersistAll(c)
      }
      org.apache.spark.sql.graft.CheckpointBlocks.unpersist(pairs)
      org.apache.spark.sql.graft.CheckpointBlocks.unpersist(sh)
    }
    spark.stop()
  }
}
