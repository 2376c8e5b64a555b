package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q147 (stream-stream interval join, AvailableNow, memory
  * sink) spend its ~2 s? Prints per-batch durationMs from the query's
  * own progress events plus wall-clock phases around it.
  * Usage: runMain graft.tools.StreamJoinLab <sfDir>
  */
object StreamJoinLab {
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

    (1 to 6).foreach { rep =>
      // reps 4-6: skip trailing no-data micro-batches (A/B)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        (rep <= 3).toString)
      val t0 = System.nanoTime()
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val joined = graft.streaming.StreamingOps.intervalJoin(
        graft.streaming.StreamingOps.eventsStream(spark, sfDir))
      val t1 = System.nanoTime()
      val qn = s"lab147_$rep"
      val shm = new java.io.File("/dev/shm")
      val ck = java.nio.file.Files.createTempDirectory(shm.toPath, "lab147-")
      val q = joined.writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ck.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      val t2 = System.nanoTime()
      require(q.awaitTermination(300000))
      val t3 = System.nanoTime()
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
          s"plan=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
          s"commitOffsets=${d.get("commitOffsets")} stateCommit=${
            Option(p.stateOperators).map(_.map(s => s.commitTimeMs).mkString(",")).getOrElse("")}")
      }
      q.stop()
      val t4 = System.nanoTime()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      val out = spark.table(qn)
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          round(col("purchase_value"), 4).as("purchase_value"))
        .orderBy(col("click_id"), col("purchase_id"))
        .localCheckpoint(true)
      spark.catalog.dropTempView(qn)
      val t5 = System.nanoTime()
      graft.Bench.force(out)
      val t6 = System.nanoTime()
      org.apache.spark.sql.graft.CheckpointBlocks.unpersist(out)
      def ms(a: Long, b: Long) = f"${(b - a) / 1e6}%.0f"
      println(s"rep $rep: build=${ms(t0, t1)} start=${ms(t1, t2)} " +
        s"await=${ms(t2, t3)} stop=${ms(t3, t4)} sinkSort=${ms(t4, t5)} " +
        s"force=${ms(t5, t6)} TOTAL=${ms(t0, t6)} ms")
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(ck)
      try walk.iterator().asScala.toSeq.reverse.foreach(_.toFile.delete())
      finally walk.close()
    }
    spark.stop()
  }
}
