package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal-JVM shuffle-floor calibration (see Scratch). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(label: String)(f: => Long): Unit = {
      f
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"S2 $label min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    run("range 369k groupBy 865")(
      spark.range(369242).select((col("id") % 865).as("fid"), lit(1L).as("cnt"))
        .groupBy("fid").agg(sum(col("cnt"))).queryExecution.toRdd.count())
    run("range 369k groupBy 865, 8 input parts")(
      spark.range(0, 369242, 1, 8).select((col("id") % 865).as("fid"), lit(1L).as("cnt"))
        .groupBy("fid").agg(sum(col("cnt"))).queryExecution.toRdd.count())
    run("range 25 groupBy 5")(
      spark.range(25).select((col("id") % 5).as("fid"))
        .groupBy("fid").agg(count(lit(1))).queryExecution.toRdd.count())
    run("pure map 32 parts no shuffle")(
      spark.range(0, 369242, 1, 32).select((col("id") % 865).as("fid"))
        .where(col("fid") < 0).queryExecution.toRdd.count())
    spark.stop()
  }
}
