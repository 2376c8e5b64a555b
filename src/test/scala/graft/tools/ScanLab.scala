package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 lab: is the q01 scan floor a mistuned reader knob? Sweeps the
  * vectorized-reader batch size, the two-level agg hash map, and
  * partition sizing over the SHIPPED q01 at the probe scale — each
  * conf in a fresh session (reader knobs are read at plan/scan time).
  * Usage: SPARK_GRAFT_SF_DIR=target/scaleprobe/sf6 \
  *   sbt "Test/runMain graft.tools.ScanLab"
  */
object ScanLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/scaleprobe/sf6")
    val sweeps: Seq[(String, Map[String, String])] = Seq(
      ("baseline", Map.empty),
      ("batch8k", Map("spark.sql.parquet.columnarReaderBatchSize" -> "8192")),
      ("batch16k", Map("spark.sql.parquet.columnarReaderBatchSize" -> "16384")),
      ("batch2k", Map("spark.sql.parquet.columnarReaderBatchSize" -> "2048")),
      ("noTwoLevel", Map("spark.sql.codegen.aggregate.map.twolevel.enabled" -> "false")),
      ("partialOnlyOff", Map("spark.sql.codegen.aggregate.map.twolevel.partialOnly" -> "false")),
      ("maxPart64m", Map("spark.sql.files.maxPartitionBytes" -> "67108864")),
      ("offHeapRead", Map("spark.sql.columnVector.offheap.enabled" -> "true")),
      // session-order drift control: the baseline again at the END —
      // if it now matches the "winners", the sweep measured warm-up,
      // not knobs
      ("baseline2", Map.empty),
      ("offHeapRead2", Map("spark.sql.columnVector.offheap.enabled" -> "true")),
      ("baseline3", Map.empty))
    sweeps.foreach { case (name, extra) =>
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      var b = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(graft.SessionTuning.localConfigMap)
      extra.foreach { case (k, v) => b = b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def q(): DataFrame = graft.SparkEntry.queries("q01_tpch_q1")(spark, sfDir)
      graft.Bench.force(q())
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); graft.Bench.force(q()); (System.nanoTime() - t0) / 1e9
      }
      println(f"SCANLAB $name%-16s min=${runs.min}%.3fs all=[${runs.map(r => f"$r%.3f").mkString(",")}]")
      spark.stop()
    }
  }
}
