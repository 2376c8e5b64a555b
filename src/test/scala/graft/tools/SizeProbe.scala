package graft.tools

import org.apache.spark.sql.SparkSession

object SizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.1", "/root/repo/target/scaleprobe/sf3")) {
      val e = graft.operators.Graph.edges(spark, d)
      println(s"SIZEPROBE dir=$d edges=${e.queryExecution.optimizedPlan.stats.sizeInBytes}")
      val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
      println(s"SIZEPROBE threshold=$thr")
    }
    spark.stop()
  }
}
