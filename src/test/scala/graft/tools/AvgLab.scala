package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r15 scratch: why is the FixedPointAvg rewrite slower than stock?
  * Prints the executed plan (codegen markers) for both variants. */
object AvgLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/scaleprobe/sf3")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val li = graft.Tables.table(spark, sfDir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))

    def q(): DataFrame = li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      avg(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("avg_qty"),
      avg(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("avg_price"),
      avg(col("l_discount").cast(DecimalType(18, 2))).cast("double").as("avg_disc"),
      count(lit(1)).as("count_order"))

    for (mode <- Seq("false", "true")) {
      spark.conf.set("graft.dsum.rewrite", mode)
      val df = q()
      graft.Bench.force(df)
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); graft.Bench.force(q()); (System.nanoTime() - t0) / 1e9
      }
      println(f"AVGLAB rewrite=$mode min=${runs.min}%.3fs all=[${runs.map(r => f"$r%.3f").mkString(",")}]")
      val plan = df.queryExecution.executedPlan.toString
      println(s"AVGLAB plan rewrite=$mode:\n" +
        plan.linesIterator.filter(l => l.contains("HashAggregate") || l.contains("Scan "))
          .mkString("\n"))
    }
    spark.stop()
  }
}
