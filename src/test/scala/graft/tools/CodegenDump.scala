package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val df0 = (1 to 100).map(i => (i % 3, i * 1.01)).toDF("g", "v")
    for (mode <- Seq("sum", "avg")) {
      val df = if (mode == "sum")
        df0.groupBy("g").agg(sum(col("v").cast(DecimalType(18,2))).cast("double").as("s"))
      else
        df0.groupBy("g").agg(avg(col("v").cast(DecimalType(18,2))).cast("double").as("s"))
      graft.Bench.force(df)
      val finalPlan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val codes = org.apache.spark.sql.execution.debug.codegenStringSeq(finalPlan)
      println(s"MODE=$mode subtrees=${codes.size}")
      codes.zipWithIndex.foreach { case ((subtree, code, _), i) =>
        val kind = if (subtree.contains("partial")) "PARTIAL" else "OTHER"
        println(s"=== $mode #$i $kind: ${code.length} chars")
        for (tok <- Seq("Decimal.apply", "toPrecision", "changePrecision", "toUnscaledLong", "BigDecimal", "fixed_point"))
          println(s"  $mode#$i count[$tok] = ${tok.r.findAllIn(code).size}")
        val f = new java.io.PrintWriter(s"/tmp/cg_${mode}_$i.java"); f.write(code); f.close()
      }
    }
    spark.stop()
  }
}
