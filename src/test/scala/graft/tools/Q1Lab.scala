package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r14 lab: where does q01 spend its time at 30×? A/B the decimal-sum
  * aggregation (oracle-exact, shipped) against double sums and scaled
  * long sums of the same columns. Usage:
  *   SPARK_GRAFT_SF_DIR=target/scaleprobe/sf3 sbt "Test/runMain graft.tools.Q1Lab"
  */
object Q1Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/scaleprobe/sf3")
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
    val li = graft.Tables.table(spark, sfDir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))

    def dsum(c: org.apache.spark.sql.Column, s: Int = 2) =
      sum(c.cast(DecimalType(18, s))).cast("double")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("shipped-decimal", () => li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 4))
          * (lit(1) + col("l_tax")).cast(DecimalType(8, 2))).cast("double").as("sum_charge"),
        (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("avg_price"),
        (dsum(col("l_discount")) / count(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))),
      ("double-sums", () => li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))),
      ("scaled-long-sums", () => li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("sum_base_price"),
        (sum((round(col("l_extendedprice") * 100).cast("long")
          * round((lit(1) - col("l_discount")) * 100).cast("long"))) / 1e4).as("sum_disc_price"),
        (sum(round(col("l_extendedprice") * 100).cast("long")
          * round((lit(1) - col("l_discount")) * 100).cast("long")
          * round((lit(1) + col("l_tax")) * 100).cast("long")) / 1e6).as("sum_charge"),
        count(lit(1)).as("count_order"))),
      ("scan-only", () => li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        count(lit(1)).as("count_order"))),
      ("fxsum-int128", () => {
        def fx(c: org.apache.spark.sql.Column, s: Int = 2) =
          org.apache.spark.sql.graft.FixedPointSum.dsum(c, s)
        li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          fx(col("l_quantity")).as("sum_qty"),
          fx(col("l_extendedprice")).as("sum_base_price"),
          fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          fx((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 4))
            * (lit(1) + col("l_tax")).cast(DecimalType(8, 2)), 6).as("sum_charge"),
          (fx(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          (fx(col("l_extendedprice")) / count(col("l_extendedprice"))).as("avg_price"),
          (fx(col("l_discount")) / count(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
      }),
      // r15: the user-facing money-AVG idiom, stock vs the
      // FixedPointAvg optimizer rewrite (rule attached via register())
      ("avg-idiom-stock", () => {
        graft.functions.VectorFunctions.register(spark)
        spark.conf.set("graft.dsum.rewrite", "false")
        li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          avg(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("avg_qty"),
          avg(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("avg_price"),
          avg(col("l_discount").cast(DecimalType(18, 2))).cast("double").as("avg_disc"),
          count(lit(1)).as("count_order"))
      }),
      ("avg-idiom-int128", () => {
        graft.functions.VectorFunctions.register(spark)
        spark.conf.set("graft.dsum.rewrite", "true")
        li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          avg(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("avg_qty"),
          avg(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("avg_price"),
          avg(col("l_discount").cast(DecimalType(18, 2))).cast("double").as("avg_disc"),
          count(lit(1)).as("count_order"))
      }),
      // r15: the SHIPPED q01 def (incl. ORDER BY + avg legs) and the
      // same def with the global sort replaced / removed — isolates
      // what the tiny-result orderBy exchange costs on top of the agg
      ("shipped-q01", () =>
        graft.SparkEntry.queries("q01_tpch_q1")(spark, sfDir)),
      ("shipped-no-sort", () => {
        import org.apache.spark.sql.graft.FixedPointSum.{dsumD, scaledLong, sumScaled}
        def fxd(c: org.apache.spark.sql.Column, s: Int = 2) = dsumD(c, s)
        li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          fxd(col("l_quantity")).as("sum_qty"),
          fxd(col("l_extendedprice")).as("sum_base_price"),
          fxd(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          sumScaled(scaledLong(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            * scaledLong(lit(1) + col("l_tax"), 2), 6).as("sum_charge"),
          (fxd(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          (fxd(col("l_extendedprice")) / count(col("l_extendedprice"))).as("avg_price"),
          (fxd(col("l_discount")) / count(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
      }),
      ("fxsum-rint", () => {
        import org.apache.spark.sql.graft.FixedPointSum.{dsumD, scaledLong, sumScaled}
        li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          dsumD(col("l_quantity"), 2).as("sum_qty"),
          dsumD(col("l_extendedprice"), 2).as("sum_base_price"),
          dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          sumScaled(scaledLong(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            * scaledLong(lit(1) + col("l_tax"), 2), 6).as("sum_charge"),
          (dsumD(col("l_quantity"), 2) / count(col("l_quantity"))).as("avg_qty"),
          (dsumD(col("l_extendedprice"), 2) / count(col("l_extendedprice"))).as("avg_price"),
          (dsumD(col("l_discount"), 2) / count(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
      }))

    // value parity: int128 fxsum == shipped decimal plan, bit-for-bit
    val ref = variants.head._2().orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString)
    val fx = variants.last._2().orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString)
    println(s"Q1LAB equal(fxsum)=${ref.sameElements(fx)}")
    if (!ref.sameElements(fx))
      ref.zip(fx).filter(p => p._1 != p._2).take(2).foreach(p =>
        println(s"Q1LAB DIFF\n  dec=${p._1}\n  fx =${p._2}"))

    // avg-idiom parity: rewritten plan == stock plan, bit-for-bit
    def collectV(n: String) = variants.find(_._1 == n).get._2()
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toString)
    val avgStock = collectV("avg-idiom-stock")
    val avgFx = collectV("avg-idiom-int128")
    println(s"Q1LAB equal(avg-idiom)=${avgStock.sameElements(avgFx)}")
    if (!avgStock.sameElements(avgFx))
      avgStock.zip(avgFx).filter(p => p._1 != p._2).take(2).foreach(p =>
        println(s"Q1LAB AVG DIFF\n  stock=${p._1}\n  fx   =${p._2}"))

    variants.foreach { case (name, mk) =>
      graft.Bench.force(mk())
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.force(mk())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q1LAB $name%-18s min=${runs.min}%.3fs all=[${runs.map(r => f"$r%.3f").mkString(",")}]")
    }
    spark.stop()
  }
}
