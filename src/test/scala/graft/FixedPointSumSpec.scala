package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, FixedPointSum}
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[FixedPointSum]] — the int128 fixed-point sum aggregate must be
  * bit-identical to Spark's stock `sum(CAST(x AS DECIMAL(18,s)))
  * .cast("double")` on every path (partial/final merge, window frames,
  * nulls), and within 1 ulp of an exact BigDecimal reference once the
  * unscaled sum leaves int64 range (the documented wide path).
  */
class FixedPointSumSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic forAll shim (no scalatestplus bridge offline — same
  // pattern as PropertySpec)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 20).flatMap(i =>
      Gen.zip(g1, g2).apply(Gen.Parameters.default, Seed(42L + i)))
      .foreach { case (a, b) => f(a, b) }

  private def stock(c: Column, s: Int): Column =
    sum(c.cast(DecimalType(18, s))).cast("double")
  private def fx(c: Column, s: Int): Column = FixedPointSum.dsum(c, s)

  private def parity(values: Seq[(Int, Double)], scale: Int): Unit = {
    val df = values.toDF("g", "v").repartition(7, col("g"))
    val a = df.groupBy("g").agg(stock(col("v"), scale).as("s"))
      .orderBy("g").collect().map(_.toString)
    val b = df.groupBy("g").agg(fx(col("v"), scale).as("s"))
      .orderBy("g").collect().map(_.toString)
    assert(a.sameElements(b), s"scale=$scale\n stock=${a.mkString(",")}\n fx=${b.mkString(",")}")
  }

  test("bit-identical to the stock decimal sum (grouped, shuffled partials)") {
    val vs = (1 to 5000).map(i =>
      (i % 13, math.rint((math.sin(i) * 1e6) * 100) / 100.0))
    parity(vs, 2)
    parity(vs, 4)
    parity(vs, 6)
  }

  test("negative, tiny and large money values, all scales") {
    val vs = Seq(0.01, -0.01, 0.005, -0.005, 99999999.99, -99999999.99,
      123.456, -123.456, 0.0, 1e-9, -1e-9).zipWithIndex.map(p => (p._2 % 3, p._1))
    for (s <- Seq(0, 2, 4, 6)) parity(vs, s)
  }

  test("property: random doubles match the stock decimal sum bitwise") {
    val genV = Gen.chooseNum(-1e9, 1e9)
    forAll(Gen.listOfN(200, genV), Gen.oneOf(0, 2, 4)) { (xs, s) =>
      parity(xs.zipWithIndex.map(p => (p._2 % 5, p._1)), s)
    }
  }

  test("nulls are skipped; an all-null group yields null") {
    val df = Seq((1, Some(2.5)), (1, None), (1, Some(0.5)), (2, None))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(fx(col("v"), 2).as("s"))
      .orderBy("g").collect()
    assert(rows(0).getDouble(1) == 3.0)
    assert(rows(1).isNullAt(1))
  }

  test("window running frame parity with the stock decimal sum") {
    val w = Window.partitionBy(col("g")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = (1 to 300).map(i => (i % 4, i, i * 1.01)).toDF("g", "i", "v")
    val a = df.select(col("g"), col("i"),
      sum(col("v").cast(DecimalType(18, 2))).over(w).cast("double").as("r"))
      .orderBy("g", "i").collect().map(_.toString)
    val b = df.select(col("g"), col("i"), fx(col("v"), 2).over(w).as("r"))
      .orderBy("g", "i").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("SQL-registered dsum(x, scale) matches the stock decimal sum") {
    graft.functions.VectorFunctions.register(spark)
    val df = (1 to 1000).map(i => (i % 7, i * 1.37)).toDF("g", "v")
    df.createOrReplaceTempView("fx_sql_t")
    val a = spark.sql(
      "SELECT g, CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s " +
      "FROM fx_sql_t GROUP BY g ORDER BY g").collect().map(_.toString)
    val b = spark.sql(
      "SELECT g, dsum(v, 2) AS s FROM fx_sql_t GROUP BY g ORDER BY g")
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("wide path: unscaled sums beyond int64 stay within 1 ulp of exact") {
    // feed pre-scaled longs straight into the aggregate (scale 0):
    // 40 × 9e17 = 3.6e19 overflows int64 into the hi limb
    val longs = Seq.fill(40)(900000000000000000L) ++ Seq.fill(10)(-7L)
    val df = longs.toDF("v").repartition(5)
    val agg = Bridge.column(
      FixedPointSum(Bridge.expression(col("v")), 0).toAggregateExpression())
    val got = df.agg(agg.as("s")).collect()(0).getDouble(0)
    val exact = longs.map(BigDecimal(_)).sum.toDouble
    val ulp = math.ulp(exact)
    assert(math.abs(got - exact) <= ulp,
      s"got=$got exact=$exact diff=${got - exact} ulp=$ulp")
  }
}
