package graft

import org.apache.spark.sql.functions._

/** [[org.apache.spark.sql.graft.FixedPointSumRule]] — the extension
  * rewrite of `CAST(sum(CAST(x AS DECIMAL(≤18,s))) AS DOUBLE)` into the
  * int128 aggregate must fire on grouped and windowed sums, skip every
  * non-qualifying shape, honor its escape conf, and stay bit-identical
  * to the un-rewritten plan.
  */
class FixedPointSumRuleSpec extends SparkSpecBase {

  private lazy val ext = {
    // getOrCreate would hand back the extension-less shared session —
    // clear the default so a NEW session (same SparkContext) is built
    // with the extensions applied (AnnSpec pattern)
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[2]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    s
  }

  private def table(): Unit = {
    val rows = (1 to 2000).map(i => (i % 7, i * 1.37, i % 3 == 0))
    ext.createDataFrame(rows).toDF("g", "v", "flag")
      .createOrReplaceTempView("fxr_t")
  }

  private def optimized(sql: String): String =
    ext.sql(sql).queryExecution.optimizedPlan.toString

  test("rewrites the grouped money-sum idiom, bit-identically") {
    table()
    val q = "SELECT g, CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s " +
      "FROM fxr_t GROUP BY g ORDER BY g"
    assert(optimized(q).contains("fixed_point_sum"), optimized(q))
    val got = ext.sql(q).collect().map(_.toString)
    ext.conf.set("graft.dsum.rewrite", "false")
    try {
      val stockPlan = optimized(q)
      assert(!stockPlan.contains("fixed_point_sum"), stockPlan) // escape works
      val stock = ext.sql(q).collect().map(_.toString)
      assert(got.sameElements(stock))
    } finally ext.conf.unset("graft.dsum.rewrite")
  }

  test("rewrites window frames and FILTER clauses, bit-identically") {
    table()
    val w = "SELECT g, CAST(sum(CAST(v AS DECIMAL(18,2))) OVER " +
      "(PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
      "AS DOUBLE) AS r FROM fxr_t ORDER BY g, r"
    val f = "SELECT g, CAST(sum(CAST(v AS DECIMAL(18,2))) FILTER (WHERE flag) " +
      "AS DOUBLE) AS s FROM fxr_t GROUP BY g ORDER BY g"
    for (q <- Seq(w, f)) {
      assert(optimized(q).contains("fixed_point_sum"), optimized(q))
      val got = ext.sql(q).collect().map(_.toString)
      ext.conf.set("graft.dsum.rewrite", "false")
      val stock = try ext.sql(q).collect().map(_.toString)
        finally ext.conf.unset("graft.dsum.rewrite")
      assert(got.sameElements(stock), q)
    }
  }

  test("skips DISTINCT sums, wide precisions, and non-double consumers") {
    table()
    val skip = Seq(
      // distinct dedups on the pre-rewrite child — left alone
      "SELECT g, CAST(sum(DISTINCT CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s FROM fxr_t GROUP BY g",
      // precision 20: unscaled value does not fit one long
      "SELECT g, CAST(sum(CAST(v AS DECIMAL(20,2))) AS DOUBLE) AS s FROM fxr_t GROUP BY g",
      // result consumed AS DECIMAL — no double cast, stock semantics stay
      "SELECT g, sum(CAST(v AS DECIMAL(18,2))) AS s FROM fxr_t GROUP BY g")
    skip.foreach { q =>
      assert(!optimized(q).contains("fixed_point_sum"), q + "\n" + optimized(q))
    }
  }

  test("imperative register() attaches the rule to an already-built session") {
    graft.functions.VectorFunctions.register(spark) // idempotent
    graft.functions.VectorFunctions.register(spark)
    assert(spark.experimental.extraOptimizations.count(
      _.isInstanceOf[org.apache.spark.sql.graft.FixedPointSumRule]) == 1)
    val rows = (1 to 1000).map(i => (i % 5, i * 2.13))
    spark.createDataFrame(rows).toDF("g", "v").createOrReplaceTempView("fxr_imp")
    val q = "SELECT g, CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s " +
      "FROM fxr_imp GROUP BY g ORDER BY g"
    val plan = spark.sql(q).queryExecution.optimizedPlan.toString
    assert(plan.contains("fixed_point_sum"), plan)
    spark.conf.set("graft.dsum.rewrite", "false")
    val stock = try spark.sql(q).collect().map(_.toString)
      finally spark.conf.unset("graft.dsum.rewrite")
    assert(spark.sql(q).collect().map(_.toString).sameElements(stock))
  }

  test("rewrites the money-AVG idiom (grouped, window, FILTER), bit-identically") {
    table()
    val qs = Seq(
      "SELECT g, CAST(avg(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS a " +
        "FROM fxr_t GROUP BY g ORDER BY g",
      "SELECT g, CAST(avg(CAST(v AS DECIMAL(18,4))) FILTER (WHERE flag) " +
        "AS DOUBLE) AS a FROM fxr_t GROUP BY g ORDER BY g",
      "SELECT g, CAST(avg(CAST(v AS DECIMAL(18,2))) OVER " +
        "(PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS DOUBLE) AS r FROM fxr_t ORDER BY g, r")
    for (q <- qs) {
      assert(optimized(q).contains("fixed_point_avg"), q + "\n" + optimized(q))
      val got = ext.sql(q).collect().map(_.toString)
      ext.conf.set("graft.dsum.rewrite", "false")
      val stock = try ext.sql(q).collect().map(_.toString)
        finally ext.conf.unset("graft.dsum.rewrite")
      assert(got.sameElements(stock), q)
    }
  }

  test("SUM and AVG rewrite together in one aggregate (the Q1 shape)") {
    table()
    val q = "SELECT g, CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s, " +
      "CAST(avg(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS a, count(v) AS c " +
      "FROM fxr_t GROUP BY g ORDER BY g"
    val plan = optimized(q)
    assert(plan.contains("fixed_point_sum") && plan.contains("fixed_point_avg"), plan)
    val got = ext.sql(q).collect().map(_.toString)
    ext.conf.set("graft.dsum.rewrite", "false")
    val stock = try ext.sql(q).collect().map(_.toString)
      finally ext.conf.unset("graft.dsum.rewrite")
    assert(got.sameElements(stock))
  }

  test("AVG rewrite skips DISTINCT, wide precision, and decimal consumers") {
    table()
    val skip = Seq(
      "SELECT g, CAST(avg(DISTINCT CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS a FROM fxr_t GROUP BY g",
      "SELECT g, CAST(avg(CAST(v AS DECIMAL(20,2))) AS DOUBLE) AS a FROM fxr_t GROUP BY g",
      "SELECT g, avg(CAST(v AS DECIMAL(18,2))) AS a FROM fxr_t GROUP BY g")
    skip.foreach { q =>
      assert(!optimized(q).contains("fixed_point_avg"), q + "\n" + optimized(q))
    }
  }

  test("fires on a decimal COLUMN child too (no inner cast)") {
    val rows = (1 to 500).map(i => (i % 5, BigDecimal(i) * 0.25))
    ext.createDataFrame(rows).toDF("g", "d").createOrReplaceTempView("fxr_d")
    val q = "SELECT g, CAST(sum(d) AS DOUBLE) AS s FROM fxr_d GROUP BY g ORDER BY g"
    // createDataFrame infers DECIMAL(38,18) for BigDecimal — too wide; cast down
    val q18 = "SELECT g, CAST(sum(CAST(d AS DECIMAL(18,4))) AS DOUBLE) AS s " +
      "FROM fxr_d GROUP BY g ORDER BY g"
    val plan18 = optimized(q18)
    assert(plan18.contains("fixed_point_sum"), plan18)
    assert(!optimized(q).contains("fixed_point_sum")) // 38,18 skipped
    val got = ext.sql(q18).collect().map(_.toString)
    ext.conf.set("graft.dsum.rewrite", "false")
    val stock = try ext.sql(q18).collect().map(_.toString)
      finally ext.conf.unset("graft.dsum.rewrite")
    assert(got.sameElements(stock))
  }
}
