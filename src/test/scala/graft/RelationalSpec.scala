package graft

import org.apache.spark.sql.Row

/** Smoke + semantics checks for the relational operator queries.
  * Full value-level verification runs against the DuckDB oracle
  * (tools/check_oracle.py / the driver's t2 gate). */
class RelationalSpec extends SparkSpecBase {

  test("every registered query executes and has a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q01_tpch_q1 aggregates match a hand-computed slice") {
    val df = SparkEntry.queries("q01_tpch_q1")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // sum_qty must equal the exact sum over the filtered slice
    import org.apache.spark.sql.functions._
    val li = Tables.table(spark, sfDir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
    val expect = li.groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("count_order") == expect(key), s"count mismatch at $key")
    }
  }

  test("q21_union distinct-ness holds") {
    val df = SparkEntry.queries("q21_union")(spark, sfDir)
    assert(df.count() == df.distinct().count())
  }

  test("entry flagship returns top-10 scored rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse), "scores must be descending")
  }
}
