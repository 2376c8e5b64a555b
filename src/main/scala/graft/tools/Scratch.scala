package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling scratchpad (builder-side tool, not part of the
  * library surface — contents change per investigation). */
object Scratch {
  def time(label: String)(f: => Long): Unit = {
    val r1 = { f; 0L } // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"SCRATCH $label min=${ts.map(_._1).min}%.3f s rows=${ts.head._2}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.table(spark, sfDir, "documents")
    docs.count()

    val n = 4
    val gramH = (0 until n).map(j => s"tks[i + $j]").mkString("xxhash64(", ", ", ")")
    def tok = docs.select(col("doc_id"),
      expr("filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)").as("tks"))
    def g = tok.where(size(col("tks")) >= n)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(tks) - $n), i -> $gramH)")))
      .toDF("doc_id", "pos", "gram")

    time("tokenize only")(tok.select(sum(size(col("tks")))).queryExecution.toRdd.count())
    time("explode grams, no shuffle")(g.select(count(lit(1))).queryExecution.toRdd.count())
    time("gram groupBy agg")(g.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1).queryExecution.toRdd.count())
    time("gram agg + join back")( {
      val dup = g.groupBy("gram").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1).select("gram")
      g.join(dup, Seq("gram")).queryExecution.toRdd.count()
    })
    time("gram count window")( {
      import org.apache.spark.sql.expressions.Window
      g.withColumn("cnt", count(lit(1)).over(Window.partitionBy("gram")))
        .where(col("cnt") > 1).queryExecution.toRdd.count()
    })

    val cw = 10
    def ch = tok.select(col("doc_id"),
        posexplode(expr(
          s"""CASE WHEN size(tks) = 0 THEN array()
             |ELSE transform(sequence(0, cast(ceil(size(tks) / $cw.0) as int) - 1),
             |               i -> concat_ws(' ', slice(tks, i * $cw + 1, $cw)))
             |END""".stripMargin)))
      .toDF("doc_id", "cidx", "chunk")
    time("chunk explode only")(ch.select(count(lit(1))).queryExecution.toRdd.count())
    time("chunk window by string")( {
      import org.apache.spark.sql.expressions.Window
      ch.withColumn("rn", row_number().over(Window.partitionBy("chunk").orderBy("doc_id", "cidx")))
        .where(col("rn") === 1).queryExecution.toRdd.count()
    })
    time("chunk window by hash")( {
      import org.apache.spark.sql.expressions.Window
      ch.withColumn("h", xxhash64(col("chunk")))
        .withColumn("rn", row_number().over(Window.partitionBy("h").orderBy("doc_id", "cidx")))
        .where(col("rn") === 1).queryExecution.toRdd.count()
    })
    time("chunk dup agg narrow")( {
      ch.select(xxhash64(col("chunk")).as("h")).groupBy("h").agg(count(lit(1)).as("c"))
        .where(col("c") > 1).queryExecution.toRdd.count()
    })
    time("full q158")(graft.SparkEntry.queries("q158_chunk_dedup")(spark, sfDir)
      .queryExecution.toRdd.count())
    time("full q178")(graft.SparkEntry.queries("q178_dup_spans")(spark, sfDir)
      .queryExecution.toRdd.count())
    spark.stop()
  }
}
