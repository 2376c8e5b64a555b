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
      .config(graft.SessionTuning.localConfigMap)
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

    // ---- q179 DSIR: where do the two passes spend?
    {
      val docs2 = graft.Tables.table(spark, sfDir, "documents")
      val occ = graft.SparkEntry.queries("q179_dsir_weights") // just to warm
      val occTab = graft.Materialize(spark, sfDir, "dsir_occ4096", Seq("documents"), Some("doc_id")) {
        graft.operators.Dsir.occurrences(docs2, 4096)
      }
      time("occ scan only")(occTab.select(count(lit(1))).queryExecution.toRdd.count())
      time("distribution agg (flags join)")( {
        val flags = docs2.select(col("doc_id"), (col("lang") === "en").as("__is_t"))
        occTab.join(flags, Seq("doc_id")).groupBy("fid").agg(
          sum(when(col("__is_t"), col("cnt")).otherwise(0L)).as("ct"),
          sum(col("cnt")).as("cr")).queryExecution.toRdd.count()
      })
      time("distribution agg (broadcast flags)")( {
        val flags = broadcast(docs2.select(col("doc_id"), (col("lang") === "en").as("__is_t")))
        occTab.join(flags, Seq("doc_id")).groupBy("fid").agg(
          sum(when(col("__is_t"), col("cnt")).otherwise(0L)).as("ct"),
          sum(col("cnt")).as("cr")).queryExecution.toRdd.count()
      })

      time("occ count rows")(occTab.queryExecution.toRdd.count())
      time("agg no-join")(occTab.groupBy("fid").agg(sum(col("cnt")).as("cr"))
        .queryExecution.toRdd.count())

      println("=== agg no-join plan ===")
      occTab.groupBy("fid").agg(sum(col("cnt")).as("cr")).explain()
      val sc = spark.sparkContext
      @volatile var jobs = 0; @volatile var stages = 0; @volatile var tasks = 0
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = { jobs += 1; stages += j.stageInfos.size }
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = tasks += 1
      })
      occTab.groupBy("fid").agg(sum(col("cnt")).as("cr")).queryExecution.toRdd.count()
      Thread.sleep(300)
      println(s"JOBMETA agg-no-join jobs=$jobs stages=$stages tasks=$tasks")

      val nation = graft.Tables.table(spark, sfDir, "nation")
      time("calibrate: nation distinct (AQE exchange)")(
        nation.select("n_regionkey").distinct().queryExecution.toRdd.count())
      time("calibrate: occ distinct fid")(
        occTab.select("fid").distinct().queryExecution.toRdd.count())

      occTab.write.mode("overwrite").parquet("/tmp/occ_copy")
      val occCopy = spark.read.parquet("/tmp/occ_copy")
      time("occ COPY distinct fid")(
        occCopy.select("fid").distinct().queryExecution.toRdd.count())
      println("occ files: " + new java.io.File(occTab.queryExecution.analyzed.collectLeaves().head.toString.split("\\[").lift(0).getOrElse("?")))
      val p = occTab.queryExecution.optimizedPlan.collectLeaves().head
      println("occ leaf: " + p.getClass.getSimpleName)

      {
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(sc2: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc2.stageInfo
            println(f"STAGEMETA id=${si.stageId} name=${si.name.take(40)} tasks=${si.numTasks} " +
              f"run=${si.taskMetrics.executorRunTime}ms cpu=${si.taskMetrics.executorCpuTime/1000000}ms " +
              f"deser=${si.taskMetrics.executorDeserializeTime}ms wall=${si.completionTime.getOrElse(0L)-si.submissionTime.getOrElse(0L)}ms")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0=System.nanoTime
        occCopy.select("fid").distinct().queryExecution.toRdd.count()
        println(f"TOTALWALL ${(System.nanoTime-t0)/1e9}%.3f")
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
      }

      time("occ copy global sum (no groupBy)")(
        occCopy.select(sum(col("cnt"))).queryExecution.toRdd.count())
      time("synthetic range groupBy (369k rows)")(
        spark.range(369242).select((col("id") % 865).as("fid"), lit(1L).as("cnt"))
          .groupBy("fid").agg(sum(col("cnt"))).queryExecution.toRdd.count())
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("occ copy distinct fid AQE OFF")(
        occCopy.select("fid").distinct().queryExecution.toRdd.count())
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      time("full q179")(graft.SparkEntry.queries("q179_dsir_weights")(spark, sfDir)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
