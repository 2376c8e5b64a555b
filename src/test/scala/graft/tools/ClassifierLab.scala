package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** q173 serving-path A/B (r16): the fused `aggregate()` HOF margin
  * (zero-shuffle, but HigherOrderFunction lambdas are INTERPRETED per
  * element — every gram pays an object-boxed md5+conv outside
  * whole-stage codegen) vs the exploded gram stream with the weight
  * lookup inside codegen and a map-side-combined per-doc agg (one row
  * per doc per partition reaches the exchange). Both end in r6, so the
  * scores agree on the 1e-6 grid. Usage:
  *   sbt "Test/runMain graft.tools.ClassifierLab <sfDir>"
  */
object ClassifierLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.table(spark, sfDir, "documents")
    docs.count()
    val dim = 1024
    val weights = spark.range(dim).select(col("id").as("fid"),
      (((col("id") * 2654435761L) % 1000) / 1000.0 - 0.5).as("w"))

    def time(label: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"CLS $label min=${ts.map(_._1).min}%.3f rows=${ts.head._2}")
    }

    // A: the shipped serving path (r16: the HashedGramMargin codegen
    // kernel — byte-direct md5, no per-gram hex/conv/concat allocs)
    time("shipped-scoreText") {
      graft.operators.Classifier.scoreText(docs, "text", "doc_id",
        weights, bias = 0.0, dim = dim).queryExecution.toRdd.count()
    }

    // A0: the pre-r16 fused HOF path (interpreted lambda per gram +
    // built-in md5-hex/conv chain) — kept as the regression comparator
    val dense0 = Array.fill(dim)(0.0)
    weights.collect().foreach(r => dense0(r.getLong(0).toInt) = r.getDouble(1))
    val wArr0 = typedlit(dense0.toSeq)
    time("hof-fused-old") {
      val toks = docs.select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0).as("w"))
      def r6o(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000L) + lit(0.5)) / lit(1000000.0)
      val gramsOf = concat(col("w"),
        zip_with(slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
          slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)))
      toks.where(size(col("w")) > 0)
        .select(col("doc_id"),
          r6o(aggregate(gramsOf, lit(0.0), (acc, g) => acc +
            element_at(wArr0, ((conv(substring(md5(g), 1, 15), 16, 10)
              .cast(LongType) % dim) + 1).cast("int")))).as("margin"))
        .withColumn("prob", r6o(lit(1.0) / (lit(1.0) + exp(-col("margin")))))
        .queryExecution.toRdd.count()
    }

    // B: explode + codegen lookup + map-side-combined per-doc agg
    val dense = Array.fill(dim)(0.0)
    weights.collect().foreach(r => dense(r.getLong(0).toInt) = r.getDouble(1))
    val wArr = typedlit(dense.toSeq)
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000L) + lit(0.5)) / lit(1000000.0)
    time("explode-agg") {
      val toks = docs.select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0).as("w"))
      val grams = toks.where(size(col("w")) > 0).select(col("doc_id"),
        explode(concat(col("w"),
          zip_with(slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
            slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
            (a, b) => concat(a, lit(" "), b)))).as("gram"))
      grams.select(col("doc_id"),
          element_at(wArr, ((conv(substring(md5(col("gram")), 1, 15), 16, 10)
            .cast(LongType) % dim) + 1).cast("int")).as("gw"))
        .groupBy(col("doc_id"))
        .agg(r6(sum(col("gw"))).as("margin"))
        .withColumn("prob", r6(lit(1.0) / (lit(1.0) + exp(-col("margin")))))
        .queryExecution.toRdd.count()
    }

    // r17 (VERDICT ask #6): the TRAIN-side kernel A/B — q174/q179's
    // shared gram→fid front half (Classifier.gramFids, also Dsir's
    // occurrence build) with the shipped Md5Fid kernel vs the pre-r16
    // hex/conv chain. Bit-parity is TextKernelsSpec-pinned, so the
    // delta is pure per-gram allocation cost.
    val gramsT = docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0).as("w"))
      .select(col("doc_id"), explode(concat(col("w"),
        zip_with(slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
          slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)))).as("gram"))
    def feats(fid: org.apache.spark.sql.Column): Long = gramsT
      .select(col("doc_id"), fid.as("fid"))
      .groupBy(col("doc_id"), col("fid")).agg(count(lit(1)).as("tf"))
      .queryExecution.toRdd.count()
    time("train-feats-kernel") {
      feats(org.apache.spark.sql.graft.Bridge.column(
        org.apache.spark.sql.graft.Md5Fid(
          org.apache.spark.sql.graft.Bridge.expression(col("gram")), dim)))
    }
    time("train-feats-oldchain") {
      feats(conv(substring(md5(col("gram")), 1, 15), 16, 10)
        .cast(LongType) % dim)
    }
    spark.stop()
  }
}
