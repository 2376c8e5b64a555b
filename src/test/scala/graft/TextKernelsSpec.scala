package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bit-parity pins for the md5-fid kernels (TextKernels /
  * TextHashExpressions): the byte-direct top-60-bits computation must
  * equal the `conv(substring(md5(g), 1, 15), 16, 10) % dim` convention
  * on every input — the classifier/DSIR feature convention is part of
  * the ORACLE contract (the DuckDB twins compute the same md5 chain),
  * so a kernel drift would silently flip q173/q179/q174 hashes. */
class TextKernelsSpec extends SparkSpecBase {
  import spark.implicits._

  private val dims = Seq(7, 1024, 4096)

  test("Md5Fid equals the hex/conv chain on random unicode grams") {
    val rnd = new scala.util.Random(42)
    val grams = (1 to 500).map { i =>
      val n = rnd.nextInt(24) + 1
      val chars = (0 until n).map { _ =>
        rnd.nextInt(5) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => ('0' + rnd.nextInt(10)).toChar.toString
          case 2 => " "
          case 3 => "é"
          case 4 => "日"
        }
      }.mkString
      chars
    } ++ Seq("", "a", "spark stream", "a b")
    val df = grams.toDF("g")
    dims.foreach { dim =>
      val cmp = df.select(
        org.apache.spark.sql.graft.Bridge.column(
          org.apache.spark.sql.graft.Md5Fid(
            org.apache.spark.sql.graft.Bridge.expression(col("g")), dim)).as("k"),
        (conv(substring(md5(col("g")), 1, 15), 16, 10).cast(LongType) % dim).as("c"))
      assert(cmp.where(col("k") =!= col("c")).count() == 0,
        s"fid kernel diverges from hex/conv chain at dim=$dim")
    }
  }

  test("HashedGramMargin equals the aggregate-HOF fold bit-for-bit") {
    val docs = Seq(
      "spark makes big joins fast",
      "la tabla grande es rápida",
      "one",
      "a b c d e f g h i j k l m n o p",
      "dup dup dup dup").toDF("text").withColumn("doc_id",
        monotonically_increasing_id())
    val dim = 64
    val dense = Array.tabulate(dim)(i => ((i * 2654435761L) % 1000) / 1000.0 - 0.5)
    val wArr = typedlit(dense.toSeq)
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0).as("w"))
    val gramsOf = concat(col("w"),
      zip_with(slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
        slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)))
    val hof = aggregate(gramsOf, lit(0.0), (acc, g) => acc +
      element_at(wArr, ((conv(substring(md5(g), 1, 15), 16, 10)
        .cast(LongType) % dim) + 1).cast("int")))
    val kernel = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.HashedGramMargin(
        org.apache.spark.sql.graft.Bridge.expression(col("w")), dense))
    val cmp = toks.select(hof.as("h"), kernel.as("k")).collect()
    cmp.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"margin fold diverges: hof=${r.getDouble(0)} kernel=${r.getDouble(1)}"))
  }

  test("HashedGramMargin rejects null token elements with a typed error") {
    val df = Seq(Tuple1(Seq("a", null, "b"))).toDF("w")
    val kernel = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.HashedGramMargin(
        org.apache.spark.sql.graft.Bridge.expression(col("w")),
        Array.fill(8)(0.1)))
    val e = intercept[Exception](df.select(kernel).collect())
    assert(e.getMessage != null)
  }

  test("Md5Prefix equals the hex/conv chain on random unicode strings") {
    val rnd = new scala.util.Random(43)
    val strs = (1 to 500).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        rnd.nextInt(6) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => ('0' + rnd.nextInt(10)).toChar.toString
          case 2 => " "
          case 3 => "é"
          case 4 => "日"
          case 5 => ('A' + rnd.nextInt(26)).toChar.toString
        }
      }.mkString
    } ++ Seq("", "a", "12345", "spark stream", "a b c")
    val df = strs.toDF("g")
    Seq(1, 8, 15).foreach { nib =>
      val cmp = df.select(
        org.apache.spark.sql.graft.Bridge.column(
          org.apache.spark.sql.graft.Md5Prefix(
            org.apache.spark.sql.graft.Bridge.expression(col("g")), nib)).as("k"),
        conv(substring(md5(col("g")), 1, nib), 16, 10).cast(LongType).as("c"))
      assert(cmp.where(col("k") =!= col("c")).count() == 0,
        s"md5Prefix diverges from hex/conv chain at nibbles=$nib")
    }
  }

  test("Md5Prefix propagates null and stays parity inside a transform lambda") {
    // null input → null output (same as the built-in chain)
    val withNull = Seq(Some("abc"), None).toDF("g")
    val k = withNull.select(org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.Md5Prefix(
        org.apache.spark.sql.graft.Bridge.expression(col("g")), 15)).as("k"))
      .collect()
    assert(!k(0).isNullAt(0) && k(1).isNullAt(0))
    // the fingerprint builders run the kernel INSIDE transform() (HOFs
    // evaluate interpreted) — pin that placement explicitly
    val arr = Seq(Tuple1(Seq("spark", "joins", "fast", "43"))).toDF("tks")
    val viaKernel = arr.select(transform(col("tks"), t =>
      org.apache.spark.sql.graft.Bridge.column(
        org.apache.spark.sql.graft.Md5Prefix(
          org.apache.spark.sql.graft.Bridge.expression(t), 15))).as("h"))
      .collect()(0).getSeq[Long](0)
    val viaChain = arr.select(expr(
      "transform(tks, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))")
      .as("h")).collect()(0).getSeq[Long](0)
    assert(viaKernel == viaChain)
  }
}
