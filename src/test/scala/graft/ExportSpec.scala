package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, Export}

/** [[graft.operators.Export]] and [[graft.operators.Embeddings]] —
  * the export-stage operators: deterministic shard layout invariants
  * (total coverage, dense 1..n positions per shard, determinism across
  * runs) and the embedding transforms against hand-computed values
  * (truncated norm, unit output, SQ8 range endpoints, zero-vector and
  * constant-dimension edge cases). */
class ExportSpec extends SparkSpecBase {
  import spark.implicits._

  test("shuffleShards: every row lands in exactly one shard with dense positions") {
    val df = spark.range(0, 1000).toDF("id")
    val out = Export.shuffleShards(df, "id", 8)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 1000)
    assert(out.map(_._1).toSet == (0L until 1000L).toSet)
    assert(out.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are 1..n within each shard, no gaps or duplicates
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: a second run produces the identical layout
    val again = Export.shuffleShards(df, "id", 8)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    // the order decorrelates from id order: within some shard the
    // id sequence under pos order is not monotone
    val monotone = out.groupBy(_._2).values.forall { rows =>
      val ids = rows.sortBy(_._3).map(_._1).toSeq
      ids == ids.sorted
    }
    assert(!monotone)
  }

  test("shuffleShards rejects a non-positive shard count") {
    intercept[IllegalArgumentException] {
      Export.shuffleShards(spark.range(1).toDF("id"), "id", 0)
    }
  }

  test("matryoshka: norm of kept prefix, unit output, zero vector stays zero") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f, 12.0f)),   // prefix-2 norm 5, full norm 13
      (2L, Seq(0.0f, 0.0f, 7.0f))     // zero prefix
    ).toDF("id", "v")
    val out = Embeddings.matryoshka(df, "v", 2)
      .select("id", "v_tnorm", "v_trunc").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2)))
      .sortBy(_._1)
    assert(out(0)._2 == 5.0)
    assert(out(0)._3 == Seq(0.6, 0.8))
    assert(out(1)._2 == 0.0)
    assert(out(1)._3 == Seq(0.0, 0.0)) // no NaN from 0/0
  }

  test("l2Normalize produces unit vectors and preserves direction") {
    val df = Seq((1L, Seq(3.0f, 4.0f))).toDF("id", "v")
    val out = Embeddings.l2Normalize(df, "v")
      .select("v_unit").head.getSeq[Double](0)
    assert(out == Seq(0.6, 0.8))
  }

  test("sq8: range endpoints map to -128/127, constant dimension codes 0") {
    val df = Seq(
      (1L, Seq(-1.0f, 5.0f)),
      (2L, Seq(0.0f, 5.0f)),
      (3L, Seq(1.0f, 5.0f))
    ).toDF("id", "v")
    val out = Embeddings.sq8(df, "v")
      .select("id", "v_sq8").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    // dim 0 spans [-1, 1]: min → -128, mid → round(0.5*255)-128 = 0, max → 127
    assert(out(0)._2(0) == -128)
    assert(out(1)._2(0) == 0)
    assert(out(2)._2(0) == 127)
    // dim 1 constant → 0 for every row
    assert(out.forall(_._2(1) == 0))
  }
}
