package graft

import org.apache.spark.sql.functions._

/** operators.Chunking — sliding-window RAG chunker (q164 pins sf0.01
  * values vs DuckDB; these specs pin the boundary arithmetic). */
class ChunkingSpec extends SparkSpecBase {
  import graft.operators.Chunking
  import spark.implicits._

  private def chunks(text: String, w: Int, s: Int) =
    Chunking.slidingWindow(Seq((1L, text)).toDF("doc_id", "text"),
        "text", "doc_id", w, s)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))

  test("short doc yields one full-doc chunk") {
    assert(chunks("a b c", 5, 2).toSeq == Seq((0L, "a b c", 3L)))
  }

  test("exact window size yields exactly one chunk") {
    assert(chunks("a b c d", 4, 2).toSeq == Seq((0L, "a b c d", 4L)))
  }

  test("one token past the window starts a second, overlapping chunk") {
    val got = chunks("a b c d e", 4, 2).toSeq
    assert(got == Seq((0L, "a b c d", 4L), (1L, "c d e", 3L)))
  }

  test("stride == window means no overlap and full coverage") {
    val got = chunks("a b c d e f g", 3, 3).toSeq
    assert(got == Seq((0L, "a b c", 3L), (1L, "d e f", 3L), (2L, "g", 1L)))
    // every token appears exactly once
    assert(got.flatMap(_._2.split(" ")).toSeq == Seq("a", "b", "c", "d", "e", "f", "g"))
  }

  test("whitespace runs collapse and empty docs emit nothing") {
    assert(chunks("  a   b  ", 4, 2).toSeq == Seq((0L, "a b", 2L)))
    val empty = Chunking.slidingWindow(
      Seq((1L, "   "), (2L, "")).toDF("doc_id", "text"), "text", "doc_id", 4, 2)
    assert(empty.count() == 0)
  }

  test("overlap invariant: consecutive chunks share window-stride tokens") {
    val got = chunks("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 6, 2)
    got.sliding(2).foreach {
      case Array((_, a, _), (_, b, _)) =>
        val at = a.split(" ").toSeq
        val bt = b.split(" ").toSeq
        assert(at.drop(2) == bt.take(at.length - 2))
      case _ =>
    }
  }
}
