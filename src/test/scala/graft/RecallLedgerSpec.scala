package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed reference-scale ANN recall table (PERF_r17_ann.md,
  * produced by tools.RecallCurve on the 100K×768D tile) to the
  * reference's Accurate bar: every `accurate` tier row and the exact
  * `perfect` row must carry recall@10 ≥ 0.95 (docs/BENCHMARKS.md:96-102
  * / benchmarks/README.md tier table). A regenerated table that dips a
  * tier below the bar turns this red instead of silently shipping a
  * weaker curve. The measurement itself is a one-off main (minutes of
  * wall time at 100K×768D), so the spec pins the LEDGER, exactly like
  * the committed PERF tables pin the perf narrative.
  */
class RecallLedgerSpec extends AnyFunSuite {

  private val path = java.nio.file.Paths.get("PERF_r17_ann.md")

  test("committed 100Kx768D recall table holds the >=0.95 Accurate+ bar") {
    assert(java.nio.file.Files.exists(path),
      "PERF_r17_ann.md missing — run tools.RecallCurve and commit the table")
    val lines = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala
    // table rows: | index | tier | params | recall@10 | avg ms |
    val rows = lines.filter(_.trim.startsWith("|")).flatMap { l =>
      l.split("\\|").map(_.trim).filter(_.nonEmpty) match {
        case Array(index, tier, _, recall, _*)
            if recall.matches("[0-9.]+") =>
          Some((index, tier, recall.toDouble))
        case _ => None
      }
    }
    assert(rows.nonEmpty, "no parsed data rows in PERF_r16_ann.md")
    val accuratePlus = rows.filter(r => r._2 == "accurate" || r._2 == "perfect")
    assert(accuratePlus.nonEmpty, "no accurate/perfect tier rows in the table")
    // every index structure must be represented at its accurate tier
    val indexes = accuratePlus.map(_._1).toSet
    assert(Set("lsh", "ivf", "hnsw", "pq").subsetOf(indexes),
      s"missing index structures in Accurate+ rows: $indexes")
    accuratePlus.foreach { case (index, tier, recall) =>
      assert(recall >= 0.95,
        s"$index/$tier recall@10 $recall below the 0.95 Accurate bar")
    }
  }
}
