package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver records only the last ~2000 chars of bench output, so the
  * final compact JSON line must always survive that tail whole — this
  * was silently broken for rounds 2-7 (the full per-query line is ~4.5k
  * chars; `parsed: null` every round). These checks keep the fix from
  * drifting as queries are added. No SparkSession needed.
  */
class BenchContractSpec extends AnyFunSuite {

  test("headline set names real, benchmarked queries") {
    val names = SparkEntry.allDefs.map(_.name).toSet
    val unknown = Bench.Headline -- names
    assert(unknown.isEmpty, s"headline entries not in allDefs: $unknown")
    val benched = SparkEntry.allDefs.filter(_.benchmarked).map(_.name).toSet
    val unbenched = Bench.Headline -- benched
    assert(unbenched.isEmpty,
      s"headline entries excluded from bench timing: $unbenched")
  }

  test("worst-case compact line fits the driver's 2000-char tail") {
    // mirror of Bench.main's final println: fixed fields + one
    // `"name":dddd.dddd` entry per headline query (worst case 9 digits)
    val fixed = ("""{"metric":"total","value":99999.9999,"unit":"sec",""" +
      """"queries":{},"n_queries":999,"cold_total_sec":99999.9999,""" +
      """"reps":9,"reps_headline":9,"var_max":9999.9999,""" +
      """"var_max_q":"q999_a_very_long_query_name_here",""" +
      """"sf":"/root/testdata/sf0.1"}""").length
    val perQuery = Bench.Headline.toSeq.map(_.length + 13).sum // "n":9999.9999,
    val worst = fixed + perQuery
    // leave headroom for sbt's [info]/[success] framing inside the tail
    assert(worst < 1700, s"compact bench line can reach $worst chars; " +
      "trim Bench.Headline or the driver will record parsed:null again")
  }

  test("compact line is strict JSON with the driver-contract fields") {
    // r17 verdict ask #1: BENCH_r16/r17 both recorded parsed:null. The
    // line itself must parse as one strict JSON object (sbt framing is
    // handled by build.sbt: run/outputStrategy=StdoutOutput drops the
    // [info] prefix, showSuccess:=false the [success] trailer).
    val warm = SparkEntry.allDefs.filter(_.benchmarked)
      .map(q => (q.name, 1234.5678))
    val line = Bench.compactLine(warm, 99999.9999, warm.size, 99999.9999,
      3, 7, 9999.9999, "q999_a_very_long_query_name_here",
      "/root/testdata/sf0.1")
    assert(!line.contains("\n"), "compact line must be a single line")
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((parsed \ "metric").extract[String] == "total")
    assert((parsed \ "value").extract[Double] == 99999.9999)
    assert((parsed \ "unit").extract[String] == "sec")
    val qs = (parsed \ "queries").extract[Map[String, Double]]
    assert(qs.keySet == Bench.Headline,
      "queries map must carry exactly the headline subset")
    assert((parsed \ "n_queries").extract[Int] == warm.size)
    assert((parsed \ "sf").extract[String] == "/root/testdata/sf0.1")
  }

  test("lifecycle pins are exactly the declared set") {
    val pins = SparkEntry.allDefs.filterNot(_.benchmarked).map(_.name).sorted
    assert(pins == Seq("q126_edge_store", "q129_agent_memory",
      "q130_importers", "q132_streaming_state", "q134_language_contract",
      "q136_streaming_ingest", "q137_storage_mode", "q138_graph_schema",
      "q142_collection_ann", "q165_streaming_predict", "q172_bpe_train",
      "q174_classifier_train", "q176_pca", "q187_storage_half",
      "q191_streaming_classify", "q192_bloom_dedup", "q194_merge_lifecycle",
      "q201_nullid_crud", "q202_uuid_import", "q203_having_guard",
      "q204_snapshot_timetravel", "q205_analytics_mode_parity",
      "q206_gc_grace_storm"),
      s"unexpected unbenchmarked queries: $pins — every exclusion from " +
        "bench timing must be a deliberate lifecycle pin")
  }
}
