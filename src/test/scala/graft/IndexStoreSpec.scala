package graft

import org.apache.spark.sql.functions._

/** Property/range indexes on user collections (G7/G8 user side —
  * reference `collection/graph/property_index.rs` / `range_index.rs`,
  * REST `handlers/indexes.rs`). Spark shape: "create index" range-
  * clusters the collection parquet by the property and every publish
  * re-applies the clustering, so parquet row-group min/max stats prune
  * property predicates — the 100 TB-viable realization of the
  * reference's in-memory hash/range maps. */
class IndexStoreSpec extends SparkSpecBase {

  private def freshCols(): Collections = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx").toString
    new Collections(spark, tmp)
  }

  private def seed(cols: Collections, n: Int = 400): Unit = {
    import spark.implicits._
    cols.create("readings", idCol = "id", vectorCol = None)
    // write via several partitions so the clustered layout has >1 file
    cols.upsert("readings",
      (1 to n).map(i => (i.toLong, (i * 37 % n).toLong, s"s$i"))
        .toDF("id", "temp", "site").repartition(4))
  }

  /** Per-parquet-file (min, max) of `colName` under the points dir. */
  private def fileRanges(cols: Collections, name: String,
      colName: String): Seq[(Long, Long)] = {
    val dir = cols.table(name).get.inputFiles.toSeq
    dir.map { f =>
      val r = spark.read.parquet(f).agg(min(col(colName)), max(col(colName))).first()
      (r.getLong(0), r.getLong(1))
    }
  }

  test("createIndex range-clusters the parquet; upserts keep the layout") {
    val cols = freshCols()
    seed(cols)
    val card = cols.createIndex("readings", "Point", "temp", "range")
    // cardinality is HLL++-approximate by design; exact in this regime
    // but allow the estimator's documented tolerance
    assert(math.abs(card - 400) <= 20, s"cardinality $card not ~400")
    assert(cols.listIndexes("readings").map(i => (i("label"), i("property"))) ==
      Seq(("Point", "temp")))
    // clustered = file ranges pairwise disjoint (row-group pruning
    // across files) AND rows sorted inside each file (pruning within a
    // file's row groups). Tiny stores legitimately collapse to one file
    // — the read side has one input partition — so the file COUNT isn't
    // asserted, the ordering invariants are.
    assertClustered(cols, "readings", "temp")
    // an upsert republishes through the clustering (index maintenance)
    import spark.implicits._
    cols.upsert("readings",
      (401 to 500).map(i => (i.toLong, (i * 37 % 400).toLong, s"s$i"))
        .toDF("id", "temp", "site").repartition(4))
    assert(cols.count("readings") == 500)
    assertClustered(cols, "readings", "temp")
  }

  private def assertClustered(cols: Collections, name: String,
      colName: String): Unit = {
    val ranges = fileRanges(cols, name, colName).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, s"file ranges overlap: $ranges")
      case _ => () // single file
    }
    cols.table(name).get.inputFiles.foreach { f =>
      val vals = spark.read.parquet(f).select(colName).collect().map(_.getLong(0))
      assert(vals.sameElements(vals.sorted), s"rows not sorted by $colName in $f")
    }
  }

  test("predicates on the indexed property reach the parquet scan") {
    val cols = freshCols()
    seed(cols)
    cols.createIndex("readings", "Point", "temp", "range")
    val p = cols.table("readings").get.where(col("temp") > 100)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // pushed filter + range-clustered files = row-group pruned read
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(temp,100)"),
      p.take(2000))
  }

  test("dropIndex stops clustering; bad index args are rejected") {
    val cols = freshCols()
    seed(cols, 50)
    assert(math.abs(cols.createIndex("readings", "Point", "temp", "hash") - 50) <= 5)
    assert(cols.dropIndex("readings", "Point", "temp"))
    assert(!cols.dropIndex("readings", "Point", "temp")) // already gone
    assert(cols.listIndexes("readings").isEmpty)
    intercept[IllegalArgumentException] {
      cols.createIndex("readings", "Point", "temp", "btree") // unknown type
    }
    intercept[IllegalArgumentException] {
      cols.createIndex("readings", "Point", "no_such_col", "range")
    }
  }

  test("index routes over HTTP: create 201 / list / delete / 404") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx-rest").toString
    val g2 = Graft(spark, tmp)
    val s2 = new server.RestServer(g2, port = 0).start()
    try {
      val b = s"http://127.0.0.1:${s2.boundPort}"
      val client = java.net.http.HttpClient.newHttpClient()
      def send(r: java.net.http.HttpRequest) =
        client.send(r, java.net.http.HttpResponse.BodyHandlers.ofString())
      def post(path: String, body: String) =
        send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$b$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build())
      def get(path: String) =
        send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$b$path"))
          .GET().build())
      post("/collections", """{"name": "m", "id_col": "id"}""")
      post("/collections/m/points",
        """{"points": [{"id": 1, "payload": {"score": 5}},
          |            {"id": 2, "payload": {"score": 9}}]}""".stripMargin)
      val created = post("/collections/m/indexes",
        """{"label": "Point", "property": "score", "index_type": "range"}""")
      assert(created.statusCode() == 201, created.body())
      // cardinality is HLL++-approximate — assert presence and range,
      // not an exact value (consistent with the tolerance assertions in
      // the createIndex tests above)
      val cardM = """"cardinality":(\d+)""".r.findFirstMatchIn(created.body())
      assert(cardM.exists(m => (1L to 3L).contains(m.group(1).toLong)),
        created.body())
      assert(get("/collections/m/indexes").body().contains("\"property\":\"score\""))
      val bad = post("/collections/m/indexes",
        """{"label": "Point", "property": "score", "index_type": "btree"}""")
      assert(bad.statusCode() == 400)
      val del = send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$b/collections/m/indexes/Point/score")).DELETE().build())
      assert(del.statusCode() == 200)
      assert(send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$b/collections/m/indexes/Point/score")).DELETE().build())
        .statusCode() == 404)
    } finally s2.stop()
  }
}
