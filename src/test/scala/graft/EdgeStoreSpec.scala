package graft

import org.apache.spark.sql.functions._

/** Per-collection mutable edge store (S5 user side — reference
  * `collection/core/graph_api.rs:40-107` add_edge/remove_edge): edges are
  * a second generation-published parquet frame next to `points`, and
  * MATCH / BFS on a user collection traverse IT, not the derived dataset
  * graph. */
class EdgeStoreSpec extends SparkSpecBase {

  private def freshGraft(): Graft = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-edges").toString
    Graft(spark, tmp)
  }

  private def seed(g: Graft): Unit = {
    import spark.implicits._
    g.collections.create("social", idCol = "id", vectorCol = None)
    g.collections.upsert("social",
      Seq((1L, "ann"), (2L, "bob"), (3L, "cat"), (4L, "dan"))
        .toDF("id", "name"))
    g.collections.upsertEdges("social",
      Seq((10L, 1L, 2L, "knows", 0.9), (11L, 2L, 3L, "knows", 0.5),
        (12L, 3L, 4L, "knows", 0.7), (13L, 1L, 4L, "blocks", 1.0))
        .toDF("id", "src", "dst", "label", "weight"))
  }

  test("upsertEdges merges by edge id; deleteEdges removes") {
    val g = freshGraft()
    seed(g)
    assert(g.collections.edges("social").get.count() == 4)
    import spark.implicits._
    // replace edge 11's target (merge-by-id), add edge 14
    g.collections.upsertEdges("social",
      Seq((11L, 2L, 4L, "knows", 0.6), (14L, 4L, 1L, "knows", 0.2))
        .toDF("id", "src", "dst", "label", "weight"))
    val e = g.collections.edges("social").get
    assert(e.count() == 5)
    assert(e.where(col("id") === 11 && col("dst") === 4).count() == 1)
    g.collections.deleteEdges("social", Seq(13L, 14L))
    assert(g.collections.edges("social").get.count() == 3)
  }

  test("id-less edges get auto-assigned ids above the stored max") {
    val g = freshGraft()
    seed(g)
    import spark.implicits._
    g.collections.upsertEdges("social",
      Seq((4L, 2L, "follows"), (4L, 3L, "follows")).toDF("src", "dst", "label"))
    val e = g.collections.edges("social").get
    assert(e.count() == 6)
    val autoIds = e.where(col("label") === "follows").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(autoIds == Seq(14L, 15L), s"expected 14,15 got $autoIds")
  }

  test("edge frame is (label, src)-clustered and label filters push to the scan") {
    val g = freshGraft()
    seed(g)
    val e = g.collections.edges("social").get
    // every file sorted by (label, src) → row-group stats prune typed
    // traversals; with one file the in-file sort is the whole invariant
    e.inputFiles.foreach { f =>
      val rows = spark.read.parquet(f).select("label", "src").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)), s"unsorted edges in $f")
    }
    val p = e.where(col("label") === "knows").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(label,knows)"),
      p.take(2000))
  }

  test("auto edge ids never collide with explicit ids in the same batch") {
    val g = freshGraft()
    seed(g) // stored max id = 13
    import spark.implicits._
    // regression: autos numbered over ALL rows would assign this auto row
    // 13+2=15, colliding with the explicit 15 and making the merge
    // window's survivor nondeterministic
    g.collections.upsertEdges("social",
      Seq((Some(15L), 2L, 1L, "follows"), (None, 3L, 1L, "follows"))
        .toDF("id", "src", "dst", "label"))
    val e = g.collections.edges("social").get
    assert(e.count() == 6)
    assert(e.select("id").distinct().count() == 6, "edge ids must be unique")
    val follows = e.where(col("label") === "follows")
      .select("id", "src").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // explicit row keeps 15; the auto row starts ABOVE the batch max
    assert(follows == Set((15L, 2L), (16L, 3L)), s"got $follows")
  }

  test("MATCH with graphScope runs over the user edge store") {
    val g = freshGraft()
    seed(g)
    // 1-hop typed
    val hop = g.sql("MATCH (a:Point)-[:knows]->(b:Point) RETURN a.id AS s, b.id AS d",
      graphScope = Some("social")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hop == Set((1L, 2L), (2L, 3L), (3L, 4L)))
    // node property filter on the payload + edge property filter
    val filt = g.sql(
      "MATCH (a:Point {name: 'ann'})-[r:knows {weight: 0.9}]->(b) RETURN b.id AS d",
      graphScope = Some("social")).collect().map(_.getLong(0)).toSeq
    assert(filt == Seq(2L))
    // var-length over user edges: 1..3 hops from ann via knows
    val reach = g.sql(
      "MATCH (a:Point {name: 'ann'})-[:knows*1..3]->(b) RETURN b.id AS d",
      graphScope = Some("social")).collect().map(_.getLong(0)).toSet
    assert(reach == Set(2L, 3L, 4L))
    // (without the scope, MATCH compiles against the derived dataset
    // graph — covered by RestServerSpec's graph routes over sfDir)
  }

  test("mutations are visible to the next MATCH (generation republish)") {
    val g = freshGraft()
    seed(g)
    def knows(): Set[(Long, Long)] =
      g.sql("MATCH (a)-[:knows]->(b) RETURN a.id AS s, b.id AS d",
        graphScope = Some("social")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(knows().size == 3)
    g.collections.deleteEdges("social", Seq(11L))
    assert(knows() == Set((1L, 2L), (3L, 4L)))
  }

  test("concurrent id-less edge upserts never collide on auto-assigned ids") {
    val g = freshGraft()
    seed(g) // ids 10..13 stored
    import spark.implicits._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit =
            g.collections.upsertEdges("social",
              Seq((1L, 2L + t, s"auto$t")).toDF("src", "dst", "label"))
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val e = g.collections.edges("social").get
    assert(e.count() == 8, "4 seeded + 4 concurrent")
    val ids = e.select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size, s"duplicate auto ids: $ids")
  }

  test("REST: GET edge by id and node edge listing (direction/label filters)") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val g = freshGraft()
    seed(g)
    val srv = new server.RestServer(g, port = 0).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val client = HttpClient.newHttpClient()
      def get(path: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      val one = get("/collections/social/graph/edges/11")
      assert(one.statusCode() == 200 && one.body().contains("\"dst\":3"), one.body())
      assert(get("/collections/social/graph/edges/999").statusCode() == 404)
      // node 1: out-edges = knows(1->2) + blocks(1->4); in = none
      val out = get("/collections/social/graph/nodes/1/edges?direction=out")
      assert(out.statusCode() == 200 && out.body().contains("\"count\":2"), out.body())
      val outKnows = get("/collections/social/graph/nodes/1/edges?direction=out&label=knows")
      assert(outKnows.body().contains("\"count\":1"), outKnows.body())
      val in4 = get("/collections/social/graph/nodes/4/edges?direction=in")
      assert(in4.body().contains("\"count\":2"), in4.body()) // knows(3->4) + blocks(1->4)
      // by-label listing (handlers/graph/handlers.rs get_edges): label
      // required, EdgeResponse shape source/target/properties
      val byLabel = get("/collections/social/graph/edges?label=knows")
      assert(byLabel.statusCode() == 200 && byLabel.body().contains("\"count\":3"),
        byLabel.body())
      assert(byLabel.body().contains("\"source\":1") &&
        byLabel.body().contains("\"target\":2"), byLabel.body())
      assert(byLabel.body().contains("\"properties\":{\"weight\":"), byLabel.body())
      assert(get("/collections/social/graph/edges").statusCode() == 400)
    } finally srv.stop()
  }

  test("scalar 'labels' payload still compiles to a MATCH label (no illegal cast)") {
    val g = freshGraft()
    import spark.implicits._
    g.collections.create("typed", idCol = "id", vectorCol = None)
    // read.json infers a bare-string payload as StringType — the graph
    // scope must wrap it, not cast string -> array<string>
    g.collections.upsert("typed",
      Seq((1L, "Person"), (2L, "Person"), (3L, "Place")).toDF("id", "labels"))
    g.collections.upsertEdges("typed",
      Seq((1L, 1L, 2L, "knows"), (2L, 2L, 3L, "visited")).toDF("id", "src", "dst", "label"))
    val persons = g.sql("MATCH (a:Person)-[:knows]->(b:Person) RETURN a.id AS s, b.id AS d",
      graphScope = Some("typed")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(persons == Seq((1L, 2L)))
  }

  test("REST: reserved property names cannot override edge structure; unsafe names skip the store") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val g = freshGraft()
    seed(g)
    val srv = new server.RestServer(g, port = 0).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      // properties named id/src/dst/label are dropped, not structural
      val up = post("/collections/social/graph/edges",
        """{"edges": [{"id": 50, "source": 4, "target": 1, "label": "follows",
          |  "properties": {"id": 10, "src": "oops", "label": "evil", "note": "kept"}}]}""".stripMargin)
      assert(up.statusCode() == 200, up.body())
      val e = g.collections.edges("social").get
      assert(e.where(col("id") === 10 && col("dst") === 2).count() == 1,
        "stored edge 10 must be untouched")
      val row = e.where(col("id") === 50)
        .select("src", "dst", "label", "note").collect()
      assert(row.length == 1 && row.head.getLong(0) == 4 &&
        row.head.getString(2) == "follows" && row.head.getString(3) == "kept")
      // a traversal-shaped collection name on a graph route never reaches
      // the store's filesystem — it falls through to the derived graph
      // (here: empty dataset dir has no orders.parquet, so Materialize
      // fails loudly rather than resolving '..' as a collection)
      val dg = client.send(HttpRequest.newBuilder(
        URI.create(s"$base/collections/%2e%2e/graph/nodes/1/degree")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(dg.statusCode() != 200, s"'..' must not resolve to a user collection: ${dg.body()}")
    } finally srv.stop()
  }

  test("REST: POST/DELETE graph edges + MATCH/degree/traverse on the user graph") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val g = freshGraft()
    val srv = new server.RestServer(g, port = 0).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      def del(path: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).DELETE().build(),
          HttpResponse.BodyHandlers.ofString())
      def get(path: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())

      post("/collections", """{"name": "net", "id_col": "id"}""")
      post("/collections/net/points",
        """{"points": [{"id": 1, "payload": {"name": "a"}},
          |            {"id": 2, "payload": {"name": "b"}},
          |            {"id": 3, "payload": {"name": "c"}}]}""".stripMargin)
      // edge POST: explicit id + auto id, properties inlined
      val up = post("/collections/net/graph/edges",
        """{"edges": [
          |  {"id": 100, "source": 1, "target": 2, "label": "knows",
          |   "properties": {"weight": 0.8}},
          |  {"source": 2, "target": 3, "label": "knows"}]}""".stripMargin)
      assert(up.statusCode() == 200 && up.body().contains("\"upserted\":2"), up.body())

      // MATCH over the user edge store through the REST route
      val m = post("/collections/net/match",
        """{"match": "MATCH (a)-[:knows]->(b) RETURN a.id AS s, b.id AS d"}""")
      assert(m.statusCode() == 200 && m.body().contains("\"count\":2"), m.body())

      // degree + traverse run over the user edges, not the dataset graph
      val dg = get("/collections/net/graph/nodes/2/degree")
      assert(dg.statusCode() == 200 &&
        dg.body().contains("\"in_degree\":1") && dg.body().contains("\"out_degree\":1"),
        dg.body())
      val tr = post("/collections/net/graph/traverse",
        """{"source": 1, "max_depth": 3, "limit": 10}""")
      assert(tr.statusCode() == 200 && tr.body().contains("\"visited\":2"), tr.body())

      // DELETE an edge; MATCH reflects it
      val dr = del("/collections/net/graph/edges/100")
      assert(dr.statusCode() == 200, dr.body())
      val m2 = post("/collections/net/match",
        """{"match": "MATCH (a)-[:knows]->(b) RETURN a.id AS s, b.id AS d"}""")
      assert(m2.statusCode() == 200 && m2.body().contains("\"count\":1"), m2.body())

      // edge mutation on a built-in table name is a 404 (no user sidecar)
      val bad = post("/collections/customer/graph/edges",
        """{"edges": [{"source": 1, "target": 2, "label": "x"}]}""")
      assert(bad.statusCode() == 404, s"${bad.statusCode()} ${bad.body()}")
    } finally srv.stop()
  }

  private val strictSchema =
    """{"schemaless": false,
      | "node_types": [
      |   {"name": "Person", "properties": {"name": "string"}},
      |   {"name": "Doc", "properties": {"title": "string"}}],
      | "edge_types": [
      |   {"name": "wrote", "from_type": "Person", "to_type": "Doc",
      |    "properties": {"year": "integer", "weight": "float"}}]}""".stripMargin

  test("strict graph schema: valid nodes and edges are accepted") {
    val g = freshGraft()
    import spark.implicits._
    g.collections.create("kg", idCol = "id", graphSchema = Some(strictSchema))
    assert(g.collections.graphSchemaOf("kg").exists(!_.schemaless))
    g.collections.upsert("kg",
      Seq((1L, Seq("Person"), "ann"), (2L, Seq("Doc"), "paper"))
        .toDF("id", "labels", "name"))
    g.collections.upsertEdges("kg",
      Seq((10L, 1L, 2L, "wrote", 2020L, 0.9))
        .toDF("id", "src", "dst", "label", "year", "weight"))
    assert(g.collections.edges("kg").get.count() == 1)
  }

  test("strict graph schema: unknown types and bad property types reject") {
    val g = freshGraft()
    import spark.implicits._
    g.collections.create("kg2", idCol = "id", graphSchema = Some(strictSchema))
    // node label not in the schema
    val e1 = intercept[graft.velesql.SemanticError] {
      g.collections.upsert("kg2",
        Seq((1L, Seq("Alien"), "zork")).toDF("id", "labels", "name"))
    }
    assert(e1.getMessage.contains("Alien"))
    // a strict collection requires labels on points
    intercept[graft.velesql.SemanticError] {
      g.collections.upsert("kg2", Seq((1L, "x")).toDF("id", "name"))
    }
    // ... and rejects rows whose labels array is EMPTY — explode would
    // silently drop them past the unknown-label check and land an
    // untyped node in a strict graph
    intercept[graft.velesql.SemanticError] {
      g.collections.upsert("kg2",
        Seq((9L, Seq.empty[String], "x")).toDF("id", "labels", "name"))
    }
    g.collections.upsert("kg2",
      Seq((1L, Seq("Person"), "ann"), (2L, Seq("Doc"), "paper"))
        .toDF("id", "labels", "name"))
    // unknown edge type
    val e2 = intercept[graft.velesql.SemanticError] {
      g.collections.upsertEdges("kg2",
        Seq((10L, 1L, 2L, "likes")).toDF("id", "src", "dst", "label"))
    }
    assert(e2.getMessage.contains("likes"))
    // property with the wrong value type ('year' declared integer)
    val e3 = intercept[graft.velesql.SemanticError] {
      g.collections.upsertEdges("kg2",
        Seq((10L, 1L, 2L, "wrote", "twenty-twenty"))
          .toDF("id", "src", "dst", "label", "year"))
    }
    assert(e3.getMessage.contains("year"))
    // undeclared property column
    val e4 = intercept[graft.velesql.SemanticError] {
      g.collections.upsertEdges("kg2",
        Seq((10L, 1L, 2L, "wrote", true)).toDF("id", "src", "dst", "label", "pinned"))
    }
    assert(e4.getMessage.contains("pinned"))
    // endpoint node type mismatch: 'wrote' is Person -> Doc, reversed here
    val e5 = intercept[graft.velesql.SemanticError] {
      g.collections.upsertEdges("kg2",
        Seq((10L, 2L, 1L, "wrote")).toDF("id", "src", "dst", "label"))
    }
    assert(e5.getMessage.contains("endpoint"))
    // the valid direction still lands
    g.collections.upsertEdges("kg2",
      Seq((10L, 1L, 2L, "wrote")).toDF("id", "src", "dst", "label"))
    assert(g.collections.edges("kg2").get.count() == 1)
    // invalid schema documents reject at create (nothing half-created)
    intercept[graft.velesql.SemanticError] {
      g.collections.create("kg3", graphSchema =
        Some("""{"schemaless": false, "edge_types": [
               |  {"name": "e", "from_type": "Ghost", "to_type": "Ghost"}]}""".stripMargin))
    }
    assert(!g.collections.exists("kg3"))
    // schemaless schema documents keep accepting anything
    g.collections.create("kg4", graphSchema = Some("""{"schemaless": true}"""))
    g.collections.upsert("kg4", Seq((1L, "x")).toDF("id", "name"))
    g.collections.upsertEdges("kg4",
      Seq((1L, 1L, 1L, "whatever", "anything")).toDF("id", "src", "dst", "label", "note"))
    assert(g.collections.edges("kg4").get.count() == 1)
  }

  test("graph schema render escapes names (round-trips any parse-accepted string)") {
    val sch = graft.GraphSchema.parse(
      """{"schemaless": false,
        | "node_types": [{"name": "A\"B", "properties": {"k\\x": "string"}}],
        | "edge_types": []}""".stripMargin)
    assert(sch.nodeTypes.head.name == "A\"B")
    // render must emit valid JSON for the quote/backslash — an unescaped
    // write would corrupt the sidecar and brick the collection's schema
    val again = graft.GraphSchema.parse(graft.GraphSchema.render(sch))
    assert(again == sch)
  }

  test("snapshot/restore covers the edge frame (full-state snapshots)") {
    val g = freshGraft()
    import spark.implicits._
    g.collections.create("snapg", idCol = "id")
    g.collections.upsert("snapg", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    g.collections.upsertEdges("snapg",
      Seq((10L, 1L, 2L, "knows")).toDF("id", "src", "dst", "label"))
    g.collections.snapshot("snapg", "v1")
    // mutate both frames past the snapshot
    g.collections.upsertEdges("snapg",
      Seq((11L, 2L, 1L, "blocks")).toDF("id", "src", "dst", "label"))
    g.collections.upsert("snapg", Seq((3L, "c")).toDF("id", "name"))
    assert(g.collections.edges("snapg").get.count() == 2)
    g.collections.restoreSnapshot("snapg", "v1")
    // both frames are back to the v1 state — a points-only restore
    // would leave edge 11 referencing a state that never coexisted
    assert(g.collections.count("snapg") == 2)
    val labels = g.collections.edges("snapg").get
      .select("label").collect().map(_.getString(0)).toSeq
    assert(labels == Seq("knows"), s"got $labels")
  }

  test("shortest paths and pagerank run over a user graph (facade + REST)") {
    val g = freshGraft()
    import spark.implicits._
    g.collections.create("wg", idCol = "id")
    g.collections.upsert("wg", Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "name"))
    // weighted diamond: 1→2 (1.0), 2→4 (5.0), 1→3 (2.0), 3→4 (1.5)
    g.collections.upsertEdges("wg",
      Seq((10L, 1L, 2L, "e", 1.0), (11L, 2L, 4L, "e", 5.0),
        (12L, 1L, 3L, "e", 2.0), (13L, 3L, 4L, "e", 1.5))
        .toDF("id", "src", "dst", "label", "weight"))
    val sp = g.shortestPaths(Seq(1L), maxHops = 3, graphScope = Some("wg"))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(sp(2L) == 1.0 && sp(3L) == 2.0)
    assert(sp(4L) == 3.5, s"1→3→4 (3.5) beats 1→2→4 (6.0), got ${sp(4L)}")
    // pagerank: sink node 4 (two in-edges) outranks everything
    val pr = g.pageRank(iters = 3, graphScope = Some("wg"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(4L) > pr(2L) && pr(4L) > pr(3L) && pr(2L) > pr(1L))
    // REST round-trips
    val srv = new graft.server.RestServer(g, port = 0).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val client = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String) =
        client.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .header("Content-Type", "application/json").build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      val spR = post("/collections/wg/graph/shortest_paths",
        """{"starts": [1], "max_hops": 3}""")
      assert(spR.statusCode() == 200 && spR.body().contains("\"cost\":3.5"), spR.body())
      val prR = post("/collections/wg/graph/pagerank", """{"iterations": 3}""")
      assert(prR.statusCode() == 200 && prR.body().contains("\"rank\""), prR.body())
      assert(post("/collections/wg/graph/pagerank",
        """{"damping": 1.5}""").statusCode() == 400)
      // personalized: restart at node 3 — its descendant 4 carries rank,
      // the 1→2 branch (unreachable from 3) gets none
      val ppr = post("/collections/wg/graph/pagerank",
        """{"iterations": 3, "seeds": [3]}""")
      assert(ppr.statusCode() == 200, ppr.body())
      val ranks = """"node":(\d+),"rank":([0-9.E-]+)""".r
        .findAllMatchIn(ppr.body())
        .map(m => m.group(1).toLong -> m.group(2).toDouble).toMap
      assert(ranks(3L) > 0 && ranks(4L) > 0 && ranks(2L) == 0.0 &&
        ranks(1L) == 0.0, ppr.body())
      // seeds validate like shortest_paths' starts: non-numeric and
      // explicitly-empty arrays are 400s, not silent coercions
      assert(post("/collections/wg/graph/pagerank",
        """{"seeds": [1, "abc"]}""").statusCode() == 400)
      assert(post("/collections/wg/graph/pagerank",
        """{"seeds": []}""").statusCode() == 400)
      assert(post("/collections/wg/graph/shortest_paths",
        """{"starts": []}""").statusCode() == 400)
      // partially-invalid starts must 400, not silently drop the bad id
      assert(post("/collections/wg/graph/shortest_paths",
        """{"starts": [1, "2"]}""").statusCode() == 400)
      // non-positive bounds error at the operator too (facade path)
      intercept[IllegalArgumentException] {
        g.shortestPaths(Seq(1L), maxHops = 0, graphScope = Some("wg"))
      }
      intercept[IllegalArgumentException] {
        g.pageRank(iters = 0, graphScope = Some("wg"))
      }
    } finally srv.stop()
  }

  test("triangle counts run over a user graph (facade + REST)") {
    val g = freshGraft()
    import spark.implicits._
    g.collections.create("tg", idCol = "id")
    g.collections.upsert("tg",
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "name"))
    // triangle 1-2-3, with the 1-2 edge stored in BOTH directions (the
    // undirected canonicalization must not double-count it) + a
    // pendant 3→4 edge under a different label
    g.collections.upsertEdges("tg",
      Seq((10L, 1L, 2L, "e"), (11L, 2L, 1L, "e"), (12L, 2L, 3L, "e"),
        (13L, 1L, 3L, "e"), (14L, 3L, 4L, "x"))
        .toDF("id", "src", "dst", "label"))
    val tri = g.triangles(graphScope = Some("tg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $tri")
    // restricting to the pendant label leaves no closed wedge
    assert(g.triangles(relTypes = Seq("x"), graphScope = Some("tg"))
      .collect().isEmpty)
    val srv = new graft.server.RestServer(g, port = 0).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val client = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String) =
        client.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .header("Content-Type", "application/json").build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      val r = post("/collections/tg/graph/triangles", "{}")
      assert(r.statusCode() == 200 && r.body().contains("\"n_triangles\":1"),
        r.body())
      val filtered = post("/collections/tg/graph/triangles",
        """{"rel_types": ["x"]}""")
      assert(filtered.statusCode() == 200 &&
        filtered.body().contains("\"results\":[]"), filtered.body())
      // connected components on the same graph: all four nodes join
      // via the pendant edge; restricted to label x only {3, 4} remain
      val cc = g.connectedComponents(graphScope = Some("tg"))
      val ccm = try cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally org.apache.spark.sql.graft.CheckpointBlocks.unpersist(cc)
      assert(ccm == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L), s"got $ccm")
      val ccR = post("/collections/tg/graph/components",
        """{"rel_types": ["x"]}""")
      assert(ccR.statusCode() == 200 &&
        ccR.body().contains("\"comp\":3"), ccR.body())
      assert(post("/collections/tg/graph/components",
        """{"max_iters": 99}""").statusCode() == 400)
      // LPA communities: triangle + pendant all absorb label 1 within
      // the default 3 rounds (plurality vote, ties → smallest label)
      val cm = post("/collections/tg/graph/communities", "{}")
      assert(cm.statusCode() == 200 &&
        cm.body().contains("\"node\":4,\"community\":1") &&
        !cm.body().contains("\"community\":3"), cm.body())
      assert(post("/collections/tg/graph/communities",
        """{"iterations": 99}""").statusCode() == 400)
      // modularity of that one-community partition is exactly 0
      // (e_c/m = 1 and (d_c/2m)² = 1 — all mass intra)
      val mo = post("/collections/tg/graph/modularity", "{}")
      assert(mo.statusCode() == 200 &&
        mo.body().contains("\"modularity\":0.0") &&
        mo.body().contains("\"community\":1"), mo.body())
      // an edge-typeless filter (no matching edges) is an empty report
      // with Q = 0 — a clean 200, not a null-sum 500
      val moEmpty = post("/collections/tg/graph/modularity",
        """{"rel_types": ["nope"]}""")
      assert(moEmpty.statusCode() == 200 &&
        moEmpty.body().contains("\"modularity\":0.0") &&
        moEmpty.body().contains("\"results\":[]"), moEmpty.body())
      // 2-core: the triangle survives, the pendant 4 peels off
      val kc = post("/collections/tg/graph/kcore", """{"k": 2}""")
      assert(kc.statusCode() == 200 &&
        kc.body().contains("\"core_deg\":2") &&
        !kc.body().contains("\"node\":4"), kc.body())
      assert(post("/collections/tg/graph/kcore",
        """{"k": 0}""").statusCode() == 400)
      // Adamic-Adar: the only non-adjacent pairs are (1,4) and (2,4),
      // both through center 3 (degree 3)
      val lp = post("/collections/tg/graph/link_predict", "{}")
      assert(lp.statusCode() == 200 &&
        lp.body().contains("\"a\":1,\"b\":4") &&
        lp.body().contains("\"a\":2,\"b\":4") &&
        lp.body().contains("\"score_micros\":910239"), lp.body())
      assert(post("/collections/tg/graph/link_predict",
        """{"max_degree": 1}""").statusCode() == 400)
    } finally srv.stop()
  }

  test("strict graph schema over REST: create carries it, GET serves it, bad upserts are 400") {
    val g = freshGraft()
    val srv = new graft.server.RestServer(g, port = 0).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val client = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String) =
        client.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .header("Content-Type", "application/json").build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      def get(path: String) =
        client.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
          .GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      val schemaJson = strictSchema.replaceAll("\n\\s*\\|", " ")
      assert(post("/collections",
        s"""{"name": "kgr", "graph_schema": $schemaJson}""").statusCode() == 200)
      val got = get("/collections/kgr/graph/schema")
      assert(got.statusCode() == 200 && got.body().contains("\"wrote\""), got.body())
      // an out-of-schema point batch rejects with 400, not 500
      val badPt = post("/collections/kgr/points",
        """{"points": [{"id": 1, "payload": {"labels": ["Alien"], "name": "zork"}}]}""")
      assert(badPt.statusCode() == 400, s"${badPt.statusCode()} ${badPt.body()}")
      // a valid typed batch lands
      val okPt = post("/collections/kgr/points",
        """{"points": [{"id": 1, "payload": {"labels": ["Person"], "name": "ann"}},
          |            {"id": 2, "payload": {"labels": ["Doc"], "title": "paper"}}]}""".stripMargin)
      assert(okPt.statusCode() == 200, s"${okPt.statusCode()} ${okPt.body()}")
      // schema itself invalid → 400 at create
      val badCreate = post("/collections",
        """{"name": "kgr2", "graph_schema": {"schemaless": false,
          |  "edge_types": [{"name": "e", "from_type": "Ghost", "to_type": "Ghost"}]}}""".stripMargin)
      assert(badCreate.statusCode() == 400, s"${badCreate.statusCode()} ${badCreate.body()}")
      // no schema → 404 on the schema route
      assert(get("/collections/nope/graph/schema").statusCode() == 404)
    } finally srv.stop()
  }
}
