package graft

import graft.velesql.{Ast, Catalog, Compiler, Parser}
import org.apache.spark.sql.functions._

/** Parser corpus + compiler semantics checks (SURVEY.md §5.2 item 4).
  * Value-level verification of the full queries runs in the DuckDB oracle
  * gate (q90-q99); this spec covers parse shapes and the reference's
  * semantic quirks. */
class VelesqlSpec extends SparkSpecBase {

  private def parseOk(q: String): Ast.Query =
    Parser.parse(q).fold(e => fail(s"parse failed for: $q\n$e"), identity)

  test("parser corpus: representative queries from the reference spec parse") {
    val corpus = Seq(
      "SELECT * FROM products",
      "SELECT id, name AS n FROM products WHERE price > 100 LIMIT 5",
      "SELECT * FROM docs WHERE vector NEAR [0.1, 0.2, 0.3] LIMIT 10",
      "SELECT * FROM docs WHERE vector NEAR $query_vec",
      "SELECT * FROM docs WHERE similarity(vector, $v) > 0.8 AND category = 'tech' ORDER BY similarity(vector, $v) DESC LIMIT 10",
      "SELECT * FROM docs WHERE vector NEAR_FUSED [[0.1,0.2],[0.3,0.4]] USING FUSION 'rrf' (k=60)",
      "SELECT * FROM articles WHERE content MATCH 'rust database'",
      "SELECT category, COUNT(*), AVG(price) FROM products GROUP BY category HAVING COUNT(*) > 5 OR AVG(price) > 10.5",
      "SELECT * FROM orders AS o JOIN customers AS c ON o.cust_id = c.id WHERE o.total > 50",
      "SELECT * FROM t LEFT JOIN u ON t.a = u.b",
      "SELECT * FROM t JOIN u USING (a, b)",
      "SELECT a FROM t UNION SELECT a FROM u",
      "SELECT a FROM t UNION ALL SELECT a FROM u",
      "SELECT a FROM t INTERSECT SELECT a FROM u",
      "SELECT a FROM t EXCEPT SELECT a FROM u",
      "SELECT * FROM events WHERE ts > NOW() - INTERVAL '7 days'",
      "SELECT * FROM t WHERE a IN (1, 2, 3) AND b BETWEEN 1 AND 10",
      "SELECT * FROM t WHERE name LIKE '%foo_%' OR name ILIKE 'BAR%'",
      "SELECT * FROM t WHERE x IS NOT NULL AND y IS NULL",
      "SELECT * FROM t WHERE NOT (a = 1 OR b = 2)",
      "SELECT `select`, \"from\" FROM `order`",
      "SELECT * FROM t WHERE price > (SELECT AVG(price) FROM t)",
      "SELECT * FROM t LIMIT 10 OFFSET 5",
      "SELECT * FROM t WITH (mode='accurate', ef_search=256)",
      "SELECT DISTINCT category FROM products",
      "MATCH (a:Person)-[:KNOWS]->(b) RETURN a.name, b.name",
      "MATCH (a:Person {name: 'Alice'})-[r:KNOWS|LIKES*1..3]->(b) WHERE b.age > 20 RETURN a.name AS x ORDER BY x LIMIT 5",
      "MATCH (a)<-[:FOLLOWS]-(b) RETURN a.id",
      "SELECT * FROM t -- trailing comment\nWHERE a = 1;")
    corpus.foreach(parseOk)
  }

  test("reference parser_tests corpus: exact inputs from the reference's own tests parse") {
    // harvested verbatim from velesql/parser_tests.rs, complex_parser_tests.rs,
    // fusion_clause_tests.rs (reference test expectations for valid queries)
    val refCorpus = Seq(
      "SELECT * FROM DOCUMENTS WHERE VECTOR NEAR $V LIMIT 10",
      "SELECT * FROM docs LIMIT 10 WITH (mode = accurate)",
      "SELECT * FROM docs LIMIT 10 WITH (rerank = true)",
      "SELECT * FROM docs LIMIT 10 WITH (threshold = 0.95)",
      "SELECT * FROM docs ORDER BY `order` DESC",
      "SELECT * FROM docs WHERE `from` LIKE '%pattern%'",
      "SELECT * FROM docs WHERE `limit` BETWEEN 1 AND 10",
      "SELECT * FROM docs WHERE `order` IN (1, 2, 3)",
      "SELECT * FROM docs WHERE `select` = 'value'",
      "SELECT * FROM docs WHERE `select` MATCH 'query'",
      "SELECT * FROM docs WHERE name ilike 'test%'",
      "SELECT * FROM docs WHERE status != 'deleted'",
      "SELECT * FROM docs WHERE vector NEAR $v LIMIT 10 WITH (mode = 'fast', ef_search = 512, timeout_ms = 5000)",
      "SELECT * FROM products JOIN prices AS pr ON pr.product_id = products.id",
      "SELECT * FROM trips JOIN prices ON prices.trip_id = trips.id JOIN availability ON availability.trip_id = trips.id",
      "SELECT * FROM t WHERE SIMILARITY(vec, $v) > 0.8",
      "SELECT * FROM t WHERE active = True",
      "SELECT * FROM t WHERE x = NULL",
      "SELECT * FROM docs USING FUSION",
      "SELECT * FROM docs USING FUSION(strategy = 'maximum')",
      "SELECT * FROM docs USING FUSION(strategy = 'rrf', k = 30)",
      "SELECT * FROM docs USING FUSION(strategy = 'weighted', vector_weight = 0.7, graph_weight = 0.3)",
      "SELECT * FROM docs WHERE category = 'tech' USING FUSION(strategy = 'rrf', k = 60)",
      "SELECT COUNT(*) AS total, AVG(price) AS avg_price FROM products",
      "SELECT COUNT(*), SUM(price), AVG(rating), MIN(stock), MAX(price) FROM products",
      "SELECT brand, AVG(price) FROM products GROUP BY brand HAVING AVG(price) > 100",
      "SELECT category, COUNT(*) FROM products WHERE vector NEAR $query GROUP BY category",
      "SELECT id, title FROM docs WHERE vector NEAR $v ORDER BY similarity(vector, $v) DESC LIMIT 5",
      "SELECT payload.title, metadata.author FROM docs",
      "SELECT `order`, `select` FROM docs",
      "SELECT id AS `order` FROM docs",
      "SELECT COUNT(*) FROM docs GROUP BY `group`",
      "select * from a join b on b.id = a.b_id",
      "select * from docs limit 10 with (mode = 'fast')",
      "select category, count(*) from items group by category having count(*) > 5",
      "SELECT * FROM docs WHERE title = 'Hello, World!' LIMIT 10",
      // r2: verbatim inputs from match_clause_tests.rs / subquery_tests.rs
      "MATCH path = (a)-[*1..5]->(b) RETURN path",
      "MATCH (p:Person)-[:WROTE]->(a) WHERE p.age > 18 RETURN a",
      "MATCH (p:Person)-[:WROTE]->(a:Article) RETURN a.title",
      "MATCH (a)-[:R]->(b)-[:S]->(c) RETURN a, b, c",
      "MATCH (n:Person {name: 'RETURN'}) RETURN n",
      "MATCH (n:Person) WHERE n.age <> 18 RETURN n",
      "MATCH (n) WHERE n.status = 'x > y' RETURN n",
      "SELECT * FROM orders WHERE total > (SELECT AVG(total) FROM orders)",
      "SELECT * FROM orders WHERE total > (SELECT AVG(amount) FROM order_items WHERE order_id = 1)",
      "SELECT * FROM products WHERE price < (SELECT AVG(price) FROM products)")
    refCorpus.foreach(parseOk)
    // fusion strategy + params land in the AST
    val f = parseOk("SELECT * FROM docs USING FUSION(strategy = 'rrf', k = 30)")
      .select.get.fusion.get
    assert(f.strategy == "rrf" && f.params("k") == 30.0)
    // reference's invalid-query expectations stay invalid
    Seq("SELECT * FROM ", "SELECT * docs", "SELECT * FROM docs WHERE ")
      .foreach(q => assert(Parser.parse(q).isLeft, s"should not parse: $q"))
  }

  test("parser rejects malformed queries") {
    val bad = Seq(
      "SELECT FROM t",
      "SELECT * FROM",
      "SELECT * FROM t WHERE",
      "SELECT * FROM t WHERE a >",
      "MATCH (a RETURN a.name",
      "SELECT * FROM t GROUP",
      "garbage")
    bad.foreach(q => assert(Parser.parse(q).isLeft, s"should not parse: $q"))
  }

  test("HAVING folds strictly left-to-right (no AND/OR precedence)") {
    // (c1 OR c2) AND c3 — SQL precedence would be c1 OR (c2 AND c3)
    val q = parseOk(
      "SELECT a, COUNT(*) FROM t GROUP BY a HAVING COUNT(*) > 5 OR MIN(a) > 1 AND MAX(a) < 9")
    val h = q.select.get.having.get
    assert(h.rest.map(_._1) == Seq("OR", "AND"))
  }

  test("NEAR default limit is 10 (query/mod.rs:61)") {
    val c = new Compiler(spark, new Catalog(spark, sfDir),
      Map("q" -> graft.functions.VectorFunctions.syntheticQuery(64)))
    val df = c.run("SELECT vec_id FROM embeddings WHERE vector NEAR $q")
    assert(df.count() == 10)
  }

  test("Neq is true on NULL fields (matching.rs is_none_or)") {
    import spark.implicits._
    val cat = new Catalog(spark, sfDir) {
      override def table(name: String) =
        Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
          .toDF("id", "v")
    }
    val c = new Compiler(spark, cat)
    val ids = c.run("SELECT id FROM x WHERE v != 'a' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L, 3L)) // NULL row passes Neq, unlike ANSI SQL
  }

  test("similarity threshold inverts for distance metrics") {
    val cat = new Catalog(spark, sfDir) {
      override val meta = Map(
        "embeddings" -> graft.velesql.CollectionMeta("vec_id", Some("embedding"), "euclidean"))
    }
    val c = new Compiler(spark, cat, Map("q" -> graft.functions.VectorFunctions.syntheticQuery(64)))
    val viaLang = c.run("SELECT vec_id FROM embeddings WHERE similarity(embedding, $q) > 3.5")
    val manual = graft.operators.Knn.thresholdFilter(
      Tables.table(spark, sfDir, "embeddings"), "embedding",
      graft.functions.VectorFunctions.syntheticQuery(64), 3.5, "euclidean", ">")
    assert(viaLang.count() == manual.count())
    assert(viaLang.count() > 0)
  }

  test("aggregate result naming parity: count / fn_col / alias") {
    val c = new Compiler(spark, new Catalog(spark, sfDir))
    val df = c.run("SELECT o_orderstatus, COUNT(*), SUM(o_totalprice), MIN(o_totalprice) AS lo FROM orders GROUP BY o_orderstatus")
    assert(df.columns.toSeq == Seq("o_orderstatus", "count", "sum_o_totalprice", "lo"))
  }

  test("JSON-path array indices: items[0].sku in SELECT, WHERE and GROUP BY (P3)") {
    import spark.implicits._
    val cat = new Catalog(spark, sfDir) {
      override def table(name: String) = Seq(
        (1L, Seq(("a", 2), ("b", 3))),
        (2L, Seq(("a", 5))),
        (3L, Seq(("c", 1), ("a", 9))))
        .toDF("id", "raw")
        .selectExpr("id",
          "transform(raw, x -> named_struct('sku', x._1, 'qty', x._2)) AS items")
    }
    val c = new Compiler(spark, cat)
    // WHERE on an indexed path
    val ids = c.run("SELECT id FROM t WHERE items[0].sku = 'a' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L))
    // GROUP BY an indexed path (json_path.rs array-index grouping)
    val grouped = c.run("SELECT items[0].sku, COUNT(*) FROM t GROUP BY items[0].sku")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped == Map("a" -> 2L, "c" -> 1L))
    // projection of an indexed path
    val skus = c.run("SELECT items[1].sku AS second FROM t WHERE id = 1")
      .collect().map(_.getString(0)).toSeq
    assert(skus == Seq("b"))
  }

  test("differential fuzz: random WHERE trees agree with hand-built DataFrame filters") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col => c}
    val rnd = new scala.util.Random(42)
    val orders = Tables.table(spark, sfDir, "orders")
    // (velesql fragment, equivalent Column) leaf pool over orders columns
    def leaf(): (String, Column) = rnd.nextInt(8) match {
      case 0 => ("o_totalprice > 150000", c("o_totalprice") > 150000)
      case 1 => ("o_orderstatus = 'F'", c("o_orderstatus") === "F")
      case 2 => ("o_orderpriority IN ('1-URGENT', '2-HIGH')",
        c("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      case 3 => ("o_totalprice BETWEEN 50000 AND 250000",
        c("o_totalprice").between(50000, 250000))
      case 4 => ("o_orderpriority LIKE '%HIGH'", c("o_orderpriority").like("%HIGH"))
      case 5 => ("o_custkey IS NOT NULL", c("o_custkey").isNotNull)
      // r2: column-to-column comparisons (ColumnRef value side)
      case 6 => ("o_custkey < o_orderkey", c("o_custkey") < c("o_orderkey"))
      case 7 => ("o_totalprice >= o_custkey", c("o_totalprice") >= c("o_custkey"))
    }
    def tree(depth: Int): (String, Column) =
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => leaf()
        case 1 =>
          val (ls, lc) = tree(depth - 1); val (rs, rc) = tree(depth - 1)
          (s"($ls AND $rs)", lc && rc)
        case 2 =>
          val (ls, lc) = tree(depth - 1); val (rs, rc) = tree(depth - 1)
          (s"($ls OR $rs)", lc || rc)
        case 3 =>
          val (is, ic) = tree(depth - 1)
          (s"NOT ($is)", !ic)
      }
    val compiler = new Compiler(spark, new Catalog(spark, sfDir))
    (1 to 25).foreach { _ =>
      val (sql, expect) = tree(3)
      val got = compiler.run(s"SELECT o_orderkey FROM orders WHERE $sql").count()
      val want = orders.where(expect).count()
      assert(got == want, s"mismatch for WHERE $sql: $got vs $want")
    }
  }

  test("NEAR_FUSED rrf fusion: exact-mode ranks, score = sum 1/(k+rank)") {
    val q1 = Seq.fill(64)(0.1f)
    val q2 = graft.functions.VectorFunctions.syntheticQuery(64)
    val c = new Compiler(spark, new Catalog(spark, sfDir), Map("a" -> q1, "b" -> q2))
    val rows = c.run(
      "SELECT vec_id, score FROM embeddings WHERE vector NEAR_FUSED [$a, $b] USING FUSION 'rrf' (k=60) LIMIT 5")
      .collect()
    assert(rows.length == 5)
    // brute-force oracle
    import graft.functions.VectorKernels
    val all = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def ranks(q: Array[Float]): Map[Long, Int] =
      all.map { case (id, v) => id -> VectorKernels.cosine(v, q) }
        .sortBy { case (id, s) => (-s, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val (r1, r2) = (ranks(q1.toArray), ranks(q2.toArray))
    val expect = all.map(_._1)
      .map(id => id -> (1.0 / (60 + r1(id)) + 1.0 / (60 + r2(id))))
      .sortBy { case (id, s) => (-s, id) }.take(5)
    rows.zip(expect).foreach { case (got, (eid, es)) =>
      assert(got.getLong(0) == eid)
      assert(math.abs(got.getDouble(1) - es) < 1e-12)
    }
  }

  test("NEAR_FUSED average fusion equals hand-built expression") {
    val q1 = Seq.fill(64)(0.1f)
    val q2 = graft.functions.VectorFunctions.syntheticQuery(64)
    val c = new Compiler(spark, new Catalog(spark, sfDir),
      Map("a" -> q1, "b" -> q2))
    val df = c.run("SELECT vec_id, score FROM embeddings WHERE vector NEAR_FUSED [$a, $b] USING FUSION 'average' LIMIT 5")
    val rows = df.collect()
    assert(rows.length == 5)
    import graft.functions.{VectorFunctions => VF}
    val emb = Tables.table(spark, sfDir, "embeddings")
    val manual = emb.select(col("vec_id"),
        ((VF.cosine_sim(col("embedding"), VF.vecLit(q1))
          + VF.cosine_sim(col("embedding"), VF.vecLit(q2))) / lit(2.0)).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(5).collect()
    assert(rows.map(_.getLong(0)).toSeq == manual.map(_.getLong(0)).toSeq)
  }
}
