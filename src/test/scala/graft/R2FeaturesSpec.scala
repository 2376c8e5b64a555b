package graft

import graft.velesql.{Ast, Catalog, Compiler, Parser}
import org.apache.spark.sql.functions._

/** Round-2 feature specs: MATCH rel properties / named paths / RETURN
  * similarity, correlated + native scalar subqueries, WITH mode/ef
  * routing to the ANN probe tier, timeout enforcement, multi-word
  * binary sketches, and the multiple-similarity-in-OR validation rule. */
class R2FeaturesSpec extends SparkSpecBase {

  private def parseOk(q: String): Ast.Query =
    Parser.parse(q).fold(e => fail(s"parse failed for: $q\n$e"), identity)

  private def compiler(params: Map[String, Any] = Map.empty) =
    new Compiler(spark, new Catalog(spark, sfDir), params)

  private val qvec: Seq[Float] = functions.VectorFunctions.syntheticQuery(64)

  test("parser: rel properties, named paths, RETURN similarity(field, $v)") {
    val q1 = parseOk("MATCH (a)-[r:KNOWS {since: 2020}]->(b) RETURN a.id")
    val rel = q1.matchQuery.get.pattern.rels.head
    assert(rel.alias.contains("r"))
    assert(rel.properties == Map("since" -> Ast.IntValue(2020)))

    val q2 = parseOk("MATCH p = (a)-[*1..5]->(b) RETURN p")
    assert(q2.matchQuery.get.pattern.name.contains("p"))

    val q3 = parseOk("MATCH (a)-[:KNOWS]->(b) RETURN similarity(a.embedding, $v) AS s")
    val ret = q3.matchQuery.get.returns.head
    assert(ret.expr.isInstanceOf[Ast.ReturnSimilarityOf])
    assert(ret.as.contains("s"))

    // column-to-column comparison on the value side
    val q4 = parseOk("SELECT * FROM t WHERE a = u.b")
    assert(q4.select.get.where.contains(
      Ast.Compare("a", "=", Ast.ColumnRef("u.b"))))
  }

  test("validation: multiple similarity() in OR rejected, AND + union mode allowed") {
    val c = compiler(Map("q" -> qvec))
    val orQ = """SELECT vec_id FROM embeddings
                |WHERE similarity(embedding, $q) > 0.5 OR similarity(embedding, $q) > 0.1""".stripMargin
    val e = intercept[IllegalArgumentException](c.run(orQ))
    assert(e.getMessage.contains("OR"))
    // one similarity OR metadata (union mode, q47 shape) still compiles
    c.run("SELECT vec_id FROM embeddings WHERE similarity(embedding, $q) > 0.5 OR label = 7")
    // AND-cascaded similarity still compiles
    c.run("SELECT vec_id FROM embeddings WHERE similarity(embedding, $q) > 0.1 AND similarity(embedding, $q) < 0.9")
  }

  test("two AND-composed NEARs are rejected (not silently dropped)") {
    val c = compiler(Map("a" -> qvec, "b" -> qvec))
    val e = intercept[IllegalArgumentException](
      c.run("SELECT vec_id FROM embeddings WHERE vector NEAR $a AND vector NEAR $b"))
    assert(e.getMessage.contains("NEAR_FUSED"))
  }

  test("WITH mode/ef_search routes NEAR through the LSH probe tier") {
    val c = compiler(Map("q" -> qvec))
    def plan(mode: String): String =
      c.run(s"SELECT vec_id, score FROM embeddings WHERE vector NEAR $$q LIMIT 5 WITH (mode = '$mode')")
        .queryExecution.executedPlan.toString
    // probe tiers read the MATERIALIZED bucket-clustered index with the
    // probe set PUSHED into the parquet scan (row-group pruning — the
    // r7 100 TB shape: no per-query re-hash, no scan outside the
    // Hamming ball); exact tiers scan the raw table, no bucket filter
    assert(plan("fast").contains("In(bucket"), "bucket probe not pushed (fast)")
    assert(plan("balanced").contains("In(bucket"), "bucket probe not pushed (balanced)")
    assert(!plan("perfect").contains("bucket"))

    def planEf(ef: Int): String =
      c.run(s"SELECT vec_id, score FROM embeddings WHERE vector NEAR $$q LIMIT 5 WITH (ef_search = $ef)")
        .queryExecution.executedPlan.toString
    assert(planEf(32).contains("In(bucket"))   // ≤64 → fast
    assert(!planEf(1000).contains("bucket")) // >256 → perfect/exact

    // WITH (index='ivf') probes the trained k-means cells instead — the
    // cell filter is pushed into the materialized index scan
    val ivfPlan = c.run(
      "SELECT vec_id, score FROM embeddings WHERE vector NEAR $q LIMIT 5 WITH (mode = 'balanced', index = 'ivf')")
      .queryExecution.executedPlan.toString
    assert(ivfPlan.contains("In(cell"), "cell probe not pushed (ivf)")
    // index on a non-probing mode / unknown value / derived frame → loud
    assert(intercept[IllegalArgumentException](c.run(
      "SELECT vec_id FROM embeddings WHERE vector NEAR $q LIMIT 5 WITH (index = 'ivf')"))
      .getMessage.contains("probing mode"))
    assert(intercept[IllegalArgumentException](c.run(
      "SELECT vec_id FROM embeddings WHERE vector NEAR $q LIMIT 5 WITH (mode = 'fast', index = 'btree')"))
      .getMessage.contains("unknown WITH index"))
    assert(intercept[IllegalArgumentException](c.run(
      "SELECT vec_id FROM embeddings_wide WHERE vector NEAR $q LIMIT 5 WITH (mode = 'fast', index = 'ivf')"))
      .getMessage.contains("dataset table"))

    // probed results are a subset of the exact top-k universe: every
    // returned row must carry a true score computed from the vector
    val fast = c.run(
      "SELECT vec_id, score FROM embeddings WHERE vector NEAR $q LIMIT 5 WITH (mode = 'fast')")
      .collect()
    assert(fast.length <= 5)
  }

  test("WITH (timeout_ms) cancels the job group and raises TimeoutError") {
    val g = Graft(spark, sfDir)
    // var-length BFS = a multi-job query; cancelJobGroupAndFutureJobs
    // kills jobs submitted after the deadline too
    intercept[velesql.TimeoutError] {
      g.collect(
        """SELECT l_orderkey, count(*) AS n FROM lineitem
          |JOIN orders ON lineitem.l_orderkey = orders.o_orderkey
          |GROUP BY l_orderkey LIMIT 10 WITH (timeout_ms = 1)""".stripMargin)
    }
    // without the option the same query runs
    val ok = g.collect(
      """SELECT l_orderkey, count(*) AS n FROM lineitem
        |JOIN orders ON lineitem.l_orderkey = orders.o_orderkey
        |GROUP BY l_orderkey LIMIT 10""".stripMargin)
    assert(ok.length == 10)
  }

  test("multi-word binary sketch (256 dims): recall ≥ 0.9 at 8× oversampling") {
    import operators.{Knn, Quantization}
    val dim = 256
    // deterministic 256-dim fixture: 400 vectors with structured signs
    val rows = (0 until 400).map { i =>
      val v = Array.tabulate(dim)(j =>
        (math.sin(i * 0.37 + j * 0.11) + math.cos(i * j * 0.013)).toFloat)
      (i.toLong, v)
    }
    val df = spark.createDataFrame(rows).toDF("id", "vec")
    val query = Array.tabulate(dim)(j => math.sin(5 * 0.37 + j * 0.11).toFloat).toSeq

    val sk = Quantization.withBinarySketch(df, "vec", dim)
    assert(sk.schema("sketch").dataType.typeName == "array", "256 dims → array<bigint> sketch")
    val approx = Quantization.search(sk, "vec", query, k = 10, oversampling = 8,
      idCol = "id").select("id").collect().map(_.getLong(0)).toSet
    val exact = Knn.topK(df, "vec", query, 10, "cosine", idCol = "id")
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("ngram-Jaccard df-cap: capped pairs drop only stop-shingle noise") {
    import operators.Dedup
    // docs 0/1 share 9 rare shingles + stop-shingle 777 present in EVERY
    // doc; docs 2..20 also carry their own private shingles, so their
    // only overlap is the stop-shingle (jaccard ~0.14, below threshold)
    val rows =
      (for (d <- 0L to 1L; i <- 0 until 9) yield (d, i.toLong)) ++
        Seq((0L, 777L), (1L, 777L)) ++
        (2L to 20L).flatMap(d =>
          Seq((d, 777L), (d, d * 100), (d, d * 100 + 1), (d, d * 100 + 2)))
    val sh = spark.createDataFrame(rows).toDF("doc_id", "sh")
    val exact = Dedup.ngramJaccardPairs(sh, 0.5, None).collect()
    val capped = Dedup.ngramJaccardPairs(sh, 0.5, Some(5L)).collect()
    // pair (0,1): exact jaccard = 10/10 = 1.0; capped drops shingle 777
    // from both docs → 9/9 = 1.0 — still found, no spurious pairs appear
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      capped.map(r => (r.getLong(0), r.getLong(1))).toSet)
    // and an uncapped run with a huge cap is identical to exact
    val bigCap = Dedup.ngramJaccardPairs(sh, 0.5, Some(1000000L)).collect()
    assert(bigCap.map(_.toString).sorted.toSeq == exact.map(_.toString).sorted.toSeq)
  }

  test("LSH-blocked embedding near-dup: recall ≥ 0.8 vs exact all-pairs, no false pairs") {
    import operators.Dedup
    val dim = 32
    // 60 clusters of 3 near-identical vectors + noise vectors
    def base(c: Int) = Array.tabulate(dim)(j => math.sin(c * 1.7 + j * 0.23))
    val rows = (0 until 60).flatMap { c =>
      (0 until 3).map { m =>
        val v = base(c).zipWithIndex.map { case (x, j) =>
          (x + 0.02 * math.sin(m * 3.1 + j)).toFloat }
        (c * 10L + m, v)
      }
    } ++ (0 until 100).map(i =>
      (5000L + i, Array.tabulate(dim)(j => math.cos(i * 2.9 + j * 1.31).toFloat)))
    val df = spark.createDataFrame(rows).toDF("id", "vec")
    val thr = 0.95
    // exact all-pairs ground truth (fine at spec scale)
    val a = df.select(col("id").as("a"), col("vec").as("va"))
    val b = df.select(col("id").as("b"), col("vec").as("vb"))
    val cs = functions.VectorFunctions.cosine_sim(col("va"), col("vb"))
    val exact = a.crossJoin(b).where(col("a") < col("b"))
      .where(cs >= thr).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.embeddingNearDupLsh(df, "vec", "id", thr, nPlanes = 8, tables = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "cosine-verified: no false pairs")
    assert(exact.nonEmpty)
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall < 0.8 (exact ${exact.size}, got ${got.size})")
  }

  test("MATCH leg-order heuristic: reversed compile returns identical results") {
    // unconstrained head + labeled tail triggers the reversed compile
    // (start from the selective end); results must be order-identical
    val c = compiler()
    val got = c.run(
      "MATCH (x)-[:placed]->(o:Order) RETURN x AS custkey, o.id AS order_node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = operators.Graph.edges(spark, sfDir)
      .where(col("label") === "placed")
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("user-created collections are queryable through VelesQL (switch-engines flow)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-usercol").toString
    val g = Graft(spark, tmp)
    g.collections.create("notes", idCol = "id",
      vectorCol = Some("embedding"), metric = "cosine")
    import spark.implicits._
    val batch = Seq(
      (1L, Array(1.0f, 0.0f), "alpha"),
      (2L, Array(0.0f, 1.0f), "beta"),
      (3L, Array(0.7f, 0.7f), "gamma")).toDF("id", "embedding", "note")
    g.collections.upsert("notes", batch)
    val rows = g.sql("SELECT id, score FROM notes WHERE vector NEAR $q LIMIT 2",
      Map("q" -> Seq(1.0f, 0.1f))).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val filtered = g.sql("SELECT id FROM notes WHERE note = 'beta'").collect()
    assert(filtered.map(_.getLong(0)).toSeq == Seq(2L))
    intercept[velesql.NotFoundError](g.sql("SELECT * FROM missing"))
  }

  test("WITH (max_groups/group_limit) errors past the cap, passes under it") {
    val c = compiler()
    // orders has 5 distinct priorities
    val e = intercept[Exception](c.run(
      """SELECT o_orderpriority, COUNT(*) FROM orders
        |GROUP BY o_orderpriority WITH (group_limit = 2)""".stripMargin).collect())
    assert(e.getMessage.contains("Too many groups"))
    val ok = c.run(
      """SELECT o_orderpriority, COUNT(*) FROM orders
        |GROUP BY o_orderpriority WITH (max_groups = 100)""".stripMargin).collect()
    assert(ok.length == 5)
  }

  test("correlated subquery under OR is rejected with a clear error") {
    val c = compiler()
    val e = intercept[IllegalArgumentException](c.run(
      """SELECT c_custkey FROM customer
        |WHERE c_acctbal < 0.0 OR c_acctbal > (SELECT MIN(o_totalprice) FROM orders
        |                                      WHERE o_custkey = customer.c_custkey)""".stripMargin))
    assert(e.getMessage.contains("AND-composed"))
  }

  test("correlated scalar subquery decorrelates (values match a manual join)") {
    val c = compiler()
    val got = c.run(
      """SELECT c_custkey FROM customer
        |WHERE c_acctbal > (SELECT MIN(o_totalprice) FROM orders
        |                   WHERE o_custkey = customer.c_custkey)
        |ORDER BY c_custkey ASC""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val cust = Tables.table(spark, sfDir, "customer")
    val ords = Tables.table(spark, sfDir, "orders")
    val expect = cust.join(
        ords.groupBy(col("o_custkey")).agg(min("o_totalprice").as("m")),
        col("c_custkey") === col("o_custkey"))
      .where(col("c_acctbal") > col("m"))
      .orderBy("c_custkey").select("c_custkey")
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
