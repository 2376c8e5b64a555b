package graft

import graft.cli.ReplSession

/** CLI REPL (reference crates/velesdb-cli/src/repl.rs,
  * repl_commands.rs) — command surface, output formats, session
  * settings binding as $params, and the active-collection scope. */
class ReplSpec extends SparkSpecBase {

  import spark.implicits._

  private def freshSession(): (ReplSession, java.io.ByteArrayOutputStream, Graft) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-repl")
    val g = Graft(spark, tmp.toString)
    g.collections.create("docs", idCol = "id", vectorCol = Some("vec"))
    g.collections.upsert("docs", Seq(
      (1L, Seq(1.0f, 0.0f), "alpha", 10L),
      (2L, Seq(0.0f, 1.0f), "beta", 20L),
      (3L, Seq(0.7f, 0.7f), "gamma", 30L))
      .toDF("id", "vec", "name", "pts"))
    val buf = new java.io.ByteArrayOutputStream()
    (new ReplSession(g, new java.io.PrintStream(buf, true, "UTF-8")), buf, g)
  }

  private def out(buf: java.io.ByteArrayOutputStream): String = {
    val s = buf.toString("UTF-8"); buf.reset(); s
  }

  test(".quit/.exit/.q end the session; other commands continue") {
    val (r, buf, _) = freshSession()
    assert(!r.handle(".quit"))
    assert(!r.handle(".exit"))
    assert(!r.handle(".q"))
    assert(r.handle(".help"))
    assert(out(buf).contains(".collections"))
    assert(r.handle(""))      // blank line is a no-op continue
    assert(r.handle(".nope")) // unknown command reports, keeps going
    assert(out(buf).contains("Unknown command"))
  }

  test(".collections lists the user collection; .schema/.count/.describe inspect it") {
    val (r, buf, _) = freshSession()
    r.handle(".collections")
    assert(out(buf).contains("docs"))
    r.handle(".schema docs")
    val sch = out(buf)
    assert(sch.contains("Id column: id") && sch.contains("Vector:    vec"))
    r.handle(".count docs")
    assert(out(buf).contains("Count: 3 records"))
    r.handle(".describe docs")
    val desc = out(buf)
    // dimension from a stored row; memory = count × dim × 4 bytes
    // (reference repl_commands.rs:157-163)
    assert(desc.contains("Dimension: 2"))
    r.handle(".count missing")
    assert(out(buf).contains("not found"))
  }

  test("VelesQL runs through Graft.sql; table and json formats render") {
    val (r, buf, _) = freshSession()
    r.handle("SELECT id, name FROM docs WHERE pts >= 20 ORDER BY id")
    val table = out(buf)
    assert(table.contains("| id") && table.contains("beta") &&
      table.contains("gamma") && !table.contains("alpha"))
    assert(table.contains("(2 rows)"))
    assert(table.contains("Took")) // timing defaults ON (repl.rs:30)
    r.handle(".timing off"); out(buf)
    r.handle(".format json"); out(buf)
    r.handle("SELECT id, name FROM docs WHERE id = 1")
    val json = out(buf)
    assert(json.contains("""{"id":1,"name":"alpha"}"""))
    assert(!json.contains("Took"))
  }

  test(".set binds as a $param; .show and .reset manage settings") {
    val (r, buf, _) = freshSession()
    r.handle(".set min_pts 15"); out(buf)
    r.handle("SELECT id FROM docs WHERE pts > $min_pts ORDER BY id")
    assert(out(buf).contains("(2 rows)"))
    r.handle(".show")
    assert(out(buf).contains("min_pts = 15"))
    r.handle(".reset"); out(buf)
    r.handle("SELECT id FROM docs WHERE pts > $min_pts")
    assert(out(buf).toLowerCase.contains("error")) // unbound param is loud
  }

  test(".use scopes inspection commands and survives as MATCH graph scope") {
    val (r, buf, g) = freshSession()
    g.collections.upsertEdges("docs", Seq(
      (10L, 1L, 2L, "knows"), (11L, 2L, 3L, "knows"))
      .toDF("id", "src", "dst", "label"))
    r.handle(".use docs")
    assert(out(buf).contains("Active collection: docs"))
    r.handle(".count")
    assert(out(buf).contains("Count: 3 records"))
    r.handle("MATCH (a:Point)-[:knows]->(b:Point) RETURN a.id AS s, b.id AS d")
    val m = out(buf)
    assert(m.contains("(2 rows)"), s"got: $m")
    r.handle(".use nope")
    assert(out(buf).contains("not found"))
  }

  test("errors are reported, never thrown; output caps at max_results") {
    val (r, buf, _) = freshSession()
    assert(r.handle("SELECT FROM nothing at all"))
    assert(out(buf).contains("Error"))
    assert(r.handle("SELECT id FROM no_such_table"))
    assert(out(buf).contains("Error"))
    r.handle(".set max_results 2"); out(buf)
    r.handle("SELECT id FROM docs ORDER BY id")
    val capped = out(buf)
    assert(capped.contains("(2 rows)") && capped.contains("capped"))
  }

  test("execution-time failures survive the session (r12 ADVICE)") {
    // a failure thrown at collect time, not analysis time (the advice's
    // example: an underlying file deleted/corrupted after the plan
    // resolved) — the session must print the error and keep going
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft-replboom")
    val g = Graft(spark, tmp.toString)
    g.collections.create("docs", idCol = "id", vectorCol = None)
    g.collections.upsert("docs", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val buf = new java.io.ByteArrayOutputStream()
    val r = new ReplSession(g, new java.io.PrintStream(buf, true, "UTF-8"))
    // overwrite every stored parquet with garbage: the manifest still
    // resolves (analysis passes), the scan fails inside the Spark job
    java.nio.file.Files.walk(tmp).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .foreach(p => java.nio.file.Files.write(p,
        "not a parquet file".getBytes("UTF-8")))
    assert(r.handle("SELECT id FROM docs"),
      "a runtime SparkException must not end the session")
    assert(out(buf).toLowerCase.contains("error"))
    assert(r.handle(".help"))
    assert(out(buf).contains(".collections"), "session still works after")
  }

  test("EXPLAIN renders the plan-intent tree through the REPL") {
    val (r, buf, _) = freshSession()
    r.handle("EXPLAIN SELECT id FROM docs WHERE name = 'alpha' LIMIT 5")
    val e = out(buf)
    assert(e.contains("TableScan(docs)") && e.contains("Limit(5)"))
  }
}
