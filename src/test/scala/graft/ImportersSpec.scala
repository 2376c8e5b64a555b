package graft

import graft.sources.Importers
import java.nio.file.Files

/** Migration importers (S9): export-format JSON → normalized points. */
class ImportersSpec extends SparkSpecBase {

  private def write(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft_import", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("Qdrant export normalizes to (id, vector, payload cols)") {
    val p = write(Seq(
      """{"id": 1, "vector": [0.1, 0.2], "payload": {"cat": "a", "price": 10}}""",
      """{"id": 2, "vector": [0.3, 0.4], "payload": {"cat": "b", "price": 20}}"""))
    val df = Importers.fromQdrant(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "cat", "price"))
    val r = df.where(df("id") === 1).first()
    assert(r.getSeq[Float](r.fieldIndex("vector")).toList == List(0.1f, 0.2f))
    assert(r.getAs[String]("cat") == "a")
  }

  test("Pinecone export maps values→vector and hashes non-numeric ids") {
    val p = write(Seq(
      """{"id": "42", "values": [1.0, 2.0], "metadata": {"genre": "doc"}}""",
      """{"id": "abc", "values": [3.0, 4.0], "metadata": {"genre": "web"}}"""))
    val df = Importers.fromPinecone(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "genre"))
    assert(df.where(df("id") === 42L).count() == 1)   // numeric id preserved
    val ids = df.select("id").collect().map(_.getLong(0))
    assert(ids.forall(_ >= 0) && ids.toSet.size == 2) // string id hashed
  }

  test("Supabase export passes extra columns through") {
    val p = write(Seq(
      """{"id": 7, "embedding": [0.5], "title": "t", "views": 3}"""))
    val df = Importers.fromSupabase(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "title", "views"))
    assert({ val r = df.first(); r.getSeq[Float](r.fieldIndex("vector")).toList == List(0.5f) })
  }

  test("text-corpus JSONL normalizes to the documents shape") {
    val p = write(Seq(
      """{"text": "spark makes joins fast", "lang": "en", "source": "web"}""",
      """{"text": "la tabla grande", "lang": "es", "source": "book"}"""))
    val df = Importers.fromTextJsonl(spark, p)
    assert(df.columns.toSet == Set("doc_id", "text", "lang", "source"))
    assert(df.count() == 2)
    // content-hash ids are deterministic across re-imports
    val ids1 = df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Importers.fromTextJsonl(spark, p)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2 && ids1.toSet.size == 2)
    // explicit id field is honored; quality/token operators accept the frame
    val p2 = write(Seq("""{"my_id": 7, "text": "keyed doc"}"""))
    val withId = Importers.fromTextJsonl(spark, p2, idField = Some("my_id"))
    assert(withId.select("doc_id").first().getLong(0) == 7L)
    val scored = graft.operators.Bm25.score(df, "spark joins", 10)
    assert(scored.count() >= 1) // BM25 runs directly on the imported shape
  }

  test("imported points flow into a collection") {
    val p = write(Seq("""{"id": 1, "vector": [0.1], "payload": {"k": "v"}}"""))
    val dir = Files.createTempDirectory("graft_import_col").toString
    val cols = new Collections(spark, dir)
    cols.create("migrated", idCol = "id", vectorCol = Some("vector"))
    cols.upsert("migrated", Importers.fromQdrant(spark, p))
    assert(cols.count("migrated") == 1)
    cols.drop("migrated")
  }
}
