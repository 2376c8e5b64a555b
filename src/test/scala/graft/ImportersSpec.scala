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

  test("Qdrant UUID point ids hash to long instead of nulling") {
    val p = write(Seq(
      """{"id": "550e8400-e29b-41d4-a716-446655440000", "vector": [0.5, 0.6]}""",
      """{"id": 7, "vector": [0.7, 0.8]}"""))
    val df = Importers.fromQdrant(spark, p)
    val ids = df.select("id").collect().map(r => Option(r.get(0)))
    assert(ids.forall(_.isDefined), s"UUID id nulled: ${ids.mkString(",")}")
    assert(df.where(df("id") === 7).count() == 1)
  }

  test("Pinecone export maps values→vector and hashes non-numeric ids") {
    val p = write(Seq(
      """{"id": "42", "values": [1.0, 2.0], "metadata": {"genre": "doc"}}""",
      """{"id": "abc", "values": [3.0, 4.0], "metadata": {"genre": "web"}}"""))
    val df = Importers.fromPinecone(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "genre"))
    assert(df.where(df("id") === 42L).count() == 1)   // numeric id preserved
    val ids = df.select("id").collect().map(_.getLong(0))
    // hashed string id lands in the reserved negative range, disjoint
    // from genuine numeric ids (r15 ADVICE)
    assert(ids.toSet.size == 2 && ids.exists(_ < 0))
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

  test("ChromaDB export maps embedding/document/metadata") {
    val p = write(Seq(
      """{"id": 5, "embedding": [0.1, 0.9], "document": "hello", "metadata": {"topic": "greet"}}""",
      """{"id": "str", "embedding": [0.2, 0.8], "document": "bye", "metadata": {"topic": "farewell"}}"""))
    val df = Importers.fromChroma(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "document", "topic"))
    val r = df.where(df("id") === 5L).first()
    assert(r.getAs[String]("document") == "hello" &&
      r.getAs[String]("topic") == "greet")
    assert(df.count() == 2) // string id hashed, both land
  }

  test("Elasticsearch scroll export unpacks _source around the vector field") {
    val p = write(Seq(
      """{"_id": "9", "_source": {"vector": [1.0, 0.0], "title": "a", "rank": 3}}""",
      """{"_id": "doc-x", "_source": {"vector": [0.0, 1.0], "title": "b", "rank": 4}}"""))
    val df = Importers.fromElasticsearch(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "title", "rank"))
    assert(df.where(df("id") === 9L).count() == 1)
    intercept[IllegalArgumentException](
      Importers.fromElasticsearch(spark, p, vectorField = "nope"))
  }

  test("CSV import parses the JSON-array vector column") {
    val f = Files.createTempFile("graft_import", ".csv")
    Files.writeString(f,
      "id,vector,label\n1,\"[0.5, 0.5]\",x\n2,\"[0.25, 0.75]\",y")
    val df = Importers.fromCsv(spark, f.toString)
    assert(df.columns.toSet == Set("id", "vector", "label"))
    val r = df.where(df("id") === 2L).first()
    assert(r.getSeq[Float](r.fieldIndex("vector")).toList == List(0.25f, 0.75f))
  }

  test("Milvus export passes dynamic fields through") {
    val p = write(Seq(
      """{"id": 3, "vector": [0.9, 0.1], "color": "red", "count": 12}"""))
    val df = Importers.fromMilvus(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "color", "count"))
    assert(df.first().getAs[String]("color") == "red")
  }

  test("Weaviate export hashes UUID ids and unpacks properties + class") {
    val p = write(Seq(
      """{"id": "e5f6a7b8-0000-0000-0000-000000000001", "class": "Doc",
        | "properties": {"title": "hi"}, "vector": [0.3, 0.7]}""".stripMargin
        .replace("\n", "")))
    val df = Importers.fromWeaviate(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "class", "title"))
    val r = df.first()
    // UUID hashes into the reserved negative range (r15 ADVICE)
    assert(r.getLong(r.fieldIndex("id")) < 0 &&
      r.getAs[String]("class") == "Doc" && r.getAs[String]("title") == "hi")
  }

  test("MongoDB export handles $oid envelopes and custom vector fields") {
    val p = write(Seq(
      """{"_id": {"$oid": "64a1f2e3d4c5b6a798000001"}, "embedding": [1.0, 0.0], "tag": "m"}""",
      """{"_id": {"$oid": "64a1f2e3d4c5b6a798000002"}, "embedding": [0.0, 1.0], "tag": "n"}"""))
    val df = Importers.fromMongo(spark, p, vectorField = "embedding")
    assert(df.columns.toSet == Set("id", "vector", "tag"))
    assert(df.count() == 2 &&
      df.select("id").collect().map(_.getLong(0)).toSet.size == 2)
    // scalar _id parses directly
    val p2 = write(Seq("""{"_id": 5, "vector": [0.1], "k": 1}"""))
    assert(Importers.fromMongo(spark, p2).select("id").first().getLong(0) == 5L)
    intercept[IllegalArgumentException](
      Importers.fromMongo(spark, p2, vectorField = "nope"))
  }

  test("Migrate pipeline: field mapping, normalize, dry-run, storage mode") {
    import graft.sources.Migrate
    val p = write(Seq(
      """{"id": 1, "vector": [3.0, 4.0], "payload": {"cat": "a"}}""",
      """{"id": 2, "vector": [0.0, 0.0], "payload": {"cat": "b"}}"""))
    val src = Importers.fromQdrant(spark, p)
    val dir = Files.createTempDirectory("graft_migrate").toString
    val cols = new Collections(spark, dir)
    // dry run: counts without creating anything (pipeline.rs dry_run)
    assert(Migrate.run(cols, "m1", src, dryRun = true) == 2L)
    assert(!cols.exists("m1"))
    // real run: field-mapped, normalized, collection auto-created
    val n = Migrate.run(cols, "m1", src,
      fieldMappings = Map("cat" -> "category"), normalize = true)
    assert(n == 2L && cols.count("m1") == 2)
    val stored = cols.table("m1").get
    assert(stored.columns.contains("category"))
    val v1 = stored.where(stored("id") === 1L).first()
    assert(v1.getSeq[Float](v1.fieldIndex("vector")).toList == List(0.6f, 0.8f))
    // zero vector passes through unnormalized
    val v2 = stored.where(stored("id") === 2L).first()
    assert(v2.getSeq[Float](v2.fieldIndex("vector")).toList == List(0.0f, 0.0f))
    // storage mode lands on create: f16 migration rounds at publish
    Migrate.run(cols, "m2", src, storageMode = Some("f16"))
    assert(cols.storageModeOf("m2").contains("f16"))
    // structural/unknown mappings are loud
    intercept[IllegalArgumentException](
      Migrate.run(cols, "m3", src, fieldMappings = Map("vector" -> "v2"), dryRun = true))
    intercept[IllegalArgumentException](
      Migrate.run(cols, "m3", src, fieldMappings = Map("nope" -> "x"), dryRun = true))
    // target collisions are loud too: onto structural, onto a
    // surviving column, or two sources onto one target
    intercept[IllegalArgumentException](
      Migrate.run(cols, "m3", src, fieldMappings = Map("cat" -> "vector"), dryRun = true))
    val src2 = src.withColumn("extra", src("cat"))
    intercept[IllegalArgumentException](
      Migrate.run(cols, "m3", src2, fieldMappings = Map("cat" -> "extra"), dryRun = true))
    intercept[IllegalArgumentException](
      Migrate.run(cols, "m3", src2,
        fieldMappings = Map("cat" -> "z", "extra" -> "z"), dryRun = true))
    cols.drop("m1"); cols.drop("m2")
  }

  test("payload fields named like structural columns get the payload_ prefix") {
    // an 'id' inside _source is common in Elasticsearch dumps — it must
    // not produce a duplicate-name frame
    val p = write(Seq(
      """{"_id": "1", "_source": {"vector": [1.0], "id": 42, "t": "x"}}"""))
    val df = Importers.fromElasticsearch(spark, p)
    assert(df.columns.toSet == Set("id", "vector", "payload_id", "t"))
    val r = df.first()
    assert(r.getLong(r.fieldIndex("id")) == 1L &&
      r.getLong(r.fieldIndex("payload_id")) == 42L)
    // same guard on flat-payload importers (supabase keeps a stray
    // 'vector' column addressable instead of colliding)
    val p2 = write(Seq("""{"id": 3, "embedding": [0.5], "vector": "not-a-vec"}"""))
    val df2 = Importers.fromSupabase(spark, p2)
    assert(df2.columns.toSet == Set("id", "vector", "payload_vector"))
  }
}
