package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-store migration importers (SURVEY.md §2.1 S9 — reference
  * crates/velesdb-migrate: Qdrant / Pinecone / Supabase export → points).
  *
  * Each importer is one `spark.read.json` + a normalizing projection to
  * the engine's point shape `(id, vector, <payload columns>)` — the
  * parse distributes, nothing touches the driver.
  */
object Importers {

  /** Payload columns with structural-name collisions prefixed
    * `payload_`: a `_source.id` next to the derived point id (or a
    * metadata `vector`/`document`/`class`) would otherwise produce a
    * duplicate-name frame that breaks every downstream select. The
    * reference keeps payload in a separate map (`point.rs` payload),
    * so the collision can't arise there; flattening to columns is the
    * Spark shape, and the prefix keeps the field addressable. */
  private def payload(cols: Seq[(String, org.apache.spark.sql.Column)],
      structural: Set[String]): Seq[org.apache.spark.sql.Column] =
    cols.map { case (n, c) => c.as(if (structural(n)) s"payload_$n" else n) }

  /** String/UUID ids hash into the RESERVED NEGATIVE range
    * [Long.MinValue, -1] (sign bit forced): a hashed id can never
    * collide with a genuine non-negative numeric id in the same import,
    * and abs()'s Long.MinValue fixed point (abs stays negative) is gone
    * (r15 ADVICE). Documented tradeoff: two DISTINCT string ids can
    * still collide in the 63-bit space (p ≈ n²/2⁶⁴ — negligible at
    * import scale, ~3·10⁻¹⁰ for a billion-point migration), and a
    * genuinely NEGATIVE numeric source id would share the range —
    * no surveyed source emits those (Qdrant ids are unsigned, the rest
    * export strings/UUIDs). */
  private def hashedId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(c.cast("string")).bitwiseOR(lit(Long.MinValue))

  /** Qdrant scroll/snapshot export: JSON lines of
    * `{"id": …, "vector": […], "payload": {…}}`. */
  def fromQdrant(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val payloadCols: Seq[org.apache.spark.sql.Column] =
      if (raw.columns.contains("payload"))
        payload(raw.select("payload.*").columns.toIndexedSeq
          .map(c => c -> col(s"payload.$c")), Set("id", "vector"))
      else Seq.empty
    // string/UUID point ids (officially supported by Qdrant) hash to
    // long like every other importer — a plain cast nulled them all
    // (r15 review finding)
    raw.select(Seq(coalesce(col("id").try_cast("long"),
        hashedId(col("id"))).as("id"),
      col("vector").cast("array<float>").as("vector")) ++ payloadCols: _*)
  }

  /** Pinecone fetch/export: JSON lines of
    * `{"id": "…", "values": […], "metadata": {…}}` (string ids hashed to
    * long when not numeric). */
  def fromPinecone(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val metaCols: Seq[org.apache.spark.sql.Column] =
      if (raw.columns.contains("metadata"))
        payload(raw.select("metadata.*").columns.toIndexedSeq
          .map(c => c -> col(s"metadata.$c")), Set("id", "vector"))
      else Seq.empty
    val idCol = coalesce(col("id").try_cast("long"),
      hashedId(col("id"))).as("id")
    raw.select(Seq(idCol,
      col("values").cast("array<float>").as("vector")) ++ metaCols: _*)
  }

  /** Supabase/pgvector dump: JSON lines `{"id": …, "embedding": […], …}`
    * (any extra top-level columns pass through as payload). */
  def fromSupabase(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val others = payload(raw.columns.toIndexedSeq
      .filterNot(Set("id", "embedding")).map(c => c -> col(c)),
      Set("id", "vector"))
    raw.select(Seq(coalesce(col("id").try_cast("long"),
        hashedId(col("id"))).as("id"),
      col("embedding").cast("array<float>").as("vector")) ++ others: _*)
  }

  /** ChromaDB export: JSON lines of `{"id": …, "embedding": […],
    * "document": "…", "metadata": {…}}` (connectors/chromadb.rs shape).
    * The document text rides along as a payload column. */
  def fromChroma(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    require(raw.columns.contains("embedding"),
      s"importer: no 'embedding' field in $path (columns: ${raw.columns.mkString(", ")})")
    val metaCols: Seq[org.apache.spark.sql.Column] =
      if (raw.columns.contains("metadata"))
        payload(raw.select("metadata.*").columns.toIndexedSeq
          .map(c => c -> col(s"metadata.$c")),
          Set("id", "vector", "document"))
      else Seq.empty
    val docCol: Seq[org.apache.spark.sql.Column] =
      if (raw.columns.contains("document"))
        Seq(col("document").cast("string").as("document"))
      else Seq.empty
    val idCol = coalesce(col("id").try_cast("long"),
      hashedId(col("id"))).as("id")
    raw.select(Seq(idCol,
      col("embedding").cast("array<float>").as("vector")) ++ docCol ++ metaCols: _*)
  }

  /** Elasticsearch scroll export: JSON lines of
    * `{"_id": …, "_source": {…}}` (connectors/elasticsearch.rs shape) —
    * the dense-vector field inside `_source` (default name "vector")
    * becomes the point vector, every other `_source` field is payload. */
  def fromElasticsearch(spark: SparkSession, path: String,
      vectorField: String = "vector"): DataFrame = {
    val raw = spark.read.json(path)
    require(raw.columns.contains("_source"),
      s"importer: no '_source' field in $path (columns: ${raw.columns.mkString(", ")})")
    val srcCols = raw.select("_source.*").columns.toIndexedSeq
    require(srcCols.contains(vectorField),
      s"importer: no '_source.$vectorField' vector field in $path")
    val payloadCols = payload(srcCols.filterNot(_ == vectorField)
      .map(c => c -> col(s"_source.$c")), Set("id", "vector"))
    val idCol = coalesce(col("_id").try_cast("long"),
      hashedId(col("_id"))).as("id")
    raw.select(Seq(idCol,
      col(s"_source.$vectorField").cast("array<float>").as("vector")) ++ payloadCols: _*)
  }

  /** CSV with a JSON-array vector column (connectors/csv_file.rs shape:
    * header row, vector serialized as "[0.1, 0.2, …]"). Header names
    * pass through as payload columns. */
  def fromCsv(spark: SparkSession, path: String,
      vectorField: String = "vector"): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    require(raw.columns.contains("id") && raw.columns.contains(vectorField),
      s"importer: CSV needs 'id' and '$vectorField' columns " +
        s"(columns: ${raw.columns.mkString(", ")})")
    val others = payload(raw.columns.toIndexedSeq
      .filterNot(c => c == "id" || c == vectorField).map(c => c -> col(c)),
      Set("id", "vector"))
    raw.select(Seq(coalesce(col("id").try_cast("long"),
        hashedId(col("id"))).as("id"),
      from_json(col(vectorField),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)).as("vector")) ++ others: _*)
  }

  /** Milvus query/export: JSON lines of `{"id": …, "vector": […],
    * <dynamic fields…>}` (connectors/milvus.rs v2 vectordb shape) —
    * any extra top-level fields are dynamic-schema payload. */
  def fromMilvus(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    require(raw.columns.contains("vector"),
      s"importer: no 'vector' field in $path (columns: ${raw.columns.mkString(", ")})")
    val others = payload(raw.columns.toIndexedSeq
      .filterNot(Set("id", "vector")).map(c => c -> col(c)), Set("id", "vector"))
    val idCol = coalesce(col("id").try_cast("long"),
      hashedId(col("id"))).as("id")
    raw.select(Seq(idCol,
      col("vector").cast("array<float>").as("vector")) ++ others: _*)
  }

  /** Weaviate objects export: JSON lines of `{"id": "<uuid>", "class":
    * "…", "properties": {…}, "vector": […]}` (connectors/weaviate.rs
    * shape) — UUID ids hash to long, the class name rides along as a
    * payload column. */
  def fromWeaviate(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    require(raw.columns.contains("vector"),
      s"importer: no 'vector' field in $path (columns: ${raw.columns.mkString(", ")})")
    val propCols: Seq[org.apache.spark.sql.Column] =
      if (raw.columns.contains("properties"))
        payload(raw.select("properties.*").columns.toIndexedSeq
          .map(c => c -> col(s"properties.$c")),
          Set("id", "vector", "class"))
      else Seq.empty
    val classCol: Seq[org.apache.spark.sql.Column] =
      if (raw.columns.contains("class"))
        Seq(col("class").cast("string").as("class"))
      else Seq.empty
    val idCol = coalesce(col("id").try_cast("long"),
      hashedId(col("id"))).as("id")
    raw.select(Seq(idCol,
      col("vector").cast("array<float>").as("vector")) ++ classCol ++ propCols: _*)
  }

  /** MongoDB export (mongoexport JSONL): `_id` either scalar or the
    * extended-JSON `{"$oid": "…"}` envelope; the vector field name is
    * configurable (connectors/mongodb.rs `vector_field`, default
    * "vector"); every other field is payload. */
  def fromMongo(spark: SparkSession, path: String,
      vectorField: String = "vector"): DataFrame = {
    val raw = spark.read.json(path)
    require(raw.columns.contains("_id"),
      s"importer: no '_id' field in $path (columns: ${raw.columns.mkString(", ")})")
    require(raw.columns.contains(vectorField),
      s"importer: no '$vectorField' vector field in $path")
    val idBase = raw.schema("_id").dataType match {
      case _: org.apache.spark.sql.types.StructType => col("_id.$oid")
      case _ => col("_id")
    }
    val idCol = coalesce(idBase.try_cast("long"),
      hashedId(idBase)).as("id")
    val others = payload(raw.columns.toIndexedSeq
      .filterNot(c => c == "_id" || c == vectorField).map(c => c -> col(c)),
      Set("id", "vector"))
    raw.select(Seq(idCol,
      col(vectorField).cast("array<float>").as("vector")) ++ others: _*)
  }

  /** Text-corpus JSONL (the HF-datasets/Dolma-style landing format for
    * training pipelines): one document per line with a text field and
    * arbitrary metadata. Normalizes to the `documents` shape the
    * dedup/quality/token operators expect: `(doc_id, text, <meta…>)` —
    * an explicit id field is kept; otherwise doc_id is a deterministic
    * content hash (stable across re-imports, unlike
    * monotonically_increasing_id which depends on partitioning). */
  def fromTextJsonl(spark: SparkSession, path: String,
      textField: String = "text", idField: Option[String] = None): DataFrame = {
    val raw = spark.read.json(path)
    require(raw.columns.contains(textField),
      s"importer: no '$textField' field in $path (columns: ${raw.columns.mkString(", ")})")
    val idCol = idField match {
      case Some(f) => coalesce(col(f).try_cast("long"), hashedId(col(f)))
      case None => hashedId(col(textField))
    }
    val others = payload(raw.columns.toIndexedSeq
      .filterNot(c => c == textField || idField.contains(c)).map(c => c -> col(c)),
      Set("doc_id", "text"))
    raw.select(Seq(idCol.as("doc_id"),
      col(textField).cast("string").as("text")) ++ others: _*)
  }
}
