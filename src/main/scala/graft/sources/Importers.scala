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

  /** Qdrant scroll/snapshot export: JSON lines of
    * `{"id": …, "vector": […], "payload": {…}}`. */
  def fromQdrant(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val payloadCols: Seq[org.apache.spark.sql.Column] =
      if (raw.columns.contains("payload"))
        raw.select("payload.*").columns.toIndexedSeq
          .map(c => col(s"payload.$c").as(c))
      else Seq.empty
    raw.select(Seq(col("id").cast("long").as("id"),
      col("vector").cast("array<float>").as("vector")) ++ payloadCols: _*)
  }

  /** Pinecone fetch/export: JSON lines of
    * `{"id": "…", "values": […], "metadata": {…}}` (string ids hashed to
    * long when not numeric). */
  def fromPinecone(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val metaCols: Seq[org.apache.spark.sql.Column] =
      if (raw.columns.contains("metadata"))
        raw.select("metadata.*").columns.toIndexedSeq
          .map(c => col(s"metadata.$c").as(c))
      else Seq.empty
    val idCol = coalesce(col("id").try_cast("long"),
      abs(xxhash64(col("id")))).as("id")
    raw.select(Seq(idCol,
      col("values").cast("array<float>").as("vector")) ++ metaCols: _*)
  }

  /** Supabase/pgvector dump: JSON lines `{"id": …, "embedding": […], …}`
    * (any extra top-level columns pass through as payload). */
  def fromSupabase(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val others = raw.columns.toIndexedSeq.filterNot(Set("id", "embedding"))
      .map(col)
    raw.select(Seq(col("id").cast("long").as("id"),
      col("embedding").cast("array<float>").as("vector")) ++ others: _*)
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
      case Some(f) => coalesce(col(f).try_cast("long"), abs(xxhash64(col(f))))
      case None => abs(xxhash64(col(textField)))
    }
    val others = raw.columns.toIndexedSeq
      .filterNot(c => c == textField || idField.contains(c))
      .map(col)
    raw.select(Seq(idCol.as("doc_id"),
      col(textField).cast("string").as("text")) ++ others: _*)
  }
}
