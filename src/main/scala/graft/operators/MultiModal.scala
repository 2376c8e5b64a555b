package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (training-data-pipeline tier).
  *
  * Media (image/audio/video) are opaque `BinaryType` columns plus a typed
  * metadata struct; decode / feature-extract run per-partition so a real
  * codec drops in without changing the plan shape. The decode kernel here
  * is a clearly-marked DETERMINISTIC STUB (the container has no image/
  * audio libs): it computes a 16-bin byte histogram + simple stats.
  * Everything around it — schema, batch iteration, partitioning, column
  * pruning — is the real 100 TB shape: bytes never hit the driver, the
  * feature stage is a narrow mapPartitions (no shuffle), and downstream
  * joins/apps see only the small feature columns.
  */
object MultiModal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
      StructField("declared_frames", IntegerType, nullable = false))),
      nullable = false)))

  /** Deterministic synthetic media table derived from `documents` (text
    * bytes stand in for encoded media; kind round-robins by id). */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.table(spark, dir, "documents")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(col("source").as("source"),
        col("n_chars").cast(LongType).as("n_bytes"),
        (col("doc_id") % 7 + 1).cast(IntegerType).as("declared_frames")).as("meta"))
  }

  /** STUB decode/feature-extract: 16-bin byte histogram + byte stats.
    * A real implementation would swap the per-row kernel for an actual
    * codec (JPEG decode, mel spectrogram, …) — the mapPartitions batch
    * shape, output schema, and null handling stay identical. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val session = media.sparkSession
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "bytes") ++ Seq(
      StructField("feat_hist", ArrayType(DoubleType, containsNull = false), nullable = true),
      StructField("feat_mean", DoubleType, nullable = true)))
    val bytesIdx = media.schema.fieldIndex("bytes")
    val keepIdx = media.schema.fields.indices.filterNot(_ == bytesIdx)
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        val (hist, mean) =
          if (bytes == null || bytes.isEmpty) (null, null)
          else {
            val h = new Array[Double](16)
            var s = 0.0
            var i = 0
            while (i < bytes.length) {
              val b = bytes(i) & 0xFF
              h(b >> 4) += 1.0
              s += b
              i += 1
            }
            var j = 0
            while (j < 16) { h(j) /= bytes.length; j += 1 }
            (h.toSeq, s / bytes.length)
          }
        Row.fromSeq(keepIdx.map(r.get) ++ Seq(hist, mean))
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** STUB frame sampler for `video` rows: split bytes into
    * `meta.declared_frames` near-equal chunks that TILE the input
    * (⌊i·len/n⌋ boundaries — every byte lands in exactly one frame; the
    * old trunc(len/n)-sized chunks skipped interior bytes and dropped
    * the tail whenever n ∤ len, r15 review finding), one output row per
    * frame. Rows declaring ≤ 0 frames emit no rows (sequence(0, n−1)
    * with a negative bound DESCENDS in Spark — it fabricated frames
    * with end-relative reads). */
  def sampleFrames(media: DataFrame): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        posexplode(split_part_bytes(col("bytes"), col("meta.declared_frames"))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")

  /** Tiling byte-chunking as an expression: substring on binary with
    * ⌊i·len/n⌋ boundaries; empty array (no rows after explode) for
    * n ≤ 0. Long arithmetic throughout — i·len stays far under 2^63
    * for any real payload. */
  private def split_part_bytes(bytes: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val len = length(bytes).cast("long")
    val nn = n.cast("long")
    def bound(i: org.apache.spark.sql.Column) = (i * len / nn).cast("long")
    when(nn > 0, transform(sequence(lit(0L), nn - 1), i =>
      substring(bytes, (bound(i) + 1).cast("int"),
        (bound(i + 1) - bound(i)).cast("int"))))
      .otherwise(array().cast("array<binary>"))
  }
}
