package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Materialize a derived frame ONCE per dataset dir as parquet,
  * optionally clustered by a key column. The cache key includes the
  * source files' mtime+size, so regenerated testdata rebuilds. At
  * cluster scale the same derived tables become bucketed tables
  * (bucketBy + metastore) so downstream joins co-locate. */
object Materialize {

  def apply(spark: SparkSession, dir: String, kind: String,
      sources: Seq[String], partCol: Option[String])(build: => DataFrame): DataFrame = {
    val stamp = sources.map { t =>
      val f = new java.io.File(s"$dir/$t.parquet")
      s"${f.lastModified()}_${f.length()}"
    }.mkString("_")
    val key = s"v2_${kind}_${dir.replaceAll("[^A-Za-z0-9._-]", "_")}__$stamp"
    val path = s"${sys.props("java.io.tmpdir")}/graft-derived/$key"
    this.synchronized {
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
        val b = build
        // cluster AND sort by the key: tight per-row-group min/max stats
        // → pushed key filters prune row groups on read
        val clustered = partCol.map(c =>
          b.repartition(spark.sessionState.conf.numShufflePartitions, col(c))
            .sortWithinPartitions(col(c)))
          .getOrElse(b)
        clustered.write.mode("overwrite").parquet(path)
      }
    }
    spark.read.parquet(path)
  }
}
