package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Migration pipeline (reference crate `velesdb-migrate`: connector →
  * `Transformer` → destination, with dry-run — `pipeline.rs:97`,
  * `transform.rs:8-46`, `main.rs` `--dry-run`). The Spark shape: any
  * [[Importers]] frame (or any `(id, vector, payload…)` DataFrame) is
  * the connector, the transform is a declarative projection, and the
  * destination is a [[graft.Collections]] upsert — one distributed
  * read → map → publish, no per-point loop, retry/batching delegated
  * to Spark task retry.
  */
object Migrate {

  /** `transform.rs:31-44` field mappings: rename payload columns
    * (`old → new`); `id`/`vector` are structural and not remappable.
    * Unknown source names are an error — a silent no-op mapping would
    * ship the wrong schema. */
  def mapFields(df: DataFrame, mappings: Map[String, String]): DataFrame = {
    val bad = mappings.keys.filterNot(df.columns.contains)
    require(bad.isEmpty, s"migrate: unknown source fields ${bad.mkString(", ")}")
    require(!mappings.keys.exists(Set("id", "vector")),
      "migrate: 'id'/'vector' are structural, not payload mappings")
    // targets validate too — renaming ONTO a structural column, onto a
    // surviving column, or two sources onto one target would produce a
    // duplicate-name frame that fails far downstream (the same
    // wrong-schema hazard the source check exists for)
    val targets = mappings.values.toSeq
    require(targets.distinct.size == targets.size,
      "migrate: two fields map onto the same target name")
    require(!targets.exists(Set("id", "vector")),
      "migrate: cannot map a payload field onto structural 'id'/'vector'")
    val surviving = df.columns.filterNot(mappings.keySet).toSet
    val clash = targets.filter(surviving)
    require(clash.isEmpty,
      s"migrate: target names collide with existing columns: ${clash.mkString(", ")}")
    mappings.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** `transform.rs normalize_vector`: unit-L2 the vector column in
    * place (zero vectors pass through unchanged), staying
    * `array<float>`. Map-only. */
  def normalizeVector(df: DataFrame, vecCol: String = "vector"): DataFrame = {
    val d = transform(col(vecCol), x => x.cast("double"))
    val n = sqrt(aggregate(d, lit(0.0), (a, x) => a + x * x))
    df.withColumn(vecCol,
      when(n > 0.0, transform(col(vecCol), x => (x.cast("double") / n).cast("float")))
        .otherwise(col(vecCol)))
  }

  /** Run a migration into a collection. Returns the point count that
    * was (or with `dryRun=true`, WOULD be) written — dry-run touches
    * nothing, exactly `pipeline.rs:97`'s no-destination mode. Creates
    * the collection on first use (vector column + optional
    * `storageMode` — so a migration can land directly in an
    * sq8/f16/pq store). */
  def run(collections: graft.Collections, name: String, source: DataFrame,
      fieldMappings: Map[String, String] = Map.empty,
      normalize: Boolean = false, dryRun: Boolean = false,
      storageMode: Option[String] = None): Long = {
    require(source.columns.contains("id"), "migrate: source needs an 'id' column")
    val mapped = mapFields(source, fieldMappings)
    val hasVec = mapped.columns.contains("vector")
    val finalDf =
      if (normalize && hasVec) normalizeVector(mapped) else mapped
    val n = finalDf.count()
    if (!dryRun) {
      if (!collections.exists(name))
        collections.create(name, idCol = "id",
          vectorCol = if (hasVec) Some("vector") else None,
          storageMode = storageMode)
      collections.upsert(name, finalDf)
    }
    n
  }
}
