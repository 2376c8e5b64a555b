package graft

import org.apache.spark.sql.functions._

/** r15 review findings on the analytics operators, pinned. */
class OperatorsHardeningSpec extends SparkSpecBase {
  import spark.implicits._

  test("bfsVarLength rejects non-positive depth instead of NPEing") {
    val e = Seq((1L, 2L, "x")).toDF("src", "dst", "label")
    val s = Seq(1L).toDF("start")
    for (bad <- Seq(0, -1, 11))
      intercept[IllegalArgumentException](
        operators.Graph.bfsVarLength(e, s, bad))
  }

  test("searchIndexFiltered: duplicate keep ids do not inflate scores") {
    val idx = operators.Bm25.materializedIndex(spark, sfDir, "hardspec",
      Seq("documents"))(Tables.table(spark, sfDir, "documents"))
    val keep = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id")).limit(200)
    val dup = keep.unionAll(keep).unionAll(keep) // every id three times
    val a = operators.Bm25.searchIndexFiltered(idx, keep, "data model", 10)
      .collect().map(_.toString).toSeq
    val b = operators.Bm25.searchIndexFiltered(idx, dup, "data model", 10)
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b,
      s"duplicated keep set changed scores\n a=${a.take(3)}\n b=${b.take(3)}")
  }

  test("Knn.batch with no queries returns an empty frame, not reduce-on-empty") {
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val out = operators.Knn.batch(df, "vec", Nil, k = 5)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("query_id", "id", "score"))
  }

  test("embeddingNearDupLsh degrades to empty output on an empty slice") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    val out = operators.Dedup.embeddingNearDupLsh(empty, "vec", "id", 0.9)
    assert(out.collect().isEmpty)
  }

  test("flat-layout IVF cell assignments follow the model epoch") {
    // pieces=None path: the cells cache key must carry the MODEL stamp
    // — the old key (data sources only) served assignments computed
    // under retired centroids after a retrain (r15 review finding)
    val token = s"hardspec-${System.nanoTime()}"
    val name = "flatstale"
    val src = java.nio.file.Paths.get(s"$sfDir/embeddings.parquet")
    def epochFile(n: Int): java.nio.file.Path = {
      val p = java.nio.file.Files.createTempFile("graft-epoch-", ".txt")
      java.nio.file.Files.writeString(p, f"$n%020d " + "x" * (n % 97))
      p
    }
    val base = Tables.table(spark, sfDir, "embeddings").limit(300)
    def cellsArtifacts(): Int = {
      val parent = java.nio.file.Paths.get(
        s"${sys.props("java.io.tmpdir")}/graft-derived")
      val s = java.nio.file.Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(p =>
          p.getFileName.toString.contains(s"ivf4_cells_$name") &&
            p.getFileName.toString.contains(token) &&
            !p.getFileName.toString.contains(".tmp-"))
      } finally s.close()
    }
    operators.Ivf.materializedIndexAt(spark, token, Seq(src), name, base,
      "embedding", k = 4, modelSources = Some(Seq(src, epochFile(1))))
    val afterFirst = cellsArtifacts()
    assert(afterFirst >= 1)
    operators.Ivf.materializedIndexAt(spark, token, Seq(src), name, base,
      "embedding", k = 4, modelSources = Some(Seq(src, epochFile(2))))
    assert(cellsArtifacts() > afterFirst,
      "retrained model did not produce a fresh cell-assignment artifact")
  }

  test("CheckpointBlocks.unpersist frees a checkpoint under a Project") {
    val ck = (1 to 100).map(i => (i.toLong, i.toString)).toDF("id", "v")
      .localCheckpoint(true)
    val projected = ck.drop("v") // the components/lpaCommunities shape
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    org.apache.spark.sql.graft.CheckpointBlocks.unpersist(projected, blocking = true)
    assert(persisted == before - 1,
      s"Project-over-checkpoint was not freed (before=$before after=$persisted)")
  }
}
