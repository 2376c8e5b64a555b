package graft

import graft.functions.{VectorFunctions, VectorKernels}
import graft.operators.Knn
import org.apache.spark.sql.functions._

/** Distance kernels + exact top-k vs brute-force Scala oracles
  * (SURVEY.md §5.2 item 2 — exact-oracle tests, mirroring the reference's
  * recall_validation.rs but in exact mode: recall must be 100%). */
class VectorSpec extends SparkSpecBase {

  private val eps = 1e-12

  test("kernel correctness on hand-computed vectors") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(4.0f, 5.0f, 6.0f)
    assert(math.abs(VectorKernels.dot(a, b) - 32.0) < eps)
    assert(math.abs(VectorKernels.l2(a, b) - math.sqrt(27.0)) < eps)
    val cos = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(VectorKernels.cosine(a, b) - cos) < eps)
    assert(VectorKernels.hamming(a, b) == 3.0)
    assert(VectorKernels.hamming(a, a) == 0.0)
    assert(VectorKernels.jaccard(a, b) == 1.0) // all non-zero both sides
    assert(VectorKernels.jaccard(Array(1f, 0f), Array(1f, 1f)) == 0.5)
    assert(VectorKernels.cosine(Array(0f, 0f, 0f), b) == 0.0) // zero-norm guard
  }

  test("codegen expression equals kernel on real data") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val q = VectorFunctions.syntheticQuery(64)
    val got = emb
      .withColumn("score", VectorFunctions.cosine_sim(col("embedding"), VectorFunctions.vecLit(q)))
      .select("vec_id", "embedding", "score").collect()
    got.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val expect = VectorKernels.cosine(v, q.toArray)
      assert(math.abs(r.getDouble(2) - expect) < eps, s"vec ${r.getLong(0)}")
    }
  }

  test("exact top-k matches brute-force oracle for every metric") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val q = VectorFunctions.syntheticQuery(64).toArray
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val kernels: Map[String, (Array[Float], Array[Float]) => Double] = Map(
      "cosine" -> VectorKernels.cosine,
      "dot" -> VectorKernels.dot,
      "euclidean" -> VectorKernels.l2,
      "hamming" -> VectorKernels.hamming,
      "jaccard" -> VectorKernels.jaccard)
    for ((metric, (_, higherBetter)) <- VectorFunctions.metrics) {
      val oracle = all.map { case (id, v) => (id, kernels(metric)(v, q)) }
        .sortBy { case (id, s) => (if (higherBetter) -s else s, id) }
        .take(10).map(_._1).toSeq
      val got = Knn.topK(emb, "embedding", q.toSeq, 10, metric, idCol = "vec_id")
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == oracle, s"metric=$metric got=$got oracle=$oracle")
    }
  }

  test("threshold filter with metric-direction inversion") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val q = VectorFunctions.syntheticQuery(64)
    // similarity(v,q) > 0.2 under euclidean metric must become l2 < 0.2
    val got = Knn.thresholdFilter(emb, "embedding", q, 3.0, "euclidean", ">")
    val manual = emb.withColumn("s",
        VectorFunctions.l2_dist(col("embedding"), VectorFunctions.vecLit(q)))
      .where(col("s") < 3.0)
    assert(got.count() == manual.count())
  }

  test("knn classify: majority label, vote tie-break, distance metric") {
    import spark.implicits._
    // two tight clusters: label 1 near (1,0), label 2 near (0,1)
    val train = Seq(
      (10L, Seq(1.0f, 0.0f), 1), (11L, Seq(0.9f, 0.1f), 1),
      (12L, Seq(0.95f, 0.05f), 1),
      (20L, Seq(0.0f, 1.0f), 2), (21L, Seq(0.1f, 0.9f), 2),
      (22L, Seq(0.05f, 0.95f), 2)
    ).toDF("vec_id", "embedding", "label")
    val test = Seq((1L, Seq(0.8f, 0.2f)), (2L, Seq(0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = Knn.classify(train, test, "embedding", "label", "vec_id", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((1, 3L)), 2L -> ((2, 3L))))
    // k=6 takes ALL train rows -> 3-3 vote tie -> smallest label wins
    val tied = Knn.classify(train, test, "embedding", "label", "vec_id", k = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tied == Map(1L -> 1, 2L -> 1))
    // distance metric ranks ascending: euclidean must agree with cosine
    // on these well-separated clusters
    val l2 = Knn.classify(train, test, "embedding", "label", "vec_id",
        k = 3, metric = "euclidean")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(l2 == Map(1L -> 1, 2L -> 2))
  }

  test("hard negatives: different-label only, self excluded, similarity order") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f), 1),   // anchor
      (2L, Seq(0.99f, 0.1f), 1),  // same label: positive, never mined
      (3L, Seq(0.98f, 0.05f), 2), // hardest negative (most similar)
      (4L, Seq(0.8f, 0.3f), 2),
      (5L, Seq(0.0f, 1.0f), 3)    // easy negative (least similar)
    ).toDF("vec_id", "embedding", "label")
    val got = Knn.hardNegatives(corpus, corpus.where(col("vec_id") === 1),
        "embedding", "label", "vec_id", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    // ranked hardest-first, label 1 rows (anchor + positive) absent
    assert(got.toSeq == Seq((3L, 2, 1L), (4L, 2, 2L), (5L, 3, 3L)))
  }

  test("mmr trades relevance for diversity as lambda falls") {
    import spark.implicits._
    // 1-2: near-duplicates closest to the query; 3: slightly less
    // relevant but orthogonal to them
    val docs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.99f, 0.01f, 0.0f)),
      (3L, Seq(0.6f, 0.0f, 0.8f))
    ).toDF("vec_id", "embedding")
    val q = Seq(1.0f, 0.0f, 0.0f)
    def picks(lambda: Double) =
      Knn.mmr(docs, "embedding", q, k = 3, lambda = lambda, candN = 3,
        idCol = "vec_id").orderBy("rank")
        .collect().map(_.getLong(0)).toSeq
    // pure relevance keeps the near-duplicate adjacent
    assert(picks(1.0) == Seq(1L, 2L, 3L))
    // diversity pressure promotes the orthogonal doc above the near-dup
    // (at 0.5 exactly, this geometry ties all scores at 0 — query is
    // collinear with doc 1, so sim-to-doc1 == relevance for everyone)
    assert(picks(0.4) == Seq(1L, 3L, 2L))
    // rank 1 is always the most relevant doc
    assert(picks(0.0).head == 1L)
  }
}
