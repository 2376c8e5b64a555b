package graft

import graft.functions.VectorFunctions
import graft.operators.{Ann, Knn, Quantization}
import org.apache.spark.sql.functions._

/** ANN + quantized search recall vs the exact oracle (SURVEY.md §5.2:
  * recall@10 ≥ 0.95 against brute force — the reference's own bar,
  * docs/BENCHMARKS.md:102). */
class AnnSpec extends SparkSpecBase {

  private val q = VectorFunctions.syntheticQuery(64)
  private lazy val emb = Tables.table(spark, sfDir, "embeddings")
  private lazy val exactTop10: Set[Long] =
    Knn.topK(emb, "embedding", q, 10, "cosine", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("LSH recall grows monotonically with probe radius (the ef knob)") {
    // Mirrors the reference's ef→recall profile (Fast 34-92% … Perfect
    // 100%, docs/BENCHMARKS.md:96-99 / benchmarks/README.md:9-15): on
    // uniform-random vectors low radii trade recall for probe count,
    // and full radius is exact by construction.
    val nPlanes = 6
    val index = Ann.buildIndex(emb, "embedding", nPlanes)
    val recalls = (1 to nPlanes).map { r =>
      val got = Ann.search(index, "embedding", q, 10, nPlanes, radius = r,
          metric = "cosine", idCol = "vec_id")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (got & exactTop10).size / 10.0
    }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall not monotone: $recalls")
    assert(recalls.last == 1.0, s"full radius must be exact: $recalls")
    assert(recalls(2) >= 0.6, s"radius-3 recall too low: $recalls")
  }

  test("LSH with full probe radius recovers exact search") {
    val nPlanes = 6
    val index = Ann.buildIndex(emb, "embedding", nPlanes)
    val got = Ann.search(index, "embedding", q, 10, nPlanes, radius = nPlanes,
        metric = "cosine", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == exactTop10)
  }

  test("LSH signature is deterministic and bucket-stable") {
    val planes = Ann.planes(6, 64)
    val sig1 = Ann.signature(q.toArray, planes)
    val sig2 = Ann.signature(q.toArray, Ann.planes(6, 64))
    assert(sig1 == sig2)
    // index assigns the same signature the kernel computes
    val index = Ann.buildIndex(emb, "embedding", 6)
    val row = index.select("vec_id", "embedding", "bucket").first()
    val v = row.getSeq[Float](1).toArray
    assert(row.getLong(2) == Ann.signature(v, planes))
  }

  test("binary-sketch two-phase search reaches recall@10 >= 0.9 at 8x oversampling") {
    val sk = Quantization.withBinarySketch(emb, "embedding", 64)
    val got = Quantization.search(sk, "embedding", q, 10, oversampling = 8,
        metric = "cosine", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (got & exactTop10).size / 10.0
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF: recall grows with nprobe; full probe is exact; assignment is nearest-centroid") {
    import graft.operators.Ivf
    val k = 8
    val centroids = Ivf.trainCentroids(emb, "embedding", k, iters = 3)
    assert(centroids.length == k)
    val index = Ivf.buildIndex(emb, "embedding", centroids).cache()
    // every vector sits in its nearest centroid's cell
    val sample = index.select("embedding", "cell").limit(20).collect()
    sample.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val best = centroids.minBy { case (c, cen) =>
        (graft.functions.VectorKernels.l2Squared(v, cen), c) }._1
      assert(r.getInt(1) == best)
    }
    val recalls = Seq(1, 4, 8).map { np =>
      val got = Ivf.search(index, "embedding", q, 10, centroids, np,
          metric = "cosine", idCol = "vec_id")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (got & exactTop10).size / 10.0
    }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall not monotone in nprobe: $recalls")
    assert(recalls.last == 1.0, s"nprobe=k must be exact: $recalls")
  }

  test("AnnTopKRule rewrites similarity top-k into a bucket-pruned probe") {
    import graft.functions.{VectorFunctions => VF}
    import org.apache.spark.sql.functions.col
    // getOrCreate would hand back the extension-less shared session —
    // clear the default so a NEW session (same SparkContext) is built
    // with the extensions applied
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val ext = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[2]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    val nPlanes = 6
    ext.conf.set("graft.ann.planes", nPlanes.toString)
    ext.conf.set("graft.ann.radius", "2")
    val index = Ann.buildIndex(Tables.table(ext, sfDir, "embeddings"),
      "embedding", nPlanes)
    def topk() = index
      .orderBy(VF.cosine_sim(col("embedding"), VF.vecLit(q)).desc, col("vec_id").asc)
      .limit(10)

    // structural check: the only Filter in this plan can be the injected
    // probe filter (pushdown may substitute `bucket` with its defining
    // expression, so string matching would miss it)
    def probeFilters(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }
    ext.conf.set("graft.ann.rewrite", "false")
    assert(probeFilters(topk()).isEmpty, "no probe filter expected when disabled")
    val exactIds = topk().select("vec_id").collect().map(_.getLong(0)).toSet

    ext.conf.set("graft.ann.rewrite", "true")
    assert(probeFilters(topk()).nonEmpty, "probe filter missing when enabled")
    val annIds = topk().select("vec_id").collect().map(_.getLong(0)).toSet
    // rewrite result must equal the explicit probe search at same radius
    val expected = Ann.search(index, "embedding", q, 10, nPlanes, radius = 2,
        metric = "cosine", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(annIds == expected)
    assert((annIds & exactIds).nonEmpty) // sanity: probes overlap the true top-k

    // direction guard (ADVICE r1): a FARTHEST-first sort must NOT get the
    // near-bucket probe filter — it would not approximate that query
    val farthest = index
      .orderBy(VF.cosine_sim(col("embedding"), VF.vecLit(q)).asc, col("vec_id").asc)
      .limit(10)
    assert(probeFilters(farthest).isEmpty, "farthest-first sort must not be probe-rewritten")
    // l2: ASCENDING is nearest-first and qualifies; DESC must not
    val l2Near = index
      .orderBy(VF.l2_dist(col("embedding"), VF.vecLit(q)).asc, col("vec_id").asc)
      .limit(10)
    assert(probeFilters(l2Near).nonEmpty, "l2 ASC is nearest-first, should rewrite")
    val l2Far = index
      .orderBy(VF.l2_dist(col("embedding"), VF.vecLit(q)).desc, col("vec_id").asc)
      .limit(10)
    assert(probeFilters(l2Far).isEmpty, "l2 DESC must not be probe-rewritten")
    ext.conf.set("graft.ann.rewrite", "false")
  }

  test("bucket-partitioned index turns probes into partition pruning") {
    import org.apache.spark.sql.functions.col
    val nPlanes = 4
    val emb = Tables.table(spark, sfDir, "embeddings")
    val idx = Ann.buildIndex(emb, "embedding", nPlanes)
    val path = java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString
    Ann.writeIndex(idx, path)
    val onDisk = Ann.readIndex(spark, path)
    val sig = Ann.signature(q.toArray, Ann.planes(nPlanes, q.length))
    val probes = Ann.probeBuckets(sig, nPlanes, radius = 1)
    val probed = onDisk.where(col("bucket").isin(probes: _*))
    val plan = probed.queryExecution.executedPlan.toString
    // the bucket predicate must land in PartitionFilters (directory
    // pruning), NOT as a row-level data filter over the whole index
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[.*bucket".r.findFirstIn(plan).isDefined,
      s"bucket probe should prune partitions:\n$plan")
    // and the probed read agrees with the in-memory index filter
    val want = idx.where(col("bucket").isin(probes: _*)).count()
    assert(probed.count() == want)
  }

  test("sketch packing matches the kernel sketch") {
    val sk = Quantization.withBinarySketch(emb, "embedding", 64)
    sk.select("embedding", "sketch").limit(20).collect().foreach { r =>
      val v = r.getSeq[Float](0)
      assert(r.getLong(1) == Quantization.sketchOf(v))
    }
  }
}
