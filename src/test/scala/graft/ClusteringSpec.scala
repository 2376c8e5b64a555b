package graft

import org.apache.spark.sql.functions._

/** operators.Clustering — deterministic k-means, SemDeDup, prototype
  * pruning (q161-q163 pin the sf0.01 values vs DuckDB; these specs pin
  * the semantics on hand-built geometry). */
class ClusteringSpec extends SparkSpecBase {
  import graft.operators.Clustering
  import spark.implicits._

  // two tight groups on opposite axes + ids ordered so the two seeds
  // (smallest ids) land one in each group
  private def twoGroups = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.1f)),
    (3L, Seq(0.9f, 0.1f, 0.0f)),
    (4L, Seq(0.1f, 0.9f, 0.0f)),
    (5L, Seq(0.95f, 0.0f, 0.05f)),
    (6L, Seq(0.0f, 0.95f, 0.05f))
  ).toDF("id", "vec")

  test("kmeans separates two obvious groups and is deterministic") {
    val got = Clustering.kmeans(twoGroups, "vec", "id", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == got(3L) && got(3L) == got(5L))
    assert(got(2L) == got(4L) && got(4L) == got(6L))
    assert(got(1L) != got(2L))
    // seed 1 (id=1) is cluster 0, seed 2 (id=2) is cluster 1
    assert(got(1L) == 0 && got(2L) == 1)
    val again = Clustering.kmeans(twoGroups, "vec", "id", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == again)
  }

  test("semDedup keeps the smallest id of each semantic twin group") {
    // ids 1/3/5 are near-parallel (cos ≈ 1) → 3 and 5 drop, 1 stays;
    // group two's members are mutually ~0.9-similar → 4 and 6 drop
    val got = Clustering.semDedup(twoGroups, "vec", "id", k = 2, iters = 2,
        threshold = 0.85)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(1L) && !got(3L) && !got(5L))
    assert(got(2L) && !got(4L) && !got(6L))
  }

  test("semDedup threshold 1.01 keeps everything") {
    val got = Clustering.semDedup(twoGroups, "vec", "id", k = 2, iters = 2,
      threshold = 1.01)
    assert(got.where(!col("keep")).count() == 0)
    assert(got.count() == 6)
  }

  test("prototypicalityPrune keeps the nearest fraction per cluster") {
    // keepFraction 2/3: each 3-member cluster keeps ranks 1 and 2
    val got = Clustering.prototypicalityPrune(twoGroups, "vec", "id",
        k = 2, iters = 3, keepFraction = 2.0 / 3.0)
      .collect()
    assert(got.length == 6)
    val byCluster = got.groupBy(_.getInt(1))
    assert(byCluster.size == 2)
    byCluster.values.foreach { rows =>
      val ranks = rows.map(_.getLong(2)).sorted
      assert(ranks.toSeq == Seq(1L, 2L, 3L))
      assert(rows.count(_.getBoolean(3)) == 2)
      // the kept two are ranks 1-2
      assert(rows.filter(_.getBoolean(3)).map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
    }
  }

  test("fit + predict assigns unseen points to the nearest centroid") {
    val model = Clustering.fit(twoGroups, "vec", "id", k = 2, iters = 3)
    val unseen = Seq(
      (10L, Seq(0.8f, 0.05f, 0.0f)), // clearly group 1 (cid 0)
      (11L, Seq(0.05f, 0.8f, 0.0f))) // clearly group 2 (cid 1)
      .toDF("id", "vec")
    val got = Clustering.predict(unseen, "vec", model)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got(10L) == 0 && got(11L) == 1)
  }

  test("kmeans single cluster swallows all when k=1") {
    val got = Clustering.kmeans(twoGroups, "vec", "id", k = 1, iters = 2)
    assert(got.select("cid").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("silhouette: well-separated clusters score high, k=2 split of one cloud scores low") {
    val good = Clustering.silhouetteByCluster(twoGroups, "vec", "id",
        k = 2, iters = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(good.length == 2 && good.forall(_._2 == 3L))
    assert(good.forall(_._3 > 0.5),
      s"tight separated clusters must score > 0.5: ${good.toSeq}")
    // a uniform line forcibly split into 2 scores WORSE than the truly
    // separated groups (silhouette is scale-invariant, so even a tiny
    // cloud splits with middling per-point scores — the signal is
    // relative, which is how the metric is used: compare k choices)
    val cloud = Seq(
      (1L, Seq(1.0f, 0.00f)), (2L, Seq(1.0f, 0.01f)),
      (3L, Seq(1.0f, 0.02f)), (4L, Seq(1.0f, 0.03f)),
      (5L, Seq(1.0f, 0.04f)), (6L, Seq(1.0f, 0.05f))
    ).toDF("id", "vec")
    val bad = Clustering.silhouetteByCluster(cloud, "vec", "id",
        k = 2, iters = 3)
      .collect().map(_.getDouble(2))
    assert(bad.sum / bad.length < good.map(_._3).sum / good.length,
      s"uniform split must score below separated groups: " +
        s"${bad.toSeq} vs ${good.map(_._3).toSeq}")
    // k=1 is rejected: b has no other cluster to come from
    intercept[IllegalArgumentException] {
      Clustering.silhouetteByCluster(twoGroups, "vec", "id", k = 1, iters = 2)
    }
  }
}
