package graft

import graft.functions.VectorKernels
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (SURVEY.md §5.2 item 3): kernel invariants,
  * metric-direction inversion, fusion invariances, LIKE-vs-regex.
  * Deterministic sampling (fixed seed) — no scalatestplus bridge in the
  * offline dependency set, so a tiny forAll shim drives the generators. */
class PropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    samples(g, 50).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(Gen.zip(g1, g2), 50).foreach { case (a, b) => f(a, b) }
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    samples(Gen.zip(g1, g2, g3), 50).foreach { case (a, b, c) => f(a, b, c) }

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0f, 10.0f)).map(_.toArray))

  /** Same-dimension pair — the algebraic kernels now THROW on a
    * dimension mismatch (r15: silent truncation scored garbage). */
  private val vecPairGen: Gen[(Array[Float], Array[Float])] =
    Gen.choose(1, 32).flatMap { n =>
      val one = Gen.listOfN(n, Gen.choose(-10.0f, 10.0f)).map(_.toArray)
      Gen.zip(one, one)
    }

  test("dot/cosine/l2 throw on dimension mismatch (no silent truncation)") {
    val a = Array(1.0f, 2.0f)
    val b = Array(1.0f, 2.0f, 3.0f)
    for (k <- Seq[(Array[Float], Array[Float]) => Double](
        VectorKernels.dot, VectorKernels.cosine, VectorKernels.l2,
        VectorKernels.l2Squared))
      intercept[IllegalArgumentException](k(a, b))
  }

  test("cosine is symmetric, bounded, and 1 on self (non-zero vectors)") {
    forAll(vecPairGen) { (p: (Array[Float], Array[Float])) =>
      val (a, b) = p
      val ab = VectorKernels.cosine(a, b)
      val ba = VectorKernels.cosine(b, a)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      if (a.exists(_ != 0.0f))
        assert(math.abs(VectorKernels.cosine(a, a) - 1.0) < 1e-9)
    }
  }

  test("l2 satisfies identity and symmetry; dot is bilinear in scale") {
    forAll(vecPairGen) { (p: (Array[Float], Array[Float])) =>
      val (a, b) = p
      assert(VectorKernels.l2(a, a) == 0.0)
      assert(math.abs(VectorKernels.l2(a, b) - VectorKernels.l2(b, a)) < 1e-12)
      val scaled = a.map(_ * 2.0f)
      assert(math.abs(VectorKernels.dot(scaled, b) - 2.0 * VectorKernels.dot(a, b)) < 1e-6)
    }
  }

  test("hamming/jaccard bounds") {
    forAll(vecGen, vecGen) { (a: Array[Float], b: Array[Float]) =>
      val h = VectorKernels.hamming(a, b)
      assert(h >= 0.0 && h <= math.max(a.length, b.length))
      val j = VectorKernels.jaccard(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(VectorKernels.jaccard(a, a) == 1.0 || a.forall(_ == 0.0f))
    }
  }

  test("metric-direction inversion: threshold filter = brute-force set (V2)") {
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.37 + d).toFloat)))
    val q = Array.tabulate(8)(d => math.cos(d * 0.21).toFloat)
    import spark.implicits._
    val df = rows.toDF("id", "vec")
    forAll(Gen.choose(0.5, 3.0)) { (t: Double) =>
      val got = graft.operators.Knn
        .thresholdFilter(df, "vec", q.toSeq, t, "euclidean", ">")
        .select("id").collect().map(_.getLong(0)).toSet
      // similarity > t under euclidean ≡ distance < t
      val expect = rows.filter { case (_, v) => VectorKernels.l2(v, q) < t }
        .map(_._1).toSet
      assert(got == expect)
    }
  }

  test("average/maximum fusion are invariant under leg permutation (F2)") {
    val legGen = Gen.listOfN(10,
      Gen.zip(Gen.choose(0L, 20L), Gen.choose(0.0, 1.0)))
    forAll(legGen, legGen, legGen) { (a, b, c) =>
      def fuseAvg(legs: Seq[Seq[(Long, Double)]]): Map[Long, Double] = {
        // per-leg best-score dedup then mean across legs (strategy.rs:170-203)
        val perLeg = legs.map(_.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max })
        perLeg.flatten.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum / v.size }
      }
      val legs = Seq(a, b, c)
      val perm = Seq(c, a, b)
      val f1 = fuseAvg(legs)
      val f2 = fuseAvg(perm)
      assert(f1.keySet == f2.keySet)
      f1.foreach { case (k, v) => assert(math.abs(v - f2(k)) < 1e-12) }
    }
  }

  test("RRF contribution is monotone decreasing in rank and in k (F1)") {
    forAll(Gen.choose(1, 100), Gen.choose(1, 100), Gen.choose(1, 200)) {
      (r1: Int, r2: Int, k: Int) =>
        def rrf(k: Int, rank: Int) = 1.0 / (k + rank)
        if (r1 < r2) assert(rrf(k, r1) > rrf(k, r2))
        assert(rrf(k, r1) > rrf(k + 1, r1))
    }
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // one celebrity key (0) with 10k rows, long tail of singletons
    val left = ((1 to 10000).map(i => (0L, i)) ++ (1 to 500).map(i => (i.toLong, i)))
      .toDF("k", "v")
    val right = (0 to 500).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = left.join(right, "k").agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.sum("v")).first()
    def salted() = graft.operators.Skew.saltedJoin(left, right, "k", salt = 8).agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.sum("v")).first()
    // default gate: the r18 broadcast exit (right fits the threshold)
    val viaExit = salted()
    assert(plain.getLong(0) == viaExit.getLong(0))
    assert(plain.getLong(1) == viaExit.getLong(1))
    // threshold -1 disables the exit: the TRUE salted replicate/spread
    // path must produce the same rows (the pre-r18 pin)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val viaSalt = try salted()
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    assert(plain.getLong(0) == viaSalt.getLong(0))
    assert(plain.getLong(1) == viaSalt.getLong(1))
  }

  test("BFS over a celebrity-node graph: salted frontier expansion equals plain") {
    // the swap documented in Graph.bfsVarLength's scaladoc (SURVEY §7.4
    // risk 5): a hub whose fan-out would land on one reducer — the salted
    // shape must reach exactly the same (start, node, depth) set
    import spark.implicits._
    val hubEdges = (1 to 5000).map(i => (1L, 100L + i, "follows")) // celebrity 1
    val tail = (1 to 50).map(i => (100L + i, 10000L + i, "follows"))
    val edges = (hubEdges ++ tail).toDF("src", "dst", "label")
    val starts = Seq(1L).toDF("start")
    val plain = graft.operators.Graph.bfsVarLength(edges, starts, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // salted depth-1 expansion: edges are the skewed (left) side, the
    // frontier the replicated (right) side, joined on the hot src key
    val frontier = starts.select(col("start"), col("start").as("node"))
    // threshold -1: pin the TRUE salted expansion (the r18 broadcast
    // exit would otherwise take over for this broadcast-sized frontier)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val d1 = try graft.operators.Skew
      .saltedJoin(edges.select(col("src"), col("dst")),
        frontier.select(col("node").as("src"), col("start")), "src", salt = 8)
      .select(col("start"), col("dst").as("node")).distinct()
      .localCheckpoint(true)
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    val d1Set = d1.collect().map(r => (r.getLong(0), r.getLong(1), 1)).toSet
    assert(d1Set == plain.filter(_._3 == 1), s"salted d1 ${d1Set.size} vs plain")
    assert(d1Set.size == 5000)
  }

  test("knn classify equals a brute-force oracle on random labeled data") {
    import spark.implicits._
    import graft.operators.Knn
    val dim = 4
    val rowGen = Gen.zip(Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f)),
      Gen.choose(0, 2))
    val dataGen = Gen.listOfN(24, rowGen)
    // few samples — each drives a full distributed classify
    samples(dataGen, 6).foreach { rows =>
      val train = rows.zipWithIndex
        .map { case ((v, l), i) => (i + 100L, v.toSeq, l) }
      val test = rows.take(4).zipWithIndex
        .map { case ((v, _), i) => (i.toLong, v.map(x => -x).toSeq) }
      val got = Knn.classify(
          train.toDF("vec_id", "embedding", "label"),
          test.toDF("vec_id", "embedding"),
          "embedding", "label", "vec_id", k = 5)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      // brute-force mirror of the operator's exact contract: rounded
      // BIGINT key, id tie-break, majority vote, smallest-label tie
      val expect = test.map { case (qid, qv) =>
        val top = train
          .map { case (tid, tv, l) =>
            val rs = math.floor(VectorKernels.cosine(tv.toArray, qv.toArray)
              * 1e6 + 0.5).toLong
            (rs, tid, l)
          }
          .sortBy { case (rs, tid, _) => (-rs, tid) }.take(5)
        val (lbl, n) = top.groupBy(_._3).view.mapValues(_.size).toSeq
          .minBy { case (l, c) => (-c, l) }
        qid -> ((lbl, n.toLong))
      }.toMap
      assert(got == expect)
    }
  }

  test("mmr: distinct picks, rank 1 = top relevance, lambda=1 = relevance order") {
    import spark.implicits._
    import graft.operators.Knn
    val dim = 4
    val dataGen = Gen.listOfN(12, Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f)))
    samples(dataGen, 5).foreach { vecs =>
      val docs = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      val df = docs.toDF("vec_id", "embedding")
      val q = Seq(1.0f, 0.5f, -0.25f, 2.0f)
      val picks = Knn.mmr(df, "embedding", q, k = 4, lambda = 1.0,
          candN = 8, idCol = "vec_id")
        .orderBy("rank").collect().map(_.getLong(0)).toSeq
      assert(picks.distinct == picks, "picks must be distinct")
      // λ=1 is pure relevance: must equal the rounded-key top-k order
      val rel = docs.map { case (id, v) =>
        (math.floor(VectorKernels.cosine(v.toArray, q.toArray)
          * 1e6 + 0.5).toLong, id)
      }.sortBy { case (rs, id) => (-rs, id) }.take(4).map(_._2)
      assert(picks == rel, s"lambda=1 must rank by relevance: $picks vs $rel")
    }
  }

  test("Spark LIKE agrees with a regex oracle") {
    import spark.implicits._
    val strGen = Gen.listOfN(6, Gen.oneOf('a', 'b', '_', '%', 'x')).map(_.mkString)
    val patGen = Gen.listOfN(4, Gen.oneOf("a", "b", "%", "_")).map(_.mkString)
    forAll(Gen.listOfN(20, strGen), patGen) { (strs: List[String], pat: String) =>
      val df = strs.toDF("s")
      val got = df.where(org.apache.spark.sql.functions.col("s").like(pat))
        .collect().map(_.getString(0)).toSeq.sorted
      val rx = ("^" + pat.flatMap {
        case '%' => ".*"
        case '_' => "."
        case c => java.util.regex.Pattern.quote(c.toString)
      } + "$").r
      val expect = strs.filter(s => rx.findFirstIn(s).isDefined).sorted
      assert(got == expect)
    }
  }
}
