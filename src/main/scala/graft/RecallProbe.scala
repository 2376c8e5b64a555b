package graft

import graft.operators.{Ann, Knn}
import org.apache.spark.sql.SparkSession

/** Scratch calibration main (not part of the API): measures LSH recall@10
  * per probe radius, for tier calibration. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(graft.SessionTuning.localConfigMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qa = functions.VectorFunctions.syntheticQuery(64)
    val qb = (0 until 64).map(i => (math.cos(i * 0.31) * 0.4 - 0.05).toFloat)
    val qc = (0 until 64).map(i => (math.sin(i * 1.3 + 0.5) * 0.3).toFloat)
    val emb = Tables.table(spark, sfDir, "embeddings")
    val nPlanes = 6
    val idx = Ann.buildIndex(emb, "embedding", nPlanes, dim = Some(64)).cache()
    idx.count()
    for (r <- 0 to nPlanes) {
      val hits = Seq(qa, qb, qc).map { q =>
        val exact = Knn.topK(emb, "embedding", q, 10, "cosine", idCol = "vec_id").select("vec_id")
        val approx = Ann.search(idx, "embedding", q, 10, nPlanes, r, idCol = "vec_id").select("vec_id")
        approx.join(exact, "vec_id").count()
      }.sum
      println(s"PROBE lsh nPlanes=$nPlanes radius=$r hits=$hits/30")
    }
    idx.unpersist()

    // PQ ADC calibration: recall@10 after exact rerank of k×os ADC
    // candidates, per (m, k, oversample)
    import org.apache.spark.sql.functions.col
    for ((m, kCent) <- Seq((8, 16), (8, 32), (4, 16))) {
      val cb = operators.Pq.train(emb, "embedding", 64, m, kCent)
      val enc = operators.Pq.encodeForProbe(emb, "embedding", "vec_id", cb).cache()
      enc.count()
      for (os <- Seq(2, 4, 8, 16)) {
        val hits = Seq(qa, qb, qc).map { q =>
          val exact = Knn.topK(emb, "embedding", q, 10, "cosine", idCol = "vec_id").select("vec_id")
          val (ord, asc) = operators.Pq.adcOrdering(col("codes"), q.toArray, cb, "cosine")
          val cand = enc.withColumn("__adc", ord)
            .orderBy(if (asc) col("__adc").asc else col("__adc").desc, col("vec_id").asc)
            .limit(10 * os).select("vec_id")
          val rer = Knn.topK(emb.join(cand, "vec_id"), "embedding", q, 10, "cosine",
            idCol = "vec_id").select("vec_id")
          rer.join(exact, "vec_id").count()
        }.sum
        println(s"PROBE pq m=$m k=$kCent oversample=$os hits=$hits/30")
      }
      enc.unpersist()
    }

    // RESIDUAL PQ calibration (the r17 product path): recall@10 after
    // exact rerank of k×os ADC candidates over the residual
    // (cell, codes) frame, per (m, k, oversample)
    val cents8 = operators.Ivf.trainCentroids(emb, "embedding", 8, iters = 2)
    for ((m, kCent) <- Seq((8, 32), (8, 64), (8, 256), (16, 32))) {
      val cb = operators.Pq.trainResidual(emb, "embedding", 64, cents8, m, kCent)
      val enc = operators.Pq.encodeResidual(emb, "embedding", "vec_id", cb, cents8).cache()
      enc.count()
      for (os <- Seq(4, 8, 16, 64)) {
        val hits = Seq(qa, qb, qc).map { q =>
          val exact = Knn.topK(emb, "embedding", q, 10, "cosine", idCol = "vec_id").select("vec_id")
          val (ord, asc) = operators.Pq.adcOrderingResidual(col("codes"),
            col("cell"), q.toArray, cb, cents8, "cosine")
          val cand = enc.withColumn("__adc", ord)
            .orderBy(if (asc) col("__adc").asc else col("__adc").desc, col("vec_id").asc)
            .limit(10 * os).select("vec_id")
          val rer = Knn.topK(emb.join(cand, "vec_id"), "embedding", q, 10, "cosine",
            idCol = "vec_id").select("vec_id")
          rer.join(exact, "vec_id").count()
        }.sum
        println(s"PROBE pqr m=$m k=$kCent oversample=$os hits=$hits/30")
      }
      enc.unpersist()
    }

    // HNSW calibration: recall@10 + scored-candidate count per
    // (nprobe, ef), vs the IVF full-cell-scan candidate count
    {
      val cents = operators.Ivf.trainCentroids(emb, "embedding", 8, iters = 2)
      val cells = operators.Ivf.buildIndex(emb, "embedding", cents)
      val graph = operators.Hnsw.buildGraph(cells, "embedding", "vec_id",
        "cosine", m = 8).cache()
      graph.count()
      for (nprobe <- Seq(2, 4, 7); ef <- Seq(24, 48, 96, 128)) {
        var cand = 0L
        var ivfCand = 0L
        val hits = Seq(qa, qb, qc).map { q =>
          val exact = Knn.topK(emb, "embedding", q, 10, "cosine", idCol = "vec_id").select("vec_id")
          val probes = operators.Hnsw.probeCells(cents, q.toArray, nprobe)
          val walked = operators.Hnsw.walkCandidates(
            graph.where(org.apache.spark.sql.functions.col("cell").isin(probes: _*)),
            "embedding", "vec_id", "cosine", q, ef)
          cand += walked.count()
          ivfCand += cells.where(
            org.apache.spark.sql.functions.col("cell").isin(probes: _*)).count()
          val approx = Knn.topK(
            walked.drop("cell", "neighbors", "neighbors1", "level"),
            "embedding", q, 10, "cosine", idCol = "vec_id").select("vec_id")
          approx.join(exact, "vec_id").count()
        }.sum
        println(s"PROBE hnsw nprobe=$nprobe ef=$ef hits=$hits/30 cand=$cand ivfCand=$ivfCand")
      }
      graph.unpersist()
    }

    // IVF-PQ calibration: coarse probe (nprobe of 8 cells) + ADC within
    // probed cells + exact rerank, per (nprobe, oversample)
    {
      val cents = operators.Ivf.trainCentroids(emb, "embedding", 8, iters = 2)
      val cells = operators.Ivf.buildIndex(emb, "embedding", cents)
      val cb = operators.Pq.train(emb, "embedding", 64, 8, 32)
      val enc = operators.Pq.encodeForProbe(emb, "embedding", "vec_id", cb)
        .join(cells.select(col("vec_id"), col("cell")), "vec_id").cache()
      enc.count()
      for (nprobe <- Seq(2, 4, 7); os <- Seq(8, 16, 32, 64)) {
        val hits = Seq(qa, qb, qc).map { q =>
          val exact = Knn.topK(emb, "embedding", q, 10, "cosine", idCol = "vec_id").select("vec_id")
          val probes = operators.IvfPq.probeCells(cents, q.toArray, nprobe)
          val (ord, asc) = operators.Pq.adcOrdering(col("codes"), q.toArray, cb, "cosine")
          val cand = enc.where(col("cell").isin(probes: _*))
            .withColumn("__adc", ord)
            .orderBy(if (asc) col("__adc").asc else col("__adc").desc, col("vec_id").asc)
            .limit(10 * os).select("vec_id")
          val rer = Knn.topK(emb.join(cand, "vec_id"), "embedding", q, 10, "cosine",
            idCol = "vec_id").select("vec_id")
          rer.join(exact, "vec_id").count()
        }.sum
        println(s"PROBE ivfpq cells=8 nprobe=$nprobe oversample=$os hits=$hits/30")
      }
      enc.unpersist()
    }
    spark.stop()
  }
}
