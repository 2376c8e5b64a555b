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
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    spark.stop()
  }
}
