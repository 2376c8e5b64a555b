package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** [[graft.operators.Classifier]] — hashed n-gram features (hand-hashed
  * expectations), scoring math, and logistic-GD training (separation,
  * determinism, zero-iteration identity). */
class ClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private def fid(gram: String, dim: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % dim
  }

  test("hashedFeatures emits unigrams + bigrams with counts") {
    val df = Seq((1L, "A b a")).toDF("id", "text")
    val out = Classifier.hashedFeatures(df, "text", "id", dim = 1 << 20)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // grams: a×2, b×1, "a b"×1, "b a"×1
    assert(out(fid("a", 1 << 20)) == 2.0)
    assert(out(fid("b", 1 << 20)) == 1.0)
    assert(out(fid("a b", 1 << 20)) == 1.0)
    assert(out(fid("b a", 1 << 20)) == 1.0)
    assert(out.size == 4)
  }

  test("hashedFeatures: single-token and empty docs produce no bigrams") {
    val df = Seq((1L, "solo"), (2L, ""), (3L, "!!!")).toDF("id", "text")
    val out = Classifier.hashedFeatures(df, "text", "id", dim = 1024)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L)) // ids 2 and 3 tokenize to nothing
  }

  test("score computes r6(sigmoid(margin + bias))") {
    val feats = Seq((1L, 0L, 2.0), (1L, 1L, 1.0)).toDF("id", "fid", "tf")
    val w = Seq((0L, 0.5), (1L, -1.0)).toDF("fid", "w")
    val row = Classifier.score(feats, w, bias = 1.0, idCol = "id").head
    assert(row.getAs[Double]("margin") == 0.0) // 2·0.5 + 1·(−1)
    assert(row.getAs[Double]("prob") ==
      math.floor(1.0 / (1.0 + math.exp(-1.0)) * 1e6 + 0.5) / 1e6)
  }

  test("train separates the classes and is deterministic") {
    val docs = Seq(
      (1L, "good fine great", 1.0), (2L, "good nice fine", 1.0),
      (3L, "bad awful poor", 0.0), (4L, "bad sad poor", 0.0)
    ).toDF("id", "text", "y")
    val feats = Classifier.hashedFeatures(docs, "text", "id", dim = 64)
    val labels = docs.select(col("id"), col("y"))
    val m1 = Classifier.train(feats, labels, "id", dim = 64, iters = 5, lr = 1.0)
    val m2 = Classifier.train(feats, labels, "id", dim = 64, iters = 5, lr = 1.0)
    assert(m1 == m2)
    val probs = Classifier.score(feats, Classifier.weightsFrame(spark, m1),
        m1.bias, "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("prob")).toMap
    assert(probs(1L) > probs(3L) && probs(2L) > probs(4L))
  }

  test("scoreText (fused inference) equals score over hashedFeatures") {
    val docs = Seq((1L, "good fine great good"), (2L, "bad poor"), (3L, ""))
      .toDF("id", "text")
    val w = Seq.tabulate(64)(f => (f.toLong, f / 64.0 - 0.5)).toDF("fid", "w")
    val viaFeats = Classifier.score(
        Classifier.hashedFeatures(docs, "text", "id", 64), w, 0.25, "id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val fused = Classifier.scoreText(docs, "text", "id", w, 0.25, 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(fused == viaFeats && fused.map(_._1) == Set(1L, 2L))
  }

  test("zero iterations yields the zero model") {
    val feats = Seq((1L, 0L, 1.0)).toDF("id", "fid", "tf")
    val labels = Seq((1L, 1.0)).toDF("id", "y")
    val m = Classifier.train(feats, labels, "id", dim = 4, iters = 0, lr = 1.0)
    assert(m.weights.forall(_ == 0.0) && m.bias == 0.0)
  }

  test("train rejects a feature width past the driver-memory contract") {
    import spark.implicits._
    val feats = Seq((1L, 0L, 1.0)).toDF("id", "fid", "tf")
    val labels = Seq((1L, 1.0)).toDF("id", "y")
    val e = intercept[IllegalArgumentException] {
      Classifier.train(feats, labels, "id",
        dim = Classifier.MaxTrainDim + 1, iters = 1, lr = 0.1)
    }
    assert(e.getMessage.contains("driver-sized"), e.getMessage)
    // the ceiling itself is accepted (argument validation only — zero
    // iters keeps the case instant)
    Classifier.train(feats, labels, "id",
      dim = Classifier.MaxTrainDim, iters = 0, lr = 0.1)
  }
}
