package graft.operators

import org.apache.spark.mllib.linalg.{Vectors => MLVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA for the embedding export pipeline — the
  * rotation/whitening step between raw embeddings and a quantizer
  * (OPQ's "R" without the codebook iteration: decorrelating dimensions
  * before [[Embeddings.sq8]]/[[Pq]] spreads quantization error evenly,
  * and truncating to the top components is the data-driven sibling of
  * [[Embeddings.matryoshka]]'s positional cut).
  *
  * Scale shape: the ONLY distributed work is one pass — each partition
  * accumulates a dim×dim Gramian + dim mean sums locally and
  * tree-aggregates (RowMatrix.computeCovariance, the MLlib layout);
  * the eigendecomposition runs on the DRIVER over the dim×dim
  * covariance (64×64 here — dimension-sized, like [[Clustering]]'s
  * centroids and [[Pq]]'s codebooks, NOT data-sized). [[transform]] is
  * map-only: the component matrix rides the plan as a literal.
  *
  * Determinism: eigenvector sign is fixed by making the
  * largest-magnitude coordinate positive (eigSym's sign is otherwise
  * arbitrary), so repeated fits produce identical models.
  */
object Pca {

  /** mean + top-k row-major components (each a unit dim-vector) +
    * their explained variances, eigen-descending. */
  final case class Model(mean: IndexedSeq[Double],
      components: IndexedSeq[IndexedSeq[Double]],
      explainedVariance: IndexedSeq[Double])

  /** One distributed pass (Gramian + means), driver eigSym, top-k. */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    require(k > 0, s"k must be positive, got $k")
    val rows = df.select(col(vecCol)).na.drop()
      .rdd.map(r => MLVectors.dense(
        r.getSeq[Float](0).iterator.map(_.toDouble).toArray))
    val mat = new RowMatrix(rows)
    val dim = mat.numCols().toInt
    require(k <= dim, s"k=$k exceeds dimension $dim")
    val mean = mat.computeColumnSummaryStatistics().mean.toArray
    val cov = mat.computeCovariance()
    val bc = breeze.linalg.DenseMatrix.tabulate(dim, dim)((i, j) => cov(i, j))
    val es = breeze.linalg.eigSym(bc) // eigenvalues ascending
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(k)
    val comps = order.map { case (_, c) =>
      val v = Array.tabulate(dim)(i => es.eigenvectors(i, c))
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      val s = if (v(pivot) < 0) -1.0 else 1.0
      v.iterator.map(_ * s).toIndexedSeq
    }
    Model(mean.toIndexedSeq, comps.toIndexedSeq,
      order.map(_._1).toIndexedSeq)
  }

  /** Map-only projection: adds `outCol` = (x − μ)·Wᵀ (array<double>,
    * length k). Mean and components are plan literals — nothing
    * shuffles, nothing is looked up. */
  def transform(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "pca"): DataFrame = {
    val muLit = typedlit(model.mean)
    val wLit = typedlit(model.components.map(_.toSeq))
    val hof = org.apache.spark.sql.functions // this object shadows `transform`
    val centered = zip_with(
      hof.transform(col(vecCol), x => x.cast("double")), muLit,
      (x, m) => x - m)
    df.withColumn(outCol,
      hof.transform(wLit, row =>
        aggregate(zip_with(centered, row, (c, w) => c * w),
          lit(0.0), (acc, x) => acc + x)))
  }
}
