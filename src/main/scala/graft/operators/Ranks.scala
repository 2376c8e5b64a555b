package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ranking helpers for fusion legs (RRF/hybrid). */
object Ranks {

  /** Single-partition window key for ranking a frame ALREADY reduced to
    * K rows by a limit (TakeOrderedAndProject). `pmod(hash(c), 1)` is
    * constant 0 for every row but non-foldable, so the optimizer keeps
    * the partition spec — unlike `lit(0)`, which folds away and turns
    * the window into an unpartitioned global one (Spark then warns
    * "No Partition Defined … may cause serious performance degradation";
    * over a post-limit K-row frame that degradation cannot occur, and
    * the explicit key documents the intent). */
  def one(c: Column): Column = pmod(hash(c), lit(1))
}
