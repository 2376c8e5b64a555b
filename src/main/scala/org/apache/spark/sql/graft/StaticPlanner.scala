package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Plans a DataFrame with adaptive execution OFF without ever touching
  * the owning session's shared conf.
  *
  * Why a session TWIN: `InsertAdaptiveSparkPlan` reads its conf from
  * `adaptiveExecutionContext.session.sessionState.conf` directly
  * (bytecode-verified on Spark 4.1), so neither `SQLConf.withExistingConf`
  * (thread-local) nor any per-QueryExecution override can disable AQE for
  * one plan — the only clean lever is WHICH session plans the query.
  * `cloneSession()` shares the SparkContext, shared state (cache manager,
  * external catalog) and a snapshot of the session conf; the twin diverges
  * in exactly one key. Re-rooting a frame costs one re-plan of its
  * already-analyzed logical plan — milliseconds, paid only on pinned
  * (small, latency-sensitive) plans.
  *
  * One twin per session, cached weakly: sessions are few and long-lived,
  * and a dead parent drops its twin with it. */
object StaticPlanner {

  private val twins =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, ClassicSession]()

  private def noAqeTwin(spark: org.apache.spark.sql.SparkSession): ClassicSession =
    twins.synchronized {
      var twin = twins.get(spark)
      if (twin == null) {
        twin = spark.asInstanceOf[ClassicSession].cloneSession()
        twin.sessionState.conf.setConfString("spark.sql.adaptive.enabled", "false")
        twins.put(spark, twin)
      }
      twin
    }

  /** Re-root `df` on the session's no-AQE twin and force its static
    * physical plan. The returned frame executes identically (same
    * SparkContext, same cache manager); only its planner conf differs. */
  def pin(df: DataFrame): DataFrame = {
    // already on a no-AQE session (e.g. an iterative loop pinning every
    // round, each chained off the last pinned frame): force the plan in
    // place instead of cloning a twin-of-a-twin
    if (!df.sparkSession.sessionState.conf.adaptiveExecutionEnabled) {
      df.queryExecution.executedPlan
      return df
    }
    val out = Dataset.ofRows(noAqeTwin(df.sparkSession), df.queryExecution.analyzed)
    out.queryExecution.executedPlan
    out
  }
}
