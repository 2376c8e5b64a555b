package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Test helper: block until the listener bus has delivered every queued
  * event, so a job-count assertion observes all jobs the code under
  * test scheduled. Lives in the spark package tree because
  * `SparkContext.listenerBus` is `private[spark]`. */
object ListenerDrain {
  def apply(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
