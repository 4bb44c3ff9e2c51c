package org.apache.spark.graftspark

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus draining: metric
  * assertions on SparkListener-collected task stats must not race the
  * async bus. Lives under org.apache.spark (the standard Spark testing
  * pattern) solely to reach `listenerBus.waitUntilEmpty`.
  */
object ListenerFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000L)
}
