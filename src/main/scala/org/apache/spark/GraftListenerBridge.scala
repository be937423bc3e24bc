package org.apache.spark

/** Bridge to `private[spark]` listener-bus draining, so a benchmark can
  * attribute asynchronously-delivered stage metrics to the query that
  * just finished (the bus dispatches on its own thread; without a drain
  * the last stages of query N can be counted against query N+1).
  */
object GraftListenerBridge {
  def flushListeners(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
