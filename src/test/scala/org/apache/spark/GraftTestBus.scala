package org.apache.spark

/** Test-only shim: `SparkContext.listenerBus` is `private[spark]`, and
  * the CollectGuard spec must DRAIN it (QueryExecutionListener events
  * ride the async bus) before asserting on what a query's construction
  * collected — without a flush the spec would race its own evidence.
  */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
