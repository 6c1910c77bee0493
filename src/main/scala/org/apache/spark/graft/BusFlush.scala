package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Accessor for the `private[spark]` listener-bus flush, so the bench
  * can drain pending task-end events before reading/resetting its
  * peak-memory accumulator between queries. Without the flush, a
  * query's last task-end events can be attributed to the next query
  * (the bus is async).
  */
object BusFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
