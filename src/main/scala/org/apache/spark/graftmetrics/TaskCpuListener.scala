/*
 * Lives in the org.apache.spark namespace solely to reach
 * SparkContext.listenerBus.waitUntilEmpty() (private[spark]) — the only
 * deterministic way to flush queued task-end events before reading the
 * accumulated CPU time. Everything used here is Apache Spark public source.
 */
package org.apache.spark.graftmetrics

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Accumulates executor CPU time (ns) and executor run time (ms) across all
  * tasks — the steal-immune denominator for scaling-efficiency evidence: on
  * a contended host, wall clock includes invisible steal, but a task's CPU
  * time counts only cycles actually executed. A job that scales perfectly
  * burns the SAME total CPU at N and 4N cores; CPU inflation at the higher
  * level is real parallel overhead (scheduling, shuffle, cache contention),
  * not host noise.
  */
final class TaskCpuListener extends SparkListener {
  val cpuNs = new AtomicLong(0L)
  val runMs = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      cpuNs.addAndGet(m.executorCpuTime)
      runMs.addAndGet(m.executorRunTime)
    }
  }

  def reset(): Unit = { cpuNs.set(0L); runMs.set(0L) }

  /** CPU seconds since the last reset, after flushing pending events. */
  def cpuSeconds(sc: SparkContext): Double = {
    sc.listenerBus.waitUntilEmpty()
    cpuNs.get() / 1e9
  }
}

/** Dev-tool bridge: flush the listener bus (private[spark]). */
object ListenerFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
