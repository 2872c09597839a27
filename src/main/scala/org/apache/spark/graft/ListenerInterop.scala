package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-side bridge to the `private[spark]` listener bus: stage
  * completion events are delivered ASYNCHRONOUSLY, so a harness that
  * reads its own SparkListener recorder right after an action returns
  * may miss the last stages of that action. The public API offers no
  * flush; this file lives under org.apache.spark for the access, and
  * contains nothing else (the GraftInterop pattern). */
object ListenerInterop {

  /** Block until the listener bus has delivered all queued events, or
    * `timeoutMillis` elapses. Returns false on timeout/error — the
    * caller's snapshot is then possibly incomplete, never wrong. */
  def drain(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: Throwable => false }
}
