package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming monitor (SURVEY.md §2.9 T10): the reference watches
  * per-batch wall-clock with hardcoded alert thresholds
  * (`/root/reference/processing-layer/stream-processor.py:119-120,
  * 319-320` — warn at 3 s sink / 4 s batch). The engine expresses the
  * same policy as a `StreamingQueryListener` fed by Spark's progress
  * events instead of driver-side `time.time()` bookkeeping — no extra
  * actions on the data path (the reference pays two extra `count()`
  * jobs per batch for its logs, SURVEY §4.2).
  */
class GraftMonitor(batchWarnMs: Long = 4000L) extends StreamingQueryListener {

  val batches = new AtomicLong(0L)
  val rows = new AtomicLong(0L)
  val slowBatches = new AtomicLong(0L)

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    println(s"[graft-monitor] query ${event.name} started (id=${event.id})")

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    batches.incrementAndGet()
    rows.addAndGet(p.numInputRows)
    val durMs = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
    if (durMs > batchWarnMs) {
      slowBatches.incrementAndGet()
      println(s"[graft-monitor] SLOW batch ${p.batchId}: ${durMs}ms > ${batchWarnMs}ms " +
        s"(rows=${p.numInputRows})")
    }
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    println(s"[graft-monitor] query ${event.id} terminated " +
      event.exception.map(e => s"with error: $e").getOrElse("cleanly"))
}
