package graft.ops

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution-metrics probe — the engine-side analogue of the reference's
  * monitoring views (`Terraform/sql/008_configure_logging.sql:171-182`
  * reports row counts and durations; a distributed engine's health
  * signals are shuffle volume and spill). Wraps an action in a listener
  * window and reports what the cluster actually did:
  *
  *  - `shuffleReadBytes` / `shuffleWriteBytes` — the scale currency; an
  *    operator that "works" but shuffles the corpus is the thing to
  *    catch before a 100 TB run (broadcast joins and map-only pipelines
  *    report 0 here).
  *  - `spillBytes` (memory+disk) — partitions that don't fit executor
  *    memory; nonzero means repartition or raise shuffle partitions.
  *  - `recordsRead` / `tasks` — work volume sanity check.
  *
  * Accumulation is listener-global while the block runs, so concurrent
  * foreground jobs would be attributed too — measure on a quiet session
  * (the same contract as any whole-cluster metric window).
  */
object QueryMetrics {

  final case class Snapshot(
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      spillBytes: Long,
      recordsRead: Long,
      tasks: Long)

  private final class Recorder extends SparkListener {
    val read = new LongAdder; val write = new LongAdder
    val spill = new LongAdder; val records = new LongAdder
    val tasks = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read.add(m.shuffleReadMetrics.totalBytesRead)
        write.add(m.shuffleWriteMetrics.bytesWritten)
        spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
        records.add(m.inputMetrics.recordsRead)
        tasks.increment()
      }
    }
    def snapshot: Snapshot = Snapshot(read.sum(), write.sum(),
      spill.sum(), records.sum(), tasks.sum())
  }

  /** Runs `body` with a metrics window around it; returns (result,
    * what-the-cluster-did). Listener-bus events post asynchronously (the
    * flush API is private to Spark), so after the action returns the
    * snapshot is polled until it stabilizes — bounded at ~2 s, usually
    * one round since actions block on job completion. */
  def measure[T](spark: SparkSession)(body: => T): (T, Snapshot) = {
    val rec = new Recorder
    spark.sparkContext.addSparkListener(rec)
    try {
      val out = body
      var prev = rec.snapshot
      var stableRounds = 0
      val deadline = System.nanoTime() + 2000000000L
      // TWO consecutive unchanged snapshots: one quiet 50 ms window can
      // be a backlogged listener bus, not a drained one
      while (stableRounds < 2 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val cur = rec.snapshot
        stableRounds = if (cur == prev) stableRounds + 1 else 0
        prev = cur
      }
      (out, prev)
    } finally spark.sparkContext.removeSparkListener(rec)
  }
}
