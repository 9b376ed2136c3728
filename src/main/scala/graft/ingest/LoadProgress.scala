package graft.ingest

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Load-progress stream for continuous ingest (reference: the gRPC
  * `Load` call emits a LoadProgress message every second with counts and
  * a cancellation check, WatService.cs:262-300). Spark's streaming
  * engine already produces exactly this signal per micro-batch; this
  * listener surfaces it as a bounded in-memory feed a service endpoint
  * can poll or stream to a client.
  *
  * Cancellation = `query.stop()` (the CancellationToken analog);
  * detach() unregisters the listener.
  */
final class LoadProgress private (spark: SparkSession) {

  /** One progress tick: (queryName, batchId, rowsInBatch, epochMs). */
  case class Tick(name: String, batchId: Long, rows: Long, atMs: Long)

  private val ticks = mutable.ArrayBuffer.empty[Tick]

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      ticks.synchronized {
        ticks += Tick(Option(e.progress.name).getOrElse(e.progress.id.toString),
          e.progress.batchId, e.progress.numInputRows,
          System.currentTimeMillis())
        // bounded like the reference's Channel(1000) — drop oldest
        if (ticks.size > 1000) ticks.remove(0, ticks.size - 1000)
      }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  /** Progress ticks observed so far (oldest first). */
  def snapshot(): Seq[Tick] = ticks.synchronized(ticks.toSeq)

  /** Total rows ingested across observed batches. */
  def totalRows: Long = ticks.synchronized(ticks.map(_.rows).sum)

  def detach(): Unit = spark.streams.removeListener(listener)
}

object LoadProgress {
  def attach(spark: SparkSession): LoadProgress = {
    val lp = new LoadProgress(spark)
    spark.streams.addListener(lp.listener)
    lp
  }
}
