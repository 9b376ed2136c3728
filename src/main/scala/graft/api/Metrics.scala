package graft.api

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query metrics snapshot — the Spark counterpart of the reference's
  * GetMetrics/GetStats surface (reference: src/core/FileStore.fs:415-485,
  * definitions src/core/Metrics.fs). A QueryExecutionListener records
  * (action, wall ns, rows-ish) per completed query; `snapshot()` drains
  * the same way GetMetrics serialized its registry.
  */
final class Metrics private (spark: SparkSession) {
  case class Entry(action: String, durationNs: Long, error: Option[String])

  private val entries = new ConcurrentLinkedQueue[Entry]()

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      entries.add(Entry(funcName, durationNs, None))
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      entries.add(Entry(funcName, 0L, Some(exception.getMessage)))
  }
  spark.listenerManager.register(listener)

  def snapshot(): Seq[Entry] = entries.asScala.toSeq
  def clear(): Unit = entries.clear()
  def close(): Unit = spark.listenerManager.unregister(listener)
}

object Metrics {
  def attach(spark: SparkSession): Metrics = new Metrics(spark)
}
