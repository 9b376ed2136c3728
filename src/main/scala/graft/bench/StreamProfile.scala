package graft.bench

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** s-family fixed-cost breakdown: runs named streaming registry
  * entries cold+warm and prints, per entry, the wall time next to the
  * engine's own per-batch duration accounting (triggerExecution,
  * queryPlanning, addBatch, walCommit, stateStoreCommit, …) from
  * QueryProgressEvent. The gap between the summed batch durations and
  * the wall is the start/stop/setup floor the round-9 notes flagged
  * (~1.2-1.7 s per entry × 33 entries).
  *
  *   sbt "runMain graft.bench.StreamProfile <sfDir> <name1> ..."
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val localDir = sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark")
    val spark = SparkSession.builder()
      .config("spark.local.dir", localDir)
      .config("spark.sql.streaming.checkpointLocation",
        s"$localDir/stream-ck-${ProcessHandle.current.pid}")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batches = mutable.ArrayBuffer.empty[(String, Map[String, Long], Long)]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          import scala.jdk.CollectionConverters._
          batches += ((e.progress.name,
            e.progress.durationMs.asScala.toMap
              .map { case (k, v) => k -> v.longValue() },
            e.progress.numInputRows))
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      org.apache.spark.sql.GraftInternals.stopStateStores()
      def rmrf(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmrf))
        f.delete(): Unit
      }
      rmrf(new java.io.File(s"$localDir/stream-ck-${ProcessHandle.current.pid}"))
      System.gc()
    }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      Seq("cold", "warm").foreach { run =>
        batches.synchronized(batches.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800) // listener drain
        val bs = batches.synchronized(batches.toSeq)
        val trig = bs.map(_._2.getOrElse("triggerExecution", 0L)).sum
        println(f"$n%-24s $run%-5s wall=$wall%6.2f s  batches=${bs.size}%2d " +
          f"triggerSum=${trig / 1e3}%5.2f s  gap=${wall - trig / 1e3}%5.2f s")
        bs.zipWithIndex.foreach { case ((qn, d, rows), i) =>
          val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
            "latestOffset", "addBatch", "walCommit", "commitOffsets")
          println("    batch%d (%s, %d rows): %s".format(i, qn, rows,
            keys.map(k => s"$k=${d.getOrElse(k, 0L)}").mkString(" ")))
        }
        clean()
      }
    }
    spark.stop()
  }
}
