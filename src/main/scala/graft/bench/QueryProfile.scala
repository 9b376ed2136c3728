package graft.bench

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Generic cost-structure profiler for any registry entry: runs each
  * named query twice (cold, then warm) with a listener counting the
  * Spark jobs, stages, tasks, cumulative task runtime and shuffle bytes
  * the query launches. For the iterative x-family the question the
  * optimization guide asks first — is the wall time data or
  * driver-side job choreography? — is answered by comparing
  * `task_s` (executor work) against `wall_s` (what the bench pays):
  * a 20 s query with 3 s of task time across 90 jobs is scheduling,
  * not data.
  *
  *   sbt "runMain graft.bench.QueryProfile <sfDir> <name1> <name2> ..."
  */
object QueryProfile {
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
      .config("spark.sql.ui.retainedExecutions", "10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    val shufR = new AtomicLong(0L)
    // optional per-stage detail (SPARK_GRAFT_STAGES=1): the
    // AQE-coalescing hunt needs (tasks, task_s) per stage, not totals —
    // a 3-task stage with 8 task_s is a serialized barrier
    val stageDetail = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          if (stageDetail) stageRows.add((e.stageInfo.stageId,
            e.stageInfo.name.take(80), e.stageInfo.numTasks,
            m.executorRunTime, m.shuffleWriteMetrics.bytesWritten))
        }
      }
    })
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      shufW.set(0); shufR.set(0); stageRows.clear()
    }
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    println(f"${"query"}%-28s ${"run"}%-5s ${"wall_s"}%7s ${"jobs"}%5s " +
      f"${"stages"}%7s ${"tasks"}%6s ${"task_s"}%7s ${"shufW_MB"}%9s ${"shufR_MB"}%9s")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      Seq("cold", "warm").foreach { run =>
        Thread.sleep(500); reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener bus drain
        println(f"$n%-28s $run%-5s $wall%7.2f ${jobs.get}%5d " +
          f"${stages.get}%7d ${tasks.get}%6d ${taskMs.get / 1e3}%7.1f " +
          f"${shufW.get / 1e6}%9.1f ${shufR.get / 1e6}%9.1f")
        if (stageDetail && run == "warm") {
          import scala.jdk.CollectionConverters._
          stageRows.asScala.toSeq.sortBy(-_._4).take(12).foreach {
            case (sid, name, nt, ms, w) =>
              println(f"    s$sid%-5d $nt%4d tasks ${ms / 1e3}%7.1f task_s " +
                f"${w / 1e6}%7.1f MB  $name")
          }
        }
        clean()
      }
    }
    spark.stop()
  }
}
