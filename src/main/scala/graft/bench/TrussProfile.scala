package graft.bench

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** x18 cost-structure breakdown: runs the k-truss registry entry once
  * with a listener attributing every job/stage/shuffle byte to the
  * peel round that launched it (the `graft.truss.round` local-property
  * marker set inside [[graft.graphx.GraphAnalytics.trussPeel]]), then
  * prints the per-round table BENCH_NOTES carries. The per-round job
  * count is the thing the round-7 verdict asked to name structurally —
  * this makes it a measured artifact instead of a wall-clock guess.
  *
  *   sbt "runMain graft.bench.TrussProfile [sfDir]"
  */
object TrussProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // same tmpfs scratch as Bench/Verify — /tmp is the stochastically
    // stalling device; shuffle there skews per-task numbers
    val localDir = sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark")
    val spark = SparkSession.builder()
      .config("spark.local.dir", localDir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Agg(var jobs: Int = 0, var stages: Int = 0,
                   var tasks: Int = 0, var shufWrite: Long = 0L,
                   var shufRead: Long = 0L)
    val byRound = mutable.LinkedHashMap.empty[String, Agg]
    val stageRound = mutable.Map.empty[Int, String]
    // per-stage detail: (round, stageId, name, tasks, taskMs, shufW)
    val stageRows = mutable.ArrayBuffer.empty[(String, Int, String, Int, Long, Long)]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = Option(e.properties)
          .flatMap(p => Option(p.getProperty("graft.truss.round")))
          .getOrElse("setup")
        byRound.synchronized {
          byRound.getOrElseUpdate(r, Agg()).jobs += 1
          e.stageIds.foreach(sid => stageRound(sid) = r)
        }
      }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = byRound.synchronized {
        val r = stageRound.getOrElse(e.stageInfo.stageId, "setup")
        val a = byRound.getOrElseUpdate(r, Agg())
        a.stages += 1
        a.tasks += e.stageInfo.numTasks
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          a.shufWrite += m.shuffleWriteMetrics.bytesWritten
          a.shufRead += m.shuffleReadMetrics.totalBytesRead
        }
        if (m != null) stageRows += ((r, e.stageInfo.stageId,
          e.stageInfo.name.take(90), e.stageInfo.numTasks,
          m.executorRunTime, m.shuffleWriteMetrics.bytesWritten))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("x18_ktruss")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // let the listener bus drain
    println(f"x18_ktruss total: $sec%.1f s ($sfDir)")
    println(f"${"round"}%-8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s " +
      f"${"shufW_MB"}%9s ${"shufR_MB"}%9s")
    byRound.toSeq.sortBy(_._1).foreach { case (r, a) =>
      println(f"$r%-8s ${a.jobs}%5d ${a.stages}%7d ${a.tasks}%6d " +
        f"${a.shufWrite / 1e6}%9.1f ${a.shufRead / 1e6}%9.1f")
    }
    println("\ntop stages by task time:")
    stageRows.sortBy(-_._5).take(18).foreach {
      case (r, sid, name, tasks, ms, w) =>
        println(f"  [$r%-5s] s$sid%-4d $tasks%4d tasks ${ms / 1e3}%7.1f " +
          f"task_s ${w / 1e6}%7.1f MB  $name")
    }
    spark.stop()
  }
}
