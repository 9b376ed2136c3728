package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries (cold + warm) at a given SF dir.
  * Usage: runMain graft.Profile <sfDir> <name1> <name2> ...
  * Separates one-time session/JIT warmup from steady-state cost — the
  * number that matters for the 100 TB design is the warm one.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // shuffle/checkpoint blocks on tmpfs: this VM's disk stalls
    // stochastically for tens of seconds under shuffle-file churn
    // (measured 2026-08: same query 3 s alone vs 100 s mid-session);
    // a real cluster would use local SSDs — tmpfs is the local[] stand-in
    val localDir = sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark")
    val spark = SparkSession.builder()
      .config("spark.local.dir", localDir)
      // streaming state checkpoints default to /tmp (disk) — the same
      // stochastic-stall device; keep them on the tmpfs scratch too
      .config("spark.sql.streaming.checkpointLocation", s"$localDir/stream-ck-${ProcessHandle.current.pid}")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bound listener-state retention: with hundreds of executions in
      // one session the retained plan graphs + metrics age the driver
      .config("spark.sql.ui.retainedExecutions", "10")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // clear checkpoints a previous JVM left behind (memory-sink queries
    // cannot recover a checkpoint — a stale dir fails the query)
    def rmStreamCk(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmStreamCk))
      f.delete(): Unit
    }
    // sweep checkpoint dirs left by DEAD JVMs only — per-pid names keep
    // live concurrent runs (verify + profile side by side) from
    // clobbering each other's streaming state
    Option(new java.io.File(localDir).listFiles()).foreach(_
      .filter(f => f.getName.startsWith("stream-ck-") &&
        !f.getName.stripPrefix("stream-ck-").toLongOption
          .exists(pid => ProcessHandle.of(pid).isPresent()))
      .foreach(rmStreamCk))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one throwaway query to absorb session warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // same per-query hygiene as Bench so numbers are comparable
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
      val cold = time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      clean()
      val warm = time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      clean()
      println(f"[profile] $n%-28s cold=$cold%8.2f warm=$warm%8.2f")
    }
    spark.stop()
  }
}
