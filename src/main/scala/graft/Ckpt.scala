package graft

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative fixpoint loops (CC, PageRank, k-core,
  * truss peel, LPA, SSSP…). Default is `localCheckpoint()` — executor-
  * memory resident and cheapest, but its blocks are lost when an
  * executor dies, which aborts a long-running loop on a real cluster.
  * Setting `spark.graft.checkpointDir` switches every cut to a
  * RELIABLE `checkpoint()` (HDFS/object-store backed, survives
  * executor loss) — the fault-tolerance mode for 100 TB runs where a
  * 20-round fixpoint outlives the executor MTBF. Both forms are eager,
  * so loop shape and determinism are identical either way.
  */
object Ckpt {
  // setCheckpointDir mints a fresh UUID subdirectory per call, so it
  // runs once per (context, dir) — keyed on applicationId, NOT just the
  // dir string: a restarted context in the same JVM with the same conf
  // would otherwise skip the call and df.checkpoint() throws
  // "checkpoint directory has not been set". The getCheckpointDir
  // emptiness check backstops even an applicationId collision.
  @volatile private var applied: Option[(String, String)] = None

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        val key = (sc.applicationId, dir)
        if (!applied.contains(key) || sc.getCheckpointDir.isEmpty)
          synchronized {
            if (!applied.contains(key) || sc.getCheckpointDir.isEmpty) {
              sc.setCheckpointDir(dir)
              applied = Some(key)
            }
          }
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }

  /** Cut two INDEPENDENT frames concurrently: each eager checkpoint is
    * its own Spark job with no dependency on the other, so launching
    * them from two driver threads lets the scheduler overlap them
    * (optimization guide §2.6 — actions are only sequential because
    * driver code calls them sequentially) instead of paying two full
    * job barriers back to back. */
  def cutPar(a: DataFrame, b: DataFrame): (DataFrame, DataFrame) = {
    // a FRESH thread, not the ForkJoin common pool: Spark local
    // properties (job groups, round markers, scheduler pool) are
    // inherited at thread CREATION, so a reused pool thread can launch
    // the b-side job with stale or missing properties. The b-side is
    // always joined — even when cut(a) throws — so a failed a-side
    // cannot leak a still-running b-side job past this call.
    val fb = new java.util.concurrent.CompletableFuture[DataFrame]()
    val t = new Thread(() => {
      try fb.complete(cut(b)): Unit
      catch { case e: Throwable => fb.completeExceptionally(e): Unit }
    }, "graft-ckpt-par")
    t.setDaemon(true)
    t.start()
    val ca =
      try cut(a)
      finally try { fb.join(): Unit } catch { case _: Throwable => () }
    (ca, fb.join())
  }
}
