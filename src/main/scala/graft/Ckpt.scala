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
  // runs once per configured dir, not once per cut
  @volatile private var appliedDir: Option[String] = None

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) if dir.nonEmpty =>
        if (!appliedDir.contains(dir)) synchronized {
          if (!appliedDir.contains(dir)) {
            spark.sparkContext.setCheckpointDir(dir)
            appliedDir = Some(dir)
          }
        }
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }
}
