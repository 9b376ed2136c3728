package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operational lifecycle for the persisted LSH band index — the
  * generation-sprawl control the round-6 verdict asked to pin
  * (verdict #6). The p72/p77/p82 family proved the SEMANTICS
  * (create → fold → retract, each oracle-checked); this module owns the
  * STORAGE policy those operations ride at 100 TB, where the failure
  * mode is unbounded generation count between compactions: every fold
  * appends a generation, merge-on-read unions all of them, and past a
  * few dozen generations the probe's scan-task count and footer churn
  * — not the data volume — dominate (the same reason the reference
  * checkpoints its FASTER stores on a cadence,
  * reference src/serverlib/NodeAttrIndex.cs:74,115-121, and the
  * GraphStore.compact discipline applied to the band index).
  *
  * Layout: each fold epoch writes ONE generation subdirectory
  * `gen=N/` under the index root. Generations are therefore an
  * explicit, listable property of the index — the file count of a flat
  * append dir measures writer parallelism, not epochs — and parquet
  * partition discovery exposes `gen` on read, so merge-on-read is a
  * plain parent-path scan.
  *
  * Policy conf: `spark.graft.dedupIndex.maxGenerations` (default 16).
  * After every append, when the generation count EXCEEDS the cap, the
  * index is compacted: all generations fold into a fresh `gen=0`,
  * repartitioned on (bi, bv) so probe-side equi-joins meet a
  * band-clustered layout. The compacted frame is materialized
  * (localCheckpoint) BEFORE the old generations drop — the rewrite
  * never reads the directory it is replacing (GraphStore.compact's
  * contract). Retraction collapses history by necessity: one anti-join
  * over the merged read, rewritten as a single generation (p82's
  * takedown shape — ~|index| rewrite, never a corpus re-sign).
  */
object DedupIndex {

  /** Documented policy knob: compact when a fold pushes the live
    * generation count past this. */
  val MaxGenerationsConf = "spark.graft.dedupIndex.maxGenerations"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** Live generation numbers, ascending (empty ⇒ no index yet). */
  def generations(spark: SparkSession, path: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("gen=") =>
        n.stripPrefix("gen=").toInt }
      .sorted
  }

  /** Merge-on-read of every live generation (the probe side's view). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("gen")

  /** Create generation 0 from the corpus band rows. */
  def create(spark: SparkSession, path: String, bands: DataFrame): Unit = {
    val f = fs(spark, path)
    f.delete(new org.apache.hadoop.fs.Path(path), true)
    bands.write.parquet(s"$path/gen=0")
  }

  /** Fold one epoch: append the admitted docs' rows as the next
    * generation, then compact if the policy cap is exceeded. Returns
    * the generation count AFTER the policy ran (≤ cap + 1: the cap
    * triggers ON exceed, so a steady state oscillates up to it).
    * `clusterCols` is the compaction clustering key — (bi, bv) for the
    * LSH band index, (chunk_hash) for the CDC chunk ledger. */
  def append(spark: SparkSession, path: String, bands: DataFrame,
      clusterCols: Seq[String] = Seq("bi", "bv")): Int = {
    val next = generations(spark, path).lastOption.getOrElse(-1) + 1
    bands.write.parquet(s"$path/gen=$next")
    maybeCompact(spark, path, clusterCols)
    generations(spark, path).size
  }

  /** Retract a takedown set: ONE anti-join on doc_id over the merged
    * read, rewritten as a single fresh generation (history collapses —
    * a retracted doc must not survive in any older generation). */
  def retract(spark: SparkSession, path: String,
      docIds: DataFrame): Unit = {
    val kept = read(spark, path)
      .join(docIds.toDF("doc_id"), Seq("doc_id"), "anti")
      .localCheckpoint() // materialize BEFORE dropping what it reads
    create(spark, path, kept)
  }

  /** Fold all generations into a fresh gen=0, clustered on
    * `clusterCols` so probe-side equi-joins meet a clustered layout. */
  def compact(spark: SparkSession, path: String,
      clusterCols: Seq[String] = Seq("bi", "bv")): Unit = {
    val merged = read(spark, path)
      .repartition(8,
        clusterCols.map(org.apache.spark.sql.functions.col): _*)
      .localCheckpoint() // materialize BEFORE dropping what it reads
    create(spark, path, merged)
  }

  private def maybeCompact(spark: SparkSession, path: String,
      clusterCols: Seq[String]): Unit = {
    val cap = try {
      spark.conf.get(MaxGenerationsConf, "16").toInt
    } catch { case _: NumberFormatException => 16 }
    if (generations(spark, path).size > math.max(cap, 1)) {
      compact(spark, path, clusterCols)
    }
  }
}
