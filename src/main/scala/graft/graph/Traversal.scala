package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recursive edge expansion — the reference's `follow` operator
  * (semantics: src/core/FileStore.fs:166-220,373-392; grammar
  * AHGHEE.g4:138-162). Spark has no recursive CTE, so the loop runs on
  * the driver as iterative joins over the `edges` view — the same shape
  * GraphX Pregel uses.
  *
  * Invariants (reference tests, src/core.tests/Tests.fs:882-900):
  *  - a node is emitted at most once per query (visited-set dedup; the
  *    reference uses a Bloom filter, we use an exact anti-join — correct
  *    rather than probabilistic);
  *  - the hop window [fromHop, toHop] gates emission: the reference
  *    decrements a Range per hop and emits while it covers 0
  *    (FileStore.fs:180-186).
  *
  * Scale: each iteration is one shuffle (frontier ⋈ edges on src_id).
  * With `edges` bucketed by src_id the join co-locates; the visited set
  * is carried as a DataFrame and `localCheckpoint`ed each hop to cut
  * lineage growth (iterative-join folklore; also what Pregel does).
  * Frontiers are typically ≪ |edges|, so the frontier side broadcasts
  * under AQE once it fits.
  */
object Traversal {

  /** Expand from `roots` (DataFrame with one column `id`) along edges
    * whose label matches `label` (None = follow any, the grammar's
    * `follow *`). Returns [id, hop] with hop = first hop-distance at
    * which the node was reached (0 = root), emitting only hops within
    * [fromHop, toHop]. */
  def follow(
      spark: SparkSession,
      edges: DataFrame,
      roots: DataFrame,
      label: Option[String],
      fromHop: Int,
      toHop: Int): DataFrame =
    followEdges(spark,
      label.fold(edges)(l => edges.where(col("label") === l)),
      roots, fromHop, toHop)

  /** Same loop over an already-predicate-filtered edge set (the query
    * compiler passes arbitrary label predicates through here). */
  def followEdges(
      spark: SparkSession,
      edges: DataFrame,
      roots: DataFrame,
      fromHop: Int,
      toHop: Int): DataFrame = {
    require(toHop >= 0 && fromHop >= 0 && fromHop <= toHop,
      s"bad hop range [$fromHop,$toHop]")

    // materialize the (filtered) edge set once: each hop re-joins it,
    // and without this every iteration re-reads the source scans
    val ed0 = edges.select(col("src_id"), col("dst_id"))
    val ed = if (toHop > 1) ed0.localCheckpoint() else ed0

    var visited = roots.select(col("id")).distinct()
      .withColumn("hop", lit(0)).localCheckpoint()
    var frontier = visited.select("id")
    var hop = 0
    var done = frontier.isEmpty

    while (hop < toHop && !done) {
      hop += 1
      val next = frontier.join(ed, frontier("id") === ed("src_id"))
        .select(ed("dst_id").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint() // materialize: cuts lineage AND makes the
                           // visited-set anti-join see a stable snapshot
      done = next.isEmpty
      visited = visited.unionAll(next).localCheckpoint()
      frontier = next.select("id")
    }
    visited.where(col("hop").between(fromHop, toHop))
  }
}
