package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-count-pinned keyed exchange for CPU-heavy stages.
  *
  * A bare `repartition(col)` is an AQE-coalescible exchange: adaptive
  * execution sizes the post-shuffle partitions by shuffled BYTES
  * (advisory 64 MB), but the "token barrier" exchanges in this engine
  * guard stages whose cost is per-row CPU — JPEG/WAV decode, shingle +
  * 32-way minhash, levenshtein, array_intersect — over small rows. At
  * sf0.1 several such barriers coalesced to ONE task and serialized
  * the stage the barrier existed to parallelize (p15's video decode
  * ran 5 tasks end to end; measured 4.5 s of single-thread wall).
  *
  * `repartition(N, col)` (REPARTITION_BY_NUM) is exempt from AQE
  * coalescing, so pinning N to the session's shuffle parallelism makes
  * the barrier a parallelism FLOOR while staying scale-configured: the
  * same `spark.sql.shuffle.partitions` a cluster deployment sizes for
  * its width (the bench sets it to the core count per the driver
  * contract). Data-sized stages keep using plain repartition — this
  * helper is only for compute-bound barriers.
  */
object Part {
  def pin(cols: Column*)(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toIntOption.getOrElse(200),
      cols: _*)

  /** Salted equi-join for a LOW-CARDINALITY join key (guide §2.5,
    * "split hot keys"): a join keyed on a handful of values — the IVF
    * cell id (kCells = 8) in this engine — hashes to at most that many
    * partitions, and AQE then coalesces the tiny-bytes exchange to ONE
    * task, serializing the per-pair CPU (cosine similarity) that
    * follows the join. Deterministically salt the probe side from a
    * high-cardinality column, replicate the build side across the salt
    * domain, and join on (key, salt): identical rows out, parallelism
    * = the salt width. Width comes from `spark.sql.shuffle.partitions`
    * (the same knob a cluster deployment sizes), and the cost is
    * shuffling |build| × width replicated rows — use only when the
    * build side is cell-bounded, the same precondition the cluster-
    * local pairwise step already relies on.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeSaltSrc: Column): DataFrame = {
    val n = probe.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toIntOption.getOrElse(200)
    // the salted exchanges must be PINNED (repartition-by-num, exempt
    // from AQE coalescing) or adaptive execution merges the tiny-bytes
    // partitions straight back to one task — measured: an unpinned
    // salted join ran the same 1-task stage as the unsalted one. The
    // join then reuses the (key, salt) hash partitioning on both sides
    // (same keys, same width), so no further exchange is added.
    val ps = probe.withColumn("__salt",
      pmod(xxhash64(probeSaltSrc), lit(n.toLong)))
      .repartition(n, col(key), col("__salt"))
    val bs = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1L))))
      .repartition(n, col(key), col("__salt"))
    ps.join(bs, Seq(key, "__salt")).drop("__salt")
  }
}
