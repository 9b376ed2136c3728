package graft

import org.apache.spark.sql.{Column, DataFrame}

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
}
