package graft

import org.apache.spark.sql.functions._

/** Wall-time guards for the historically slowest queries: a plan
  * regression (a lost broadcast hint, a new exchange, a de-pruned scan)
  * should surface here in CI rather than in the round bench. Thresholds
  * are ~3× the committed local[4]/sf0.01 times (min-of-2 to ride out
  * this host's documented stochastic stalls, Bench.scala:8-11) — loose
  * enough for noise, tight enough that an O(n²) or full-rescan
  * regression (typically ≥5×) trips them.
  */
class BenchGuardSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private def once(name: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sf001).write
      .format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def minOf2(name: String): Double =
    math.min(once(name), once(name))

  /** min-of-2, plus ONE extra sample only when that is over the limit:
    * this host's documented stalls can blanket two consecutive samples
    * mid-suite (x20 measured 12.8 s in a loaded 24-minute run vs 2.9 s
    * standalone minutes later), while a genuine plan regression —
    * the thing these guards exist for — fails all three. */
  private def guarded(name: String, limit: Double): Double = {
    val m2 = minOf2(name)
    if (m2 < limit) m2 else math.min(m2, once(name))
  }

  // committed min-of-2 local[4]/sf0.01 baselines (calibrated 2026-08:
  // a07 1.0, x04 1.4, q40 0.4, x01 1.3, p05 0.7, s08 ~2.5 s);
  // threshold ≈ 3-5×. s08 guards the inlined-projection failure mode
  // specifically — losing its barrier repartition measured 30× slower.
  private val guards = Seq(
    ("a07_lang_inequality", 4.0),
    ("x04_triangles", 6.0),
    ("q40_percentiles", 2.0),
    ("x01_connected_components", 5.0),
    ("p05_minhash_lsh", 3.0),
    ("s08_stream_neardup", 10.0),
    // the k-core peel loop: losing a localCheckpoint re-inlines every
    // prior round's joins into the next (exponential plan growth)
    ("x05_kcore", 8.0),
    // x02 baseline ~1.2 s (driver-arm dispatch): a trip means the
    // local/distributed threshold broke and 40 shuffle stages run on a
    // driver-sized graph (measured 14 s before the dispatch existed)
    ("x02_pagerank", 5.0),
    // p32 baseline ~4.4 s: candidate banding + CC + resolution; a trip
    // means an all-pairs regression in the pair source or a lost
    // checkpoint in the CC loop
    ("p32_lsh_dedup_pipeline", 13.0),
    // x06 baseline ~1.5 s: 5 LPA rounds, each join+agg on a ~2k-edge
    // clique-chain; a trip means a lost per-round localCheckpoint
    // (round lineage re-inlines — the x05 failure mode) or the graph
    // construction went quadratic
    ("x06_label_propagation", 6.0),
    // x12 baseline ~1.5 s at sf0.01: sampled-center wedges into the
    // broadcast packed-key probe; a trip means the probe fell back to
    // an exchange (the wedge volume materializes) or a lost checkpoint
    // re-runs the pair build per consumer
    ("x12_clustering_coeff", 6.0),
    // x15 baseline ~0.7 s (driver-arm dispatch): a trip means the
    // local/distributed threshold broke and 4 relax rounds run as
    // shuffle stages on a driver-sized graph, or the distributed arm
    // lost a per-round localCheckpoint (round lineage re-inlines)
    ("x15_weighted_sssp", 5.0),
    // x16 baseline ~0.7 s (driver-arm dispatch): same trip semantics —
    // 5 sweep rounds of joins on a driver-sized graph, or the
    // x05/x06-style re-inlining in the distributed arm
    ("x16_betweenness", 6.0),
    // p53 baseline ~3-5 s at sf0.01 (196k verified pairs is real
    // work): a trip means the corpus cap was lost — on this vocabulary
    // (every token globally frequent) the prefix candidate join
    // degrades toward all-pairs (the unbounded sf0.1 run stalled on
    // ~1e8 candidate rows before the cap landed, i.e. minutes, so the
    // loose limit still trips on the guarded failure)
    ("p53_prefix_join_dedup", 15.0),
    // x18 baseline ~2 s at sf0.01 (ONE wedge pass + incremental
    // support maintenance): a trip means the peel regressed to
    // per-round triangle re-enumeration, a lost per-round
    // localCheckpoint (rounds re-inline — the x05 failure mode), or
    // the removed-set broadcast fell back to a per-round SMJ
    ("x18_ktruss", 8.0),
    // x20 baseline ~1.7 s at sf0.01: streaming wedge self-join on the
    // customer key; a trip means the lost checkpoint recomputes the
    // orders⋈lineitem distinct per wedge side, or the wedge join
    // degenerated to a cartesian
    ("x20_butterflies", 6.0),
    // p60 baseline ~3.2 s at sf0.01: mirrored banding + verify + the
    // CC loop + two report joins; a trip means an all-pairs regression
    // in the pair source or a lost checkpoint in the CC loop (the p32
    // trip semantics, on the hash-checked twin)
    ("p60_dedup_report_mirror", 10.0))

  guards.foreach { case (name, limitSec) =>
    test(s"$name stays under ${limitSec}s (3x committed time)") {
      val sec = guarded(name, limitSec)
      info(f"$name: $sec%.2f s (limit $limitSec)")
      assert(sec < limitSec,
        f"$name took $sec%.1f s (limit $limitSec) — plan regression?")
    }
  }
}
