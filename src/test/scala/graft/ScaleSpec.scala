package graft

import org.apache.spark.sql.functions._

/** Scale-technique proofs on local data: bucketing co-locates equi-joins
  * (no shuffle exchange on the bucketed sides — the 100 TB fact-fact
  * join strategy), and two-phase salted aggregation is result-identical
  * to the direct form (the skew mitigation).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a killed prior run can leave the managed-table dirs behind with no
    // metastore entry; saveAsTable then fails LOCATION_ALREADY_EXISTS
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      if (d.exists()) rm(d)
    }
    Tables(spark, sfDir, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables(spark, sfDir, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")

    val j = spark.table("b_orders")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
    // disable broadcast so the join shape is decided by bucketing
    val plan = withNoBroadcast {
      j.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  private def withNoBroadcast[T](f: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("IVF probe scans only the probed cells' buckets") {
    // the p14 scale path: corpus written bucketed by cell → an nprobe=2
    // query reads 2 of 32 buckets, not the whole corpus
    val corpus = (0L until 100L).map(i => (i, i % 8)).toDF("vec_id", "cell")
    val stored = graft.sources.GraphStore.materialize(
      spark, "graft_test_ivf", "cell", corpus)
    // autoBucketedScan drops the bucketed layout for scan-only plans
    // (no join/agg to exploit distribution) — which also forfeits bucket
    // PRUNING; a real IVF probe service pins it off for point reads
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      val probe = stored.where(col("cell").isin(2L, 5L))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 2 out of 32"),
        s"probe not bucket-pruned:\n$plan")
      assert(probe.count() == 25)
    } finally {
      spark.conf
        .unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS graft_test_ivf")
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // one hot key (99% of the left side) — with the skew thresholds
    // lowered to test scale, AQE must mark the sort-merge join skewed
    // and split the hot partition instead of leaving one straggler task
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 200000)
        .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id"))
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 100).select(col("id").as("k"),
        lit("dim").as("name"))
      val joined = left.join(right, "k")
      // collect() drives THIS Dataset's queryExecution, so the AQE plan
      // inspected below is the final (post-replan) one
      assert(joined.collect().length == 198001)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("p21 sampling plan: one scan, one aggregate exchange, no join") {
    // the hash-gated sampler must stay embarrassingly parallel — a plan
    // that grew a join or a second exchange would mean the sampler
    // acquired coordination state somewhere
    val plan = SparkEntry.queries("p21_stratified_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"sampler grew a join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    // one partial→final agg exchange + the output sort's range exchange
    assert(exchanges <= 2, s"sampler shuffles more than agg+sort:\n$plan")
  }

  test("p19 decontamination joins broadcast, not shuffle") {
    // the benchmark side is tiny by construction (eval sets are) — the
    // contamination probe must be a broadcast hash join so the corpus
    // stream never re-shuffles on the gram key
    val plan = SparkEntry.queries("p19_decontam")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"decontam gram join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"decontam shuffles the corpus on the gram key:\n$plan")
  }

  test("x04 wedge stream probes a broadcast, never an exchange") {
    // the Σ out-deg² wedge stream must flow straight into the closing
    // semi-probe: a shuffle there would materialize 41M rows at sf0.1
    val plan = SparkEntry.queries("x04_triangles")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"triangle closure is not a broadcast semi-join:\n$plan")
  }

  test("x12 wedge closure probes a broadcast, never an exchange") {
    // same discipline as x04: the per-center neighbor-pair stream must
    // flow straight into the packed-key broadcast semi-probe — a
    // shuffle there would materialize the deg² wedge volume
    val plan = SparkEntry.queries("x12_clustering_coeff")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"cc closure is not a broadcast semi-join:\n$plan")
  }

  test("p29 funnel: the barrier shuffle doubles as the window exchange") {
    // the barrier repartition keys on md5(text) — the SAME clustering
    // the dedup window needs — so Catalyst must elide the window's own
    // exchange. Plan shape: repartition + agg exchange + sort range
    // exchange and nothing else; a 4th exchange means the barrier and
    // the window stopped sharing a shuffle.
    val plan = SparkEntry.queries("p29_pipeline_funnel")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel grew a join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"funnel shuffles beyond barrier+agg+sort:\n$plan")
  }

  test("p25 chunk dedup: hash-aggregate freq join, never a cartesian") {
    // the C4-style chunk-dup ratio must stay linear: chunk freq is a
    // two-phase hash aggregate and the per-doc count is an equi-join on
    // the chunk hash — any NestedLoop/Cartesian means an all-pairs
    // regression
    val plan = SparkEntry.queries("p25_chunk_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"chunk dedup went quadratic:\n$plan")
  }

  test("p32 dedup pipeline: pair source and resolution stay cartesian-free") {
    // the whole point of p32 is that near-dup clustering never goes
    // all-pairs: candidates come from the band hash-aggregate + in-row
    // explode, verify/resolution are equi-joins. A NestedLoop/Cartesian
    // anywhere in either plan is the quadratic regression this exists
    // to prevent. (p05 shares the pair-source shape pre-checkpoint;
    // p32's visible plan covers verify + CC-output resolution joins.)
    for (q <- Seq("p05_minhash_lsh", "p32_lsh_dedup_pipeline",
        "p40_lsh_mirror", "p60_dedup_report_mirror",
        "p62_leakage_free_split")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q went quadratic:\n$plan")
    }
  }

  test("p39 packing: one scan, one window exchange per shard, no join") {
    // sequence packing must stay embarrassingly shard-parallel: a plan
    // with a join or a third exchange means packing acquired global
    // coordination (the sequential-loop regression the window form
    // exists to avoid)
    val plan = SparkEntry.queries("p39_seq_packing")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"packing grew a join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"packing shuffles beyond window+sort:\n$plan")
  }

  test("p34 retrieval: postings meet the query side by broadcast only") {
    // the inverted-postings frame is the 100 TB side — it may shuffle
    // for its own aggregates, but the query terms / df / corpus-stats
    // sides are tiny and must reach it as broadcasts. A SortMergeJoin
    // would mean the whole postings table re-shuffles per query set.
    val plan = SparkEntry.queries("p34_bm25_search")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"BM25 query join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"BM25 shuffles postings against the query side:\n$plan")
  }

  test("p35 span dedup stays linear: explode + hash-agg, no all-pairs") {
    // substring dedup must never compare documents pairwise — the span
    // hash-agg + co-partitioned join back IS the algorithm; any
    // NestedLoop/Cartesian is the quadratic regression
    val plan = SparkEntry.queries("p35_span_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span dedup went quadratic:\n$plan")
  }

  test("p53 prefix join: candidates equi-join on prefix tokens only") {
    // AllPairs/PPJoin's entire scale argument is that the candidate
    // generator is an EQUI-join on rarest-first prefix tokens — a
    // NestedLoop/Cartesian anywhere means either the prefix filter
    // collapsed or the verify went all-pairs, both quadratic. The
    // exactness half (misses nothing at the threshold) is the DuckDB
    // hash gate; this pins the plan half.
    val plan = SparkEntry.queries("p53_prefix_join_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join went quadratic:\n$plan")
  }

  test("p37 bloom membership probes broadcasts, never shuffles the corpus") {
    // the whole point of the bitmap: membership is a constant-size
    // broadcast (bit positions + bench grams), so the corpus gram
    // stream must meet it as BroadcastHashJoins — a SortMergeJoin
    // means the 100 TB side re-shuffled on the probe key
    val plan = SparkEntry.queries("p37_bloom_decontam")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bloom probe is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"bloom probe shuffles the corpus:\n$plan")
  }

  test("p36 bigram LM: count tables join by key, no cartesian blowup") {
    // c12/c1 are vocab-bounded equi-joins; the only permitted nested
    // loop is the 1-row vocab-size broadcast (crossJoin(broadcast)) —
    // a CartesianProduct of non-broadcast sides means the LM scoring
    // stopped being linear in the corpus
    val plan = SparkEntry.queries("p36_bigram_lm")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"bigram LM went quadratic:\n$plan")
  }

  test("p45 sample: rank filter becomes a partial top-k, no join") {
    // "sample 10 of 25 TB per stratum" must push the rank<=10 filter
    // below the exchange: Spark's WindowGroupLimit keeps each map
    // task's local top-10 per source, so the shuffle moves O(k·tasks)
    // rows, not the corpus — losing it re-sorts whole partitions
    val plan = SparkEntry.queries("p45_weighted_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter not pushed into a partial top-k:\n$plan")
    assert(!plan.contains("Join"), s"sampler grew a join:\n$plan")
  }

  test("p46 chunking: map-only — no join, no aggregate exchange") {
    // chunking 100 TB must stay embarrassingly parallel: the token
    // barrier's exchange and the deterministic output sort are the only
    // legal shuffles; a join or aggregate would mean the chunker
    // acquired cross-row state
    val plan = SparkEntry.queries("p46_rag_chunks")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"chunker grew a join:\n$plan")
    assert(!plan.contains("Aggregate"), s"chunker aggregates:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"chunker shuffles beyond barrier+sort:\n$plan")
  }

  test("p51 diversity sample: partial top-k per cell, sizes by broadcast") {
    // per-cell selection over 100 TB must keep the p45 group-limit
    // shape (each map task's local top-3 per cell crosses the shuffle,
    // not the corpus), and the 16-row cell-size table must come back
    // by broadcast — a sort-merge there would re-shuffle the winners
    // on the cell key for nothing
    val plan = SparkEntry.queries("p51_diverse_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter not pushed into a partial top-k:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"cell sizes not joined by broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"winners re-shuffled on cell:\n$plan")
  }

  test("p52 audio dedup: candidates from the chunk equi-join, no all-pairs") {
    // the perceptual-dedup contract at 100 TB: candidate pairs come
    // ONLY from the 4×8-bit chunk buckets (linear in bucket volume) —
    // a cartesian/nested-loop anywhere means the blocking broke
    val plan = SparkEntry.queries("p52_audio_fp_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"audio dedup degenerated to all-pairs:\n$plan")
  }

  test("q52 sweep: the wide window shuffles on (event_type, hour)") {
    // the two-level prefix-sum decomposition only scales if the HEAVY
    // running-sum window is keyed by (type, hour-bucket) — one
    // executor per bucket — with the per-type prefix running over hour
    // TOTALS only. If the exchange feeding the point stream ever drops
    // back to hashpartitioning(event_type) alone, the sweep has become
    // the single-sorter-per-type bottleneck this decomposition removes.
    val plan = SparkEntry.queries("q52_interval_sweep")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(event_type#\\d+, hr#\\d+".r
      .findFirstIn(plan).isDefined,
      s"wide window not keyed by (event_type, hr):\n$plan")
  }

  test("x20/p55/p58: dedup-shaped ops stay cartesian-free") {
    // butterflies fan out in-row per customer, video pairs explode per
    // signature group, novelty attributes via a gram-keyed equi-join —
    // a NestedLoop/Cartesian in any of them is the all-pairs regression
    for (q <- Seq("x20_butterflies", "p55_video_sig_dedup", "p58_novelty")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q went quadratic:\n$plan")
    }
  }

  test("p57 classifier: map-side only — no join in the scoring plan") {
    // the fastText shape ships weights WITH the row (deterministic
    // bucket arithmetic standing in for a broadcast array): scoring
    // 100 TB must be one explode + one hash aggregate, never a join
    // against a weight table
    val plan = SparkEntry.queries("p57_hashed_linear_clf")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"classifier grew a join:\n$plan")
  }

  test("q55/q56: clickstream analytics shuffle on natural keys only") {
    // the transition matrix's one window must partition by user_id
    // (per-user sequence build), never globally; the cohort table must
    // broadcast its cohort sizes, not shuffle-join them — losing either
    // turns a natural-keyed analytics query into a single-node sort or
    // a second full exchange at 100 TB
    val tPlan = SparkEntry.queries("q55_transition_matrix")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id#\\d+".r.findFirstIn(tPlan).isDefined,
      s"transition window not keyed by user_id:\n$tPlan")
    val cPlan = SparkEntry.queries("q56_cohort_retention")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(cPlan.contains("BroadcastHashJoin"),
      s"cohort sizes not broadcast:\n$cPlan")
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables(spark, sfDir, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("cnt"))
    // phase 1: aggregate per (key, salt); phase 2: merge partials
    val salted = li
      .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
      .groupBy("l_returnflag", "salt")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("cnt"))
      .groupBy("l_returnflag")
      .agg(sum("sq").as("sq"), sum("cnt").as("cnt"))
    val d = direct.orderBy("l_returnflag").collect().map(_.toSeq)
    val s = salted.orderBy("l_returnflag").collect().map(_.toSeq)
    assert(d.length == s.length)
    d.zip(s).foreach { case (a, b) =>
      assert(a(0) == b(0) && a(2) == b(2))
      assert(math.abs(a(1).asInstanceOf[Double] - b(1).asInstanceOf[Double]) < 1e-6)
    }
  }

  test("q62 delta fold reads ONLY the persisted summary plus the delta slice") {
    // the materialized-view claim: epoch 2 must not re-scan the full
    // corpus — its plan holds exactly two file scans (summary parquet
    // + the lineitem delta) and the summary scan reads the PARTIALS,
    // not raw rows
    val df = SparkEntry.queries("q62_incremental_agg")(spark, sfDir)
    df.collect()
    // AQE's toString repeats the tree under "== Initial Plan ==" —
    // count scans in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected summary+delta scans, got $scans:\n$plan")
    assert(plan.contains("graft_q62_summary"),
      s"merge does not read the persisted summary:\n$plan")
  }

  test("q61 bucketed join plans with zero shuffle Exchange") {
    // both sides persisted bucketed 16 ways on the join key: the join
    // must read co-located buckets — any Exchange hashpartitioning
    // means the layout was ignored and the 100 TB claim is void.
    // Broadcast is disabled so the tiny-sf plan can't sidestep the
    // bucketed SortMergeJoin being pinned.
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q61_bucketed_join")(spark, sfDir)
      assert(df.collect().length == 5) // the five order priorities
      // the registry run persisted the bucketed tables; pin the bare
      // join (the agg/sort above it legitimately shuffle their few
      // grouped rows — the claim is the JOIN reads co-located buckets)
      val tag = sfDir.replaceAll("[^0-9a-zA-Z]", "_")
      val j = spark.table(s"graft_q61_ord_$tag")
        .join(spark.table(s"graft_q61_li_$tag"),
          col("o_orderkey") === col("l_orderkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan is not bucket-aware:\n$plan")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("p78 index probe prunes the bucketed postings scan to the query's buckets") {
    // the deployed-search claim: query cost ~ postings of the QUERY
    // terms, not the corpus — the term IN-list must prune the
    // 16-bucket scan (SelectedBucketsCount < 16); losing the pruning
    // silently degrades every probe to a full index scan at 100 TB.
    val df = SparkEntry.queries("p78_bm25_index_probe")(spark, sfDir)
    assert(df.collect().nonEmpty) // registry run persists the index
    val tag = sfDir.replaceAll("[^0-9a-zA-Z]", "_")
    // DisableUnnecessaryBucketedScan turns bucketing off for a
    // filter-only plan (it only weighs partitioning interest, not
    // pruning) — the deployment conf for a probe-serving session is
    // autoBucketedScan=false, which is what we pin under
    val saved = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val plan = try {
      val probe = spark.table(s"graft_p78_post_$tag")
        .where(col("term").isin("spark", "join", "hash", "table", "scan",
          "window", "agg", "data"))
      probe.collect()
      probe.queryExecution.executedPlan.toString
    } finally spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", saved)
    assert(plan.contains("Bucketed: true"),
      s"postings scan is not bucket-aware:\n$plan")
    val sel = "SelectedBucketsCount: (\\d+)".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(sel.exists(n => n > 0 && n < 16),
      s"bucket pruning lost (selected=$sel):\n${plan.take(2000)}")
  }
}
