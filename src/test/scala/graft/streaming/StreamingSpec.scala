package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Streams.{Ev, UserStat}

/** Streaming transforms exercised through real Structured Streaming
  * (MemoryStream source → memory sink), asserting batch-equivalence:
  * the same transform on the same rows as a batch frame must agree.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600L * 1000 * 24 + min * 60000L)

  private val rows = Seq(
    Ev(1, ts(0), 10, "click"), Ev(2, ts(5), 10, "view"),
    Ev(3, ts(65), 11, "click"), Ev(4, ts(70), 10, "click"),
    Ev(2, ts(5), 10, "view"), // duplicate event_id
    Ev(5, ts(200), 11, "view"))

  private def runStream[T](dfName: String)(build: MemoryStream[Ev] => org.apache.spark.sql.DataFrame,
                                           mode: OutputMode): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    src.addData(rows: _*)
    val q = build(src).writeStream.format("memory")
      .queryName(dfName).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(dfName).collect()
  }

  test("RocksDB state store provider: streaming == batch (production config)") {
    // the documented 100 TB config — state off-heap in RocksDB instead
    // of the HDFS-backed in-memory maps; results must be identical
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val streamed = runStream("t_rocks")(
        src => Streams.tumblingCounts(src.toDF()), OutputMode.Complete())
      val batch = Streams.tumblingCounts(rows.toDF()).collect()
      assert(streamed.map(_.toString).sorted
        .sameElements(batch.map(_.toString).sorted))
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("tumbling window counts: streaming == batch") {
    val streamed = runStream("t_tumble")(
      src => Streams.tumblingCounts(src.toDF()), OutputMode.Complete())
    val batch = Streams.tumblingCounts(rows.toDF()).collect()
    assert(streamed.map(_.toString).sorted.sameElements(batch.map(_.toString).sorted))
    assert(streamed.length == 4) // hours 24,25,27 × types
  }

  test("session windows merge rows within gap: streaming == batch") {
    val streamed = runStream("t_sess")(
      src => Streams.sessionCounts(src.toDF(), "30 minutes"), OutputMode.Complete())
    val batch = Streams.sessionCounts(rows.toDF(), "30 minutes").collect()
    assert(streamed.map(_.toString).sorted.sameElements(batch.map(_.toString).sorted))
    // user 10: {0,5} merge, {70} separate; user 11: {65}, {200}
    assert(streamed.length == 4)
  }

  test("watermarked dedup drops the duplicate event_id") {
    val streamed = runStream("t_dedup")(
      src => Streams.dedup(src.toDF()).groupBy("event_type")
        .agg(count(lit(1)).as("c")), OutputMode.Complete())
    val m = streamed.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("click" -> 3L, "view" -> 2L))
  }

  test("stream-static enrichment join") {
    val dim = Seq(("click", 2.0), ("view", 1.0)).toDF("event_type", "weight")
    val streamed = runStream("t_enrich")(
      src => Streams.enrich(src.toDF(), dim)
        .groupBy("event_type").agg(sum("weight").as("w")), OutputMode.Complete())
    val m = streamed.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("click" -> 6.0, "view" -> 3.0))
  }

  test("mapGroupsWithState accumulates per-user counters across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = Streams.userStats(src.toDS()).writeStream.format("memory")
      .queryName("t_state").outputMode(OutputMode.Update()).start()
    src.addData(rows.take(3): _*); q.processAllAvailable()
    src.addData(rows.drop(3): _*); q.processAllAvailable()
    q.stop()
    // last update per user wins
    val last = spark.table("t_state").as[UserStat].collect()
      .groupBy(_.user_id).map { case (u, xs) => u -> xs.last }
    assert(last(10L) == UserStat(10, 4, 2))
    assert(last(11L) == UserStat(11, 2, 1))
  }

  test("streaming LSH dedup equals verified batch min-anchored pairs") {
    import graft.llm.TextOps
    val streamed = graft.SparkEntry
      .queries("s08_stream_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch expectation over the SAME corpus: band every doc with the
    // batch pipeline (shingles pre-hashed to longs, like the stream and
    // like p05), star-anchor each >=2 bucket at its min doc, then apply
    // the same exact-Jaccard >=0.5 verify gate the query applies.
    // (Pair-SET equality holds here because the file source delivers
    // ascending doc_ids — the bucket min arrives first; under an
    // arbitrary split only component equality is guaranteed, pinned in
    // the adversarial-split test below.)
    val base = graft.Tables(spark, sfDir, "documents").select("doc_id", "text")
    val t = TextOps.tokens(col("text"))
    val corpus = base.unionAll(base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 3, lit(1)))).as("text")))
    val sh = corpus.select(col("doc_id"),
      transform(TextOps.shingles(TextOps.tokens(col("text")), 3),
        s => xxhash64(s)).as("sh"))
    val bands = TextOps.bands(
      TextOps.minhash(sh, "doc_id", col("sh"), k = 32), "doc_id", b = 8, r = 4)
    val shSorted = sh.select(col("doc_id"), array_sort(col("sh")).as("ssh"))
    val expected = bands.groupBy("band_idx", "band_hash")
      .agg(min("doc_id").as("m"), collect_set("doc_id").as("ids"))
      .where(size(col("ids")) >= 2)
      .select(col("m"), explode(col("ids")).as("d"))
      .where(col("d") =!= col("m"))
      .select(col("m").as("a_id"), col("d").as("b_id")).distinct()
      .join(shSorted.select(col("doc_id").as("a_id"), col("ssh").as("a_sh")), "a_id")
      .join(shSorted.select(col("doc_id").as("b_id"), col("ssh").as("b_sh")), "b_id")
      .where(TextOps.jaccardSorted(col("a_sh"), col("b_sh")) >= 0.5)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected,
      s"stream/batch diverge: only-stream=${(streamed -- expected).take(5)} " +
        s"only-batch=${(expected -- streamed).take(5)}")

    // and the planted twins are recovered like the batch path (p05 pin)
    val nDocs = base.count()
    val twins = streamed.count { case (a, b) => b == a + 1000000L }
    assert(twins >= 0.9 * nDocs, s"twin recall $twins/$nDocs")

    // precision: the stream path must not weaken p05's verify
    // guarantee — recompute Jaccard over an INDEPENDENT representation
    // (string shingles, no xxhash64) and require zero emitted pairs
    // below the documented 0.5 threshold
    import spark.implicits._
    val strSh = corpus.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val below = streamed.toSeq.toDF("a_id", "b_id")
      .join(strSh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(strSh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .where(TextOps.jaccard(col("a_sh"), col("b_sh")) < 0.5)
      .count()
    assert(below == 0,
      s"$below of ${streamed.size} streamed pairs below Jaccard 0.5")
  }

  test("band-bucket split across batches: chain output, star components") {
    import graft.streaming.Streams.{BandDoc, DupPair}
    implicit val sqlCtx = spark.sqlContext
    // ADVICE r3's counterexample, executed: bucket {3,5} in batch 1,
    // then {1} in batch 2. The emitted set is the CHAIN {(3,5),(1,3)} —
    // not the batch star {(1,3),(1,5)} — but connectivity and duplicate
    // coverage match the star exactly, which is the processor's real
    // contract (and all its CC-consuming downstream needs).
    Streams.withRocksDB(spark) {
      val src = MemoryStream[BandDoc]
      val q = Streams.bandDedup(src.toDS()).writeStream.format("memory")
        .queryName("t_chain").outputMode(OutputMode.Append()).start()
      src.addData(BandDoc(0, 7L, 3), BandDoc(0, 7L, 5)); q.processAllAvailable()
      src.addData(BandDoc(0, 7L, 1)); q.processAllAvailable()
      q.stop()
    }
    val pairs = spark.table("t_chain").as[DupPair].collect()
      .map(p => (p.a_id, p.b_id)).toSet
    assert(pairs == Set((3L, 5L), (1L, 3L)), pairs.toString)
    // component equality with the star via union-find over the chain
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    assert(Seq(1L, 3L, 5L).map(find).distinct == Seq(1L),
      "chain must connect the whole bucket to its min")
    // duplicate coverage: every non-min member appears in >=1 pair
    val covered = pairs.flatMap(p => Seq(p._1, p._2))
    assert(covered == Set(1L, 3L, 5L))
  }

  test("band-bucket state re-anchors when a smaller doc arrives later") {
    import graft.streaming.Streams.{BandDoc, DupPair}
    implicit val sqlCtx = spark.sqlContext
    Streams.withRocksDB(spark) {
      val src = MemoryStream[BandDoc]
      val q = Streams.bandDedup(src.toDS()).writeStream.format("memory")
        .queryName("t_band").outputMode(OutputMode.Append()).start()
      // bucket (0, 100): doc 5 first, then a SMALLER doc 3, then doc 4 —
      // the min must re-anchor and the final pair set equal the batch
      // star {(3,5),(3,4)} no matter the arrival order
      src.addData(BandDoc(0, 100L, 5)); q.processAllAvailable()
      src.addData(BandDoc(0, 100L, 3)); q.processAllAvailable()
      src.addData(BandDoc(0, 100L, 4)); q.processAllAvailable()
      q.stop()
    }
    val pairs = spark.table("t_band").as[DupPair].collect()
      .map(p => (p.a_id, p.b_id)).toSet
    assert(pairs == Set((3L, 5L), (3L, 4L)), pairs.toString)
  }

  test("priority sample state: any micro-batch split equals batch top-k") {
    import graft.streaming.Streams.{PrioDoc, SampleOut}
    implicit val sqlCtx = spark.sqlContext
    // adversarial arrival: eventual winners arrive LAST and spread over
    // three batches, two sources interleaved — top-k under the total
    // order (prio, doc_id) must still equal the batch sort exactly
    val src = MemoryStream[PrioDoc]
    val q = Streams.prioritySample(src.toDS(), k = 3)
      .writeStream.format("memory").queryName("t_samp")
      .outputMode(OutputMode.Update()).start()
    src.addData(PrioDoc("a", 1, 10, 900), PrioDoc("a", 2, 10, 800),
      PrioDoc("b", 3, 10, 500))
    q.processAllAvailable()
    src.addData(PrioDoc("a", 4, 10, 100), PrioDoc("b", 5, 10, 400))
    q.processAllAvailable()
    src.addData(PrioDoc("a", 6, 10, 50), PrioDoc("a", 7, 10, 700),
      PrioDoc("b", 8, 10, 600))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("t_samp").as[SampleOut].collect()
      .groupBy(_.source)
      .map { case (sc, rows) =>
        sc -> rows.maxBy(_.n_seen).top.map(_.doc_id).toSeq }
    assert(fin("a") == Seq(6L, 4L, 7L), fin.toString) // prios 50,100,700
    assert(fin("b") == Seq(5L, 3L, 8L), fin.toString) // prios 400,500,600
    // n_seen counts every arrival, not just survivors
    val seen = spark.table("t_samp").as[SampleOut].collect()
      .groupBy(_.source).map { case (sc, r) => sc -> r.map(_.n_seen).max }
    assert(seen == Map("a" -> 5L, "b" -> 3L), seen.toString)
  }

  test("budget admission: late high-score doc evicts, split == batch") {
    import graft.streaming.Streams.{BudgetDoc, BudgetOut}
    implicit val sqlCtx = spark.sqlContext
    // budget 10: A(u5,n6) and B(u4,n6) both admit in batch 1 (B is the
    // overflow doc that ships). C(u9,n6) arrives in batch 2, outranks
    // both, and must EVICT B — the final admitted set has to equal the
    // batch computation over {A,B,C}, i.e. C(cum 6), A(cum 12)
    val src = MemoryStream[BudgetDoc]
    val q = Streams.budgetAdmission(src.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("t_budget")
      .outputMode(OutputMode.Update()).start()
    src.addData(BudgetDoc("a", 1, 5, 6), BudgetDoc("a", 2, 4, 6))
    q.processAllAvailable()
    val mid = spark.table("t_budget").as[BudgetOut].collect()
      .maxBy(_.n_seen).admitted.map(a => (a.doc_id, a.cum_tokens))
    assert(mid == Seq((1L, 6L), (2L, 12L)), mid.toString)
    src.addData(BudgetDoc("a", 3, 9, 6))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("t_budget").as[BudgetOut].collect()
      .maxBy(_.n_seen).admitted.map(a => (a.doc_id, a.u, a.cum_tokens))
    assert(fin == Seq((3L, 9L, 6L), (1L, 5L, 12L)), fin.toString)
    // a doc rejected at arrival never re-enters: nothing readmits B
    assert(!fin.exists(_._1 == 2L))
  }

  test("s10 streamed count-min: bounded state, one-sided estimates") {
    val rows = graft.SparkEntry.queries("s10_stream_countmin")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    // the count-min guarantee survives the micro-batched build: every
    // streamed-sketch estimate is >= the exact count
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1), r.toString))
    // the streamed counter grid itself is bounded by d×w, the whole
    // point of sketch-as-streaming-state (3 rows × 1024 buckets)
    val grid = spark.table("s10_sink")
    assert(grid.count() <= 3L * 1024L)
    // total mass per sketch row = total bigram count (nothing lost in
    // the complete-mode aggregate)
    val perRow = grid.groupBy("r").agg(sum("ccnt").as("m"))
      .collect().map(_.getLong(1)).toSet
    assert(perRow.size == 1, s"sketch rows disagree on mass: $perRow")
  }

  test("s13 HLL registers: any micro-batch split equals the batch merge") {
    implicit val sqlCtx = spark.sqlContext
    // register max is associative/commutative — the built-in streaming
    // aggregate's drained state must equal the all-at-once fold no
    // matter how arrivals are split, including a later batch raising
    // some registers and leaving others (s13 reads the update-mode
    // sink back with a max per (source, reg), so re-emissions from
    // raised registers collapse to the final state)
    val rows = Seq(("a", 0, 3), ("a", 1, 1), ("a", 0, 5), ("b", 63, 2),
      ("a", 1, 4), ("a", 2, 1), ("b", 63, 1))
    val src = MemoryStream[(String, Int, Int)]
    val q = src.toDS().toDF("source", "reg", "rho")
      .groupBy("source", "reg").agg(max("rho").as("mr"))
      .writeStream.format("memory").queryName("t_hll")
      .outputMode(OutputMode.Update()).start()
    src.addData(rows.take(4): _*)
    q.processAllAvailable()
    src.addData(rows.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("t_hll").groupBy("source", "reg")
      .agg(max("mr").as("mr")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val batch = rows.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.map(_._3).max }
    assert(fin == batch, fin.toString)
  }

  test("streaming linkage: pair set invariant under adversarial split") {
    import graft.streaming.Streams.{CustRow, LinkPair}
    implicit val sqlCtx = spark.sqlContext
    // names chosen so every unordered pair's distance is known:
    // aaa~aab=1, aaa~abb=2, aab~abb=1, aaa~zzz=3 (excluded), and a
    // second block that must never cross-link. Arrival is adversarial:
    // later-id rows first, linked members split across three batches.
    val rows = Seq(
      CustRow("blk1", 5L, "abb", 300L), CustRow("blk2", 9L, "aaa", 50L),
      CustRow("blk1", 1L, "aaa", 100L), CustRow("blk1", 7L, "zzz", 100L),
      CustRow("blk1", 3L, "aab", 250L), CustRow("blk2", 2L, "aac", 70L))
    val src = MemoryStream[CustRow]
    val q = Streams.linkPairs(src.toDS(), tau = 2L)
      .writeStream.format("memory").queryName("t_link")
      .outputMode(OutputMode.Append()).start()
    src.addData(rows(0), rows(1)); q.processAllAvailable()
    src.addData(rows(2), rows(3)); q.processAllAvailable()
    src.addData(rows(4), rows(5)); q.processAllAvailable()
    q.stop()
    val got = spark.table("t_link").as[LinkPair].collect()
      .map(p => (p.blk, p.a_id, p.b_id, p.name_lev, p.bal_diff_c)).toSet
    // the batch blocked join over the same rows, computed by hand
    assert(got == Set(
      ("blk1", 1L, 5L, 2L, 200L), ("blk1", 1L, 3L, 1L, 150L),
      ("blk1", 3L, 5L, 1L, 50L), ("blk2", 2L, 9L, 1L, 20L)), got.toString)
  }

  test("s15 moments: any micro-batch split reaches the exact batch integers") {
    import graft.streaming.Streams.UserMoments
    implicit val sqlCtx = spark.sqlContext
    // integer moments are order-free: a 2/4 split (key 1 straddling the
    // boundary, negative values included) must land on the exact batch
    // (n, Σv, Σv²) — the invariant that makes s15 oracle-checkable
    val rows = Seq((1L, 100L), (1L, -250L),
      (2L, 7L), (1L, 42L), (2L, -7L), (2L, 0L))
    // transformWithState's column families need the RocksDB provider,
    // exactly as the s15 query runs it
    Streams.withRocksDB(spark) {
      val src = MemoryStream[(Long, Long)]
      val q = Streams.userMoments(src.toDS())
        .writeStream.format("memory").queryName("t_moments")
        .outputMode(OutputMode.Update()).start()
      src.addData(rows.take(2): _*); q.processAllAvailable()
      src.addData(rows.drop(2): _*); q.processAllAvailable()
      q.stop()
    }
    val fin = spark.table("t_moments").as[UserMoments].collect()
      .groupBy(_.user_id).map { case (u, xs) => u -> xs.maxBy(_.n) }
    assert(fin(1L) == UserMoments(1L, 3, -108L, 74264L), fin(1L).toString)
    assert(fin(2L) == UserMoments(2L, 3, 0L, 98L), fin(2L).toString)
  }

  test("s19 transitions: ts-boundary split chains pairs across batches") {
    import graft.streaming.Streams.{TransRow, TransPair}
    implicit val sqlCtx = spark.sqlContext
    // user 1: a→b→c→d split 2/2 at a ts boundary — the c→d boundary
    // pair must come from STATE (the stored batch-1 tail), not the
    // batch-2 rows; user 2 entirely in batch 2, shuffled within the
    // batch (in-batch sort must restore ts order); a lone event emits
    // nothing
    val b1 = Seq(TransRow(1L, 10L, 1L, "a"), TransRow(1L, 20L, 2L, "b"),
      TransRow(1L, 30L, 3L, "c"))
    val b2 = Seq(TransRow(2L, 15L, 6L, "y"), TransRow(2L, 5L, 5L, "x"),
      TransRow(1L, 40L, 4L, "d"), TransRow(3L, 1L, 7L, "solo"))
    Streams.withRocksDB(spark) {
      val src = MemoryStream[TransRow]
      val q = Streams.transitionPairs(src.toDS())
        .writeStream.format("memory").queryName("t_trans")
        .outputMode(OutputMode.Append()).start()
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      q.stop()
    }
    val got = spark.table("t_trans").as[TransPair].collect().toSet
    assert(got == Set(TransPair(1L, "a", "b"), TransPair(1L, "b", "c"),
      TransPair(1L, "c", "d"), TransPair(2L, "x", "y")), got.toString)
  }

  test("s22 as-of: ts-boundary split attributes clicks from state") {
    import graft.streaming.Streams.{TransRow, AsOfOut}
    implicit val sqlCtx = spark.sqlContext
    // user 1: view(1) click(2) view(3) | click(4) — the batch-2 click
    // must attribute to the STORED view 3, not re-derive from batch-2
    // rows; user 2 all in batch 2 ts-shuffled (in-batch sort restores
    // view-before-click); user 3: click with NO prior view → None
    val b1 = Seq(TransRow(1L, 10L, 1L, "view"), TransRow(1L, 20L, 2L, "click"),
      TransRow(1L, 30L, 3L, "view"))
    val b2 = Seq(TransRow(2L, 15L, 6L, "click"), TransRow(2L, 5L, 5L, "view"),
      TransRow(1L, 40L, 4L, "click"), TransRow(3L, 1L, 7L, "click"))
    Streams.withRocksDB(spark) {
      val src = MemoryStream[TransRow]
      val q = Streams.asOfEnrich(src.toDS())
        .writeStream.format("memory").queryName("t_asof")
        .outputMode(OutputMode.Append()).start()
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      q.stop()
    }
    val got = spark.table("t_asof").as[AsOfOut].collect().toSet
    assert(got == Set(AsOfOut(1L, 2L, Some(1L)), AsOfOut(1L, 4L, Some(3L)),
      AsOfOut(2L, 6L, Some(5L)), AsOfOut(3L, 7L, None)), got.toString)
  }

  test("s24 sessionize: a session spans a micro-batch split via state") {
    import graft.streaming.Streams.{SessRow, SessOut}
    implicit val sqlCtx = spark.sqlContext
    // user 1: t=0,100 | t=200 (same session, continued FROM STATE),
    // t=2500 (gap 2300 > 1800 → session 2); user 2 all in batch 2,
    // shuffled (in-batch sort restores order), its own sid sequence
    val b1 = Seq(SessRow(1L, 0L, 1L), SessRow(1L, 100L, 2L))
    val b2 = Seq(SessRow(2L, 50L, 6L), SessRow(2L, 5000L, 7L),
      SessRow(1L, 200L, 3L), SessRow(1L, 2500L, 4L))
    Streams.withRocksDB(spark) {
      val src = MemoryStream[SessRow]
      val q = Streams.sessionize(src.toDS(), gap = 1800L)
        .writeStream.format("memory").queryName("t_sess")
        .outputMode(OutputMode.Append()).start()
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      q.stop()
    }
    val got = spark.table("t_sess").as[SessOut].collect()
      .map(o => o.event_id -> o.sid).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      6L -> 1L, 7L -> 2L), got.toString)
  }

  test("s20 packing: doc_id-boundary split continues the open sequence") {
    import graft.streaming.Streams.{PackRow, PackOut}
    implicit val sqlCtx = spark.sqlContext
    // cap 10; source A: docs of 4+4 tokens in batch 1 (cum=8), then 4+9
    // in batch 2 — doc 3 must START at off 8 of seq 0 (state-carried
    // cum), doc 4 at off 12 → seq 1 off 2; batch-2 rows arrive
    // doc_id-shuffled (in-batch sort must restore order); source B all
    // in batch 2
    val b1 = Seq(PackRow("A", 1L, 4L), PackRow("A", 2L, 4L))
    val b2 = Seq(PackRow("A", 4L, 9L), PackRow("A", 3L, 4L),
      PackRow("B", 1L, 7L), PackRow("B", 2L, 5L))
    Streams.withRocksDB(spark) {
      val src = MemoryStream[PackRow]
      val q = Streams.packSequences(src.toDS(), cap = 10L)
        .writeStream.format("memory").queryName("t_pack")
        .outputMode(OutputMode.Append()).start()
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      q.stop()
    }
    val got = spark.table("t_pack").as[PackOut].collect().toSet
    assert(got == Set(
      PackOut("A", 1L, 4L, 0L, 0L), PackOut("A", 2L, 4L, 0L, 4L),
      PackOut("A", 3L, 4L, 0L, 8L), PackOut("A", 4L, 9L, 1L, 2L),
      PackOut("B", 1L, 7L, 0L, 0L), PackOut("B", 2L, 5L, 0L, 7L)),
      got.toString)
  }

  test("s16 funnel: first-touch state is arrival-order invariant") {
    import graft.streaming.Streams.FunnelState
    implicit val sqlCtx = spark.sqlContext
    // user 1's click arrives FIRST and precedes their first view —
    // first-touch semantics must mark them incomplete; user 2 completes
    // in order but split across batches; unknown types are ignored
    val rows = Seq((1L, "click", 5L), (2L, "view", 1L),
      (1L, "view", 10L), (2L, "click", 2L), (1L, "purchase", 20L),
      (2L, "purchase", 3L), (2L, "refund", 0L))
    Streams.withRocksDB(spark) {
      val src = MemoryStream[(Long, String, Long)]
      val q = Streams.funnelTouches(src.toDS())
        .writeStream.format("memory").queryName("t_funnel")
        .outputMode(OutputMode.Update()).start()
      src.addData(rows.take(3): _*); q.processAllAvailable()
      src.addData(rows.drop(3): _*); q.processAllAvailable()
      q.stop()
    }
    // last update per user wins (batches append to the memory sink in
    // commit order — the same finalize the mapGroupsWithState test uses)
    val fin = spark.table("t_funnel").as[FunnelState].collect()
      .groupBy(_.user_id).map { case (u, xs) => u -> xs.last }
    assert(fin(1L) == FunnelState(1L, 10L, 5L, 20L), fin(1L).toString)
    assert(fin(2L) == FunnelState(2L, 1L, 2L, 3L), fin(2L).toString)
    def completed(f: FunnelState): Boolean =
      f.t_view >= 0 && f.t_click >= 0 && f.t_purchase >= 0 &&
        f.t_view < f.t_click && f.t_click < f.t_purchase
    assert(!completed(fin(1L)) && completed(fin(2L)))
  }

  test("s25 signed partials: update pair split across batches; emptied group retired") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("s25spec").toString
    val src = MemoryStream[(Long, String, Long)] // (sign, key, qty)
    val q = src.toDF().toDF("sign", "key", "qty")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.groupBy("key").agg(sum("sign").as("n"),
            sum(col("sign") * col("qty")).as("s"))
          .write.mode("append").parquet(dir)
        ()
      }
      .start()
    // batch 1: inserts — a has two rows, b one
    src.addData((1L, "a", 10L), (1L, "a", 20L), (1L, "b", 5L))
    q.processAllAvailable()
    // batch 2: ONLY the retract half of a's update (10 → 11) — the
    // -1/+1 pair is split across different micro-batches
    src.addData((-1L, "a", 10L))
    q.processAllAvailable()
    // batch 3: the insert half, plus the retraction that EMPTIES b
    src.addData((1L, "a", 11L), (-1L, "b", 5L))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(dir).groupBy("key")
      .agg(sum("n").as("n"), sum("s").as("s")).where(col("n") > 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // a: 2 rows, 20 + 11 = 31; b retired by HAVING n > 0
    assert(got == Set(("a", 2L, 31L)), got.toString)
  }

  test("restart from checkpoint: source offsets and dedup state survive") {
    // the recovery contract a 100 TB ingest pipeline leans on: kill a
    // stateful query between epochs, restart with the SAME checkpoint,
    // and (a) already-committed input is NOT reprocessed (source
    // offsets recovered — the file sink would otherwise duplicate
    // epoch-1 rows), (b) operator state IS recovered (dropDuplicates
    // must suppress an epoch-2 duplicate of an epoch-1 key it has only
    // seen before the restart)
    val base = java.nio.file.Files
      .createTempDirectory("graft-recovery").toString
    val stage = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .dropDuplicates("id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(stage)
    run() // epoch 1, then the query STOPS (simulated failure window)
    Seq((2L, "DUP"), (3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(stage)
    run() // restart from the same checkpoint
    val got = spark.read.parquet(out).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"recovery broke exactly-once: $got")
  }

  test("foreachBatch partials are replay-idempotent keyed by batchId") {
    // the exactly-once discipline for the s21/s25/s29/s30 maintenance
    // family: a foreachBatch APPEND duplicates its partials if the
    // micro-batch replays after a mid-commit failure; keying the write
    // by batchId under dynamic partition overwrite makes the replay
    // OVERWRITE its own partition instead — the drain-time fold is
    // then exactly-once under any retry, because sum-of-partials reads
    // each batch partition exactly once regardless of how many times
    // it was written
    val base = java.nio.file.Files
      .createTempDirectory("graft-idem").toString
    val key = "spark.sql.sources.partitionOverwriteMode"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      def writeEpoch(rows: Seq[(String, Long)], id: Long): Unit =
        rows.toDF("k", "n").withColumn("batch", lit(id))
          .write.mode("overwrite").partitionBy("batch").parquet(base)
      def fold(): Map[String, Long] = spark.read.parquet(base)
        .groupBy("k").agg(sum("n").as("n"))
        .as[(String, Long)].collect().toMap
      writeEpoch(Seq(("a", 1L), ("b", 2L)), 0L)
      writeEpoch(Seq(("a", 10L), ("c", 5L)), 1L)
      val committed = fold()
      assert(committed == Map("a" -> 11L, "b" -> 2L, "c" -> 5L))
      writeEpoch(Seq(("a", 10L), ("c", 5L)), 1L) // the REPLAY
      assert(fold() == committed,
        "replayed batch changed the fold — partials are not idempotent")
      // and a plain APPEND of the same replay would have double-counted
      // (the failure mode the pattern exists to prevent)
      Seq(("a", 10L), ("c", 5L)).toDF("k", "n")
        .withColumn("batch", lit(1L))
        .write.mode("append").partitionBy("batch").parquet(base)
      assert(fold() == Map("a" -> 21L, "b" -> 2L, "c" -> 10L),
        s"append control: ${fold()}")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("foreachBatch fold survives a kill BETWEEN partial append and commit") {
    // the crash the batchId-keyed pattern exists for, rehearsed
    // end-to-end: the query dies AFTER batch 1's partial has landed
    // but BEFORE the offset log commits, restarts from the SAME
    // checkpoint (so batch 1 REPLAYS), and the drained fold must still
    // equal the batch recompute — the dynamic overwrite rewrites the
    // half-committed partition instead of double-counting it
    val base = java.nio.file.Files
      .createTempDirectory("graft-killfold").toString
    val stage = s"$base/stage"; val sumDir = s"$base/sum"; val ck = s"$base/ck"
    for (i <- 0 to 2)
      Seq.tabulate(20)(j => (i * 20 + j.toLong, (j % 4).toString))
        .toDF("id", "k").coalesce(1).write.mode("append").parquet(stage)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType)))
    val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          batch.groupBy("k")
            .agg(count(lit(1)).as("n"), sum("id").as("sum_id"))
            .withColumn("batch_id", lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(sumDir)
          // the partial for batch 1 is ON DISK; dying HERE (before
          // foreachBatch returns) means the offset log never commits
          // batch 1 — the exact mid-commit window
          if (bid == 1L && !killed.getAndSet(true))
            throw new RuntimeException("simulated crash between append and commit")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException
        if e.getMessage.contains("simulated crash") => () }
    }
    run() // dies mid-batch-1
    assert(killed.get(), "the simulated crash never fired")
    run() // restart from the same checkpoint: batch 1 replays
    val folded = spark.read.parquet(sumDir)
      .groupBy("k").agg(sum("n").as("n"), sum("sum_id").as("sum_id"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    val expect = spark.read.parquet(stage)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("id").as("sum_id"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(folded == expect,
      s"fold after kill-and-restart diverged: $folded vs $expect")
  }

  test("editDistance matches Spark's levenshtein on random strings") {
    import graft.streaming.Streams
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(40)(rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
    val pairs = strs.zip(strs.reverse) ++ Seq(("", ""), ("", "abc"),
      ("Customer#000000001", "Customer#000000010"))
    val rows = pairs.map { case (a, b) => (a, b) }
    val sparkLev = rows.toDF("a", "b")
      .select(levenshtein(col("a"), col("b")).cast("long")).as[Long]
      .collect()
    rows.zip(sparkLev).foreach { case ((a, b), exp) =>
      assert(Streams.editDistance(a, b) == exp, s"'$a' vs '$b'")
    }
  }
}
