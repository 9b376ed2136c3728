package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.Streams

/** Streaming queries run through REAL Structured Streaming — parquet
  * file source → stateful transform → memory sink, Trigger.AvailableNow
  * — and the final materialized result is compared to a DuckDB oracle,
  * proving the streaming path computes exactly what the batch semantics
  * promise (not just the q19/q20 batch equivalents).
  */
object Streaming {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** events.parquet as a stream (ts normalized to µs TIMESTAMP, same as
    * Tables). The file source needs an explicit schema, and that schema
    * must match the file's actual ts encoding — TIMESTAMP(NANOS) files
    * surface as long (nanosAsLong), µs-NTZ files as TIMESTAMP_NTZ;
    * forcing LongType onto a µs file silently reads µs values where the
    * div-1000 path expects ns (1000× skew, windows collapse). One batch
    * schema probe picks the right branch. */
  private def streamEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = s.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    // the file source wants a directory; pathGlobFilter narrows it to
    // the events table without touching the sibling parquet files
    val raw = s.readStream
      .schema(StructType(eventsSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = tsType) else f)))
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    tsType match {
      // integer div, not floor(x/1000) — double division drifts 1µs at
      // ns magnitudes (see Tables.scala)
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** State partitions are frozen at a streaming query's first plan;
    * size them to the (small) state instead of the session default —
    * every stateful operator commits one state store per partition per
    * micro-batch, so oversizing is pure commit overhead. */
  private def withStatePartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val before = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", before)
  }

  /** Run `build(stream)` to completion into a memory sink, return the
    * materialized table. */
  private def runToMemory(s: SparkSession, dir: String, name: String,
                          mode: String)(build: DataFrame => DataFrame): DataFrame = {
    val q = withStatePartitions(s, 8) {
      build(streamEvents(s, dir))
        .writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    s.table(name)
  }

  val registry: Seq[RegQuery] = Seq(

    // ---- s01: tumbling window counts through the streaming engine ------
    RegQuery("s01_stream_tumbling",
      (s, d) => runToMemory(s, d, "s01_sink", "complete")(Streams.tumblingCounts(_))
        .select(date_format(col("ws"), "yyyy-MM-dd HH:mm").as("ws"),
          col("event_type"), col("cnt"))
        .orderBy("ws", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS ws,
             |event_type, count(*) AS cnt FROM events
             |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)),

    // ---- s02: session windows through the streaming engine -------------
    RegQuery("s02_stream_sessions",
      (s, d) => runToMemory(s, d, "s02_sink", "complete")(
          Streams.sessionCounts(_, "30 minutes"))
        .select(col("user_id"),
          date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("ws"), col("cnt"))
        .orderBy("user_id", "ws"),
      // gaps-and-islands: new session when the gap to the previous event
      // is >= 30 min (Spark session windows are [start, start+gap))
      Some("""WITH m AS (SELECT user_id, ts,
             |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |            >= INTERVAL 30 MINUTE
             |       THEN 1 ELSE 0 END AS new_s FROM events),
             |g AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id
             |  ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m)
             |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS ws,
             |  count(*) AS cnt
             |FROM g GROUP BY user_id, sid ORDER BY user_id, ws""".stripMargin)),

    // ---- s03: arbitrary stateful op (mapGroupsWithState) ---------------
    RegQuery("s03_stream_stateful",
      (s, d) => {
        import s.implicits._
        val q = withStatePartitions(s, 8) {
          Streams.userStats(streamEvents(s, d).as[Streams.Ev])
            .writeStream.format("memory").queryName("s03_sink")
            .outputMode(Streams.userStatsOutputMode)
            .trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        // counters grow monotonically → the max row per user is the final
        // state regardless of how many micro-batches the source split into
        s.table("s03_sink").groupBy("user_id")
          .agg(max("n_events").as("n_events"), max("n_clicks").as("n_clicks"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |count(*) FILTER (WHERE event_type = 'click') AS n_clicks
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // transformWithState (Spark 4 arbitrary-state API): typed ValueState
    // per user in the state store — REQUIRES the RocksDB provider, i.e.
    // this query runs the full production state config end-to-end
    RegQuery("s07_stream_totals",
      (s, d) => {
        import s.implicits._
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.userTotals(streamEvents(s, d).as[Streams.EvV])
              .writeStream.format("memory").queryName("s07_sink")
              .outputMode("update")
              .trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          // totals grow monotonically → max per user = final state
          s.table("s07_sink").groupBy("user_id")
            .agg(max("n_events").as("n_events"),
              (floor(max("total_value") * 100 + 0.5) / 100).as("total_value"))
            .orderBy("user_id")
        }
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |floor(sum(value)*100 + 0.5)/100 AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- s04: watermarked streaming dedup (bounded state) --------------
    // The source has unique event_ids, so the stream is unioned with
    // itself — the dedup must collapse every event back to one row.
    // dropDuplicatesWithinWatermark evicts per-key state as the watermark
    // advances (the only dedup shape whose state stays bounded on an
    // unbounded stream).
    RegQuery("s04_stream_dedup",
      (s, d) => {
        val q = withStatePartitions(s, 8) {
          Streams.dedup(streamEvents(s, d).unionAll(streamEvents(s, d)))
            .writeStream.format("memory").queryName("s04_sink")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table("s04_sink")
          .groupBy("event_type").agg(count(lit(1)).as("cnt"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS cnt FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- s05: stream-static enrichment join (dim broadcasts) -----------
    // The static side is tiny and hash-joins against every micro-batch
    // without shuffling the stream — the standard dimension-enrichment
    // shape at scale.
    RegQuery("s05_stream_enrich",
      (s, d) => {
        val dim = graft.Tables(s, d, "events")
          .select(col("event_type")).distinct()
          .withColumn("weight", length(col("event_type")))
        val q = withStatePartitions(s, 8) {
          Streams.enrich(streamEvents(s, d), dim)
            .groupBy("event_type")
            .agg(count(lit(1)).as("cnt"), sum("weight").as("wsum"))
            .writeStream.format("memory").queryName("s05_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table("s05_sink").orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS cnt,
             |count(*) * length(event_type) AS wsum
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- s06: stream-stream interval join (bounded join state) ---------
    // Two live streams of the same source join on user within a 6 h
    // window; watermarks + the time bound let the engine evict buffered
    // rows (unbounded-state joins don't survive at scale). Inner join →
    // append sink; the per-user rollup happens batch-side on the sink.
    // The cohort filter (user_id % 7 = 0, both sides) bounds the join
    // state to ~1/7 of the stream BEFORE buffering — the same
    // pre-join-filter discipline that keeps stream-stream state
    // survivable at 100 TB (filter early, buffer late).
    RegQuery("s06_stream_join",
      (s, d) => {
        def cohort(df: DataFrame) = df.where(pmod(col("user_id"), lit(7)) === 0)
        // a stream-stream join commits 4 state stores per partition per
        // batch — the shared 8-partition sizing matters most here
        val q = withStatePartitions(s, 8) {
          Streams.clickViewJoin(
              cohort(streamEvents(s, d)), cohort(streamEvents(s, d)))
            .writeStream.format("memory").queryName("s06_sink")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table("s06_sink")
          .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      Some("""SELECT c.user_id, count(*) AS n_pairs
             |FROM events c JOIN events v
             |  ON c.event_type = 'click' AND v.event_type = 'view'
             | AND c.user_id = v.user_id
             | AND v.ts BETWEEN c.ts - INTERVAL 6 HOUR AND c.ts
             |WHERE c.user_id % 7 = 0
             |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin)),

    // ---- s08: streaming incremental near-dup (continuous-ingest dedup) --
    // Docs arrive as a stream; banding is a STATELESS per-row transform
    // (TextOps.bandsPerRow — same hashes as the batch MinHash pipeline),
    // and only the band-bucket min lives in the state store. Each new
    // doc that lands in a seen bucket emits a (first_doc, new_doc)
    // candidate pair immediately — dedup keeps up with ingest instead
    // of re-running batch LSH over the whole corpus. Under any
    // micro-batch split the emitted pairs connect each bucket member to
    // its bucket min (component equality with the batch star — pinned
    // in StreamingSpec, incl. an adversarial split). Candidates then
    // pass the SAME exact-Jaccard ≥0.5 verify gate as p05, as a batch
    // join over the tiny emitted pair set only (shingles recomputed for
    // just the docs appearing in pairs — never the corpus twice), so
    // the stream path cannot silently weaken p05's precision guarantee
    // (no-false-pair assertion pinned in StreamingSpec). xxhash64 has
    // no DuckDB analog → rows-only check.
    RegQuery("s08_stream_neardup",
      (s, d) => {
        import s.implicits._
        // doc + perturbed twin fan out from ONE scan (a union of two
        // streamDocs() would read and parse the source twice)
        val tk = graft.llm.TextOps.tokens(col("text"))
        val all = streamDocs(s, d)
          .select(explode(array(
            struct(col("doc_id"), col("text")),
            struct((col("doc_id") + 1000000L).as("doc_id"),
              concat_ws(" ", slice(tk, lit(1),
                greatest(size(tk) - 3, lit(1)))).as("text")))).as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
        // hash shingles to longs ONCE behind a shuffle barrier: the 32
        // minhash exprs each reference the shingle array, and
        // CollapseProject would inline the whole split→shingle→hash
        // chain into every one (measured 110 s/run at sf0.1 without the
        // barrier, ~3 s with). A stream can't localCheckpoint — the
        // exchange is the streaming-legal materialization point.
        val bands = graft.llm.TextOps.bandsPerRow(col("hs"),
          k = 32, b = 8, r = 4)
        val banded = all
          // first shuffle = PARALLELISM: the file source is one small
          // file (1-2 input partitions), and the shingle+hash chain at
          // ~1 ms/doc would otherwise run serial in the scan task
          .transform(graft.Part.pin(col("doc_id")))
          .select(col("doc_id"), transform(
            graft.llm.TextOps.shingles(
              graft.llm.TextOps.tokens(col("text")), 3),
            sh => xxhash64(sh)).as("hs"))
          // second shuffle = BARRIER (user repartitions with a project
          // between survive CollapseRepartition): hs materializes once
          // instead of being re-inlined into all 32 band expressions
          .transform(graft.Part.pin(col("doc_id")))
          .select(col("doc_id"),
            posexplode(bands).as(Seq("band_idx", "band_hash")))
          .select(col("band_idx").cast("int").as("band_idx"),
            col("band_hash"), col("doc_id"))
          .as[graft.streaming.Streams.BandDoc]
        graft.streaming.Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            graft.streaming.Streams.bandDedup(banded)
              .writeStream.format("memory").queryName("s08_sink")
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
        }
        val cand = s.table("s08_sink").distinct()
        // verify (batch — the sink table is static once the
        // AvailableNow trigger drains): prune the corpus to docs that
        // appear in a candidate pair BEFORE shingling, so the exact-
        // Jaccard gate costs O(pairs), not a second corpus pass
        val pairIds = cand.select(col("a_id").as("doc_id"))
          .unionAll(cand.select(col("b_id").as("doc_id"))).distinct()
        val btk = graft.llm.TextOps.tokens(col("text"))
        val corpus = graft.Tables(s, d, "documents").select("doc_id", "text")
          .select(explode(array(
            struct(col("doc_id"), col("text")),
            struct((col("doc_id") + 1000000L).as("doc_id"),
              concat_ws(" ", slice(btk, lit(1),
                greatest(size(btk) - 3, lit(1)))).as("text")))).as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
        // token barrier before shingling (the p05/p16 rule): without it
        // CollapseProject inlines the regex split into every element_at
        // of the shingle lambda — measured 13.6 s of the 18.7 s total
        // this stage cost un-barriered at sf0.1
        val sh = corpus.join(pairIds, "doc_id")
          .select(col("doc_id"),
            graft.llm.TextOps.tokens(col("text")).as("tk"))
          .transform(graft.Part.pin(col("doc_id")))
          .select(col("doc_id"), array_sort(transform(
            graft.llm.TextOps.shingles(col("tk"), 3),
            x => xxhash64(x))).as("sh"))
          .localCheckpoint()
        cand
          .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
          .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
          .where(graft.llm.TextOps.jaccardSorted(
            col("a_sh"), col("b_sh")) >= 0.5)
          .select("a_id", "b_id")
          .orderBy("a_id", "b_id")
      },
      None),

    // ---- s09: streaming quality gate (continuous curation funnel) ------
    // The p26 logistic quality filter as a CONTINUOUS operator: docs
    // stream in, the per-row score is stateless codegen arithmetic, and
    // the per-source funnel (arrivals / survivors / score mass) is a
    // streaming aggregate — the monitoring surface a 100 TB ingest
    // pipeline watches while data lands, not a batch afterthought.
    // Scores are floored to BIGINT 1e-4 units BEFORE the sum (the p34
    // integer-aggregation discipline), so the streaming aggregate is
    // exact integer math — micro-batch boundaries can't perturb a
    // float-sum order — and the gate (score > 0.6 ⟺ u > 6000) is the
    // identical keep rule p26 applies batch-side. Token barrier via
    // repartition (the s08 lesson: streams can't localCheckpoint; the
    // exchange is the streaming-legal materialization point).
    RegQuery("s09_stream_quality",
      (s, d) => {
        import graft.llm.TextOps
        val tk = col("tk")
        val sr = TextOps.stopwordRatio(tk)
        val mw = aggregate(tk, lit(0L), (a, x) => a + length(x))
          .cast("double") / size(tk)
        val z = lit(-3.0) + lit(4.0) * sr + lit(0.5) * mw +
          lit(0.2) * log(2.0, size(tk))
        val u = floor((lit(1.0) / (lit(1.0) + exp(-z))) * 10000 + 0.5)
          .cast("long")
        val q = withStatePartitions(s, 8) {
          streamDocs(s, d)
            .select(col("doc_id"), col("source"),
              TextOps.tokens(col("text")).as("tk"))
            .transform(graft.Part.pin(col("doc_id")))
            .select(col("source"), u.as("u"))
            .groupBy("source")
            .agg(count(lit(1)).as("n_docs"),
              sum((col("u") > 6000).cast("long")).as("n_keep"),
              sum(col("u")).as("sum_score_u"))
            .writeStream.format("memory").queryName("s09_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table("s09_sink").orderBy("source")
      },
      Some(s"""WITH t AS (SELECT source, string_split(text,' ') AS tk
             |  FROM documents),
             |f AS (SELECT source, CAST(floor(1.0/(1.0 + exp(-(
             |  -3.0 + 4.0 * (CAST(len(list_filter(tk, x -> list_contains(
             |      ${graft.llm.TextOps.enStopwords.mkString("['", "','", "']")}, x)))
             |      AS DOUBLE) / len(tk))
             |  + 0.5 * (CAST(list_sum(list_transform(tk, x -> length(x)))
             |      AS DOUBLE) / len(tk))
             |  + 0.2 * log2(len(tk)))))*10000 + 0.5) AS BIGINT) AS u FROM t)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN u > 6000 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_keep,
             |  CAST(sum(u) AS BIGINT) AS sum_score_u
             |FROM f GROUP BY source ORDER BY source""".stripMargin)),

    // ---- s10: streaming count-min sketch maintenance -------------------
    // p38's heavy-hitter sketch built BY the stream: the d×w counter
    // grid is a complete-mode streaming aggregate over (row, bucket) —
    // p38's "the partial aggregate IS the sketch merge" taken to its
    // streaming conclusion: counter adds commute, so micro-batch
    // boundaries can't perturb a single cell, and the stateful
    // operator's state is O(d·w) = 3×1024 rows NO MATTER how long the
    // stream runs (the bounded-state sketch story, vs s04's per-key
    // dedup state that grows with the keyspace). After the AvailableNow
    // drain, a batch probe joins the exact top-20 bigrams against the
    // streamed counters — same polynomial bucket hashes both sides and
    // in DuckDB, so the oracle (p38's, verbatim) checks the streamed
    // sketch cell-exactly, collision overestimates included.
    RegQuery("s10_stream_countmin",
      (s, d) => {
        import graft.llm.TextOps
        val P = 1000000007L
        def polyB(g: Column, seed: Long, mult: Int): Column =
          (graft.llm.TextOps.polyHash(g, seed, mult) % 1024).cast("long")
        val tk = col("tk")
        val grams = transform(
          sequence(lit(1), greatest(size(tk) - 1, lit(0))),
          i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1)))
        val q = withStatePartitions(s, 8) {
          streamDocs(s, d)
            .where(size(TextOps.tokens(col("text"))) >= 2)
            .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
            .transform(graft.Part.pin(col("doc_id"))) // token barrier (s08/s09 lesson)
            .select(explode(grams).as("g"))
            .select(posexplode(array(
              polyB(col("g"), 7L, 131), polyB(col("g"), 11L, 137),
              polyB(col("g"), 13L, 139))).as(Seq("r", "bucket")))
            .groupBy("r", "bucket").agg(count(lit(1)).as("ccnt"))
            .writeStream.format("memory").queryName("s10_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        val cm = s.table("s10_sink")
        // batch probe: the exact truth the streamed estimates are judged
        // against, re-hashed with the same polynomials (p38's shape)
        val hb = graft.Tables(s, d, "documents")
          .where(size(TextOps.tokens(col("text"))) >= 2)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .transform(graft.Part.pin(col("doc_id"))) // token barrier (p16 rule)
          .select(explode(grams).as("g"))
          .withColumn("b0", polyB(col("g"), 7L, 131))
          .withColumn("b1", polyB(col("g"), 11L, 137))
          .withColumn("b2", polyB(col("g"), 13L, 139))
          .localCheckpoint()
        val ex = hb.groupBy("g").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("g")).limit(20)
        ex.join(hb.select("g", "b0", "b1", "b2").distinct(), "g")
          .select(col("g"), col("cnt"), posexplode(
            array(col("b0"), col("b1"), col("b2"))).as(Seq("r", "bucket")))
          .join(broadcast(cm), Seq("r", "bucket"))
          .groupBy("g", "cnt").agg(min(col("ccnt")).as("est"))
          .select("g", "cnt", "est")
          .orderBy(col("cnt").desc, col("g"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS tk
             |  FROM documents WHERE len(string_split(text,' ')) >= 2),
             |g AS (SELECT unnest(list_transform(range(1, len(tk)),
             |    i -> tk[i] || ' ' || tk[i+1])) AS g FROM t),
             |hb AS (SELECT g,
             |  list_reduce(list_prepend(CAST(7 AS BIGINT),
             |    list_transform(string_split(g,''),
             |      c -> CAST(ord(c) AS BIGINT))),
             |    (acc, x) -> (acc*131 + x) % 1000000007) % 1024 AS b0,
             |  list_reduce(list_prepend(CAST(11 AS BIGINT),
             |    list_transform(string_split(g,''),
             |      c -> CAST(ord(c) AS BIGINT))),
             |    (acc, x) -> (acc*137 + x) % 1000000007) % 1024 AS b1,
             |  list_reduce(list_prepend(CAST(13 AS BIGINT),
             |    list_transform(string_split(g,''),
             |      c -> CAST(ord(c) AS BIGINT))),
             |    (acc, x) -> (acc*139 + x) % 1000000007) % 1024 AS b2
             |  FROM g),
             |cm AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS ccnt
             |  FROM (SELECT unnest([0,1,2]) AS r,
             |    unnest([b0,b1,b2]) AS bucket FROM hb)
             |  GROUP BY r, bucket),
             |ex AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt FROM hb
             |  GROUP BY g ORDER BY cnt DESC, g LIMIT 20),
             |eb AS (SELECT e.g, e.cnt, unnest([0,1,2]) AS r,
             |  unnest([h.b0, h.b1, h.b2]) AS bucket
             |  FROM ex e JOIN (SELECT DISTINCT g, b0, b1, b2 FROM hb) h
             |    USING (g))
             |SELECT eb.g, min(eb.cnt) AS cnt,
             |  CAST(min(cm.ccnt) AS BIGINT) AS est
             |FROM eb JOIN cm USING (r, bucket)
             |GROUP BY eb.g ORDER BY cnt DESC, g""".stripMargin)),

    // ---- s11: streaming weighted priority sample -----------------------
    // p45's deterministic Efraimidis–Spirakis sample maintained BY the
    // stream: the stateless per-row priority (exact BIGINT, see p45)
    // flows into a per-source top-k kept as mapGroupsWithState state.
    // Because top-k under the (prio, doc_id) total order is an
    // associative commutative merge, the drained state equals the batch
    // sample under ANY micro-batch split — so this is that rare thing,
    // a STREAMING sampler with a full DuckDB hash oracle (p45's SQL,
    // verbatim). The 100 TB story: a continuously-ingesting corpus
    // keeps a live, exactly-reproducible quality-audit sample per
    // stratum in O(k) state, no batch re-scan.
    RegQuery("s11_stream_sample",
      (s, d) => {
        import s.implicits._
        val q = withStatePartitions(s, 8) {
          streamDocs(s, d)
            .select(col("source"), col("doc_id"), col("n_chars"),
              expr("((doc_id * 2654435761 + 104729) % 1000000007)" +
                " * 1000000 div n_chars").as("prio"))
            .as[Streams.PrioDoc]
            .transform(Streams.prioritySample(_, 10))
            .writeStream.format("memory").queryName("s11_sink")
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        // n_seen monotone per source → max_by picks the final emission
        s.table("s11_sink")
          .groupBy("source")
          .agg(max_by(col("top"), col("n_seen")).as("top"))
          .select(col("source"), posexplode(col("top")).as(Seq("i", "p")))
          .select(col("source"), (col("i") + 1).as("rk"),
            col("p.doc_id").as("doc_id"), col("p.n_chars").as("n_chars"),
            col("p.prio").as("prio"))
          .orderBy("source", "rk")
      },
      Some("""WITH p AS (SELECT source, doc_id, n_chars,
             |  ((doc_id * 2654435761 + 104729) % 1000000007) * 1000000
             |    // n_chars AS prio FROM documents),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             |  ORDER BY prio, doc_id) AS rk FROM p)
             |SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, n_chars,
             |  prio
             |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin)),

    // ---- s12: streaming token-budget admission --------------------------
    // p47's mix builder as a CONTINUOUS operator: per-row integer
    // micro-score (stateless), then per-source greedy budget admission
    // as mapGroupsWithState whose state is only the admitted prefix —
    // bounded by the budget itself, not the stream length. Admission
    // monotonicity (see Streams.budgetAdmission) makes the drained
    // state equal the batch computation under any micro-batch split,
    // so the continuously-built mix is hash-checked against p47's
    // oracle (budget 800). The 100 TB story: the training mix exists
    // at every moment of ingest, and re-planning a mix after more data
    // lands is a state update, not a corpus re-scan.
    RegQuery("s12_stream_budget",
      (s, d) => {
        import s.implicits._
        import graft.llm.TextOps
        val tk = col("tk")
        val sr = TextOps.stopwordRatio(tk)
        val mw = aggregate(tk, lit(0L), (a, x) => a + length(x))
          .cast("double") / size(tk)
        val z = lit(-3.0) + lit(4.0) * sr + lit(0.5) * mw +
          lit(0.2) * log(2.0, size(tk))
        val u = floor((lit(1.0) / (lit(1.0) + exp(-z))) * 10000 + 0.5)
          .cast("long")
        val q = withStatePartitions(s, 8) {
          streamDocs(s, d)
            .select(col("doc_id"), col("source"),
              TextOps.tokens(col("text")).as("tk"))
            .transform(graft.Part.pin(col("doc_id"))) // token barrier (s08/s09 lesson)
            .select(col("source"), col("doc_id"), u.as("u"),
              size(col("tk")).cast("long").as("n_tok"))
            .as[Streams.BudgetDoc]
            .transform(Streams.budgetAdmission(_, budget = 800L))
            .writeStream.format("memory").queryName("s12_sink")
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table("s12_sink")
          .groupBy("source")
          .agg(max_by(col("admitted"), col("n_seen")).as("admitted"))
          .select(col("source"), explode(col("admitted")).as("a"))
          .select(col("source"), col("a.doc_id").as("doc_id"),
            col("a.u").as("u"), col("a.n_tok").as("n_tok"),
            col("a.cum_tokens").as("cum_tokens"))
          .orderBy("source", "doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, string_split(text,' ')
             |    AS tk FROM documents),
             |f AS (SELECT doc_id, source,
             |  CAST(len(tk) AS BIGINT) AS n_tok,
             |  CAST(floor(1.0/(1.0 + exp(-(
             |  -3.0 + 4.0 * (CAST(len(list_filter(tk, x -> list_contains(
             |      ${graft.llm.TextOps.enStopwords.mkString("['", "','", "']")}, x)))
             |      AS DOUBLE) / len(tk))
             |  + 0.5 * (CAST(list_sum(list_transform(tk, x -> length(x)))
             |      AS DOUBLE) / len(tk))
             |  + 0.2 * log2(len(tk)))))*10000 + 0.5) AS BIGINT) AS u
             |  FROM t),
             |c AS (SELECT *, COALESCE(SUM(n_tok) OVER (
             |    PARTITION BY source ORDER BY u DESC, doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    AS cum_before FROM f)
             |SELECT source, doc_id, u, n_tok,
             |  CAST(cum_before + n_tok AS BIGINT) AS cum_tokens
             |FROM c WHERE cum_before < 800
             |ORDER BY source, doc_id""".stripMargin)),

    // ---- s13: streaming cardinality estimation (HLL registers) ---------
    // q48's deterministic HLL maintained BY the stream: per-source
    // shingle-vocabulary cardinality tracked live as (source, register)
    // → max(rho) in Spark's OWN streaming aggregate. Register max is
    // associative and commutative, so the drained registers equal the
    // batch computation under any micro-batch split — a streaming
    // APPROXIMATE operator with a full DuckDB hash oracle (the s11/s12
    // property applied to sketches; q33/q44's native HLL++ can't do
    // this). Built-in aggregation (not mapGroupsWithState) is the
    // structural choice: the exploded shingle stream is PARTIALLY
    // AGGREGATED map-side before the state shuffle, so only ≤ 64
    // (register, max) partials per source per batch cross the wire,
    // where the former custom-state version shuffled EVERY shingle row
    // into the stateful operator. Local wall time is unchanged (~8.7 s
    // at sf0.1 — the cost is the per-shingle hash chain plus the
    // exact-side string countDistinct, both data-proportional), but on
    // a cluster the state exchange no longer scales with corpus size —
    // that is the property that matters at 100 TB. Per-row
    // work is stateless codegen (poly fold + the q48 xor-shift
    // finalizer — one multiply-mod alone is linear and skews the
    // ranks, see q48); state is 64 rows per stratum FOREVER. The
    // 100 TB story: live dedup-pressure / vocabulary-growth monitoring
    // per source during ingest, registers union losslessly across
    // streams by max, no distinct-set ever materialized.
    RegQuery("s13_stream_hll",
      (s, d) => {
        import s.implicits._
        import graft.llm.TextOps
        val P = 1000000007L
        def polyH(g: Column): Column = TextOps.polyHash(g) // native codegen fold
        val A25 = 2905460551L << 25
        val w = shiftright(col("h"), 6)
        val q = withStatePartitions(s, 8) {
          streamDocs(s, d)
            .select(col("source"), col("doc_id"),
              TextOps.tokens(col("text")).as("tk"))
            .transform(graft.Part.pin(col("doc_id"))) // token barrier (s08/s09 lesson)
            .select(col("source"),
              explode(TextOps.shingles(col("tk"), 3)).as("g"))
            .select(col("source"), polyH(col("g")).as("p"))
            .select(col("source"),
              ((col("p") * 2654435761L + 104729L) % P).as("h1"))
            .select(col("source"),
              (col("h1").bitwiseXOR(shiftright(col("h1"), 15))
                * 1779033703L % P).as("h2"))
            .select(col("source"),
              col("h2").bitwiseXOR(shiftright(col("h2"), 13)).as("h"))
            .select(col("source"),
              col("h").bitwiseAND(lit(63L)).cast("int").as("reg"),
              when(w === 0L, lit(25L))
                .otherwise(bit_count(w.bitwiseAND(-w) - 1) + 1L)
                .cast("int").as("rho"))
            .groupBy("source", "reg").agg(max("rho").as("mr"))
            .writeStream.format("memory").queryName("s13_sink")
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        // update mode re-emits a register row per batch that raised it;
        // max across emissions = the final state (register maxima are
        // monotone). Registers never touched contribute rho 0 = 2^25
        // each, same as the oracle's (64 - count(*)) term.
        val est = s.table("s13_sink").groupBy("source", "reg")
          .agg(max("mr").as("mr"))
          .groupBy("source")
          .agg((sum(expr("shiftleft(cast(1 as bigint), 25 - mr)")) +
            (lit(64L) - count(lit(1))) * lit(33554432L)).as("num"))
          .select(col("source"), expr(s"($A25 div num) div 1000000").as("est"))
        // the repartition barrier matters HERE too: without it the
        // single-file scan builds every shingle string in one task
        // (measured 7.2 s single-threaded vs 1 s spread — the same
        // token-barrier lesson as the stream side)
        val ex = graft.Tables(s, d, "documents")
          .select(col("source"), col("doc_id"),
            TextOps.tokens(col("text")).as("tk"))
          .transform(graft.Part.pin(col("doc_id")))
          .select(col("source"),
            explode(TextOps.shingles(col("tk"), 3)).as("g"))
          .groupBy("source").agg(countDistinct("g").as("exact"))
        est.join(ex, "source")
          .select(col("source"), col("est"), col("exact"),
            expr("abs(est - exact) * 10000 div exact").as("err_bp"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, string_split(text,' ') AS tk
             |  FROM documents),
             |sh AS (SELECT source, unnest(CASE WHEN len(tk) >= 3
             |    THEN list_distinct(list_transform(range(1, len(tk)-1),
             |      i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]))
             |    ELSE [array_to_string(tk, ' ')] END) AS g FROM t),
             |h0 AS (SELECT source, list_reduce(list_prepend(
             |    CAST(7 AS BIGINT), list_transform(string_split(g,''),
             |      c -> CAST(ord(c) AS BIGINT))),
             |    (acc, x) -> (acc*131 + x) % 1000000007) AS p FROM sh),
             |h1 AS (SELECT source,
             |  (p*2654435761 + 104729) % 1000000007 AS h1 FROM h0),
             |hx AS (SELECT source,
             |  (xor(h1, h1 >> 15) * 1779033703) % 1000000007 AS h2 FROM h1),
             |h AS (SELECT source, xor(h2, h2 >> 13) AS h FROM hx),
             |r AS (SELECT source, h % 64 AS reg, h // 64 AS w FROM h),
             |rho AS (SELECT source, reg, CASE WHEN w = 0 THEN 25
             |    ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM r),
             |regs AS (SELECT source, reg, max(rho) AS mr FROM rho
             |  GROUP BY source, reg),
             |est AS (SELECT source, CAST((97491078487212032 //
             |    (sum(CAST(1 AS BIGINT) << CAST(25 - mr AS INTEGER))
             |     + (64 - count(*)) * 33554432)) // 1000000 AS BIGINT)
             |    AS est FROM regs GROUP BY source),
             |ex AS (SELECT source, CAST(count(DISTINCT g) AS BIGINT)
             |    AS exact FROM sh GROUP BY source)
             |SELECT est.source, est, exact,
             |  CAST(abs(est - exact) * 10000 // exact AS BIGINT) AS err_bp
             |FROM est JOIN ex ON est.source = ex.source
             |ORDER BY est.source""".stripMargin)),

    // ---- s14: streaming blocked record linkage -------------------------
    // p54's entity resolution as a CONTINUOUS operator: per-block member
    // lists in mapGroups state, each arriving customer compared against
    // the members already seen, link pairs (levenshtein ≤ 2 within the
    // nation×segment block) emitted exactly once — when the later
    // member arrives. The emitted SET is invariant under micro-batch
    // split, so the drained sink hash-matches the batch blocked join in
    // DuckDB — a streaming JOIN checked by a batch oracle, the s11/s12
    // order-independence property applied to ER. Unlike batch p54 (re-
    // links the world each run), the stream links each NEW record in
    // O(|block|) — the production shape for continuous ingest.
    RegQuery("s14_stream_linkage",
      (s, d) => {
        import s.implicits._
        val q = withStatePartitions(s, 8) {
          streamCustomers(s, d)
            .select(concat_ws("|", col("c_nationkey"),
                col("c_mktsegment")).as("blk"),
              col("c_custkey").as("id"), col("c_name").as("nm"),
              floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
            .as[Streams.CustRow]
            .transform(Streams.linkPairs(_, tau = 2L))
            .writeStream.format("memory").queryName("s14_sink")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table("s14_sink")
          .select(split(col("blk"), "\\|")(0).cast("int").as("nation"),
            col("a_id"), col("b_id"), col("name_lev"), col("bal_diff_c"))
          .orderBy("nation", "a_id", "b_id")
      },
      Some("""SELECT a.c_nationkey AS nation, a.c_custkey AS a_id,
             |  b.c_custkey AS b_id,
             |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_lev,
             |  abs(CAST(floor(a.c_acctbal*100+0.5) AS BIGINT)
             |    - CAST(floor(b.c_acctbal*100+0.5) AS BIGINT)) AS bal_diff_c
             |FROM customer a JOIN customer b
             |  ON a.c_nationkey = b.c_nationkey
             |  AND a.c_mktsegment = b.c_mktsegment
             |  AND a.c_custkey < b.c_custkey
             |WHERE levenshtein(a.c_name, b.c_name) <= 2
             |ORDER BY nation, a_id, b_id""".stripMargin)),

    // ---- s15: streaming running moments (integer-exact Welford) --------
    // Live per-key mean/variance at ingest — the anomaly-detection
    // substrate (alert when a key's value drifts from its running
    // distribution). Float Welford state (mean, M2) can NEVER be
    // oracle-checked exactly (accumulation order differs per split);
    // the fix is the s13 determinization move applied to moments:
    // values scale to exact milli integers BEFORE the stateful op, and
    // state is the exact (n, Σv, Σv²) — order-free, so ANY micro-batch
    // split reaches the identical final state, and mean/variance derive
    // from the integers by one closed formula both engines share
    // (var_micro = (n·Σv² − (Σv)²) div n², the population variance in
    // micro units). 32 bytes of RocksDB state per key forever; bounds
    // checked: |v_milli| ≤ 6·10⁵ here, so Σv² per key stays ~10¹⁵ —
    // int64-safe to ~10⁶ events per key at this value scale.
    RegQuery("s15_stream_moments",
      (s, d) => {
        import s.implicits._
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.userMoments(streamEvents(s, d)
                .select(col("user_id"),
                  floor(col("value") * 1000 + 0.5).cast("long").as("vm"))
                .as[(Long, Long)])
              .writeStream.format("memory").queryName("s15_sink")
              .outputMode("update").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          // n grows monotonically → the n-max row per user is final state
          s.table("s15_sink").groupBy("user_id")
            .agg(max("n").as("n"),
              max_by(col("sum_milli"), col("n")).as("sum_milli"),
              max_by(col("sumsq_milli"), col("n")).as("sumsq_milli"))
            .select(col("user_id"), col("n"), col("sum_milli"),
              col("sumsq_milli"),
              expr("sum_milli div n").as("mean_milli"),
              expr("(n * sumsq_milli - sum_milli * sum_milli)" +
                " div (n * n)").as("var_micro"))
            .orderBy("user_id")
        }
      },
      Some("""WITH v AS (SELECT user_id,
             |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
             |  FROM events),
             |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(vm) AS BIGINT) AS sum_milli,
             |    CAST(sum(vm * vm) AS BIGINT) AS sumsq_milli
             |  FROM v GROUP BY user_id)
             |SELECT user_id, n, sum_milli, sumsq_milli,
             |  sum_milli // n AS mean_milli,
             |  (n * sumsq_milli - sum_milli * sum_milli) // (n * n)
             |    AS var_micro
             |FROM m ORDER BY user_id""".stripMargin)),

    // ---- s16: streaming first-touch funnel ------------------------------
    // The conversion funnel maintained live: per-user earliest view /
    // click / purchase times in 24 bytes of state, completion =
    // first-view < first-click < first-purchase. Deliberately
    // FIRST-TOUCH semantics (three independent mins) rather than q42's
    // staged-min: min is order-free, so the final state is invariant
    // under any micro-batch split or arrival reordering — the property
    // that lets a streaming funnel be hash-checked against a batch
    // oracle at all (q42's "click after the final min view" gate would
    // need unbounded click history to re-admit under reordering).
    // Batch-side finalize folds update-mode emissions with the same
    // min (-1 = unseen → null), so multi-batch runs land on the
    // identical answer.
    RegQuery("s16_stream_funnel",
      (s, d) => {
        import s.implicits._
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.funnelTouches(streamEvents(s, d)
                .select(col("user_id"), col("event_type"),
                  floor(unix_millis(col("ts")) / 1000.0).cast("long").as("t"))
                .as[(Long, String, Long)])
              .writeStream.format("memory").queryName("s16_sink")
              .outputMode("update").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          s.table("s16_sink").groupBy("user_id")
            .agg(min(nullif(col("t_view"), lit(-1L))).as("t_view"),
              min(nullif(col("t_click"), lit(-1L))).as("t_click"),
              min(nullif(col("t_purchase"), lit(-1L))).as("t_purchase"))
            .withColumn("completed",
              coalesce(col("t_view") < col("t_click") &&
                col("t_click") < col("t_purchase"), lit(false)))
            .orderBy("user_id")
        }
      },
      Some("""WITH e AS (SELECT user_id, event_type,
             |    epoch_ms(ts) // 1000 AS t FROM events),
             |m AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN t END) AS t_view,
             |    min(CASE WHEN event_type = 'click' THEN t END) AS t_click,
             |    min(CASE WHEN event_type = 'purchase' THEN t END)
             |      AS t_purchase
             |  FROM e GROUP BY user_id)
             |SELECT user_id, t_view, t_click, t_purchase,
             |  coalesce(t_view < t_click AND t_click < t_purchase, false)
             |    AS completed
             |FROM m ORDER BY user_id""".stripMargin)),

    // ---- s17: streaming mergeable quantile sketch ----------------------
    // q58's dyadic price histogram maintained BY the stream: bucket
    // counts are the sketch, count is associative/commutative, so the
    // built-in streaming aggregate (s13's shape — map-side partials,
    // ≤ ~1.2k (flag, bucket) state rows forever) drains to exactly the
    // batch sketch under any micro-batch split. Quantile finalize and
    // the merged-ALL row run batch-side over the drained bucket rows;
    // the oracle is q58's — built from the RAW rows — so the hash
    // compare proves end to end that continuous maintenance + sketch
    // merge loses nothing vs scanning the data at rest. The streaming
    // percentile monitor (price/latency SLO dashboards at ingest time)
    // with an exact cross-engine correctness witness.
    RegQuery("s17_stream_quantile_sketch",
      (s, d) => {
        val q = withStatePartitions(s, 8) {
          streamLineitem(s, d)
            .select(col("l_returnflag").as("flag"),
              expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)" +
                " div 8192").as("b"))
            .groupBy("flag", "b").agg(count(lit(1)).as("c"))
            .writeStream.format("memory").queryName("s17_sink")
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        // update-mode re-emissions carry the running count — monotone,
        // so max per (flag, b) is the final state
        val sk = s.table("s17_sink").groupBy("flag", "b")
          .agg(max("c").as("c")).localCheckpoint()
        val merged = sk.groupBy("b").agg(sum("c").as("c"))
          .select(lit("ALL").as("flag"), col("b"), col("c"))
        val win = Window.partitionBy("flag").orderBy("b")
        val tot = Window.partitionBy("flag")
        sk.select(col("flag"), col("b"), col("c")).unionAll(merged)
          .select(col("flag"), col("b"), col("c"),
            sum("c").over(win).as("cum"), sum("c").over(tot).as("n"))
          .groupBy("flag")
          .agg(max("n").as("n_rows"),
            min(when(col("cum") * 2 >= col("n"), col("b"))).as("b50"),
            min(when(col("cum") * 10 >= col("n") * 9, col("b"))).as("b90"),
            min(when(col("cum") * 100 >= col("n") * 99, col("b"))).as("b99"))
          .select(col("flag"), col("n_rows"),
            ((col("b50") + 1) * 8192 - 1).as("p50_cents_ub"),
            ((col("b90") + 1) * 8192 - 1).as("p90_cents_ub"),
            ((col("b99") + 1) * 8192 - 1).as("p99_cents_ub"))
          .orderBy("flag")
      },
      Some("""WITH li AS (SELECT l_returnflag AS flag,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 8192
             |      AS b
             |  FROM lineitem),
             |sk AS (SELECT flag, b, count(*) AS c FROM li GROUP BY 1, 2
             |  UNION ALL SELECT 'ALL', b, count(*) FROM li GROUP BY b),
             |cm AS (SELECT flag, b, c,
             |    sum(c) OVER (PARTITION BY flag ORDER BY b) AS cum,
             |    sum(c) OVER (PARTITION BY flag) AS n FROM sk)
             |SELECT flag, CAST(max(n) AS BIGINT) AS n_rows,
             |  (min(CASE WHEN cum*2 >= n THEN b END) + 1)*8192 - 1
             |    AS p50_cents_ub,
             |  (min(CASE WHEN cum*10 >= n*9 THEN b END) + 1)*8192 - 1
             |    AS p90_cents_ub,
             |  (min(CASE WHEN cum*100 >= n*99 THEN b END) + 1)*8192 - 1
             |    AS p99_cents_ub
             |FROM cm GROUP BY flag ORDER BY flag""".stripMargin)),

    // ---- s18: streaming EXACT distinct via block bitmaps ---------------
    // q59 maintained BY the stream — the fourth streamed sketch beside
    // s10 (count-min), s13 (HLL) and s17 (quantile histogram), and the
    // only EXACT one: per (flag, 63-key block) membership bitmaps under
    // bit_or, associative/commutative, so the built-in streaming
    // aggregate drains to exactly the batch bitmaps under any
    // micro-batch split. State is one BIGINT per touched block —
    // bounded by the key RANGE, not the row count — and OR-merge makes
    // the count re-aggregatable downstream (the q59 'ALL' proof, here
    // built from state the STREAM accumulated). Continuous exact
    // distinct-order tracking per flag at ingest time, full oracle.
    RegQuery("s18_stream_bitmap_distinct",
      (s, d) => {
        val q = withStatePartitions(s, 8) {
          streamLineitem(s, d)
            .select(col("l_returnflag").as("flag"),
              expr("l_orderkey div 63").as("blk"),
              expr("shiftleft(cast(1 as bigint)," +
                " cast(l_orderkey % 63 as int))").as("bit"))
            .groupBy("flag", "blk").agg(bit_or(col("bit")).as("bm"))
            .writeStream.format("memory").queryName("s18_sink")
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        // update-mode re-emissions only ever ADD bits → bit_or across
        // emissions = final state
        val bm = s.table("s18_sink").groupBy("flag", "blk")
          .agg(bit_or(col("bm")).as("bm")).localCheckpoint()
        val merged = bm.groupBy("blk").agg(bit_or(col("bm")).as("bm"))
          .select(lit("ALL").as("flag"), col("blk"), col("bm"))
        bm.select(col("flag"), col("blk"), col("bm")).unionAll(merged)
          .groupBy("flag")
          .agg(count(lit(1)).as("n_blocks"),
            sum(bit_count(col("bm"))).as("n_distinct"))
          .orderBy("flag")
      },
      Some("""WITH b AS (SELECT l_returnflag AS flag, l_orderkey // 63
             |      AS blk,
             |    (CAST(1 AS BIGINT) << CAST(l_orderkey % 63 AS INTEGER))
             |      AS bit
             |  FROM lineitem),
             |bm AS (SELECT flag, blk, bit_or(bit) AS bm FROM b
             |    GROUP BY 1, 2
             |  UNION ALL SELECT 'ALL', blk, bit_or(bit) FROM b GROUP BY blk)
             |SELECT flag, CAST(count(*) AS BIGINT) AS n_blocks,
             |  CAST(sum(bit_count(bm)) AS BIGINT) AS n_distinct
             |FROM bm GROUP BY flag ORDER BY flag""".stripMargin)),

    // ---- s19: streaming event-transition matrix ------------------------
    // q55 maintained BY the stream: Streams.TransitionProcessor keeps
    // ONE row of state per user (the last-seen (ts, event_id, type)
    // tail), sorts each micro-batch's rows per user, and emits the
    // adjacent (from→to) pairs — so the Markov transition counts are
    // live at ingest with O(|users|) state, not a buffered history.
    // Exactness contract (docstring'd on the processor): per-user
    // ts-monotone batch arrival — the log-ingest shape; StreamsSpec
    // pins equality across a ts-boundary micro-batch split. The final
    // normalization to ppm is the same integer window as q55, so the
    // full q55 oracle hash-checks the drained pair stream.
    RegQuery("s19_stream_transition",
      (s, d) => {
        import s.implicits._
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.transitionPairs(streamEvents(s, d)
                .select(col("user_id"), unix_micros(col("ts")).as("ts_micro"),
                  col("event_id"), col("event_type").as("et"))
                .as[Streams.TransRow])
              .writeStream.format("memory").queryName("s19_sink")
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          val tr = s.table("s19_sink")
            .groupBy(col("from_type"), col("to_type"))
            .agg(count(lit(1)).as("cnt"))
          tr.withColumn("row_tot",
              sum("cnt").over(Window.partitionBy("from_type")))
            .select(col("from_type"), col("to_type"), col("cnt"),
              expr("cnt * 1000000 div row_tot").as("p_ppm"))
            .orderBy("from_type", "to_type")
        }
      },
      Some("""WITH seq AS (SELECT event_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS next_type
             |  FROM events),
             |tr AS (SELECT event_type AS from_type, next_type AS to_type,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM seq WHERE next_type IS NOT NULL
             |  GROUP BY event_type, next_type)
             |SELECT from_type, to_type, cnt,
             |  CAST(cnt * 1000000
             |      // (sum(cnt) OVER (PARTITION BY from_type)) AS BIGINT)
             |    AS p_ppm
             |FROM tr ORDER BY from_type, to_type""".stripMargin)),

    // ---- s20: streaming sequence packing -------------------------------
    // p39 maintained BY the stream: Streams.PackProcessor holds ONE
    // long of state per source (tokens packed so far) and assigns each
    // landing doc its (seq_id, off) slot — training sequences pack at
    // ingest time instead of via a corpus-wide window pass. Ordering
    // contract as s19 (per-source doc_id-monotone arrival; in-batch
    // sort); the full p39 oracle hash-checks the drained assignment.
    RegQuery("s20_stream_packing",
      (s, d) => {
        import s.implicits._
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.packSequences(streamDocs(s, d)
                .select(col("source"), col("doc_id"),
                  size(graft.llm.TextOps.tokens(col("text")))
                    .cast("long").as("n_tok"))
                .as[Streams.PackRow], cap = 2048L)
              .writeStream.format("memory").queryName("s20_sink")
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          s.table("s20_sink")
            .select("doc_id", "source", "n_tok", "seq_id", "off")
            .orderBy("source", "doc_id")
        }
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (SELECT doc_id, source, n_tok,
             |  sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             |    ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before FROM t)
             |SELECT doc_id, source, n_tok,
             |  CAST(cum_before // 2048 AS BIGINT) AS seq_id,
             |  CAST(cum_before % 2048 AS BIGINT) AS off
             |FROM c ORDER BY source, doc_id""".stripMargin)),

    // ---- s21: streaming incremental aggregate maintenance --------------
    // q62's materialized-view discipline run BY the stream — the one
    // round-5 family that had no streaming twin. The lineitem corpus
    // is staged as TWO files (q62's base/delta epochs) and consumed
    // with maxFilesPerTrigger=1, so foreachBatch fires once per epoch
    // and each firing APPENDS that micro-batch's ALGEBRAIC partials
    // (n, Σqty, Σcents per (flag, status)) to the persisted summary —
    // merge-on-read, the GraphStore append discipline applied to a
    // materialized view: each epoch costs one |batch| aggregate + a
    // bounded write, the corpus is never re-scanned, and a compactor
    // can fold the summary dir at leisure because sum-of-partials is
    // associative under ANY micro-batch split. The drain-time fold +
    // derived averages hash-check against q62's oracle, which
    // recomputes from ALL raw rows.
    RegQuery("s21_stream_incremental_agg",
      (s, d) => {
        val stagePath = Scratch.path(s, "s21_epochs", d)
        val sumPath = Scratch.path(s, "s21_summary", d)
        Scratch.clear(s, stagePath, sumPath)
        // stage the two epochs: base (7/8 of orders) then the delta
        val li = graft.Tables(s, d, "lineitem")
          .select(lineitemSchema.map(f => col(f.name)): _*)
        li.where(col("l_orderkey") % 8 =!= 7).coalesce(1)
          .write.mode("append").parquet(stagePath)
        li.where(col("l_orderkey") % 8 === 7).coalesce(1)
          .write.mode("append").parquet(stagePath)
        val q = withStatePartitions(s, 8) {
          s.readStream.schema(lineitemSchema)
            .option("maxFilesPerTrigger", "1").parquet(stagePath)
            .writeStream
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              // exactly-once under replay: the partial is keyed by its
              // batchId partition and written as a DYNAMIC overwrite,
              // so a micro-batch replayed after a mid-commit failure
              // REWRITES its own partition instead of double-counting
              // (the StreamingSpec replay-idempotence pattern)
              batch
                .groupBy(col("l_returnflag").as("flag"),
                  col("l_linestatus").as("status"))
                .agg(count(lit(1)).as("n"),
                  sum(expr("cast(l_quantity as bigint)")).as("sum_qty"),
                  sum(expr(
                    "cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
                    .as("sum_cents"))
                .withColumn("batch_id", lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id").parquet(sumPath)
              ()
            }
            .trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        // merge-on-read fold of the appended per-epoch partials, then
        // the same closed-form averages as q62
        s.read.parquet(sumPath)
          .groupBy("flag", "status")
          .agg(sum("n").as("n"), sum("sum_qty").as("sum_qty"),
            sum("sum_cents").as("sum_cents"))
          .select(col("flag"), col("status"), col("n"), col("sum_qty"),
            col("sum_cents"),
            expr("sum_qty * 1000 div n").as("avg_qty_milli"),
            expr("sum_cents div n").as("avg_price_cents"))
          .orderBy("flag", "status")
      },
      Some("""SELECT l_returnflag AS flag, l_linestatus AS status,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             |    AS BIGINT) AS sum_cents,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) * 1000 // count(*)
             |    AS BIGINT) AS avg_qty_milli,
             |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             |    // count(*) AS BIGINT) AS avg_price_cents
             |FROM lineitem GROUP BY 1, 2 ORDER BY flag, status""".stripMargin)),

    // ---- s22: streaming as-of enrichment -------------------------------
    // The as-of join family's third arm (q24 composed window, q63
    // custom exec, s22 the stream): Streams.AsOfProcessor keeps ONE
    // long of state per user (the last view's event_id) and stamps
    // each landing click with it — event attribution computed AT
    // INGEST with O(|users|) state, no merged-history window, no join
    // buffer. Ordering contract as s19/s20 (per-user ts-monotone batch
    // arrival; in-batch (ts, event_id) sort); StreamsSpec pins
    // split-invariance across a ts-boundary micro-batch split. The
    // drained click stream hash-checks against q24's UNCHANGED oracle,
    // so all three arms are checked by the same SQL.
    RegQuery("s22_stream_asof",
      (s, d) => {
        import s.implicits._
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.asOfEnrich(streamEvents(s, d)
                .select(col("user_id"), unix_micros(col("ts")).as("ts_micro"),
                  col("event_id"), col("event_type").as("et"))
                .as[Streams.TransRow])
              .writeStream.format("memory").queryName("s22_sink")
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          s.table("s22_sink").select("event_id", "last_view")
            .orderBy("event_id")
        }
      },
      Some("""SELECT event_id, last_view FROM (
             |  SELECT event_id, event_type,
             |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view
             |  FROM events)
             |WHERE event_type = 'click' ORDER BY event_id""".stripMargin)),

    // ---- s23: streaming Bloom membership filter -------------------------
    // p37's decontamination bloom maintained BY the stream — the fifth
    // streamed sketch beside s10/s13/s17/s18, and the second EXACT-
    // state one: the benchmark docs stream in and the 65536-bit filter
    // accumulates as (block, bitmap) rows under bit_or (associative/
    // commutative → same bits under ANY micro-batch split; state is
    // bounded by the FILTER SIZE — ≤ 1040 block rows — not the stream
    // length). At drain the corpus probes the streamed filter exactly
    // as p37 probes its batch-built one (both polynomial bit
    // positions set → bloom hit), and the full p37 oracle — including
    // every FALSE POSITIVE — hash-checks that the stream-accumulated
    // filter is bit-identical to building it at rest.
    RegQuery("s23_stream_bloom",
      (s, d) => {
        def polyBits(g: Column, seed: Long, mult: Int): Column =
          (graft.llm.TextOps.polyHash(g, seed, mult) % 65536).cast("long")
        val q = withStatePartitions(s, 8) {
          streamDocs(s, d)
            .where(col("doc_id") % 97 === 0)
            .select(col("doc_id"),
              graft.llm.TextOps.tokens(col("text")).as("tk"))
            .where(size(col("tk")) >= 3)
            .select(explode(graft.llm.TextOps.shingles(col("tk"), 3))
              .as("g"))
            .select(explode(array(polyBits(col("g"), 7L, 131),
              polyBits(col("g"), 11L, 137))).as("bit"))
            .select(expr("bit div 63").as("blk"),
              expr("shiftleft(cast(1 as bigint), cast(bit % 63 as int))")
                .as("m"))
            .groupBy("blk").agg(bit_or(col("m")).as("bm"))
            .writeStream.format("memory").queryName("s23_sink")
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        // update-mode re-emissions only ever ADD bits → bit_or = state
        val bits = s.table("s23_sink").groupBy("blk")
          .agg(bit_or(col("bm")).as("bm"))
          .select(col("blk"), explode(expr(
            "filter(sequence(0, 62)," +
              " i -> (shiftright(bm, cast(i as int)) & 1) = 1)")).as("i"))
          .select((col("blk") * 63 + col("i")).as("bit"))
          .localCheckpoint()
        // batch-side probe — p37's shape, against the STREAMED filter
        val grams = graft.Tables(s, d, "documents")
          .select(col("doc_id"), graft.llm.TextOps.tokens(col("text"))
            .as("tk"))
          .where(size(col("tk")) >= 3)
          .transform(graft.Part.pin(col("doc_id")))
          .select(col("doc_id"),
            explode(graft.llm.TextOps.shingles(col("tk"), 3)).as("g"))
          .withColumn("b1", polyBits(col("g"), 7L, 131))
          .withColumn("b2", polyBits(col("g"), 11L, 137))
          .localCheckpoint()
        val bench = grams.where(col("doc_id") % 97 === 0)
        val gb = grams
          .join(broadcast(bits.select(col("bit").as("b1"))),
            Seq("b1"), "left_semi")
          .join(broadcast(bits.select(col("bit").as("b2"))),
            Seq("b2"), "left_semi")
          .select("doc_id").distinct().withColumn("bloom_hit", lit(1))
        val ex = grams
          .join(broadcast(bench.select("g").distinct()), "g")
          .select("doc_id").distinct().withColumn("exact_hit", lit(1))
        graft.Tables(s, d, "documents").select("doc_id")
          .join(gb, Seq("doc_id"), "left")
          .join(ex, Seq("doc_id"), "left")
          .na.fill(0, Seq("bloom_hit", "exact_hit"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS tk
             |  FROM documents WHERE len(string_split(text,' ')) >= 3),
             |g AS (SELECT doc_id, unnest(list_distinct(
             |    list_transform(range(1, len(tk)-1),
             |      i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]))) AS g FROM t),
             |hb AS (SELECT doc_id, g,
             |  list_reduce(list_prepend(CAST(7 AS BIGINT),
             |    list_transform(string_split(g,''),
             |      c -> CAST(ord(c) AS BIGINT))),
             |    (acc, x) -> (acc*131 + x) % 1000000007) % 65536 AS b1,
             |  list_reduce(list_prepend(CAST(11 AS BIGINT),
             |    list_transform(string_split(g,''),
             |      c -> CAST(ord(c) AS BIGINT))),
             |    (acc, x) -> (acc*137 + x) % 1000000007) % 65536 AS b2
             |  FROM g),
             |bench AS (SELECT * FROM hb WHERE doc_id % 97 = 0),
             |bits AS (SELECT DISTINCT bit FROM (
             |  SELECT b1 AS bit FROM bench UNION ALL SELECT b2 FROM bench)),
             |gb AS (SELECT DISTINCT doc_id FROM hb
             |  WHERE b1 IN (SELECT bit FROM bits)
             |    AND b2 IN (SELECT bit FROM bits)),
             |ex AS (SELECT DISTINCT h.doc_id FROM hb h
             |  JOIN (SELECT DISTINCT g FROM bench) b USING (g))
             |SELECT d.doc_id,
             |  CAST(CASE WHEN gb.doc_id IS NOT NULL THEN 1 ELSE 0 END
             |    AS INTEGER) AS bloom_hit,
             |  CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END
             |    AS INTEGER) AS exact_hit
             |FROM documents d LEFT JOIN gb ON d.doc_id = gb.doc_id
             |LEFT JOIN ex ON d.doc_id = ex.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- s24: streaming sessionization ---------------------------------
    // The sessionize family's third arm (q41 composed window, q66
    // custom exec, s24 the stream): Streams.SessProcessor keeps TWO
    // longs of state per user (last gap value, session counter) —
    // SessionizeExec's cursor lifted into transformWithState — and
    // stamps every event's session id at ingest, no window buffer, no
    // batch boundary. Ordering contract as s19/s20/s22; StreamsSpec
    // pins a session spanning a micro-batch split. The drained rows
    // aggregate to q41's UNCHANGED oracle, so one SQL checks all
    // three arms.
    RegQuery("s24_stream_sessionize",
      (s, d) => {
        import s.implicits._
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.sessionize(streamEvents(s, d)
                .select(col("user_id"),
                  expr("unix_millis(ts) div 1000").as("tsec"),
                  col("event_id"))
                .as[Streams.SessRow], gap = 1800L)
              .writeStream.format("memory").queryName("s24_sink")
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          s.table("s24_sink")
            .groupBy("user_id", "sid")
            .agg(count(lit(1)).as("n_events"),
              (max(col("tsec")) - min(col("tsec"))).as("dur_s"))
            .orderBy("user_id", "sid")
        }
      },
      Some("""WITH g AS (SELECT user_id, event_id, ts,
             |  CASE WHEN lag(ts) OVER w IS NULL
             |         OR epoch_ms(ts)//1000 - epoch_ms(lag(ts) OVER w)//1000 > 1800
             |       THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, ts, SUM(brk) OVER (
             |  PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g)
             |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n_events,
             |  max(epoch_ms(ts)//1000) - min(epoch_ms(ts)//1000) AS dur_s
             |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin)),

    // ---- s25: streaming RETRACTION maintenance (CDC deletes/updates) ---
    // Completes the MV lifecycle's streaming arm: s21 streams INSERT
    // epochs; this streams q64's delete/update fold — a CDC feed whose
    // rows carry a SIGN (+1 insert, -1 retract; an update is a -1/+1
    // pair), staged as three files (base inserts, the %10==3 purge, the
    // %10==4 reprice pairs) and consumed with maxFilesPerTrigger=1 so
    // foreachBatch fires once per epoch. Each firing appends that
    // micro-batch's SIGNED algebraic partials — the identical fold s21
    // uses, no retraction special-casing, because signed partials are
    // associative under ANY micro-batch split. HAVING n > 0 at the
    // drain-time read retires groups the retractions emptied. q64's
    // UNCHANGED full-recompute oracle hash-checks the result, so the
    // batch fold (q64) and the streamed fold (this) are checked by one
    // SQL.
    RegQuery("s25_stream_retract",
      (s, d) => {
        val stagePath = Scratch.path(s, "s25_cdc", d)
        val sumPath = Scratch.path(s, "s25_summary", d)
        Scratch.clear(s, stagePath, sumPath)
        // stage the CDC feed pre-cast: (sign, flag, status, qty, cents)
        val li = graft.Tables(s, d, "lineitem")
        def cdc(df: DataFrame, sign: Int) = df.select(
          lit(sign.toLong).as("sign"),
          col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
          expr("cast(l_quantity as bigint)").as("qty"),
          expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")
            .as("cents"))
        // epoch 1: full corpus as inserts
        cdc(li, 1).coalesce(1).write.mode("append").parquet(stagePath)
        // epoch 2: the GDPR purge as retractions
        cdc(li.where(col("l_orderkey") % 10 === 3), -1)
          .coalesce(1).write.mode("append").parquet(stagePath)
        // epoch 3: the reprice as retract/insert pairs in ONE batch
        cdc(li.where(col("l_orderkey") % 10 === 4), -1)
          .unionAll(cdc(li.where(col("l_orderkey") % 10 === 4)
            .withColumn("l_quantity", col("l_quantity") + 1), 1))
          .coalesce(1).write.mode("append").parquet(stagePath)
        val cdcSchema = StructType(Seq(
          StructField("sign", LongType), StructField("flag", StringType),
          StructField("status", StringType), StructField("qty", LongType),
          StructField("cents", LongType)))
        val q = withStatePartitions(s, 8) {
          s.readStream.schema(cdcSchema)
            .option("maxFilesPerTrigger", "1").parquet(stagePath)
            .writeStream
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              // signed partials keyed by batchId + dynamic overwrite —
              // a replayed retraction batch rewrites, never re-retracts
              batch.groupBy("flag", "status")
                .agg(sum("sign").as("n"),
                  sum(col("sign") * col("qty")).as("sum_qty"),
                  sum(col("sign") * col("cents")).as("sum_cents"))
                .withColumn("batch_id", lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id").parquet(sumPath)
              ()
            }
            .trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.read.parquet(sumPath)
          .groupBy("flag", "status")
          .agg(sum("n").as("n"), sum("sum_qty").as("sum_qty"),
            sum("sum_cents").as("sum_cents"))
          .where(col("n") > 0)
          .select(col("flag"), col("status"), col("n"), col("sum_qty"),
            col("sum_cents"),
            expr("sum_qty * 1000 div n").as("avg_qty_milli"))
          .orderBy("flag", "status")
      },
      Some("""SELECT l_returnflag AS flag, l_linestatus AS status,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(CASE WHEN l_orderkey % 10 = 4
             |      THEN l_quantity + 1 ELSE l_quantity END AS BIGINT))
             |    AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             |    AS BIGINT) AS sum_cents,
             |  CAST(sum(CAST(CASE WHEN l_orderkey % 10 = 4
             |      THEN l_quantity + 1 ELSE l_quantity END AS BIGINT))
             |    * 1000 // count(*) AS BIGINT) AS avg_qty_milli
             |FROM lineitem WHERE l_orderkey % 10 <> 3
             |GROUP BY 1, 2 ORDER BY flag, status""".stripMargin)),

    // ---- s26: streaming kNN enrichment (the ANN family's stream arm) ---
    // New vectors arriving on a stream are enriched with their top-k
    // corpus neighbors AT INGEST: the IVF is trained once in batch
    // (Pipeline.ivfAssign — centroids broadcast, corpus assignment
    // localCheckpointed), then each micro-batch of probes assigns its
    // nprobe cells against the 8-row centroid table and equi-joins the
    // STATIC assignment by cell — per-batch cost ~|batch|·cellSize,
    // the corpus never rescans, no stream state at all (each probe's
    // top-k is complete within its own batch, so per-batch ranking is
    // exact under ANY split — proven by staging the probe set as 3
    // files consumed one per trigger). The drained enrichment
    // hash-matches p83's UNCHANGED kNN-graph oracle: one SQL now
    // checks the batch build AND the streamed serving path.
    RegQuery("s26_stream_knn",
      (s, d) => {
        val stagePath = Scratch.path(s, "s26_probes", d)
        val outPath = Scratch.path(s, "s26_knn", d)
        Scratch.clear(s, stagePath, outPath)
        val e = graft.Tables(s, d, "embeddings").select(col("vec_id"),
          graft.llm.VectorOps.toDouble(col("embedding")).as("v"))
        val (assigned0, cents) = Pipeline.ivfAssign(e, 8)
        val assigned = assigned0.localCheckpoint() // probe target, fixed
        // stage the probe stream as 3 files → 3 micro-batches
        for (m <- 0 to 2)
          e.where(col("vec_id") % 3 === m).coalesce(1)
            .write.mode("append").parquet(stagePath)
        val probeSchema = StructType(Seq(
          StructField("vec_id", LongType),
          StructField("v", ArrayType(DoubleType))))
        val q = withStatePartitions(s, 8) {
          s.readStream.schema(probeSchema)
            .option("maxFilesPerTrigger", "1").parquet(stagePath)
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              val probes = Pipeline.ivfNearest(batch, cents, 2)
                .select(col("vec_id").as("q_id"), col("v").as("qv"),
                  col("c_id").as("cell"))
              // salted (r10): the 8-cell join coalesces to one task per
              // batch and serializes ~330k cosine evals (Part.saltedJoin
              // scaladoc; same fix as the batch knn/semdedup arms)
              graft.Part.saltedJoin(probes, assigned, "cell", col("q_id"))
                .where(col("q_id") =!= col("vec_id"))
                .withColumn("cos_r", Pipeline.ivfSim6(col("qv"), col("v")))
                .withColumn("rank", row_number().over(
                  Window.partitionBy("q_id")
                    .orderBy(col("cos_r").desc, col("vec_id"))))
                .where(col("rank") <= 3)
                .select(col("q_id"), col("rank"),
                  col("vec_id").as("n_id"), col("cos_r"))
                .write.mode("append").parquet(outPath)
              ()
            }
            .trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.read.parquet(outPath)
          .select(col("q_id"), col("rank").cast("int").as("rank"),
            col("n_id"), col("cos_r"))
          .orderBy("q_id", "rank")
      },
      Some(Pipeline.knnGraphOracle)),

    // ---- s27: streaming SemDeDup (ingest-time semantic dedup) ----------
    // p85's cluster-local rule run BY the stream: rows keyed by IVF
    // cell, state = every member seen so far in the cell — the rare
    // list-state whose bound is a DESIGN CONSTANT (cell size, which
    // the IVF holds ~fixed at any corpus scale by growing K with N).
    // A landing doc compares against all prior same-cell members
    // (dropped docs remain witnesses — exactly p85's ∃ a<b rule),
    // takes the smallest ≥0.99 witness as canonical, and joins the
    // state. Probes staged as 3 id-range files (sources before twins,
    // one per trigger), so twin resolution crosses micro-batch
    // boundaries through state. p85's UNCHANGED oracle hash-checks the
    // drained dispositions: one SQL checks the batch rule and the
    // streamed rule.
    RegQuery("s27_stream_semdedup",
      (s, d) => {
        import s.implicits._
        val stagePath = Scratch.path(s, "s27_members", d)
        Scratch.clear(s, stagePath)
        val e = Pipeline.semDedupInput(s, d)
        val (assigned0, _) = Pipeline.ivfAssign(e, 8)
        val assigned = assigned0.localCheckpoint()
        // id-ordered ranges → per-cell id-monotone arrival; the twins
        // (ids ≥ 1e6) land strictly AFTER their sources
        for ((lo, hi) <- Seq((0L, 170L), (170L, 1000000L),
            (1000000L, Long.MaxValue)))
          assigned.where(col("vec_id") >= lo && col("vec_id") < hi)
            .select("cell", "vec_id", "v").coalesce(1)
            .write.mode("append").parquet(stagePath)
        val semSchema = StructType(Seq(
          StructField("cell", LongType), StructField("vec_id", LongType),
          StructField("v", ArrayType(DoubleType))))
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.semDeDup(s.readStream.schema(semSchema)
                .option("maxFilesPerTrigger", "1").parquet(stagePath)
                .as[Streams.SemRow], threshold = 0.99)
              .writeStream.format("memory").queryName("s27_sink")
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          s.table("s27_sink").select("vec_id", "kept", "canonical")
            .orderBy("vec_id")
        }
      },
      Some(Pipeline.semDedupOracle)),

    // ---- s28: streaming CDC chunk dedup --------------------------------
    // p86's chunker run ON the stream (map-only, so it simply rides the
    // streaming plan) with first-seen ownership in state: one
    // (doc_id, chunk_idx) per distinct chunk hash — the exact-dedup
    // ledger a CDC-chunked firehose maintains at ingest. Docs staged as
    // 3 id-range files (one per trigger), so a chunk's owner and its
    // dups can land in different micro-batches and resolve through
    // state. Oracle = the batch argmin over p86's shared chunk CTE
    // (first occurrence by (doc_id, chunk_idx)), so one SQL checks the
    // chunker AND the streamed ledger.
    RegQuery("s28_stream_chunk_dedup",
      (s, d) => {
        import s.implicits._
        val stagePath = Scratch.path(s, "s28_docs", d)
        Scratch.clear(s, stagePath)
        val docs = graft.Tables(s, d, "documents")
          .select("doc_id", "text")
        for ((lo, hi) <- Seq((0L, 170L), (170L, 340L),
            (340L, Long.MaxValue)))
          docs.where(col("doc_id") >= lo && col("doc_id") < hi)
            .coalesce(1).write.mode("append").parquet(stagePath)
        val docSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType)))
        Streams.withRocksDB(s) {
          val q = withStatePartitions(s, 8) {
            Streams.chunkDedup(Pipeline.cdcChunks(
                s.readStream.schema(docSchema)
                  .option("maxFilesPerTrigger", "1").parquet(stagePath))
              .select(col("chunk_hash"), col("doc_id"), col("chunk_idx"))
              .as[Streams.ChunkRow])
              .writeStream.format("memory").queryName("s28_sink")
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          s.table("s28_sink")
            .select(col("doc_id"), col("chunk_idx"), col("chunk_hash"),
              col("dup"), col("owner_doc"),
              col("owner_idx").cast("int").as("owner_idx"))
            .orderBy("doc_id", "chunk_idx")
        }
      },
      Some(s"""WITH ${Pipeline.cdcChunksCte},
             |o AS (SELECT doc_id, chunk_idx, chunk_hash,
             |  ROW_NUMBER() OVER (PARTITION BY chunk_hash
             |    ORDER BY doc_id, chunk_idx) AS rn,
             |  first_value(doc_id) OVER (PARTITION BY chunk_hash
             |    ORDER BY doc_id, chunk_idx
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS owner_doc,
             |  first_value(chunk_idx) OVER (PARTITION BY chunk_hash
             |    ORDER BY doc_id, chunk_idx
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS owner_idx
             |  FROM ch)
             |SELECT doc_id, chunk_idx, chunk_hash, rn > 1 AS dup,
             |  owner_doc, CAST(owner_idx AS INTEGER) AS owner_idx
             |FROM o ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- s29: streaming BM25 index maintenance -------------------------
    // The retrieval-index lifecycle's streaming arm — the third leg
    // beside p78 (build+probe) and p79 (batch increment), completing
    // the same batch/incremental/streaming symmetry the MV family
    // (q62/q64/s21) and the dedup index (p72/p77/s28) already have.
    // The document corpus arrives as a STREAM (three files,
    // maxFilesPerTrigger=1) and each foreachBatch firing maintains the
    // p79 index shape: the micro-batch's postings rows append into the
    // SAME 16-bucket term-bucketed table (bucket pruning keeps working
    // across appends), and its ALGEBRAIC df / corpus-stats partials
    // append as sidecar rows — each firing costs one |batch| aggregate
    // plus bounded writes, the corpus is never re-scanned, and the fold
    // is associative under ANY micro-batch split. The post-drain probe
    // reads NOTHING but the index and hash-checks against
    // [[Pipeline.bm25ProbeOracle]] — the identical SQL that checks p34
    // and p78 — proving the stream-maintained index serves exactly what
    // a from-scratch batch build would.
    RegQuery("s29_stream_bm25_increment",
      (s, d) => {
        import s.implicits._
        val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
        val postT = s"graft_s29_post_$tag"
        val stagePath = Scratch.path(s, "s29_docs", d)
        val dfPath = Scratch.path(s, "s29_df", d)
        val statPath = Scratch.path(s, "s29_stats", d)
        Scratch.dropTable(s, postT)
        Scratch.clear(s, stagePath, dfPath, statPath)
        // stage three doc_id-disjoint epochs (SF-independent split)
        val docs = graft.Tables(s, d, "documents").select("doc_id", "text")
        for (i <- 0L to 2L)
          docs.where(col("doc_id") % 3 === i)
            .coalesce(1).write.mode("append").parquet(stagePath)
        val docSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType)))
        val q = withStatePartitions(s, 8) {
          s.readStream.schema(docSchema)
            .option("maxFilesPerTrigger", "1").parquet(stagePath)
            .writeStream
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              val tok = batch
                .select(col("doc_id"),
                  graft.llm.TextOps.tokens(col("text")).as("tk"))
                .transform(graft.Part.pin(col("doc_id"))) // token barrier (p34)
                .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
                  col("tk"))
                .localCheckpoint() // feeds postings AND the stats partial
              val post = tok
                .select(col("doc_id"), col("dl"),
                  explode(col("tk")).as("term"))
                .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
                .localCheckpoint() // feeds the table AND the df partial
              // exactly-once under replay: all THREE outputs are keyed
              // by their batchId partition and written as DYNAMIC
              // overwrites — a micro-batch replayed after a mid-commit
              // failure rewrites its own partition instead of
              // double-counting postings/df/stats (the StreamingSpec
              // replay-idempotence pattern). The postings table stays
              // term-bucketed WITHIN each batch partition, so probe
              // pruning survives appends AND replays.
              val postB = post.withColumn("batch_id", lit(bid))
              if (!s.catalog.tableExists(postT))
                postB.write.partitionBy("batch_id")
                  .bucketBy(16, "term").sortBy("term")
                  .format("parquet").mode("overwrite").saveAsTable(postT)
              else {
                // insertInto IGNORES the per-write partitionOverwriteMode
                // option (measured: it statically wipes the table) — only
                // the session conf reaches the catalog-table insert path.
                // foreachBatch runs on the stream's CLONED session, so the
                // conf must be set on the BATCH's session (the outer
                // session's conf is invisible here); the clone dies with
                // the query, so no restore needed
                postB.sparkSession.conf
                  .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
                postB.write.mode("overwrite").insertInto(postT)
              }
              post.groupBy("term").agg(count(lit(1)).as("df"))
                .withColumn("batch_id", lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id").parquet(dfPath)
              tok.agg(count(lit(1)).as("n_docs"),
                  sum(col("dl")).as("sum_dl"))
                .withColumn("batch_id", lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id").parquet(statPath)
              ()
            }
            .trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        // probe: folded sidecars + the bucket-pruned postings table —
        // identical to the p78/p79 probe shape
        val qterms = Seq((1, "spark"), (1, "join"), (2, "hash"),
          (2, "table"), (2, "scan"), (3, "window"), (3, "agg"), (3, "data"))
          .toDF("q_id", "term")
        val terms = qterms.select("term").distinct()
          .as[String].collect().sorted.toSeq
        val post = s.table(postT).where(col("term").isin(terms: _*))
        val dfreq = s.read.parquet(dfPath)
          .where(col("term").isin(terms: _*))
          .groupBy("term").agg(sum("df").as("df"))
        val st = s.read.parquet(statPath)
          .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
        val avgdl = col("sum_dl").cast("double") / col("n_docs")
        val idf = log(lit(1.0) +
          (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
        val tfn = col("tf") * 2.2 / (col("tf") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
        post.join(broadcast(qterms), "term")
          .join(broadcast(dfreq), "term")
          .crossJoin(broadcast(st))
          .withColumn("u", floor(idf * tfn * 10000 + 0.5).cast("long"))
          .groupBy("q_id", "doc_id").agg(sum(col("u")).as("score_u"))
          .withColumn("rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("score_u").desc, col("doc_id"))))
          .where(col("rank") <= 10)
          .select("q_id", "rank", "doc_id", "score_u")
          .orderBy("q_id", "rank")
      },
      Some(Pipeline.bm25ProbeOracle)),

    // ---- s30: streamed tokenizer serving (WordPiece at ingest) ---------
    // The production tokenizer shape: TRAIN OFFLINE (p89's trainer, a
    // batch job over the corpus), then SERVE the frozen vocab inside
    // the ingest stream — each foreachBatch firing tokenizes its
    // micro-batch with the one compiled greedy-MaxMatch regex (pure
    // map-side codegen, no joins) and appends its ALGEBRAIC token-count
    // partials; the drain-time fold + top-100 hash-checks against
    // [[Pipeline.wordpieceOracle]] — the identical SQL that checks
    // p89 — proving streamed serving counts exactly what the batch
    // tokenizer does under any micro-batch split.
    RegQuery("s30_stream_wordpiece",
      (s, d) => {
        val stagePath = Scratch.path(s, "s30_docs", d)
        val cntPath = Scratch.path(s, "s30_counts", d)
        Scratch.clear(s, stagePath, cntPath)
        val pat = Pipeline.wordpiecePattern(s, d) // offline training
        val docs = graft.Tables(s, d, "documents").select("doc_id", "text")
        for (i <- 0L to 2L)
          docs.where(col("doc_id") % 3 === i)
            .coalesce(1).write.mode("append").parquet(stagePath)
        val docSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType)))
        val q = withStatePartitions(s, 8) {
          s.readStream.schema(docSchema)
            .option("maxFilesPerTrigger", "1").parquet(stagePath)
            .writeStream
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              // token-count partials keyed by batchId + dynamic
              // overwrite: replays rewrite, never double-count
              batch
                .select(explode(graft.llm.TextOps.tokens(col("text")))
                  .as("w"))
                .where(col("w") =!= "")
                .select(explode(regexp_extract_all(col("w"), lit(pat),
                  lit(0))).as("token"))
                .groupBy("token").agg(count(lit(1)).as("n"))
                .withColumn("batch_id", lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id").parquet(cntPath)
              ()
            }
            .trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.read.parquet(cntPath)
          .groupBy("token").agg(sum("n").as("n"))
          .orderBy(col("n").desc, col("token").asc).limit(100)
      },
      Some(Pipeline.wordpieceOracle)),

    // ---- s31: streaming VARIANT ingestion -------------------------------
    // q73's streaming twin: the open-schema payload parses to a
    // binary VARIANT as rows ARRIVE (schema-on-read at the ingest
    // edge — no re-parse at query time), typed extraction feeds a
    // running complete-mode aggregate, and the drained result
    // hash-checks against the SAME SQL as q73.
    RegQuery("s31_stream_variant",
      (s, d) => {
        val q = withStatePartitions(s, 8) {
          streamEvents(s, d)
            .select(col("event_type"),
              expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
              min("k").as("min_k"), max("k").as("max_k"))
            .writeStream.format("memory").queryName("s31_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table("s31_sink")
          .select("event_type", "n", "sum_k", "min_k", "max_k")
          .orderBy("event_type")
      },
      Some(Relational.variantAggOracle)),

    // ---- s32: the graft V2 store's commit log AS a streaming source ----
    // The table-format CDC read the DSv2 store completes: offsets are
    // GENERATION numbers, each micro-batch emits the file delta of the
    // append commits in (start, end], and an overwrite/compaction
    // commit — which only rewrites rows the stream already emitted —
    // contributes NOTHING (compaction invisible downstream, the
    // Delta/Iceberg streaming-read contract). Staged here: three
    // append generations with a COMPACTION between the second and
    // third; the drained aggregate hash-checks against the raw
    // customer table — every row exactly once, the rewrite unseen.
    RegQuery("s32_stream_store_cdc",
      (s, d) => {
        val root = Scratch.path(s, "s32_store", d)
        Scratch.clear(s, root)
        def slice(m: Long) = graft.Tables(s, d, "customer")
          .where(col("c_custkey") % 3 === m)
          .select(concat(lit("customer/"), col("c_custkey")).as("id"),
            col("c_name").as("name"), col("c_nationkey").as("nation"))
        graft.sources.v2.GraftTable.create(root, slice(0).schema, "id")
        slice(0).write.format("graft").mode("append").save(root) // gen 1
        slice(1).write.format("graft").mode("append").save(root) // gen 2
        // gen 3: compaction — a pure rewrite of gens 1+2's rows; the
        // stream below must NOT emit them twice
        s.read.format("graft").load(root).localCheckpoint()
          .write.format("graft").mode("overwrite").save(root)
        slice(2).write.format("graft").mode("append").save(root) // gen 4
        val q = withStatePartitions(s, 8) {
          s.readStream.format("graft").load(root)
            .groupBy("nation")
            .agg(count(lit(1)).as("n"), min("name").as("min_name"),
              max("id").as("max_id"))
            .writeStream.format("memory").queryName("s32_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table("s32_sink")
          .select("nation", "n", "min_name", "max_id")
          .orderBy("nation")
      },
      Some("""SELECT c_nationkey AS nation, CAST(count(*) AS BIGINT) AS n,
             |  min(c_name) AS min_name,
             |  max('customer/' || c_custkey) AS max_id
             |FROM customer GROUP BY 1 ORDER BY nation""".stripMargin))
  )

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** documents.parquet as a stream. */
  private def streamDocs(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)

  private val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType)))

  private def streamLineitem(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(lineitemSchema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(dir)

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  private def streamCustomers(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(customerSchema)
      .option("pathGlobFilter", "customer.parquet").parquet(dir)
}
