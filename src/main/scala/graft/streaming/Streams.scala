package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming surface (SURVEY.md §2.2 streaming rows): tumbling / sliding
  * / session windows, watermarked dedup, stream-static enrichment and
  * arbitrary stateful processing. Every transform takes a DataFrame and
  * works unchanged on a batch frame or a `readStream` frame — the batch
  * path is what the DuckDB oracle checks (q19/q20), the streaming path
  * is exercised with MemoryStream in StreamingSpec.
  *
  * The reference's only streaming machinery is chunked ingest with
  * progress + backpressure (reference: src/server/Services/
  * WatService.cs:241-300, bounded channel FileStorePartition.fs:26);
  * Structured Streaming's source rate limiting (`maxFilesPerTrigger`)
  * and checkpointing subsume both. State at 100 TB: always pair
  * stateful ops with watermarks so the store is bounded; use the
  * RocksDB state store in production configs.
  */
object Streams {

  /** Tumbling event-time window counts. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** Sliding window counts (window > slide ⇒ overlapping). */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** Session windows: rows within `gap` of each other merge per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("user_id"), col("cnt"))

  /** Watermarked streaming dedup. `dropDuplicatesWithinWatermark` (not
    * plain dropDuplicates) so each key's state is EVICTED once the
    * watermark passes its event time — the only dedup that survives an
    * unbounded stream; plain dropDuplicates keys state forever. Duplicates
    * are only suppressed if they arrive within the watermark delay of the
    * first occurrence, which is the documented contract. */
  def dedup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: the static side broadcasts. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left")

  /** Stream-stream interval join: each click pairs with the same user's
    * views from the preceding `within`. Watermarks on BOTH inputs plus
    * the time-bound condition let Spark EVICT buffered rows once the
    * watermark passes the interval — the only way a stream-stream join's
    * state stays bounded on unbounded inputs. Inner join ⇒ append mode. */
  def clickViewJoin(clicks0: DataFrame, views0: DataFrame,
                    within: String = "6 hours",
                    watermark: String = "1 hour"): DataFrame = {
    val clicks = clicks0.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", watermark)
    val views = views0.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    clicks.join(views,
      col("user_id") === col("v_user") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $within") &&
        col("v_ts") <= col("c_ts"))
  }

  // --- arbitrary stateful processing ---------------------------------

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String)
  case class UserStat(user_id: Long, n_events: Long, n_clicks: Long)

  /** Per-user running counters via mapGroupsWithState — the pattern for
    * custom state the built-in aggregations can't express (the analog of
    * the reference's FASTER read-modify-write state,
    * src/serverlib/NodeAttrIndex.cs:183-232). */
  def userStats(events: Dataset[Ev]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0L))
          val batch = evs.toSeq
          val next = UserStat(uid,
            prev.n_events + batch.size,
            prev.n_clicks + batch.count(_.event_type == "click"))
          state.update(next)
          next
      }
  }

  /** Update-mode sink for userStats. */
  val userStatsOutputMode: OutputMode = OutputMode.Update()

  // --- transformWithState (Spark 4 arbitrary-state API) ----------------

  case class EvV(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Per-user running totals as a [[StatefulProcessor]] — the
    * `transformWithState` successor of mapGroupsWithState: named typed
    * state handles (here one ValueState) living in the state store
    * (RocksDB in the production config), with per-state TTL and timer
    * support the old API lacked. State is one small row per user —
    * bounded by key cardinality, not stream length. */
  class TotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EvV, UserTotals] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvV],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserTotals] = {
      var next = Option(state.get()).getOrElse(UserTotals(key, 0L, 0.0))
      rows.foreach { e =>
        next = UserTotals(key, next.n_events + 1, next.total_value + e.value)
      }
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Per-user event counts + value totals via transformWithState. */
  def userTotals(events: Dataset[EvV]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  case class UserMoments(user_id: Long, n: Long,
                         sum_milli: Long, sumsq_milli: Long)

  /** Streaming running moments (the Welford pattern, made INTEGER-EXACT):
    * instead of float (mean, M2) — whose accumulation order differs
    * between engines — state carries the exact integer moments
    * (n, Σv, Σv²) of milli-scaled values. Mean and variance derive from
    * the integers by the same closed formula on both engines, so the
    * streaming statistic hash-matches a batch oracle exactly, any
    * micro-batch split, any arrival order. State is 32 bytes per key
    * forever — the live per-key variance monitor at ingest scale. */
  class MomentsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), UserMoments] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[UserMoments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserMoments]("moments",
        org.apache.spark.sql.Encoders.product[UserMoments], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserMoments] = {
      var m = Option(state.get()).getOrElse(UserMoments(key, 0L, 0L, 0L))
      rows.foreach { case (_, vm) =>
        m = UserMoments(key, m.n + 1, m.sum_milli + vm,
          m.sumsq_milli + vm * vm)
      }
      state.update(m)
      Iterator.single(m)
    }
  }

  /** Per-user integer-exact running moments via transformWithState;
    * input rows are (user_id, value_milli). */
  def userMoments(events: Dataset[(Long, Long)]): Dataset[UserMoments] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new MomentsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** First-touch funnel state: earliest event-time per stage (-1 = not
    * seen). min() per stage is order-free, so the final state is
    * micro-batch-split invariant — the property that makes the
    * streaming funnel oracle-checkable (unlike q42's staged-min
    * semantics, whose "click after final min view" gate needs the full
    * click history to re-admit under arrival reordering). */
  case class FunnelState(user_id: Long, t_view: Long, t_click: Long,
                         t_purchase: Long)

  class FunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String, Long), FunnelState] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[FunnelState] = {
      var f = Option(state.get())
        .getOrElse(FunnelState(key, -1L, -1L, -1L))
      def mn(cur: Long, t: Long): Long = if (cur < 0 || t < cur) t else cur
      rows.foreach { case (_, et, t) =>
        et match {
          case "view"     => f = f.copy(t_view = mn(f.t_view, t))
          case "click"    => f = f.copy(t_click = mn(f.t_click, t))
          case "purchase" => f = f.copy(t_purchase = mn(f.t_purchase, t))
          case _          => ()
        }
      }
      state.update(f)
      Iterator.single(f)
    }
  }

  /** Per-user first-touch funnel via transformWithState; input rows are
    * (user_id, event_type, t_seconds). */
  def funnelTouches(events: Dataset[(Long, String, Long)])
      : Dataset[FunnelState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new FunnelProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  // --- streaming event-transition pairs (s19) --------------------------

  case class TransRow(user_id: Long, ts_micro: Long, event_id: Long,
                      et: String)
  case class TransPair(user_id: Long, from_type: String, to_type: String)
  case class LastSeen(ts_micro: Long, event_id: Long, et: String)

  /** Adjacent-event (from→to) pair emission with ONE row of state per
    * user: the last-seen (ts, event_id, type). Rows are sorted by
    * (ts, event_id) within each micro-batch and chained from the
    * stored tail, so the pair stream equals q55's lead()-window pairs
    * whenever each user's batches arrive ts-monotone — the log-ingest
    * contract (a replayed file, a Kafka partition keyed by user). That
    * assumption is inherent: adjacency is order-DEPENDENT, so unlike
    * the funnel's min() state there is no order-free formulation with
    * bounded state — the honest alternative (buffering each user's
    * full history) is exactly what the bounded-state discipline
    * forbids at 100 TB. StreamsSpec pins split-invariance across a
    * ts-boundary split. */
  class TransitionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TransRow, TransPair] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var last: ValueState[LastSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastSeen]("last",
        org.apache.spark.sql.Encoders.product[LastSeen], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TransRow],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TransPair] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_micro, r.event_id))
      var prev = Option(last.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[TransPair]
      sorted.foreach { r =>
        prev.foreach(p => out += TransPair(key, p.et, r.et))
        prev = Some(LastSeen(r.ts_micro, r.event_id, r.et))
      }
      prev.foreach(last.update)
      out.iterator
    }
  }

  /** Per-user adjacent-transition pairs via transformWithState. */
  def transitionPairs(events: Dataset[TransRow]): Dataset[TransPair] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  // --- streaming as-of enrichment (s22) --------------------------------

  case class AsOfOut(user_id: Long, event_id: Long,
                     last_view: Option[Long])

  /** The as-of join family's STREAMING arm (q24 composed window, q63
    * custom exec, and this): enrich each click with the latest
    * at-or-before view using ONE row of state per user — the last view
    * seen. Ordering contract as the transition processor (per-user
    * ts-monotone batch arrival; rows sorted by (ts, event_id) within
    * each micro-batch), under which the enrichment equals the batch
    * window exactly — this is how a 100 TB event firehose gets its
    * attribution column at ingest, with O(|users|) state and no
    * history buffer. */
  class AsOfProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TransRow, AsOfOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var lastView: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastView = getHandle.getValueState[Long]("lastView",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TransRow],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AsOfOut] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_micro, r.event_id))
      var lv: Option[Long] =
        if (lastView.exists()) Some(lastView.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[AsOfOut]
      sorted.foreach { r =>
        if (r.et == "view") lv = Some(r.event_id)
        else if (r.et == "click") out += AsOfOut(key, r.event_id, lv)
      }
      lv.foreach(lastView.update)
      out.iterator
    }
  }

  /** Click stream enriched with the latest at-or-before view id. */
  def asOfEnrich(events: Dataset[TransRow]): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new AsOfProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  // --- streaming sessionization (s24) ----------------------------------

  case class SessRow(user_id: Long, tsec: Long, event_id: Long)
  case class SessOut(user_id: Long, event_id: Long, tsec: Long, sid: Long)
  case class SessState(last_tsec: Long, sid: Long)

  /** The sessionize family's STREAMING arm (q41 composed window, q66
    * custom exec, and this): assign session ids AT INGEST with two
    * longs of state per user — the last gap value and the running
    * session counter, exactly SessionizeExec's cursor lifted into
    * transformWithState. Ordering contract as s19/s20/s22 (per-user
    * ts-monotone batch arrival; in-batch (tsec, event_id) sort). */
  class SessProcessor(gap: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SessRow, SessOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var st: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState]("sess",
        org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessRow],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessOut] = {
      val sorted = rows.toArray.sortBy(r => (r.tsec, r.event_id))
      var cur = Option(st.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
      sorted.foreach { r =>
        cur = Some(cur match {
          case None => SessState(r.tsec, 1L)
          case Some(s) if r.tsec - s.last_tsec > gap =>
            SessState(r.tsec, s.sid + 1)
          case Some(s) => SessState(r.tsec, s.sid)
        })
        out += SessOut(key, r.event_id, r.tsec, cur.get.sid)
      }
      cur.foreach(st.update)
      out.iterator
    }
  }

  /** Per-user session ids via transformWithState. */
  def sessionize(events: Dataset[SessRow], gap: Long): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessProcessor(gap),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  // --- streaming SemDeDup (s27) -----------------------------------------

  case class SemRow(cell: Long, vec_id: Long, v: Array[Double])
  case class SemOut(vec_id: Long, kept: Boolean, canonical: Long)
  case class SemMember(vec_id: Long, v: Array[Double])

  /** SemDeDup AT INGEST — p85's rule run by the stream. Keyed by IVF
    * cell; state = every member seen so far in the cell, which is
    * BOUNDED BY CELL SIZE — the quantity the IVF design holds roughly
    * constant at any corpus scale (K grows with N), so this is the rare
    * list-state whose bound is a design constant, like s08's band
    * anchors. A landing doc compares against all prior same-cell
    * members — kept or dropped, a dropped doc is still a valid witness,
    * exactly p85's "∃ a &lt; b" rule — is dropped iff some prior member
    * reaches cos6 ≥ threshold (canonical = the SMALLEST such witness),
    * and always joins the state. Cosine matches the CosineSim
    * expression op-for-op (single fused accumulation loop, then
    * dot / (√nx · √ny), then floor(x·1e6 + 0.5)/1e6), so the DuckDB
    * mirror is bit-identical. Ordering contract as s19/s20/s22:
    * per-cell vec_id-monotone batch arrival; in-batch vec_id sort. */
  class SemDeDupProcessor(threshold: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SemRow, SemOut] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TTLConfig}
    @transient private var members: ListState[SemMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[SemMember]("members",
        org.apache.spark.sql.Encoders.product[SemMember], TTLConfig.NONE)

    private def sim6(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
      }
      math.floor(dot / (math.sqrt(nx) * math.sqrt(ny)) * 1000000 + 0.5) /
        1000000
    }

    override def handleInputRows(key: Long, rows: Iterator[SemRow],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SemOut] = {
      val sorted = rows.toArray.sortBy(_.vec_id)
      val cur = scala.collection.mutable.ArrayBuffer.empty[SemMember]
      val it = members.get()
      while (it.hasNext) cur += it.next()
      val out = scala.collection.mutable.ArrayBuffer.empty[SemOut]
      sorted.foreach { r =>
        var canon = -1L
        cur.foreach { m =>
          if (sim6(m.v, r.v) >= threshold &&
            (canon < 0 || m.vec_id < canon)) canon = m.vec_id
        }
        out += SemOut(r.vec_id, canon < 0,
          if (canon < 0) r.vec_id else canon)
        cur += SemMember(r.vec_id, r.v)
      }
      members.put(cur.toArray)
      out.iterator
    }
  }

  /** Per-cell streaming SemDeDup via transformWithState. */
  def semDeDup(rows: Dataset[SemRow], threshold: Double): Dataset[SemOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.cell)
      .transformWithState(new SemDeDupProcessor(threshold),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  // --- streaming CDC chunk dedup (s28) ----------------------------------

  case class ChunkRow(chunk_hash: Long, doc_id: Long, chunk_idx: Int)
  case class ChunkOut(chunk_hash: Long, doc_id: Long, chunk_idx: Int,
      dup: Boolean, owner_doc: Long, owner_idx: Int)
  case class ChunkOwner(doc_id: Long, chunk_idx: Int)

  /** First-seen chunk ownership AT INGEST: keyed by chunk hash, ONE
    * (doc_id, chunk_idx) of state per distinct chunk — the exact-dedup
    * ledger a CDC-chunked firehose needs (every later occurrence is
    * stamped dup with its owner, so storage/training dedup happens as
    * data lands). Ordering contract as s19/s20/s22: per-hash
    * (doc_id, chunk_idx)-monotone batch arrival; in-batch sort — under
    * which first-seen equals the batch argmin exactly. */
  class ChunkDedupProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, ChunkRow, ChunkOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var owner: ValueState[ChunkOwner] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[ChunkOwner]("owner",
        org.apache.spark.sql.Encoders.product[ChunkOwner], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ChunkRow],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[ChunkOut] = {
      val sorted = rows.toArray.sortBy(r => (r.doc_id, r.chunk_idx))
      var cur = Option(owner.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[ChunkOut]
      sorted.foreach { r =>
        cur match {
          case None =>
            cur = Some(ChunkOwner(r.doc_id, r.chunk_idx))
            out += ChunkOut(key, r.doc_id, r.chunk_idx, dup = false,
              r.doc_id, r.chunk_idx)
          case Some(o) =>
            out += ChunkOut(key, r.doc_id, r.chunk_idx, dup = true,
              o.doc_id, o.chunk_idx)
        }
      }
      cur.foreach(owner.update)
      out.iterator
    }
  }

  /** Per-hash first-seen chunk dedup via transformWithState. */
  def chunkDedup(rows: Dataset[ChunkRow]): Dataset[ChunkOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.chunk_hash)
      .transformWithState(new ChunkDedupProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  // --- streaming sequence packing (s20) --------------------------------

  case class PackRow(source: String, doc_id: Long, n_tok: Long)
  case class PackOut(source: String, doc_id: Long, n_tok: Long,
                     seq_id: Long, off: Long)

  /** p39's prefix-sum sequence packing maintained by the stream: state
    * per source is ONE long (tokens packed so far); each arriving doc
    * takes seq_id = cum div cap, off = cum mod cap, then advances cum.
    * Same ordering contract as the transition processor: per-source
    * doc_id-monotone batch arrival (rows are doc_id-sorted within each
    * micro-batch), under which the assignment equals the batch window
    * exactly. A 100 TB ingest packs training sequences AS documents
    * land — O(|sources|) state, no shuffle-the-corpus window. */
  class PackProcessor(cap: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, PackRow, PackOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[PackRow],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[PackOut] = {
      // primitive state: exists() guards the unset case (get() would
      // unbox null)
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).map { r =>
        val o = PackOut(key, r.doc_id, r.n_tok, c / cap, c % cap)
        c += r.n_tok
        o
      }
      cum.update(c)
      out.iterator
    }
  }

  /** Per-source streaming prefix-sum packing. */
  def packSequences(docs: Dataset[PackRow], cap: Long): Dataset[PackOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new PackProcessor(cap),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Run `f` with the RocksDB state store provider (required by
    * transformWithState's column families; also the production 100 TB
    * state config), restoring the prior provider after. */
  def withRocksDB[T](s: org.apache.spark.sql.SparkSession)(f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try f finally before match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  // --- streaming weighted priority sampler (s11) -----------------------

  case class PrioDoc(source: String, doc_id: Long, n_chars: Long,
                     prio: Long)
  case class SampleState(n_seen: Long, top: List[PrioDoc])
  case class SampleOut(source: String, n_seen: Long, top: Seq[PrioDoc])

  /** The p45 weighted sample maintained BY the stream: per-source
    * top-k smallest priorities as mapGroupsWithState state. Top-k of a
    * multiset under a total order ((prio, doc_id) — no ties possible)
    * is an associative commutative merge, so the final state equals the
    * batch top-k under ANY micro-batch split of the corpus — unlike
    * order-dependent reservoir algorithms, this streaming sample is
    * exactly reproducible and therefore oracle-checkable. State is
    * O(k) per source no matter how long the stream runs (the bounded-
    * state discipline: a 100 TB ingest keeps a 10-row sample per
    * stratum, not a 10-row-per-batch backlog). n_seen grows
    * monotonically, so the max-n_seen emission per source is the final
    * one (the s03 drain trick). */
  def prioritySample(docs: Dataset[PrioDoc], k: Int): Dataset[SampleOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .mapGroupsWithState[SampleState, SampleOut](GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[SampleState]) =>
          val prev = state.getOption.getOrElse(SampleState(0L, Nil))
          val batch = rows.toList
          val merged = (prev.top ++ batch)
            .sortBy(p => (p.prio, p.doc_id)).take(k)
          val next = SampleState(prev.n_seen + batch.size, merged)
          state.update(next)
          SampleOut(src, next.n_seen, merged)
      }
  }

  // --- streaming token-budget admission (s12) --------------------------

  case class BudgetDoc(source: String, doc_id: Long, u: Long, n_tok: Long)
  case class BudgetAdmit(doc_id: Long, u: Long, n_tok: Long,
                         cum_tokens: Long)
  case class BudgetState(n_seen: Long, admitted: List[BudgetAdmit])
  case class BudgetOut(source: String, n_seen: Long,
                       admitted: Seq[BudgetAdmit])

  /** p47's greedy token-budget admission maintained BY the stream.
    * State per source is ONLY the currently-admitted prefix (≤ budget
    * tokens + one overflow doc) — sufficient because admission is
    * monotone: docs ahead of x in the (u desc, doc_id) order only ever
    * accumulate, so a doc rejected once (cum_before ≥ budget at its
    * position) can never re-enter, and an admitted doc can only be
    * evicted by better arrivals, never readmitted after. Hence
    * Admit(S ∪ B) = Admit(Admit(S) ∪ B): folding batches through the
    * admitted prefix equals the batch computation under ANY micro-batch
    * split, and the drained state hash-matches p47's DuckDB oracle.
    * The eviction case (a late high-score doc displacing an earlier
    * admit) is pinned in StreamingSpec. */
  def budgetAdmission(docs: Dataset[BudgetDoc],
                      budget: Long): Dataset[BudgetOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .mapGroupsWithState[BudgetState, BudgetOut](GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[BudgetState]) =>
          val prev = state.getOption.getOrElse(BudgetState(0L, Nil))
          val batch = rows.toList
          val cands = (prev.admitted.map(a => (a.u, a.doc_id, a.n_tok)) ++
            batch.map(b => (b.u, b.doc_id, b.n_tok)))
            .sortBy { case (u, id, _) => (-u, id) }
          var cum = 0L
          val kept = List.newBuilder[BudgetAdmit]
          cands.foreach { case (u, id, n) =>
            if (cum < budget) { cum += n; kept += BudgetAdmit(id, u, n, cum) }
          }
          val next = BudgetState(prev.n_seen + batch.size, kept.result())
          state.update(next)
          BudgetOut(src, next.n_seen, next.admitted)
      }
  }

  // --- streaming blocked record linkage (s14) --------------------------

  case class CustRow(blk: String, id: Long, nm: String, cents: Long)
  case class LinkPair(blk: String, a_id: Long, b_id: Long, name_lev: Long,
                      bal_diff_c: Long)

  /** p54's blocked entity resolution maintained BY the stream: the
    * block's member list is the state; each arriving record compares
    * against every member already seen (plus earlier rows of its own
    * batch) and emits link pairs under the edit-distance threshold. A
    * pair is emitted exactly once — when the LATER of its two members
    * arrives — so the drained sink is SET-equal to the batch blocked
    * join under any micro-batch split and fully oracle-checkable
    * (the s11/s12 order-independence property applied to joins).
    * State is the block's member list, bounded by blocking-key design —
    * the same contract that bounds the batch p54's per-block pair
    * count; a block key too coarse to bound members is an ER modeling
    * bug, not a streaming one. */
  def linkPairs(rows: Dataset[CustRow], tau: Long): Dataset[LinkPair] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.blk)
      .flatMapGroupsWithState[List[CustRow], LinkPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (blk, batch0, state: GroupState[List[CustRow]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[LinkPair]
          // in-batch order is irrelevant to the emitted SET (every
          // unordered pair meets exactly once either way); sort only to
          // make per-row emission order stable for debugging
          batch0.toList.sortBy(_.id).foreach { r =>
            seen.iterator.filter(_.id != r.id).foreach { m =>
              val lev = editDistance(m.nm, r.nm)
              if (lev <= tau) {
                val (a, b) = if (m.id < r.id) (m, r) else (r, m)
                out += LinkPair(blk, a.id, b.id, lev,
                  math.abs(a.cents - b.cents))
              }
            }
            seen = r :: seen
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** Classic unit-cost Levenshtein DP (two-row), matching Spark's and
    * DuckDB's `levenshtein` exactly — the state processor runs plain
    * JVM code, so the SQL function isn't reachable from here. */
  private[streaming] def editDistance(a: String, b: String): Long = {
    var prev = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length).toLong
  }

  // --- streaming cardinality estimation (s13) --------------------------
  // s13's HLL register maxima ride Spark's OWN streaming aggregate
  // (groupBy(source, reg).max(rho)): partial aggregation happens
  // map-side before the state shuffle, so no custom state operator is
  // needed and only ≤ 64 (register, max) partials per source per batch
  // cross the wire — the former mapGroupsWithState version shuffled
  // every shingle row into the stateful operator (same local wall
  // time, but a corpus-proportional exchange at cluster scale).
  // Split-invariance of the built-in path is pinned in StreamingSpec.

  // --- streaming incremental near-dup (LSH band-bucket state) ----------

  case class BandDoc(band_idx: Int, band_hash: Long, doc_id: Long)
  case class DupPair(a_id: Long, b_id: Long)
  // public: the state encoder's generated code instantiates it
  case class BucketMin(doc: Long)

  /** Per band bucket keep the MIN doc_id ever seen; every other doc
    * sharing the bucket emits a (min, doc) candidate pair — the
    * continuous-ingest half of MinHash dedup. Emission is linear in
    * bucket size (anchored at the running min, not all-pairs — the
    * spam-guard cap becomes unnecessary). The guarantee under ANY
    * micro-batch split is CONNECTIVITY, not a fixed pair set: a later
    * batch that brings a smaller doc re-anchors the bucket and emits
    * the demoted min as the b-side, so a bucket split across batches
    * can yield a CHAIN ({3,5} then {1} → (3,5),(1,3)) where one batch
    * yields the min-star ((1,3),(1,5)). Both connect every bucket
    * member to the bucket min — same connected components, same
    * duplicate coverage (every non-min member appears in ≥1 pair) —
    * which is exactly what the downstream consumer (p32's
    * CC → canonical resolution) is invariant to. Pinned in
    * StreamingSpec: star equality when order delivers the min first,
    * chain-vs-star component equality under an adversarial split.
    * State is one long per bucket — bounded by bucket cardinality, with
    * TTL available for time-decayed corpora. */
  class BandDedupProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Int, Long), BandDoc, DupPair] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var minDoc: ValueState[BucketMin] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      minDoc = getHandle.getValueState[BucketMin]("minDoc",
        org.apache.spark.sql.Encoders.product[BucketMin], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandDoc],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[DupPair] = {
      val ds = rows.map(_.doc_id).toArray.sorted.distinct
      val out = scala.collection.mutable.ArrayBuffer.empty[DupPair]
      var cur = Option(minDoc.get()).map(_.doc)
      ds.foreach { d =>
        cur match {
          case None => cur = Some(d)
          case Some(m) if d == m => ()
          case Some(m) if d < m => out += DupPair(d, m); cur = Some(d)
          case Some(m) => out += DupPair(m, d)
        }
      }
      cur.foreach(m => minDoc.update(BucketMin(m)))
      out.iterator
    }
  }

  /** Stream of banded docs → candidate near-dup pairs. */
  def bandDedup(bands: Dataset[BandDoc]): Dataset[DupPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(b => (b.band_idx, b.band_hash))
      .transformWithState(new BandDedupProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }
}
