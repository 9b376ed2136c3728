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
}
