package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL-text surface for the custom-operator tier: SESSIONIZE /
  * ASOF_LE hints planning into SessionizeExec / AsOfJoinExec from pure
  * `spark.sql(...)` text, row-equal to the Scala-API and window forms;
  * malformed hints degrade to logged no-ops (the hint contract). */
class SqlSurfaceSpec extends SparkSpec {

  private def find[T <: SparkPlan](plan: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    plan match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)(pf)
      case q: QueryStageExec => find(q.plan)(pf)
      case p if pf.isDefinedAt(p) => Seq(pf(p))
      case p => p.children.flatMap(find(_)(pf))
    }
  }

  private def events = graft.Tables(spark, sfDir, "events")

  test("SESSIONIZE hint: pure SQL plans into SessionizeExec, rows match the Scala API") {
    events.createOrReplaceTempView("sqlsurf_events")
    val df = spark.sql("""
      SELECT user_id, event_id, sid FROM (
        SELECT /*+ SESSIONIZE('user_id', 'ts,event_id', 'tsec', 1800, 'sid') */ *
        FROM (SELECT user_id, ts, event_id,
                     CAST(floor(unix_millis(ts) / 1000.0) AS BIGINT) AS tsec
              FROM sqlsurf_events))
      ORDER BY event_id""")
    val rows = df.collect().toSeq
    assert(find(df.queryExecution.executedPlan) {
      case e: SessionizeExec => e }.nonEmpty,
      s"SQL text did not plan into SessionizeExec:\n${df.queryExecution.executedPlan}")
    val viaApi = Sessionize.assign(
      events.select(col("user_id"), col("ts"), col("event_id"),
        floor(unix_millis(col("ts")) / 1000.0).cast("long").as("tsec")),
      Seq("user_id"), Seq("ts", "event_id"), "tsec", 1800L, "sid")
      .select("user_id", "event_id", "sid").orderBy("event_id")
      .collect().toSeq
    assert(rows == viaApi)
  }

  test("ASOF_LE hint: bare JOIN plans into AsOfJoinExec, rows match the window form") {
    events.createOrReplaceTempView("sqlsurf_events")
    val df = spark.sql("""
      SELECT event_id, last_view FROM (
        SELECT /*+ ASOF_LE('user_id', 'ts,event_id', 'event_id AS last_view') */ *
        FROM (SELECT user_id, ts, event_id FROM sqlsurf_events
              WHERE event_type = 'click')
        JOIN (SELECT user_id, ts, event_id FROM sqlsurf_events
              WHERE event_type = 'view'))
      ORDER BY event_id""")
    val rows = df.collect().toSeq
    assert(find(df.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e }.nonEmpty,
      s"SQL text did not plan into AsOfJoinExec:\n${df.queryExecution.executedPlan}")
    // composed window oracle (q24's shape)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = events
      .withColumn("last_view", last(
        when(col("event_type") === "view", col("event_id")), true).over(w))
      .where(col("event_type") === "click")
      .select("event_id", "last_view").orderBy("event_id")
      .collect().toSeq
    assert(rows == exp)
  }

  test("ASOF_GE hint: forward direction plans into AsOfJoinExec, rows match the Scala API") {
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tmicro"),
        col("event_id"), col("event_type"))
      .createOrReplaceTempView("sqlsurf_events_m")
    val df = spark.sql("""
      SELECT event_id, next_view FROM (
        SELECT /*+ ASOF_GE('user_id', 'tmicro,event_id', 'event_id AS next_view') */ *
        FROM (SELECT user_id, tmicro, event_id FROM sqlsurf_events_m
              WHERE event_type = 'click')
        JOIN (SELECT user_id, tmicro, event_id FROM sqlsurf_events_m
              WHERE event_type = 'view'))
      ORDER BY event_id""")
    val rows = df.collect().toSeq
    assert(find(df.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e }.nonEmpty,
      s"SQL text did not plan into AsOfJoinExec:\n${df.queryExecution.executedPlan}")
    // the Scala forward API must agree row-for-row (one buildPlan,
    // two surfaces)
    val ev = events.select(col("user_id"),
      unix_micros(col("ts")).as("tmicro"), col("event_id"),
      col("event_type"))
    val viaApi = AsOfJoin.asOfGE(
      ev.filter(col("event_type") === "click")
        .select("user_id", "tmicro", "event_id"),
      ev.filter(col("event_type") === "view")
        .select("user_id", "tmicro", "event_id"),
      on = Seq("user_id"), ord = Seq("tmicro", "event_id"),
      valueCol = "event_id", as = "next_view")
      .select("event_id", "next_view").orderBy("event_id")
      .collect().toSeq
    assert(rows == viaApi)
    // and the helper negation columns never leak into the output
    assert(!df.columns.exists(_.startsWith("graft_asof_neg_")))
  }

  test("COSINE_TOPK hint: bare JOIN plans into CosineTopKExec, rows match the Scala API") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
    emb.createOrReplaceTempView("sqlsurf_emb")
    val df = spark.sql("""
      SELECT q_id, rank, n_id, cos_r FROM (
        SELECT /*+ COSINE_TOPK('vec_id', 'embedding', 'vec_id', 'embedding', 5, true) */ *
        FROM sqlsurf_emb
        JOIN (SELECT vec_id, embedding FROM sqlsurf_emb WHERE vec_id < 3))
      ORDER BY q_id, rank""")
    val rows = df.collect().toSeq
    assert(find(df.queryExecution.executedPlan) {
      case e: CosineTopKExec => e }.nonEmpty,
      s"SQL text did not plan into CosineTopKExec:\n${df.queryExecution.executedPlan}")
    val viaApi = CosineTopK.topK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 3), "vec_id", "embedding",
        k = 5, excludeSelf = true)
      .orderBy("q_id", "rank").collect().toSeq
    assert(rows == viaApi)
    assert(rows.nonEmpty)
  }

  test("appended columns ride select-star and resolve by name upstream") {
    events.createOrReplaceTempView("sqlsurf_events")
    val df = spark.sql("""
      SELECT user_id, sid, count(*) AS n FROM (
        SELECT /*+ SESSIONIZE('user_id', 'ts,event_id', 'tsec', 1800, 'sid') */ *
        FROM (SELECT user_id, ts, event_id,
                     CAST(floor(unix_millis(ts) / 1000.0) AS BIGINT) AS tsec
              FROM sqlsurf_events))
      GROUP BY user_id, sid ORDER BY user_id, sid""")
    assert(df.columns.toSeq == Seq("user_id", "sid", "n"))
    assert(df.count() > 0)
  }

  test("malformed hints degrade to a no-op instead of failing the query") {
    events.createOrReplaceTempView("sqlsurf_events")
    // wrong arity → warned + ignored; query still runs without the column
    val noSid = spark.sql("""
      SELECT /*+ SESSIONIZE('user_id') */ user_id FROM sqlsurf_events""")
    assert(noSid.columns.toSeq == Seq("user_id"))
    assert(noSid.count() == events.count())
    // ASOF_LE with no join underneath → warned + ignored
    val noJoin = spark.sql("""
      SELECT /*+ ASOF_LE('user_id', 'ts', 'event_id AS lv') */ user_id
      FROM sqlsurf_events""")
    assert(noJoin.count() == events.count())
  }

  test("bad column name in a well-formed hint throws the builder's message") {
    events.createOrReplaceTempView("sqlsurf_events")
    val e = intercept[Exception] {
      spark.sql("""
        SELECT /*+ SESSIONIZE('user_id', 'ts', 'nope', 1800, 'sid') */ *
        FROM sqlsurf_events""").collect()
    }
    def msg(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msg(t.getCause)
    assert(msg(e).contains("not found") || msg(e).contains("nope"),
      s"unexpected failure: $e")
  }
}
