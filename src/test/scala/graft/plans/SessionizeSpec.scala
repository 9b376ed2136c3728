package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sessionize whole-operator extension: strategy fires, row
  * equality with the composed lag+cumsum window form on real data,
  * threshold/key-boundary edges, and survival of arbitrary input
  * partitioning (EnsureRequirements owns the clustering+sort). */
class SessionizeSpec extends SparkSpec {

  private def findExec(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[SessionizeExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    plan match {
      case a: AdaptiveSparkPlanExec => findExec(a.executedPlan)
      case q: QueryStageExec => findExec(q.plan)
      case e: SessionizeExec => Seq(e)
      case p => p.children.flatMap(findExec)
    }
  }

  private def events = graft.Tables(spark, sfDir, "events")
    .select(col("user_id"), col("ts"), col("event_id"),
      floor(unix_millis(col("ts")) / 1000.0).cast("long").as("tsec"))

  private def viaExec(df: DataFrame): DataFrame =
    Sessionize.assign(df, Seq("user_id"), Seq("ts", "event_id"),
      "tsec", 1800L, "sid")

  private def viaWindow: DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("brk", when(lag("tsec", 1).over(w).isNull ||
        col("tsec") - lag("tsec", 1).over(w) > 1800L, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("user_id", "event_id", "sid")
  }

  test("strategy fires; no Window in the operator plan") {
    val df = viaExec(events)
    df.collect()
    val exec = df.queryExecution.executedPlan
    assert(findExec(exec).nonEmpty, s"strategy did not fire:\n$exec")
    assert(!exec.toString.contains("Window"),
      s"operator plan regrew the window form:\n$exec")
  }

  test("row-for-row equal to the composed q41 window form") {
    val exp = viaWindow.orderBy("event_id").collect().toSeq
    val got = viaExec(events).select("user_id", "event_id", "sid")
      .orderBy("event_id").collect().toSeq
    assert(got == exp)
  }

  test("edges: exact-threshold gap continues; key change resets to sid 1") {
    import spark.implicits._
    // key 1: t=0, 1800 (gap == threshold → SAME session), 3601 (> →
    // new); key 2 starts fresh at sid 1 even right after key 1's rows
    val rows = Seq((1L, 0L, 1L), (1L, 1800L, 2L), (1L, 3601L, 3L),
      (2L, 10L, 4L))
      .toDF("user_id", "tsec", "event_id")
      .withColumn("ts", timestamp_seconds(col("tsec")))
    val got = Sessionize.assign(rows, Seq("user_id"),
        Seq("ts", "event_id"), "tsec", 1800L, "sid")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(2), r.getLong(4))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L)),
      got.toString)
  }

  test("whole-stage codegen: the exec fuses into a WholeStageCodegen stage") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findFused(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => findFused(a.executedPlan)
      case q: QueryStageExec => findFused(q.plan)
      case w: WholeStageCodegenExec =>
        w.collect { case e: SessionizeExec => e }.nonEmpty ||
          w.children.exists(findFused)
      case p => p.children.exists(findFused)
    }
    val df = viaExec(events)
    df.collect() // force execution so AQE finalizes stages
    val plan = df.queryExecution.executedPlan
    assert(findFused(plan),
      s"SessionizeExec did not fuse into a WholeStageCodegen stage:\n$plan")
    // and the fused plan still matches the window form row-for-row
    val exp = viaWindow.orderBy("event_id").collect().toSeq
    val got = viaExec(events).select("user_id", "event_id", "sid")
      .orderBy("event_id").collect().toSeq
    assert(got == exp)
  }

  test("non-integral keys fall back to the interpreted path, same rows") {
    import spark.implicits._
    // string session key → supportCodegen=false → interpreted doExecute
    val rows = Seq(("a", 0L, 1L), ("a", 2000L, 2L), ("b", 10L, 3L))
      .toDF("k", "tsec", "event_id")
    val df = Sessionize.assign(rows, Seq("k"), Seq("tsec", "event_id"),
      "tsec", 1800L, "sid")
    val got = df.orderBy("event_id")
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(got == Seq(("a", 1L), ("a", 2L), ("b", 1L)), got.toString)
  }

  test("NULL gap fails fast with an actionable error (non-null contract)") {
    import spark.implicits._
    val rows = Seq((1L, java.lang.Long.valueOf(0L), 1L),
        (1L, null.asInstanceOf[java.lang.Long], 2L))
      .toDF("user_id", "tsec", "event_id")
      .withColumn("ts", timestamp_seconds(col("event_id")))
    val e = intercept[Exception] {
      Sessionize.assign(rows, Seq("user_id"), Seq("ts", "event_id"),
        "tsec", 1800L, "sid").collect()
    }
    def msg(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msg(t.getCause)
    assert(msg(e).contains("NULL gap"), s"unexpected failure: $e")
  }

  test("arbitrary input partitioning: EnsureRequirements re-clusters") {
    val exp = viaWindow.orderBy("event_id").collect().toSeq
    val got = viaExec(events.repartition(17))
      .select("user_id", "event_id", "sid")
      .orderBy("event_id").collect().toSeq
    assert(got == exp)
  }
}
