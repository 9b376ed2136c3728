package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The binned range-join rewrite: result equality vs the planner's
  * nested-loop default on every edge the rewrite touches (bounds,
  * strict/non-strict, NULLs, empty intervals, negative values), plus
  * plan-shape assertions that the rewrite actually replaced the
  * all-pairs loop and stays idempotent/ineligible where it must.
  */
class RangeJoinBinningSpec extends SparkSpec {
  import spark.implicits._

  private def withBin[T](w: String)(f: => T): T = {
    spark.conf.set("spark.graft.rangeJoin.binWidth", w)
    try f finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // intervals: [lo, hi] with NULLs and an empty interval planted
  private lazy val intervals = Seq[(Int, java.lang.Double, java.lang.Double)](
    (1, 0.0, 10.0), (2, 5.0, 5.0), (3, -20.0, -3.5), (4, 9.9, 30.0),
    (5, null, 10.0), (6, 2.0, null), (7, 50.0, 40.0), (8, -1.0, 1.0))
    .toDF("iid", "lo", "hi")
  private lazy val points = Seq[(Int, java.lang.Double)](
    (10, 0.0), (11, 5.0), (12, -3.5), (13, 10.0), (14, 29.999),
    (15, null), (16, 45.0), (17, -19.0), (18, 0.5))
    .toDF("pid", "pt")

  test("binned between-join == nested-loop result; plan is an equi-join") {
    val q = intervals.join(points,
      col("pt").between(col("lo"), col("hi")))
    val base = sortedRows(q)
    assert(base.nonEmpty)
    withBin("7.0") {
      val binned = intervals.join(points,
        col("pt").between(col("lo"), col("hi")))
      val plan = binned.queryExecution.executedPlan.toString
      assert(plan.contains("graft_bin"), plan.take(1500))
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(1500))
      assert(sortedRows(binned) == base)
    }
  }

  test("strict bounds and reversed operand order rewrite correctly") {
    // pt > lo AND hi >= pt — mixed strictness, mixed operand sides
    val q = intervals.join(points,
      col("pt") > col("lo") && col("hi") >= col("pt"))
    val base = sortedRows(q)
    withBin("3.0") {
      val binned = intervals.join(points,
        col("pt") > col("lo") && col("hi") >= col("pt"))
      assert(binned.queryExecution.executedPlan.toString
        .contains("graft_bin"))
      assert(sortedRows(binned) == base)
    }
  }

  test("extra residual conjuncts ride along") {
    val q = intervals.join(points,
      col("pt").between(col("lo"), col("hi")) && col("pid") =!= col("iid"))
    val base = sortedRows(q)
    withBin("5.0") {
      val binned = intervals.join(points,
        col("pt").between(col("lo"), col("hi")) && col("pid") =!= col("iid"))
      assert(binned.queryExecution.executedPlan.toString
        .contains("graft_bin"))
      assert(sortedRows(binned) == base)
    }
  }

  test("joins with an equi key are left alone; rule is conf-gated") {
    val eq = intervals.join(points, col("iid") === col("pid"))
    withBin("5.0") {
      assert(!eq.queryExecution.executedPlan.toString.contains("graft_bin"))
    }
    // conf unset -> pure range join keeps the planner default
    val q = intervals.join(points, col("pt").between(col("lo"), col("hi")))
    assert(!q.queryExecution.executedPlan.toString.contains("graft_bin"))
  }

  test("RANGE_BIN hint bins a single join without the session conf") {
    val q = intervals.join(points, col("pt").between(col("lo"), col("hi")))
    val base = sortedRows(q)
    val hinted = q.hint("range_bin", 7.0)
    val plan = hinted.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bin"), plan.take(1500))
    assert(sortedRows(hinted) == base)
    // invalid parameter -> hint ignored, planner default survives
    val bad = q.hint("range_bin", "wide")
    assert(!bad.queryExecution.executedPlan.toString.contains("graft_bin"))
    assert(sortedRows(bad) == base)
  }

  test("SQL /*+ RANGE_BIN(w) */ hint reaches the rewrite") {
    intervals.createOrReplaceTempView("rb_intervals")
    points.createOrReplaceTempView("rb_points")
    val q = spark.sql("""
      SELECT /*+ RANGE_BIN(7) */ iid, pid FROM rb_intervals JOIN rb_points
      ON pt BETWEEN lo AND hi""")
    assert(q.queryExecution.executedPlan.toString.contains("graft_bin"))
    val base = spark.sql("""
      SELECT iid, pid FROM rb_intervals JOIN rb_points
      ON pt BETWEEN lo AND hi""")
    assert(sortedRows(q) == sortedRows(base))
  }

  test("bins-per-interval cap: exactly cap bins pass, cap+1 raises") {
    // width 1.0 → interval [0, 9.5] covers bins 0..9 = exactly 10
    val iv = Seq((1, 0.0, 9.5)).toDF("iid", "lo", "hi")
    val pts = Seq((10, 4.0)).toDF("pid", "pt")
    def run(cap: String): Seq[String] = {
      spark.conf.set("spark.graft.rangeJoin.maxBinsPerRow", cap)
      try withBin("1.0") {
        sortedRows(iv.join(pts, col("pt").between(col("lo"), col("hi"))))
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBinsPerRow")
    }
    assert(run("10").size == 1) // 10 covered bins == cap → allowed
    val e = intercept[Exception] { run("9") } // 10 > cap → actionable
    assert(e.getMessage != null &&
      (e.getMessage.contains("more than 9 bins") ||
        e.getCause != null && e.getCause.getMessage.contains("more than 9 bins")),
      s"expected the cap message, got: ${e.getMessage}")
  }

  test("q17's real-table shape: binned == default at sf0.001") {
    val part = graft.Tables(spark, sfDir, "part")
    val supplier = graft.Tables(spark, sfDir, "supplier")
    def q = part.join(supplier,
        col("p_retailprice").between(col("s_acctbal"),
          col("s_acctbal") + 100))
      .select("p_partkey", "s_suppkey")
    val base = sortedRows(q)
    withBin("100") {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft_bin") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
      assert(sortedRows(q) == base)
    }
  }
}
