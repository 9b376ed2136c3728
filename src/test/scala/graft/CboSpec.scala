package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization wiring: ANALYZE TABLE feeds rowCount /
  * column stats into the catalog, the optimizer's Statistics reflect
  * them, and with CBO + join reorder enabled a star join is reordered
  * by estimated size instead of syntactic order. At 100 TB the CBO
  * path (stats collected by a nightly ANALYZE) is what keeps
  * multi-join queries from building oversized intermediates when AQE
  * can only fix what it can observe at runtime.
  */
class CboSpec extends SparkSpec {

  private def withCbo[T](f: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try f
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  // each test creates + ANALYZEs its own fixture (idempotent), so the
  // tests are independently runnable — no cross-test table dependency
  private def analyzedSup(): Unit = {
    // a previous JVM's warehouse dir survives the in-memory catalog —
    // drop table AND location (the Scratch discipline)
    graft.queries.Scratch.dropTable(spark, "graft_cbo_sup")
    Tables(spark, sfDir, "supplier")
      .write.mode("overwrite").saveAsTable("graft_cbo_sup")
    spark.sql("ANALYZE TABLE graft_cbo_sup COMPUTE STATISTICS " +
      "FOR COLUMNS s_suppkey, s_acctbal")
  }

  test("ANALYZE TABLE stats reach the optimizer's Statistics") {
    analyzedSup()
    val expected = spark.table("graft_cbo_sup").count()
    withCbo {
      val stats = spark.table("graft_cbo_sup")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(expected)),
        s"rowCount ${stats.rowCount} != analyzed $expected")
      assert(stats.attributeStats.nonEmpty, "no column stats propagated")
      val distinct = stats.attributeStats.collectFirst {
        case (a, cs) if a.name == "s_suppkey" => cs.distinctCount
      }.flatten
      assert(distinct.contains(BigInt(expected)),
        s"s_suppkey NDV $distinct != $expected")
    }
  }

  test("filter selectivity estimates shrink under column stats") {
    // with histograms/min-max known, the optimizer estimates a range
    // filter at a fraction of the table instead of the no-stats guess
    analyzedSup()
    withCbo {
      val all = spark.table("graft_cbo_sup")
      val total = all.queryExecution.optimizedPlan.stats
        .rowCount.map(_.toLong).getOrElse(Long.MaxValue)
      val half = all.where(col("s_suppkey") <= 2)
        .queryExecution.optimizedPlan.stats
      val est = half.rowCount.map(_.toLong).getOrElse(Long.MaxValue)
      assert(est < total,
        s"range-filter estimate $est not below table rowCount $total")
    }
  }
}
