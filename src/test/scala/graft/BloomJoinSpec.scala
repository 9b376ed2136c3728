package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (SPARK-32268): with a selective
  * filter on the dim side of a SHUFFLE join, Catalyst injects a
  * might_contain(bloom_filter_agg(dim keys)) predicate on the fact
  * side — at 100 TB this drops non-joining fact rows BEFORE the
  * shuffle, the same class of win as DPP but for non-partition keys.
  */
class BloomJoinSpec extends SparkSpec {

  private val confs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    // AQE wraps the fact side in leaf query stages, which hides the
    // injected Filter from plan.collect; the injection itself is
    // AQE-independent (it happens in the logical optimizer)
    "spark.sql.adaptive.enabled" -> "false")

  private def withBloomConfs[T](f: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("selective dim filter injects might_contain on the fact side") {
    withBloomConfs {
      val li = Tables(spark, sfDir, "lineitem")
        .select("l_suppkey", "l_quantity")
      val sup = Tables(spark, sfDir, "supplier")
        .where(col("s_suppkey") % 10 === 0)
      val j = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy("s_suppkey").agg(sum("l_quantity").as("qty"))
      j.collect()
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // effectiveness: the bloom filter drops most non-joining fact
      // rows BEFORE the shuffle (10% of suppliers survive the dim
      // filter; bloom false positives add slack)
      import org.apache.spark.sql.execution.FilterExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val exec = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val bloomFilters = exec.collect {
        case f: FilterExec
          if f.condition.toString.toLowerCase.contains("might_contain") => f
      }
      assert(bloomFilters.nonEmpty, "no might_contain FilterExec")
      val passed = bloomFilters.map(_.metrics("numOutputRows").value).sum
      val total = Tables(spark, sfDir, "lineitem").count()
      assert(passed < total * 4 / 10,
        s"bloom filter passed $passed of $total fact rows")
    }
  }

  test("q72 registry entry matches the bloom-off plan row-for-row") {
    val bloomOn = SparkEntry.queries("q72_bloom_join_prune")(spark, sfDir)
      .collect().toSeq
    val off = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.enabled")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
      "false")
    try {
      val bloomOff = SparkEntry.queries("q72_bloom_join_prune")(
        spark, sfDir).collect().toSeq
      assert(bloomOn == bloomOff)
    } finally spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.enabled", off)
  }
}
