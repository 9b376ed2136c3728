package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the POINT of the Z-order layout: parquet min/max row-group
  * pruning fires for filters on EITHER clustered column, where a
  * single-column sort only serves its own column. Measured through the
  * scan's numOutputRows metric — rows that survive row-group skipping —
  * not plan text, so a regression in the curve math (bit spreading,
  * rank scaling) or in the writer's range partitioning shows up as
  * full-table reads here. */
class LayoutSpec extends SparkSpec {

  private def rowsRead(path: String, filter: Column): Long = {
    val q = spark.read.parquet(path).where(filter)
    q.collect()
    q.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-order serves BOTH dimensions' filters; sort serves only its own") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val base = java.nio.file.Files
      .createTempDirectory("graft-layout").toString
    Layout.writeSorted(li, "l_partkey", s"$base/sorted", 32)
    Layout.writeZOrdered(li, "l_partkey", "l_suppkey", s"$base/zorder", 32)
    val total = li.count() // 60k rows, partkey 0..1999, suppkey 0..99

    // narrow filter on the SECOND dimension (5% of the suppkey range):
    // the partkey-sorted layout scatters any suppkey everywhere — every
    // row group survives pruning; z-order bounds suppkey per row group
    val sndFilter = col("l_suppkey").between(40, 44)
    val sortedSnd = rowsRead(s"$base/sorted", sndFilter)
    val zSnd = rowsRead(s"$base/zorder", sndFilter)
    info(s"second-dim filter: sorted reads $sortedSnd, z-order reads " +
      s"$zSnd of $total")
    assert(sortedSnd > (total * 9) / 10,
      s"sorted layout unexpectedly pruned a second-dim filter: $sortedSnd")
    assert(zSnd * 2 < sortedSnd,
      s"z-order read $zSnd rows — row-group pruning is not firing")

    // narrow filter on the FIRST dimension: both layouts must prune
    val fstFilter = col("l_partkey").between(100, 199)
    val sortedFst = rowsRead(s"$base/sorted", fstFilter)
    val zFst = rowsRead(s"$base/zorder", fstFilter)
    info(s"first-dim filter: sorted reads $sortedFst, z-order reads $zFst")
    assert(sortedFst * 4 < total, "sort stopped pruning its own column")
    assert(zFst * 2 < total, "z-order stopped pruning the first column")

    // layout rewrites placement, never content
    val back = spark.read.parquet(s"$base/zorder")
    assert(back.count() == total)
    assert(back.agg(sum("l_quantity")).first().getDouble(0) ==
      li.agg(sum("l_quantity")).first().getDouble(0))
  }

  test("hive-partitioned layout prunes fact scans dynamically (DPP)") {
    // the third layout arm beside buckets (GraphStoreSpec) and z-order:
    // directory partitioning on the join key lets Catalyst inject the
    // dim side's filter result as a runtime partition filter on the
    // fact scan — at 100 TB this is the difference between touching 4
    // and 100 partitions when the dim filter is selective
    val base = java.nio.file.Files
      .createTempDirectory("graft-dpp").toString
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_suppkey", "l_quantity")
    li.write.partitionBy("l_suppkey").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read
      .parquet("/root/testdata/sf0.01/supplier.parquet")
      .where(col("s_acctbal") > 9000) // selective: few suppliers survive
    val nDim = dim.count()
    assert(nDim > 0 && nDim < 20, s"filter not selective: $nDim")
    // AQE hides scan nodes inside query stages; DPP is orthogonal to
    // AQE, so flatten the plan for metric access
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val j = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"))
    try j.collect()
    finally spark.conf.set("spark.sql.adaptive.enabled", before)
    val scans = j.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
    val factScan = scans.find(_.metadata("Location").contains("fact")).get
    assert(factScan.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning")),
      s"no dynamic pruning expression on the fact scan:" +
        s" ${factScan.partitionFilters}")
    val factRows = factScan.metrics("numOutputRows").value
    val total = li.count()
    info(s"DPP: fact scan read $factRows of $total rows" +
      s" for $nDim surviving suppliers")
    assert(factRows < total / 2,
      s"DPP did not prune: read $factRows of $total")
  }
}
