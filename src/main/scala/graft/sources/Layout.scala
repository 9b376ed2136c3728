package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering (Z-order) for parquet layouts.
  *
  * A sort on ONE column gives parquet row-group min/max stats that prune
  * scans filtered on that column — and destroys locality for every other
  * column. Interleaving the bits of two dimension ranks (the Z-order /
  * Morton curve, the layout Delta/Iceberg expose as OPTIMIZE ZORDER BY)
  * keeps BOTH dimensions' values range-bounded within every file and row
  * group, so min/max pruning fires for filters on either column. This is
  * a pure layout concern: rewriting data placement, not values — the
  * reference's closest analog is its sorted per-bucket storage
  * (GraphStore's murmur3 buckets); Z-order is the multi-column
  * generalization a 100 TB lakehouse needs when queries filter on more
  * than the partition key.
  *
  * Everything is Column algebra (codegen'd, no UDF): ranks are min/max
  * scaled to 16 bits, bit-spreading uses the classic mask-shift ladder.
  * LayoutSpec pins the actual effect: scanning with a filter on the
  * SECOND dimension reads a small fraction of the rows a single-column
  * sort layout reads (parquet row-group skipping measured through the
  * scan's numOutputRows metric).
  */
object Layout {

  /** Spread the low 16 bits of x to even bit positions (Morton):
    * 0b1111 → 0b01010101. The mask-shift ladder is branch-free and
    * stays inside whole-stage codegen. */
  def spread16(x0: Column): Column = {
    var x = x0.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Interleave two 16-bit ranks into one 32-bit Z-value. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Min/max scale a numeric column to the 0..65535 rank space.
    * (mn, mx) come from one driver-side bounds aggregate — at scale
    * they'd come from table statistics; approximate bounds only blur
    * the curve, never break correctness, since Z-order is layout. */
  def rank16(c: Column, mn: Long, mx: Long): Column =
    if (mx == mn) lit(0L)
    else ((c.cast("long") - mn) * 65535L / (mx - mn)).cast("long")

  /** Rewrite `df` Z-ordered on two numeric columns: rank both dims,
    * interleave, range-partition by the Z-value into `nFiles` files and
    * sort within each — every file then covers a compact Z-range, i.e.
    * a bounded rectangle in (a, b) space, which is exactly what parquet
    * min/max row-group stats need to prune filters on EITHER column.
    * Small row groups (4 MB here vs the 128 MB default) make the
    * pruning granularity finer than the file split. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int): Unit = {
    val b = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).first()
    val z = zValue(rank16(col(colA), b.getLong(0), b.getLong(1)),
      rank16(col(colB), b.getLong(2), b.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", 4L * 1024 * 1024)
      .parquet(path)
  }

  /** The single-column-sort baseline layout (same file count, same row
    * group size) — what z-order is measured against in LayoutSpec. */
  def writeSorted(df: DataFrame, colA: String, path: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(colA))
      .sortWithinPartitions(colA)
      .write.mode("overwrite")
      .option("parquet.block.size", 4L * 1024 * 1024)
      .parquet(path)
}
