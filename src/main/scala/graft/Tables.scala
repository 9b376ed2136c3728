package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All query entry points take `(spark, sfDir)` and read tables lazily so
  * Catalyst sees the parquet scan directly — filters and column pruning
  * push down to the scan (verified via `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    // rejects by default; read nanos as long and truncate to microseconds
    // (exactly what DuckDB's ns→µs conversion does, keeping oracle parity).
    // Integer `div`, NOT floor(x/1000): `/` is double division, and at
    // ~1.7e18 ns the rounded quotient can land just above the true µs
    // integer, making floor() 1µs high vs DuckDB (observed at sf0.01).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as long → truncate to µs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // µs-NTZ generation of the table: the
        // wall-clock values ARE what DuckDB sees; session tz is pinned
        // UTC everywhere, so NTZ→LTZ is instant-preserving and restores
        // the TIMESTAMP type the ts functions (unix_millis &c) require
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }
}
