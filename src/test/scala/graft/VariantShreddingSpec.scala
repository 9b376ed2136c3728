package graft

import org.apache.spark.sql.functions._

/** VARIANT shredding, write-side (q76's plan pins): with
  * writeShredding + inferShreddingSchema the parquet footer carries
  * typed_value subcolumns extracted from the VARIANT at write time,
  * and with pushVariantIntoScan a typed-path read replaces the variant
  * in the scan schema with a struct of ONLY the requested fields — the
  * columnar pruning that makes schema-on-read cheap at 100 TB (vs
  * re-decoding the binary variant per row per query).
  */
class VariantShreddingSpec extends SparkSpec {

  private val confs = Seq(
    "spark.sql.variant.writeShredding.enabled" -> "true",
    "spark.sql.variant.inferShreddingSchema" -> "true",
    "spark.sql.variant.pushVariantIntoScan" -> "true")

  private def withShredding[T](f: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("shredded write extracts typed columns; typed read prunes the scan") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-shred").toString + "/ev"
    withShredding {
      Tables(spark, sfDir, "events")
        .select(col("event_id"), col("event_type"),
          parse_json(col("props")).as("v"))
        .write.mode("overwrite").parquet(out)
      // 1. WRITE side: the footer schema holds a typed_value group
      //    under v — the shredded typed column, skippable/prunable
      //    like any other
      val file = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file.getPath),
          new org.apache.hadoop.conf.Configuration()))
      val footer = rdr.getFooter.getFileMetaData.getSchema.toString
      rdr.close()
      assert(footer.contains("typed_value"),
        s"no shredded typed column in the footer:\n$footer")
      assert(footer.contains("group k") || footer.contains("required group k"),
        s"the \\$$.k path was not shredded:\n$footer")

      // 2. READ side: pushVariantIntoScan replaces the variant with a
      //    struct of the requested path only — visible in ReadSchema
      val q = spark.read.parquet(out)
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'int')").as("k"))
        .groupBy("event_type").agg(sum("k").as("sum_k"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("v:struct<0:int>"),
        s"typed-path scan not pruned to the requested field:\n$plan")

      // 3. CORRECTNESS: shredded-typed read == unshredded variant_get
      //    over the raw props text
      val shredded = q.orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val raw = Tables(spark, sfDir, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .groupBy("event_type").agg(sum("k").as("sum_k"))
        .orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(shredded == raw)
    }
  }
}
