package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Value

/** N-Triples sink — the export half of the reference's NT surface
  * (reference reads NT, WatService.cs:216-300; export symmetry lets a
  * graph leave the engine in the same standard format it arrived in).
  *
  * Rendering is pure column expressions (one codegen pass, no UDF):
  *  - NODEID values → `<iri>` (blank nodes `_:b` pass through);
  *  - STR values → escaped `"lit"`, with `@lang` / `^^<type>` re-rendered
  *    from value_meta (the reader's metadata mapping, inverted);
  *  - engine-native scalars (put-script i64/double/bool) → XSD-typed
  *    literals — these round-trip as typed STRINGS (the NT data model
  *    has no native numbers), documented lossy-by-format.
  *
  * `write` lands one text file per partition — at 100 TB the export
  * parallelizes exactly like the splittable read side.
  */
object NTriplesWriter {

  private def esc(c: Column): Column = {
    // order matters: backslash first, then the characters that expand
    val bs = regexp_replace(c, "\\\\", "\\\\\\\\")
    val q = regexp_replace(bs, "\"", "\\\\\"")
    val n = regexp_replace(q, "\n", "\\\\n")
    val r = regexp_replace(n, "\r", "\\\\r")
    regexp_replace(r, "\t", "\\\\t")
  }

  private def iriOrBlank(c: Column): Column =
    when(c.startsWith("_:"), c).otherwise(concat(lit("<"), c, lit(">")))

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  /** One attr row → one N-Triples line. */
  def line(id: Column, key: Column, value: Column,
           valueMeta: Column): Column = {
    val metaSuffix = when(valueMeta.getField("vtype") === Value.NODEID,
        concat(lit("^^<"), valueMeta.getField("iri"), lit(">")))
      .when(valueMeta.getField("vtype") === Value.STR &&
          valueMeta.getField("str").startsWith("lang:"),
        regexp_replace(valueMeta.getField("str"), "^lang:", ""))
      .otherwise(lit(""))
    def typed(lex: Column, t: String) =
      concat(lit("\""), lex, lit("\"^^<" + Xsd + t + ">"))
    val obj = when(value.getField("vtype") === Value.NODEID,
        iriOrBlank(value.getField("iri")))
      .when(value.getField("vtype") === Value.STR,
        concat(lit("\""), esc(value.getField("str")), lit("\""), metaSuffix))
      .when(value.getField("vtype").isin(Value.I32, Value.I64,
          Value.UI32, Value.UI64),
        typed(value.getField("i64").cast("string"), "long"))
      .when(value.getField("vtype").isin(Value.D, Value.F),
        typed(value.getField("num").cast("string"), "double"))
      .when(value.getField("vtype") === Value.B,
        typed(value.getField("b").cast("string"), "boolean"))
      .otherwise(concat(lit("\""), esc(value.getField("str")), lit("\"")))
    concat_ws(" ", iriOrBlank(id), concat(lit("<"), key, lit(">")), obj,
      lit("."))
  }

  /** Long-form attrs frame → Dataset of N-Triples lines. */
  def lines(attrs: DataFrame): Dataset[String] = {
    val spark = attrs.sparkSession
    import spark.implicits._
    val meta = if (attrs.columns.contains("value_meta")) col("value_meta")
      else Value.nullValue
    attrs.select(
      line(col("id"), col("key"), col("value"), meta).as("nt")).as[String]
  }

  /** Export to a directory of .nt text files (one per partition). */
  def write(attrs: DataFrame, path: String): Unit =
    lines(attrs).write.mode("overwrite").text(path)
}
