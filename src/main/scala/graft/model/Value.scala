package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's dynamic value type ("VALUE" in SURVEY.md §1.2) — a tagged
  * struct mirroring the reference's `DataBlock` oneof
  * (reference: src/ahghee.grpc/types.proto:28-53). The tag `vtype` keeps
  * the proto case numbers so cross-type ordering matches the reference's
  * comparator (src/ahghee.grpc/MemoryPointer.partial.cs:377-414): values
  * of different types order by case number, same-type compare natively.
  *
  * Kept flat (no nested arrays of itself) so it stays codegen- and
  * pushdown-friendly; nested Array/Map DataBlocks serialize to `bytes`
  * as JSON with type_iri "application/json", matching the reference's
  * own JSON fallback (src/server/ContextExtensions.cs:269-278).
  */
object Value {
  // proto oneof case numbers (types.proto:30-42)
  val NODEID = 1
  val METABYTES = 2
  val STR = 3
  val I32 = 4
  val I64 = 5
  val UI32 = 6
  val UI64 = 7
  val D = 8
  val F = 9
  val B = 10
  val ARRAY = 12
  val MAP = 13

  /** Spark-side schema of one VALUE. `iri` carries NodeID.iri (the graph
    * name NodeID.remote is a table-level column, not per-value). */
  val schema: StructType = StructType(Seq(
    StructField("vtype", IntegerType, nullable = false),
    StructField("str", StringType),
    StructField("i64", LongType),          // i32/i64/ui32 all carried here
    StructField("num", DoubleType),        // d and f
    StructField("b", BooleanType),
    StructField("iri", StringType),        // nodeid target
    StructField("type_iri", StringType),   // metabytes type
    StructField("bytes", BinaryType)))

  private def nullC(dt: DataType): Column = lit(null).cast(dt)

  /** A typed NULL VALUE — the empty metadata slot (TMD with no
    * annotations, types.proto:55-59). */
  def nullValue: Column = lit(null).cast(schema)

  private def mk(vtype: Int, str: Column = nullC(StringType),
                 i64: Column = nullC(LongType), num: Column = nullC(DoubleType),
                 b: Column = nullC(BooleanType), iri: Column = nullC(StringType),
                 typeIri: Column = nullC(StringType),
                 bytes: Column = nullC(BinaryType)): Column =
    struct(lit(vtype).as("vtype"), str.as("str"), i64.as("i64"),
      num.as("num"), b.as("b"), iri.as("iri"), typeIri.as("type_iri"),
      bytes.as("bytes"))

  def str(c: Column): Column = mk(STR, str = c.cast(StringType))
  def i32(c: Column): Column = mk(I32, i64 = c.cast(LongType))
  def i64(c: Column): Column = mk(I64, i64 = c.cast(LongType))
  def d(c: Column): Column = mk(D, num = c.cast(DoubleType))
  def f(c: Column): Column = mk(F, num = c.cast(DoubleType))
  def bool(c: Column): Column = mk(B, b = c.cast(BooleanType))
  def nodeid(iriC: Column): Column = mk(NODEID, iri = iriC.cast(StringType))
  def typedBytes(typeIri: Column, bytes: Column): Column =
    mk(METABYTES, typeIri = typeIri, bytes = bytes)

  /** Total-order sort key for a VALUE column: order by vtype first, then
    * the per-type payload (reference semantics
    * MemoryPointer.partial.cs:377-402: cross-type by case number,
    * same-type natively, strings ordinal, TypeBytes by type-IRI then
    * bytes). Struct-field comparison in Spark is lexicographic by field
    * position, so projecting the payload into one comparable struct gives
    * the exact order without a custom Expression.
    */
  def sortKey(v: Column): Column = struct(
    v.getField("vtype"),
    v.getField("i64"), v.getField("num"), v.getField("b"),
    v.getField("str"), v.getField("iri"),
    v.getField("type_iri"), base64(v.getField("bytes")))

  /** Render a VALUE to a display string (Printers.cs-style). */
  def render(v: Column): Column = {
    val t = v.getField("vtype")
    when(t === NODEID, concat(lit("^"), v.getField("iri")))
      .when(t === STR, v.getField("str"))
      .when(t.isin(I32, I64, UI32, UI64), v.getField("i64").cast(StringType))
      .when(t.isin(D, F), v.getField("num").cast(StringType))
      .when(t === B, v.getField("b").cast(StringType))
      .otherwise(concat(lit("bytes:"), coalesce(v.getField("type_iri"), lit(""))))
  }
}
