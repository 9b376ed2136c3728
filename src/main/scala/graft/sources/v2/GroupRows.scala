package graft.sources.v2

import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Spark StructType ⇄ parquet example-Group conversion for the `graft`
  * DataSource V2 store (sources/GraphStore.scala's bucketed layout made
  * a first-class table — reference seam: FileStore.fs:514-551 routes
  * node fragments to hash partitions; NodeAttrIndex.cs:35-50 rebuilds
  * them per partition).
  *
  * The V2 reader/writer cannot delegate to Spark's internal parquet
  * file format (executors see only the connector API), so the store
  * speaks parquet through the public parquet-hadoop example API: a
  * MessageType mirroring the StructType, Group records converted
  * to/from InternalRow. Supported types are the store's actual surface
  * (string/int/long/double/boolean/binary + nested struct — the
  * nodes_attrs VALUE struct); anything else fails loudly at schema
  * build time rather than corrupting silently.
  */
object GroupRows {

  /** StructType → parquet MessageType (all fields optional, matching
    * Spark's own parquet writer convention for nullable columns). */
  def messageType(schema: StructType, name: String = "graft"): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach(f => b.addField(field(f.name, f.dataType)))
    b.named(name)
  }

  private def field(name: String, dt: DataType): Type = dt match {
    case StringType => Types.optional(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named(name)
    case IntegerType => Types.optional(PrimitiveTypeName.INT32).named(name)
    case LongType => Types.optional(PrimitiveTypeName.INT64).named(name)
    case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE).named(name)
    case FloatType => Types.optional(PrimitiveTypeName.FLOAT).named(name)
    case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN).named(name)
    case BinaryType => Types.optional(PrimitiveTypeName.BINARY).named(name)
    case st: StructType =>
      val gb = Types.optionalGroup()
      st.fields.foreach(f => gb.addField(field(f.name, f.dataType)))
      gb.named(name)
    case other => throw new IllegalArgumentException(
      s"graft store does not support column type $other ($name)")
  }

  /** InternalRow → Group under `schema` (the writer side). */
  def toGroup(row: InternalRow, schema: StructType, mt: GroupType): Group = {
    val g = new SimpleGroup(mt)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) set(g, i, row, schema.fields(i).dataType, mt)
      i += 1
    }
    g
  }

  private def set(g: Group, i: Int, row: InternalRow, dt: DataType,
                  mt: GroupType): Unit = dt match {
    case StringType => g.add(i, row.getUTF8String(i).toString)
    case IntegerType => g.add(i, row.getInt(i))
    case LongType => g.add(i, row.getLong(i))
    case DoubleType => g.add(i, row.getDouble(i))
    case FloatType => g.add(i, row.getFloat(i))
    case BooleanType => g.add(i, row.getBoolean(i))
    case BinaryType => g.add(i, Binary.fromConstantByteArray(row.getBinary(i)))
    case st: StructType =>
      val sub = g.addGroup(i)
      val nested = row.getStruct(i, st.length)
      val subType = mt.getType(i).asGroupType()
      var j = 0
      while (j < st.length) {
        if (!nested.isNullAt(j))
          set(sub, j, nested, st.fields(j).dataType, subType)
        j += 1
      }
    case other => throw new IllegalArgumentException(s"unsupported $other")
  }

  /** Group → InternalRow under the READ schema (the reader side) —
    * `fileType` is the file's own group type (projection may reorder
    * or subset fields, so lookup is by NAME, absent → null). */
  def toRow(g: Group, schema: StructType): InternalRow = {
    val out = new Array[Any](schema.length)
    val gt = g.getType
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      out(i) = null
      if (gt.containsField(f.name)) {
        val idx = gt.getFieldIndex(f.name)
        if (g.getFieldRepetitionCount(idx) > 0)
          out(i) = get(g, idx, f.dataType)
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  private def get(g: Group, idx: Int, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(g.getString(idx, 0))
    case IntegerType => g.getInteger(idx, 0)
    case LongType => g.getLong(idx, 0)
    case DoubleType => g.getDouble(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case BooleanType => g.getBoolean(idx, 0)
    case BinaryType => g.getBinary(idx, 0).getBytes
    case st: StructType => toRow(g.getGroup(idx, 0), st)
    case other => throw new IllegalArgumentException(s"unsupported $other")
  }
}
