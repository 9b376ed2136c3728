package graft.ingest

import graft.model.Value

/** Case-class mirror of one VALUE (field order matches Value.schema so
  * Dataset encoders line up with the column form). */
case class ValueRow(
    vtype: Int,
    str: Option[String] = None,
    i64: Option[Long] = None,
    num: Option[Double] = None,
    b: Option[Boolean] = None,
    iri: Option[String] = None,
    type_iri: Option[String] = None,
    bytes: Option[Array[Byte]] = None)

object ValueRow {
  def str(s: String): ValueRow = ValueRow(Value.STR, str = Some(s))
  def i32(i: Int): ValueRow = ValueRow(Value.I32, i64 = Some(i.toLong))
  def i64(i: Long): ValueRow = ValueRow(Value.I64, i64 = Some(i))
  def ui64(i: Long): ValueRow = ValueRow(Value.UI64, i64 = Some(i))
  def f32(f: Float): ValueRow = ValueRow(Value.F, num = Some(f.toDouble))
  def d(x: Double): ValueRow = ValueRow(Value.D, num = Some(x))
  def bool(x: Boolean): ValueRow = ValueRow(Value.B, b = Some(x))
  def nodeid(target: String): ValueRow = ValueRow(Value.NODEID, iri = Some(target))
  def typedBytes(typeIri: String, bs: Array[Byte]): ValueRow =
    ValueRow(Value.METABYTES, type_iri = Some(typeIri), bytes = Some(bs))
}

/** One long-form attribute row (the ingest-side twin of GraphView's
  * nodes_attrs schema, plus the per-value metadata slot the N-Triples
  * path needs for `^^<type>` / `@lang` annotations). */
case class AttrRow(
    graph: String,
    id: String,
    key: String,
    value: ValueRow,
    ts: Long = 0L,
    value_meta: Option[ValueRow] = None)
