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
  * nodes_attrs schema). Both the key and the value carry an optional
  * metadata VALUE — the reference's TMD wraps every key AND value in
  * (metadata, data) pairs (reference: types.proto:55-59): `value_meta`
  * holds N-Triples `^^<type>` / `@lang` annotations
  * (ContextExtensions.cs:70-102), `key_meta` holds the node reference
  * of a `^"key"` fedge/dedge (AHGHEE.g4:56-66). */
case class AttrRow(
    graph: String,
    id: String,
    key: String,
    value: ValueRow,
    ts: Long = 0L,
    value_meta: Option[ValueRow] = None,
    key_meta: Option[ValueRow] = None)

/** One attribute of a grouped Node: full TMD pair — (key, key_meta) →
  * (value, value_meta) — plus the write timestamp. */
case class NodeAttr(
    key: String,
    value: ValueRow,
    ts: Long = 0L,
    key_meta: Option[ValueRow] = None,
    value_meta: Option[ValueRow] = None)

/** The reference's Node message as a first-class typed result: id plus
  * its attribute multiset, sorted by (key, value) for determinism
  * (reference: types.proto:66-70 — Node = id + repeated KeyValue;
  * fragment merge collapses to one logical node, FileStore.fs:71-79). */
case class Node(id: String, attrs: Seq[NodeAttr])
