package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Value

/** TinkerPop GraphML sink — the export inverse of [[GraphMlReader]]'s
  * reification convention: ids carrying both `source` and `target`
  * nodeid attributes are edge-nodes and render as `<edge>` elements
  * (their other attributes as `<data>`); every other id renders as
  * `<node>`. The derived back-references (`out.X` / `in.X`) and the
  * edge-node's `source`/`target` rows are NOT written — the reader
  * regenerates exactly them, so read → write → read is the identical
  * graph for GraphML-ingested data. Other nodeid attributes render as
  * string data (GraphML's type system has no node references —
  * lossy-by-format, like NT's scalars; use the N-Triples writer for
  * full fidelity).
  *
  * GraphML is one XML document — the same driver-side fixture path as
  * the reader (`wholetext`), streamed id-at-a-time from a sorted
  * `toLocalIterator`, never collected. The 100 TB fact path is parquet.
  */
object GraphMlWriter {

  private def xmlEsc(s: String): String = s.flatMap {
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '&' => "&amp;"
    case '"' => "&quot;"
    case c => c.toString
  }

  private def attrType(vtype: Int): String = vtype match {
    case Value.I32 | Value.UI32 => "int"
    case Value.I64 | Value.UI64 => "long"
    case Value.D => "double"
    case Value.F => "float"
    case Value.B => "boolean"
    case _ => "string"
  }

  /** Render the graph as one GraphML document string. */
  def render(attrs: DataFrame): String = {
    val flat = attrs.select(col("id"), col("key"),
        col("value.vtype").as("vtype"),
        coalesce(col("value.str"), col("value.iri"),
          col("value.i64").cast("string"), col("value.num").cast("string"),
          col("value.b").cast("string")).as("lex"))
      .where(!col("key").startsWith("out.") && !col("key").startsWith("in."))
      .orderBy("id", "key")
      .localCheckpoint() // feeds key decls + the row stream

    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">\n"
    // key declarations from the observed (key, vtype) pairs. Only the
    // NODEID-typed source/target rows are edge reification (suppressed
    // from <data> below) — a plain node attribute that happens to be
    // named "source" (documents.source, say) still emits <data>, so it
    // must still be declared or the document is non-conformant for
    // external TinkerPop consumers.
    flat.where(!(col("key").isin("source", "target") &&
        col("vtype") === Value.NODEID))
      .select(col("key"), col("vtype")).distinct()
      .orderBy("key").collect().foreach { r =>
        val k = xmlEsc(r.getString(0))
        sb ++= s"""  <key id="$k" for="all" attr.name="$k" attr.type="${
          attrType(r.getInt(1))}"/>\n"""
      }
    sb ++= "  <graph id=\"G\" edgedefault=\"directed\">\n"

    // stream grouped per id: attrs of one id are contiguous in id order
    val it = flat.toLocalIterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]
    var cur: String = null
    def flush(): Unit = if (cur != null) {
      val m = buf.groupBy(_._1)
      val isEdge = m.contains("source") && m.contains("target") &&
        Seq("source", "target").forall(k => m(k).head._2 == Value.NODEID)
      val dataRows = buf.filterNot(r => isEdge &&
        (r._1 == "source" || r._1 == "target"))
      val open = if (isEdge)
        s"""<edge id="${xmlEsc(cur)}" source="${xmlEsc(m("source").head._3)}" target="${xmlEsc(m("target").head._3)}">"""
      else s"""<node id="${xmlEsc(cur)}">"""
      sb ++= s"    $open\n"
      dataRows.foreach { case (k, _, lex) =>
        sb ++= s"""      <data key="${xmlEsc(k)}">${xmlEsc(lex)}</data>\n"""
      }
      sb ++= (if (isEdge) "    </edge>\n" else "    </node>\n")
      buf.clear()
    }
    while (it.hasNext) {
      val r = it.next()
      if (r.getString(0) != cur) { flush(); cur = r.getString(0) }
      buf += ((r.getString(1), r.getInt(2), Option(r.getString(3)).getOrElse("")))
    }
    flush()
    sb ++= "  </graph>\n</graphml>\n"
    sb.toString
  }

  /** Write the graph as a single .graphml file. */
  def write(attrs: DataFrame, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      render(attrs))
}
