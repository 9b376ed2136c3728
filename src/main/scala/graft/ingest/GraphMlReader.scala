package graft.ingest

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

/** TinkerPop GraphML source, reproducing the reference's reification
  * convention (reference: src/core/TinkerPop.fs:36-164):
  *
  *  - `<key>` declarations type the values (`xs:string/int/double` —
  *    TinkerPop.fs:27-32); ints MUST round-trip as i32;
  *  - vertices become nodes with their declared attributes;
  *  - each `<edge>` becomes its OWN node (id = edge id) carrying
  *    `labelE`, `weight`, plus `source`/`target` nodeid attributes
  *    (TinkerPop.fs:101-156);
  *  - both endpoints get `out.<labelE>` / `in.<labelE>` attributes
  *    pointing at the edge-node — not the far vertex
  *    (TinkerPop.fs:78-97).
  *
  * Distribution: one GraphML file parses on one task (`wholetext`), many
  * files parallelize per file — the format is a small-fixture/dimension
  * path, not the 100 TB fact path (that's Parquet).
  */
object GraphMlReader {

  def read(spark: SparkSession, path: String, graph: String = ""): Dataset[AttrRow] = {
    import spark.implicits._
    // http(s) URLs spool to a local temp file like the N-Triples path
    // (reference accepts URLs for loads, WatService.cs:216-239)
    val local = NTriplesReader.localize(path)
    spark.read.option("wholetext", "true").textFile(local)
      .flatMap(xml => parse(xml, graph))
  }

  /** Parse one GraphML document into long-form attribute rows. */
  def parse(xml: String, graph: String = ""): Seq[AttrRow] = {
    val fac = XMLInputFactory.newInstance()
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = fac.createXMLStreamReader(new StringReader(xml))

    val keyTypes = mutable.Map[String, String]() // key id -> attr.type
    val rows = mutable.ArrayBuffer[AttrRow]()

    var elemId: String = null          // current node/edge id
    var isEdge = false
    var src: String = null
    var tgt: String = null
    var dataKey: String = null
    val text = new StringBuilder
    var edgeLabel: String = null
    val pending = mutable.ArrayBuffer[(String, ValueRow)]()

    def typed(key: String, s: String): ValueRow =
      keyTypes.getOrElse(key, "string") match {
        case "int" | "integer" => ValueRow.i32(s.trim.toInt)
        case "long" => ValueRow.i64(s.trim.toLong)
        case "double" => ValueRow.d(s.trim.toDouble)
        case "float" => ValueRow.f32(s.trim.toFloat)
        case "boolean" => ValueRow.bool(s.trim.toBoolean)
        case _ => ValueRow.str(s)
      }

    def flushElement(): Unit = {
      if (elemId != null) {
        if (isEdge) {
          val label = if (edgeLabel != null) edgeLabel else "edge"
          // the edge-node itself
          pending.foreach { case (k, v) => rows += AttrRow(graph, elemId, k, v) }
          rows += AttrRow(graph, elemId, "source", ValueRow.nodeid(src))
          rows += AttrRow(graph, elemId, "target", ValueRow.nodeid(tgt))
          // endpoint back-references to the edge-node
          rows += AttrRow(graph, src, s"out.$label", ValueRow.nodeid(elemId))
          rows += AttrRow(graph, tgt, s"in.$label", ValueRow.nodeid(elemId))
        } else {
          pending.foreach { case (k, v) => rows += AttrRow(graph, elemId, k, v) }
        }
      }
      pending.clear(); elemId = null; edgeLabel = null; isEdge = false
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "key" =>
              val id = r.getAttributeValue(null, "id")
              val t = Option(r.getAttributeValue(null, "attr.type")).getOrElse("string")
              if (id != null) keyTypes(id) = t
            case "node" =>
              flushElement()
              elemId = r.getAttributeValue(null, "id"); isEdge = false
            case "edge" =>
              flushElement()
              elemId = r.getAttributeValue(null, "id"); isEdge = true
              src = r.getAttributeValue(null, "source")
              tgt = r.getAttributeValue(null, "target")
            case "data" =>
              dataKey = r.getAttributeValue(null, "key"); text.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (dataKey != null) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "data" if dataKey != null =>
              val v = typed(dataKey, text.toString)
              if (dataKey == "labelE") edgeLabel = text.toString.trim
              pending += ((dataKey, v))
              dataKey = null
            case "graph" | "graphml" => flushElement()
            case _ =>
          }
        case _ =>
      }
    }
    flushElement()
    r.close()
    rows.toSeq
  }
}
