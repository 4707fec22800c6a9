package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared Solr update-XML codec for the XML loader (`xml_ingest`) and the
  * XML response writer (`writer_xml`) — the `<field name=...>text</field>`
  * wire shape of `handler/loader/XMLLoader.java` /
  * `response/XMLWriter.java`.
  *
  * Two properties both ops must share (they round-trip through each other):
  *   - serialize-side escaping: `& < >` in field values must be
  *     entity-encoded or the parse of the payload throws
  *     XMLStreamException mid-task — the loader is advertised for
  *     arbitrary string columns, not just clean dimension tables;
  *   - the StAX factory is per executor THREAD, not per row:
  *     XMLInputFactory.newInstance() does a service-provider lookup, and
  *     the JDK impl is not specified thread-safe, so a shared-factory
  *     shortcut would race under local[32].
  * StAX CHARACTERS events return entity-DECODED text, so escape+parse is
  * an exact identity on the original values. */
object XmlCodec {

  /** XML-escape a column for use as element text. */
  def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c.cast("string"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  // one factory per executor thread; object re-initializes per JVM, so
  // nothing here is serialized into the UDF closure
  private val factories =
    ThreadLocal.withInitial[javax.xml.stream.XMLInputFactory](() => {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f
    })

  /** Pull-parse the `<field name=..>..</field>` children of one payload
    * into a name -> text map (last write wins on duplicate names). */
  def parseFields(xml: String): Map[String, String] = {
    val r = factories.get().createXMLStreamReader(new java.io.StringReader(xml))
    val fields = scala.collection.mutable.Map.empty[String, String]
    var cur: String = null
    val sb = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT
              if r.getLocalName == "field" =>
            cur = r.getAttributeValue(null, "name"); sb.clear()
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if cur != null =>
            sb.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT
              if r.getLocalName == "field" =>
            fields(cur) = sb.toString; cur = null
          case _ =>
        }
      }
    } finally r.close()
    fields.toMap
  }
}
