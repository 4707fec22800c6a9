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
  *     arbitrary string columns, not just clean dimension tables.
  *     XML 1.0 cannot carry C0 control chars AT ALL (not even as numeric
  *     character references — only #x9 #xA #xD are legal, and a literal
  *     #xD is itself rewritten to #xA by mandated EOL normalization), so
  *     the codec shifts all of them except TAB/LF to U+E000+c on write
  *     and reverses on read: the round-trip stays an exact identity for
  *     any value (this repo itself embeds U+0001/U+0002 sentinels in
  *     index terms). The codec CONVENTION reserves U+E000..U+E01F;
  *     genuine private-use chars there would be un-shifted on read;
  *   - the StAX factory is per executor THREAD, not per row:
  *     XMLInputFactory.newInstance() does a service-provider lookup, and
  *     the JDK impl is not specified thread-safe, so a shared-factory
  *     shortcut would race under local[32].
  * StAX CHARACTERS events return entity-DECODED text, so escape+parse is
  * an exact identity on the original values. */
object XmlCodec {

  // the C0 chars that cannot round-trip as literal element text (all of
  // 0x00-0x1F except TAB/LF: the others are either illegal in XML 1.0
  // outright, or — CR — rewritten to LF by the parser's mandated
  // end-of-line normalization) and their U+E000-shifted stand-ins, as 1:1
  // translate() alphabets
  private val CtrlRaw: String =
    (0 until 32).filter(c => c != 9 && c != 10).map(_.toChar).mkString
  private val CtrlShifted: String = CtrlRaw.map(c => (0xe000 + c).toChar)

  /** XML-escape a column for use as element text. */
  def esc(c: Column): Column =
    translate(regexp_replace(regexp_replace(regexp_replace(c.cast("string"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), CtrlRaw, CtrlShifted)

  /** Reverse of the control-char shift (parse side). */
  private def unshift(s: String): String = {
    var i = 0
    var dirty = false
    while (i < s.length && !dirty) {
      val ch = s.charAt(i)
      if (ch >= 0xe000 && ch <= 0xe01f) dirty = true
      i += 1
    }
    if (!dirty) s
    else s.map { ch =>
      if (ch >= 0xe000 && ch <= 0xe01f && CtrlShifted.indexOf(ch) >= 0)
        (ch - 0xe000).toChar
      else ch
    }
  }

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
              // cur == null: a <field> with no name attribute is skipped
              // (storing under a null key would NPE downstream map users)
              if r.getLocalName == "field" && cur != null =>
            fields(cur) = unshift(sb.toString); cur = null
          case _ =>
        }
      }
    } finally r.close()
    fields.toMap
  }
}
