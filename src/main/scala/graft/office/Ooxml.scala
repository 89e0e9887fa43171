package graft.office

import org.w3c.dom.Element
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** Shared OOXML package plumbing (zip part map + JDK DOM parsing) for the
  * docx/xlsx/pptx converters. */
object Ooxml {

  def readZip(bytes: Array[Byte]): Map[String, String] = {
    val zip = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, String]
    var e = zip.getNextEntry
    val buf = new Array[Byte](8192)
    while (e != null) {
      val bos = new java.io.ByteArrayOutputStream()
      var n = zip.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = zip.read(buf) }
      out += e.getName -> new String(bos.toByteArray, "UTF-8")
      e = zip.getNextEntry
    }
    zip.close()
    out.result()
  }

  def parseXml(xml: String): Element =
    // per-thread reused builder (graft.util.Xml) — building a fresh
    // DocumentBuilderFactory per part dominated the office tier profile
    graft.util.Xml.builder()
      .parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))
      .getDocumentElement

  def children(e: Element): Vector[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).iterator.map(nl.item)
      .collect { case el: Element => el }.toVector
  }

  def descendants(e: Element, name: String): Vector[Element] = {
    // one explicit preorder walk (document order, nested matches included,
    // self excluded — exactly getElementsByTagName's contract) instead of
    // Xerces' DeepNodeList, whose item()/getLength re-traversal showed up
    // hot in the office tier profile (r6)
    val out = Vector.newBuilder[Element]
    val all = name == "*"
    def walk(n: org.w3c.dom.Node): Unit = {
      var c = n.getFirstChild
      while (c != null) {
        c match {
          case el: Element =>
            if (all || el.getTagName == name) out += el
            walk(el)
          case _ =>
        }
        c = c.getNextSibling
      }
    }
    walk(e)
    out.result()
  }

  /** Relationship map (Id -> Target) of a rels part. */
  def relMap(relsXml: Option[String]): Map[String, String] =
    relsXml.map { xml =>
      descendants(parseXml(xml), "Relationship")
        .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap
    }.getOrElse(Map.empty)
}
