package graft.io

import graft.schema.{Kinds, OrderedBlock}
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Result -> .docx post-form (the reference's word output,
  * office_middle_json_mkcontent.py / the md post-forms family): renders an
  * extraction result's blocks into a real WordprocessingML package. Kinds
  * docx can represent map to their native forms (Heading styles, Caption
  * style, numbered lists, tables, drawings with relationship-resolved
  * media, hyperlinks); formula/algorithm/checkbox/seal degrade to plain
  * paragraphs carrying their text. The round trip through
  * office.DocxConvert recovers the representable spans exactly
  * (DocxSinkSpec). Pure per-document function — a sink column. */
object DocxSink {

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def run(t: String): String =
    s"""<w:r><w:t xml:space="preserve">${xmlEsc(t)}</w:t></w:r>"""

  def render(blocks: Seq[OrderedBlock]): Array[Byte] = {
    val rels = Vector.newBuilder[(String, String, String)]
    var relId = 0
    var numId = 0
    val body = blocks.map { b =>
      b.kind match {
        case Kinds.Title =>
          val lvl = math.min(6, math.max(1, b.level))
          s"""<w:p><w:pPr><w:pStyle w:val="Heading$lvl"/></w:pPr>${run(b.text)}</w:p>"""
        case Kinds.Caption | Kinds.Footnote | Kinds.ImageFootnote =>
          s"""<w:p><w:pPr><w:pStyle w:val="Caption"/></w:pPr>${run(b.text)}</w:p>"""
        case Kinds.ListK | Kinds.Index =>
          numId += 1
          b.text.split("\n").map(item =>
            s"""<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="$numId"/></w:numPr></w:pPr>${run(item)}</w:p>""").mkString
        case Kinds.Figure =>
          relId += 1
          val hash = b.media_ref.stripPrefix("img://")
          rels += ((s"rId$relId",
            "http://schemas.openxmlformats.org/officeDocument/2006/relationships/image",
            s"media/$hash.png"))
          s"""<w:p><w:r><w:drawing><a:blip r:embed="rId$relId"/></w:drawing></w:r></w:p>"""
        case Kinds.Hyperlink =>
          relId += 1
          rels += ((s"rId$relId",
            "http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink",
            b.media_ref))
          s"""<w:p><w:hyperlink r:id="rId$relId">${run(b.text)}</w:hyperlink></w:p>"""
        case Kinds.Table =>
          // spans map to their OOXML forms: colspan -> gridSpan, rowspan ->
          // vMerge restart + per-row continuation placeholders; a bordered
          // table carries tblBorders
          val rows = graft.pipeline.TableMerge.parse(b.text)
          val borders =
            if (b.text.startsWith("<table border")) "<w:tblPr><w:tblBorders/></w:tblPr>"
            else ""
          var pending = Map.empty[Int, (Int, Int)] // vcol -> (colspan, rows remaining)
          val trs = rows.map { row =>
            val sb = new StringBuilder("<w:tr>")
            var vcol = 0
            val it = row.iterator
            var more = true
            while (more) {
              pending.get(vcol) match {
                case Some((cs, rem)) =>
                  val gs = if (cs > 1) s"""<w:gridSpan w:val="$cs"/>""" else ""
                  sb.append(s"<w:tc><w:tcPr>$gs<w:vMerge/></w:tcPr><w:p/></w:tc>")
                  pending = if (rem > 1) pending + (vcol -> (cs, rem - 1)) else pending - vcol
                  vcol += cs
                case None if it.hasNext =>
                  val c = it.next()
                  val gs = if (c.colspan > 1) s"""<w:gridSpan w:val="${c.colspan}"/>""" else ""
                  val vm = if (c.rowspan > 1) """<w:vMerge w:val="restart"/>""" else ""
                  val pr = if (gs.nonEmpty || vm.nonEmpty) s"<w:tcPr>$gs$vm</w:tcPr>" else ""
                  sb.append(s"<w:tc>$pr<w:p>${run(c.text)}</w:p></w:tc>")
                  if (c.rowspan > 1) pending += vcol -> (c.colspan, c.rowspan - 1)
                  vcol += c.colspan
                case None =>
                  // trailing rowspan columns past the row's own cells
                  pending.keys.filter(_ > vcol).minOption match {
                    case Some(nv) => vcol = nv
                    case None => more = false
                  }
              }
            }
            sb.append("</w:tr>").toString
          }.mkString
          s"<w:tbl>$borders$trs</w:tbl>"
        case _ => // formula/algorithm/checkbox/seal/text degrade to paragraphs
          s"<w:p>${run(b.text)}</w:p>"
      }
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"
         |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"
         |  xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
         |<w:body>$body</w:body></w:document>""".stripMargin
    val relXml = rels.result().map { case (id, tpe, target) =>
      s"""<Relationship Id="$id" Type="$tpe" Target="${xmlEsc(target)}"/>"""
    }.mkString(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""".stripMargin,
      "", "</Relationships>")
    val bos = new ByteArrayOutputStream(doc.length + 1024)
    val zip = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      val e = new ZipEntry(name); e.setTime(0L)
      zip.putNextEntry(e); zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin)
    put("word/document.xml", doc)
    put("word/_rels/document.xml.rels", relXml)
    zip.close()
    bos.toByteArray
  }
}
