package graft.corpus

import graft.schema.{Kinds, OutSpan}
import graft.util.Rng
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic synthetic OFFICE corpus: real .docx packages (zip with
  * word/document.xml + its relationships part) whose content derives from
  * the doc id alone, plus the golden span sequence the converter must
  * recover. The office input class of the reference
  * (office_analyze.py:9-36 routing into model/docx/docx_converter.py) —
  * here scoped to the WordprocessingML surface the corpus authors:
  * Heading/Caption styles, multi-run paragraphs, numbered lists, tables,
  * inline drawings with relationship-resolved media, hyperlinks. */
object DocxGen {

  case class OBlock(kind: String, text: String, mediaRef: String = "")

  /** Authored office blocks (rng stream "office" — independent of the pdf
    * corpus streams). */
  def officeAuthored(docId: String): Vector[OBlock] = {
    val r = Rng.stream("office", docId)
    val out = Vector.newBuilder[OBlock]
    out += OBlock(Kinds.Title, DocGen.titleText(r))
    var figK = 0
    val n = 5 + r.nextInt(9)
    var i = 0
    while (i < n) {
      val roll = r.nextDouble()
      if (roll < 0.12) out += OBlock(Kinds.Title, DocGen.titleText(r))
      else if (roll < 0.58) out += OBlock(Kinds.Text, DocGen.paragraphOnce(r))
      else if (roll < 0.70) {
        figK += 1
        out += OBlock(Kinds.Figure, "",
          mediaRef = "img://" + DocGen.sha256Hex(docId + ":ofig:" + figK))
        if (r.chance(0.7)) out += OBlock(Kinds.Caption, s"Figure $figK: Figure Caption")
      } else if (roll < 0.84) {
        val cols = 2 + r.nextInt(3)
        val rows = 2 + r.nextInt(3)
        val cells = Vector.tabulate(rows, cols) { (_, _) =>
          if (r.chance(0.3)) (100 + r.nextInt(900)).toString
          else DocGen.cap(DocGen.word(r))
        }
        out += OBlock(Kinds.Table, tableHtmlOf(cells))
      } else if (roll < 0.94) {
        val items = Vector.fill(3 + r.nextInt(4))(
          DocGen.cap(DocGen.word(r)) + " " + DocGen.word(r))
        out += OBlock(Kinds.ListK, items.mkString("\n"))
      } else {
        out += OBlock(Kinds.Hyperlink, s"See the ${DocGen.word(r)} ${DocGen.word(r)}",
          mediaRef = s"https://example.org/${DocGen.word(r)}/${1 + r.nextInt(99)}")
      }
      i += 1
    }
    out.result()
  }

  /** Canonical table HTML for a cell matrix — the contract both the golden
    * and the converter's independent XML walk must produce. */
  def tableHtmlOf(cells: Vector[Vector[String]]): String =
    cells.map(row => row.map(c => s"<td>$c</td>").mkString("<tr>", "", "</tr>"))
      .mkString("<table>", "", "</table>")

  /** Title level from the text (shared with the Heading style the XML
    * carries — level 1 for the leading doc title, 2..4 for sections). */
  def titleLevelOf(idx: Int, text: String): Int =
    if (idx == 0) 1 else graft.kernel.StubModel.titleLevelOf(text)

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Split a paragraph into 1-3 runs at word boundaries (the converter
    * must join runs back; real docx splits runs at formatting changes). */
  private def runSplit(r: graft.util.SplitMix64, text: String): Vector[String] = {
    val ws = text.split(" ")
    if (ws.length < 4 || r.chance(0.4)) return Vector(text)
    val cut1 = 1 + r.nextInt(ws.length - 2)
    if (r.chance(0.5) || ws.length - cut1 < 3) {
      // trailing space stays on the left run (xml:space="preserve")
      Vector(ws.take(cut1).mkString("", " ", " "), ws.drop(cut1).mkString(" "))
    } else {
      val cut2 = cut1 + 1 + r.nextInt(ws.length - cut1 - 1)
      Vector(ws.take(cut1).mkString("", " ", " "),
        ws.slice(cut1, cut2).mkString("", " ", " "),
        ws.drop(cut2).mkString(" "))
    }
  }

  private def runs(texts: Seq[String]): String =
    texts.map(t =>
      s"""<w:r><w:t xml:space="preserve">${xmlEsc(t)}</w:t></w:r>""").mkString

  private def runOf(t: String): String =
    if (t.isEmpty) ""
    else s"""<w:r><w:t xml:space="preserve">${xmlEsc(t)}</w:t></w:r>"""

  /** Body-paragraph runs: an inline `$…$` equation authors as a REAL OMML
    * element (`m:oMath` with the latex in `m:t`) — the converter must
    * re-wrap it, not read it as literal text (the reference splits
    * paragraphs at equation boundaries, docx_converter.py:486-690). */
  private def runsWithMath(texts: Seq[String]): String =
    texts.map { t =>
      val a = t.indexOf('$')
      val b = if (a < 0) -1 else t.indexOf('$', a + 1)
      if (b < 0) runOf(t) // no (or unpaired) '$': plain literal run
      else
        runOf(t.substring(0, a)) +
          s"<m:oMath><m:r><m:t>${xmlEsc(t.substring(a + 1, b))}</m:t></m:r></m:oMath>" +
          runOf(t.substring(b + 1))
    }.mkString

  /** word/document.xml + word/_rels/document.xml.rels. */
  def documentXml(docId: String): (String, String) = {
    val r = Rng.stream("officexml", docId)
    val blocks = officeAuthored(docId)
    val rels = Vector.newBuilder[(String, String, String)] // id, type, target
    var relId = 0
    var titleIdx = 0
    var numId = 0 // one numbering instance per list block
    val body = blocks.zipWithIndex.map { case (b, bi) =>
      b.kind match {
        case Kinds.Title =>
          val lvl = titleLevelOf(titleIdx, b.text)
          titleIdx += 1
          s"""<w:p><w:pPr><w:pStyle w:val="Heading$lvl"/></w:pPr>${runs(Seq(b.text))}</w:p>"""
        case Kinds.Caption =>
          s"""<w:p><w:pPr><w:pStyle w:val="Caption"/></w:pPr>${runs(Seq(b.text))}</w:p>"""
        case Kinds.Text =>
          val pieces = runSplit(r, b.text)
          if (Math.floorMod(Rng.fnv64(docId + "|tbx|" + bi), 8L) == 0L) {
            // TEXTBOX paragraph (the reference extracts textbox content,
            // docx_converter.py:108): the real mc:AlternateContent shape —
            // content in mc:Choice/wps:txbx, a DUPLICATE in mc:Fallback
            // (the compatibility copy real writers emit; a naive
            // descendant concat doubles the text)
            val inner = s"<w:txbxContent><w:p>${runsWithMath(pieces)}</w:p></w:txbxContent>"
            s"""<w:p><w:r><mc:AlternateContent><mc:Choice Requires="wps">""" +
              s"""<w:drawing><wps:txbx>$inner</wps:txbx></w:drawing></mc:Choice>""" +
              s"""<mc:Fallback><w:pict><v:textbox>$inner</v:textbox></w:pict></mc:Fallback>""" +
              "</mc:AlternateContent></w:r></w:p>"
          } else s"<w:p>${runsWithMath(pieces)}</w:p>"
        case Kinds.ListK =>
          numId += 1
          b.text.split("\n").map(item =>
            s"""<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="$numId"/></w:numPr></w:pPr>${runs(Seq(item))}</w:p>""").mkString
        case Kinds.Figure =>
          relId += 1
          val hash = b.mediaRef.stripPrefix("img://")
          rels += ((s"rId$relId",
            "http://schemas.openxmlformats.org/officeDocument/2006/relationships/image",
            s"media/$hash.png"))
          s"""<w:p><w:r><w:drawing><a:blip r:embed="rId$relId"/></w:drawing></w:r></w:p>"""
        case Kinds.Hyperlink =>
          relId += 1
          rels += ((s"rId$relId",
            "http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink",
            b.mediaRef))
          s"""<w:p><w:hyperlink r:id="rId$relId">${runs(Seq(b.text))}</w:hyperlink></w:p>"""
        case Kinds.Table =>
          val rows = graft.pipeline.TableMerge.parse(b.text)
          rows.map { row =>
            row.map(c =>
              s"<w:tc><w:p>${runs(Seq(c.text))}</w:p></w:tc>").mkString("<w:tr>", "", "</w:tr>")
          }.mkString("<w:tbl>", "", "</w:tbl>")
        case _ => ""
      }
    }.mkString
    // running-head part referenced from sectPr: document chrome the
    // converter must NOT leak into the span stream (the engine-wide
    // header/footer boilerplate contract)
    rels += (("rIdHdr",
      "http://schemas.openxmlformats.org/officeDocument/2006/relationships/header",
      "header1.xml"))
    val sectPr =
      """<w:sectPr><w:headerReference w:type="default" r:id="rIdHdr"/></w:sectPr>"""
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"
         |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"
         |  xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
         |  xmlns:m="http://schemas.openxmlformats.org/officeDocument/2006/math"
         |  xmlns:mc="http://schemas.openxmlformats.org/markup-compatibility/2006"
         |  xmlns:wps="http://schemas.microsoft.com/office/word/2010/wordprocessingShape"
         |  xmlns:v="urn:schemas-microsoft-com:vml">
         |<w:body>$body$sectPr</w:body></w:document>""".stripMargin
    val relXml = rels.result().map { case (id, tpe, target) =>
      s"""<Relationship Id="$id" Type="$tpe" Target="${xmlEsc(target)}"/>"""
    }.mkString(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""".stripMargin,
      "", "</Relationships>")
    (doc, relXml)
  }

  /** A real .docx package (zip). */
  def docxBytes(docId: String): Array[Byte] = {
    val (doc, rels) = documentXml(docId)
    val bos = new ByteArrayOutputStream(doc.length + rels.length + 1024)
    val zip = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L) // deterministic package bytes
      zip.putNextEntry(e)
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin)
    put("word/document.xml", doc)
    put("word/_rels/document.xml.rels", rels)
    put("word/header1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:hdr xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:p><w:r><w:t>RUNNING HEAD $docId</w:t></w:r></w:p></w:hdr>""".stripMargin)
    zip.close()
    bos.toByteArray
  }

  /** Expected converter output, straight from the authoring structure. */
  def golden(docId: String): Vector[OutSpan] =
    officeAuthored(docId).zipWithIndex.map { case (b, ord) =>
      OutSpan(b.kind, b.text, b.mediaRef, ord)
    }
}
