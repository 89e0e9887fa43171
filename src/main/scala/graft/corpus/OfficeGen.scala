package graft.corpus

import graft.schema.{Kinds, OutSpan}
import graft.util.{Rng, SplitMix64}
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Office corpus across all three formats (reference office_analyze.py
  * routes docx/pptx/xlsx by sniffed type): every document id maps to one
  * deterministic format + package; golden = the authored block sequence
  * in the engine's span contract. */
object OfficeGen {

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4096)
    val zip = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(0L)
      zip.putNextEntry(e)
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    zip.close()
    bos.toByteArray
  }

  // -- xlsx ------------------------------------------------------------------

  private case class Sheet(name: String, nCols: Int,
      cells: Vector[Vector[Option[String]]],
      /** merged region (row0, col0, rowSpan, colSpan), at most one */
      merge: Option[(Int, Int, Int, Int)],
      /** date cells: position -> Excel serial (days since 1899-12-30).
        * The XML stores the SERIAL with a date-format style; both the
        * golden and the converter render it as the datetime string
        * openpyxl's cell.value yields ("yyyy-MM-dd 00:00:00" — the
        * reference str()s that value, xlsx_converter.py:1549). */
      dates: Map[(Int, Int), Int] = Map.empty)

  /** The openpyxl-style rendering of a date serial. */
  def dateSerialText(serial: Int): String =
    java.time.LocalDate.of(1899, 12, 30).plusDays(serial).toString + " 00:00:00"

  /** 1-3 sheets; cells carry GAPS (the converter pads every row to the
    * sheet's column count), string values route through the deduped
    * sharedStrings table like a real workbook, and ~30% of sheets carry a
    * mergeCells region (rendered as colspan/rowspan on the anchor cell).
    * The first row's last column and the last row's first column are
    * always present, so the authored grid extent is recoverable. */
  private def xlsxSheets(r: SplitMix64): Vector[Sheet] =
    Vector.fill(1 + r.nextInt(3)) {
      val name = DocGen.cap(DocGen.word(r)) + " " + DocGen.cap(DocGen.word(r))
      val nCols = 2 + r.nextInt(3)
      val nRows = 2 + r.nextInt(4)
      val cells = Vector.tabulate(nRows, nCols) { (row, colI) =>
        val forced = (row == 0 && colI == nCols - 1) || (row == nRows - 1 && colI == 0)
        if (!forced && r.chance(0.15)) None
        else Some(
          if (r.chance(0.4)) (100 + r.nextInt(900)).toString
          else DocGen.cap(DocGen.word(r)))
      }
      val merge =
        if (r.chance(0.3) && nRows >= 3 && nCols >= 3) {
          val rs = 1 + r.nextInt(2); val cs = if (rs == 1) 2 else 1 + r.nextInt(2)
          Some((r.nextInt(nRows - rs), r.nextInt(nCols - cs), rs, cs))
        } else None
      // the merge anchor must hold a value; covered cells hold none
      val withMerge = merge match {
        case Some((r0, c0, rs, cs)) =>
          Vector.tabulate(nRows, nCols) { (row, colI) =>
            val inside = row >= r0 && row < r0 + rs && colI >= c0 && colI < c0 + cs
            if (row == r0 && colI == c0)
              Some(cells(row)(colI).getOrElse(DocGen.cap(DocGen.word(r))))
            else if (inside) None
            else cells(row)(colI)
          }
        case None => cells
      }
      // date cells: occupied positions outside any merge region carry an
      // Excel date serial with a date-format style (~15%)
      val dates = (for {
        row <- 0 until nRows
        colI <- 0 until nCols
        if withMerge(row)(colI).isDefined
        if !merge.exists { case (r0, c0, rs, cs) =>
          row >= r0 && row < r0 + rs && colI >= c0 && colI < c0 + cs
        }
        if r.chance(0.15)
      } yield (row, colI) -> (40000 + r.nextInt(8000))).toMap
      Sheet(name, nCols, withMerge, merge, dates)
    }

  private def colRef(c: Int): String = // 0 -> A .. 25 -> Z (corpus stays < 26)
    ('A' + c).toChar.toString

  def xlsxBytes(docId: String): Array[Byte] = {
    val r = Rng.stream("xlsx", docId)
    val sheets = xlsxSheets(r)
    // deduped shared-string table
    val strings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sstIdx(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    val sheetXmls = sheets.map { sh =>
      val rows = sh.cells.zipWithIndex.map { case (row, ri) =>
        val cs = row.zipWithIndex.collect { case (Some(v), ci) =>
          val ref = s"${colRef(ci)}${ri + 1}"
          sh.dates.get((ri, ci)) match {
            // date cell: the raw SERIAL with the date-format style (xf 1
            // -> numFmtId 14); the converter must render it
            case Some(serial) => s"""<c r="$ref" s="1"><v>$serial</v></c>"""
            case None =>
              if (v.forall(_.isDigit)) s"""<c r="$ref"><v>$v</v></c>"""
              else s"""<c r="$ref" t="s"><v>${sstIdx(v)}</v></c>"""
          }
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      val mergeXml = sh.merge.map { case (r0, c0, rs, cs) =>
        val ref = s"${colRef(c0)}${r0 + 1}:${colRef(c0 + cs - 1)}${r0 + rs}"
        s"""<mergeCells count="1"><mergeCell ref="$ref"/></mergeCells>"""
      }.getOrElse("")
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$rows</sheetData>$mergeXml</worksheet>""".stripMargin
    }
    val wbSheets = sheets.zipWithIndex.map { case (sh, i) =>
      s"""<sheet name="${xmlEsc(sh.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>$wbSheets</sheets></workbook>""".stripMargin
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""".stripMargin,
      "", "</Relationships>")
    val sst = strings.keys.map(s => s"<si><t>${xmlEsc(s)}</t></si>").mkString(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""".stripMargin,
      "", "</sst>")
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin
    zipOf(
      Seq("xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> rels,
        "xl/styles.xml" -> styles,
        "xl/sharedStrings.xml" -> sst) ++
        sheetXmls.zipWithIndex.map { case (x, i) => s"xl/worksheets/sheet${i + 1}.xml" -> x }: _*)
  }

  def xlsxGolden(docId: String): Vector[(String, String, String)] = {
    val r = Rng.stream("xlsx", docId)
    xlsxSheets(r).flatMap { sh =>
      def covered(row: Int, colI: Int): Boolean = sh.merge.exists {
        case (r0, c0, rs, cs) =>
          row >= r0 && row < r0 + rs && colI >= c0 && colI < c0 + cs &&
            !(row == r0 && colI == c0)
      }
      val html = sh.cells.zipWithIndex.map { case (row, ri) =>
        (0 until sh.nCols).flatMap { ci =>
          if (covered(ri, ci)) None
          else sh.merge match {
            case Some((r0, c0, rs, cs)) if ri == r0 && ci == c0 =>
              val csA = if (cs > 1) s""" colspan="$cs"""" else ""
              val rsA = if (rs > 1) s""" rowspan="$rs"""" else ""
              Some(s"<td$csA$rsA>${row(ci).getOrElse("")}</td>")
            case _ =>
              val text = sh.dates.get((ri, ci)).map(dateSerialText)
                .orElse(row(ci)).getOrElse("")
              Some(s"<td>$text</td>")
          }
        }.mkString("<tr>", "", "</tr>")
      }.mkString("<table>", "", "</table>")
      Vector((Kinds.Title, sh.name, ""), (Kinds.Table, html, ""))
    }
  }

  // -- pptx ------------------------------------------------------------------

  private case class Slide(title: String, bodies: Vector[String],
      table: Option[Vector[Vector[String]]], pic: Option[String],
      notes: Option[String])

  private def pptxSlides(r: SplitMix64, docId: String): Vector[Slide] =
    Vector.tabulate(2 + r.nextInt(3)) { i =>
      Slide(
        DocGen.titleText(r),
        Vector.fill(1 + r.nextInt(3))(DocGen.paragraphOnce(r)),
        if (r.chance(0.25))
          Some(Vector.tabulate(2 + r.nextInt(2), 2 + r.nextInt(2)) { (_, _) =>
            if (r.chance(0.4)) (100 + r.nextInt(900)).toString
            else DocGen.cap(DocGen.word(r))
          })
        else None,
        if (r.chance(0.3)) Some(DocGen.sha256Hex(s"$docId:slide:$i")) else None,
        // speaker notes (the reference emits notes paragraphs as
        // PAGE_FOOTNOTE blocks, pptx_converter.py:548-583)
        if (r.chance(0.3)) Some(s"Note: ${DocGen.word(r)} ${DocGen.word(r)}.") else None)
    }

  /** Slide PART numbering is deliberately REVERSED relative to the
    * presentation order: the converter must follow presentation.xml's
    * sldIdLst through the rels, not the file names. */
  def pptxBytes(docId: String): Array[Byte] = {
    val r = Rng.stream("pptx", docId)
    val slides = pptxSlides(r, docId)
    val n = slides.length
    def slideXml(s: Slide): String = {
      val title =
        s"""<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
           |<p:txBody><a:p><a:r><a:t>${xmlEsc(s.title)}</a:t></a:r></a:p></p:txBody></p:sp>""".stripMargin
      val bodies = s.bodies.map(b =>
        s"""<p:sp><p:txBody><a:p><a:r><a:t>${xmlEsc(b)}</a:t></a:r></a:p></p:txBody></p:sp>""").mkString
      val tbl = s.table.map { cells =>
        val trs = cells.map(row =>
          row.map(c =>
            s"""<a:tc><a:txBody><a:p><a:r><a:t>${xmlEsc(c)}</a:t></a:r></a:p></a:txBody></a:tc>""")
            .mkString("<a:tr>", "", "</a:tr>")).mkString
        s"""<p:graphicFrame><a:graphic><a:graphicData><a:tbl>$trs</a:tbl></a:graphicData></a:graphic></p:graphicFrame>"""
      }.getOrElse("")
      val pic = s.pic.map(_ =>
        s"""<p:pic><p:blipFill><a:blip r:embed="rId1"/></p:blipFill></p:pic>""").getOrElse("")
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
         |  xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
         |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<p:cSld><p:spTree>$title$bodies$tbl$pic</p:spTree></p:cSld></p:sld>""".stripMargin
    }
    // presentation order i -> slide part number (n - i), i.e. reversed
    val sldIds = slides.indices.map { i =>
      s"""<p:sldId id="${256 + i}" r:id="rId${i + 1}"/>"""
    }.mkString
    val presentation =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
         |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<p:sldIdLst>$sldIds</p:sldIdLst></p:presentation>""".stripMargin
    val presRels = slides.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide" Target="slides/slide${n - i}.xml"/>"""
    }.mkString(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""".stripMargin,
      "", "</Relationships>")
    val slideEntries = slides.zipWithIndex.flatMap { case (s, i) =>
      val part = n - i // reversed numbering
      val relRows =
        s.pic.map(hash =>
          s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="../media/$hash.png"/>""").toSeq ++
          s.notes.map(_ =>
            s"""<Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/notesSlide" Target="../notesSlides/notesSlide$part.xml"/>""").toSeq
      val slideRel =
        if (relRows.isEmpty) Seq.empty
        else Seq(s"ppt/slides/_rels/slide$part.xml.rels" ->
          (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
            relRows.mkString + "</Relationships>"))
      // notes slide: the authored note paragraph PLUS the notes master's
      // slide-number placeholder chrome the converter must skip
      val notesPart = s.notes.map { note =>
        s"ppt/notesSlides/notesSlide$part.xml" ->
          (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<p:notes xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"""" +
            """ xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">""" +
            "<p:cSld><p:spTree>" +
            """<p:sp><p:nvSpPr><p:nvPr><p:ph type="sldNum"/></p:nvPr></p:nvSpPr>""" +
            s"""<p:txBody><a:p><a:r><a:t>${i + 1}</a:t></a:r></a:p></p:txBody></p:sp>""" +
            s"""<p:sp><p:txBody><a:p><a:r><a:t>${xmlEsc(note)}</a:t></a:r></a:p></p:txBody></p:sp>""" +
            "</p:spTree></p:cSld></p:notes>")
      }.toSeq
      Seq(s"ppt/slides/slide$part.xml" -> slideXml(s)) ++ slideRel ++ notesPart
    }
    zipOf(
      Seq("ppt/presentation.xml" -> presentation,
        "ppt/_rels/presentation.xml.rels" -> presRels) ++ slideEntries: _*)
  }

  def pptxGolden(docId: String): Vector[(String, String, String)] = {
    val r = Rng.stream("pptx", docId)
    pptxSlides(r, docId).flatMap { s =>
      Vector((Kinds.Title, s.title, "")) ++
        s.bodies.map(b => (Kinds.Text, b, "")) ++
        s.table.map(cells => (Kinds.Table, DocxGen.tableHtmlOf(cells), "")).toVector ++
        s.pic.map(h => (Kinds.Figure, "", s"img://$h")).toVector ++
        s.notes.map(t => (Kinds.Footnote, t, "")).toVector
    }
  }

  // -- unified corpus --------------------------------------------------------

  /** Format per document (roll from its own stream): 50% docx, 25% xlsx,
    * 25% pptx. */
  def formatOf(docId: String): String = {
    val roll = Rng.stream("ofmt", docId).nextDouble()
    if (roll < 0.5) "docx" else if (roll < 0.75) "xlsx" else "pptx"
  }

  def bytes(docId: String): Array[Byte] = formatOf(docId) match {
    case "docx" => DocxGen.docxBytes(docId)
    case "xlsx" => xlsxBytes(docId)
    case _ => pptxBytes(docId)
  }

  def golden(docId: String): Vector[OutSpan] = (formatOf(docId) match {
    case "docx" => DocxGen.golden(docId).map(s => (s.kind, s.text, s.media_ref))
    case "xlsx" => xlsxGolden(docId)
    case _ => pptxGolden(docId)
  }).zipWithIndex.map { case ((k, t, m), ord) => OutSpan(k, t, m, ord) }
}
