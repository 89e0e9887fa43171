package graft.pdf

import graft.pdf.PdfConvert._

/** Byte-level PDF page-range slicing — the reference's
  * `convert_pdf_bytes_to_bytes_by_pypdfium2` / windowed
  * `convert_pdf_to_bytes_by_pypdfium2` (rapid_doc/cli/common.py:58-166),
  * which import pages [start, end] (INCLUSIVE, end clamped to the last
  * page) into a fresh document via pdfium and re-serialize it. Here the
  * source file is parsed with [[PdfConvert]]'s object model (xref walk,
  * object streams, incremental updates already resolved) and the selected
  * pages are re-emitted as a NEW classic-xref PDF: each page's inherited
  * attributes (/Resources /MediaBox /Rotate — §7.7.3.4) are materialized
  * onto the page dict, the transitive reference closure (fonts, ToUnicode
  * CMaps, XObjects, content streams, /Annots) is copied with renumbering,
  * and streams are written with their already-decoded payloads (filters
  * consumed by the parser are dropped; an UNCONSUMED tail — e.g. a
  * DCTDecode image kept as raw JPEG — is re-emitted as the new /Filter so
  * the payload round-trips byte-identically and the sha-256 `media_ref`
  * contract is preserved across a slice).
  *
  * Error semantics match the reference exactly: the plain slice returns
  * the ORIGINAL bytes on any failure (common.py:84-86), the windowed
  * variant returns empty bytes + file_end (common.py:151-153), and a
  * single page that fails to serialize is skipped rather than failing the
  * window (common.py:139-144).
  */
object PdfSlice {

  /** Page count of a PDF blob (the page-tree walk), 0 on parse failure —
    * `len(pdf)` in the reference's windowing loop. */
  def pageCount(bytes: Array[Byte]): Int =
    try new Pdf(bytes).pages().length
    catch { case scala.util.control.NonFatal(_) => 0 }

  /** Slice pages `[startPageId, endPageId]` (inclusive; `endPageId < 0` or
    * None → last page) into a standalone PDF. On any parse/serialize
    * failure the ORIGINAL bytes are returned unchanged — the caller's
    * parse then sees the full document, the reference's degradation. */
  def slice(bytes: Array[Byte], startPageId: Int, endPageId: Int = -1): Array[Byte] =
    try {
      val pdf = new Pdf(bytes)
      val pages = pdf.pages()
      val last = pages.length - 1
      val s = math.max(0, startPageId)
      val e = math.min(if (endPageId < 0) last else endPageId, last)
      require(s <= e, s"empty page range [$s, $e]")
      write(pdf, (s to e).map(pages), skipBroken = false)
    } catch { case scala.util.control.NonFatal(_) => bytes }

  /** Windowed batching variant: `batch > 0` → the window is
    * `[startPageId, startPageId + batch - 1]` clamped to the document;
    * returns `(bytes, fileEnd)` where fileEnd marks the window touching
    * the last page. A page that fails to serialize is SKIPPED (the
    * reference's per-page import catch); a document-level failure yields
    * `(empty, true)`. The extraction loop drives this until fileEnd —
    * the reference's 64-page `pdf_pages_batch` loop (main.py:296-368). */
  def window(bytes: Array[Byte], startPageId: Int, batch: Int,
      endPageId: Int = -1): (Array[Byte], Boolean) =
    try {
      val pdf = new Pdf(bytes)
      val pages = pdf.pages()
      val total = pages.length
      if (total == 0) return (Array.empty[Byte], true)
      val s = math.max(0, startPageId)
      var e =
        if (batch > 0) s + batch - 1
        else if (endPageId >= 0) endPageId
        else total - 1
      var fileEnd = false
      if (e >= total - 1) { e = total - 1; fileEnd = true }
      (write(pdf, (s to e).map(pages), skipBroken = true), fileEnd)
    } catch {
      case scala.util.control.NonFatal(_) => (Array.empty[Byte], true)
    }

  /** The full batching loop with ONE source parse: the per-window variant
    * re-walks the xref for every call, which at crawl scale makes a
    * 10k-page document pay O(windows) parses — this parses once, then
    * re-serializes each window from the shared object model (the memoized
    * object cache makes later windows cheaper, not costlier). Returns the
    * window byte arrays in order; parse failure yields a single empty
    * window, mirroring the windowed error contract. */
  def windows(bytes: Array[Byte], batch: Int): Vector[Array[Byte]] =
    try {
      val pdf = new Pdf(bytes)
      val pages = pdf.pages()
      if (pages.isEmpty) return Vector(Array.empty[Byte])
      pages.indices.grouped(math.max(1, batch)).map { idxs =>
        try write(pdf, idxs.map(pages), skipBroken = true)
        catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
      }.toVector
    } catch {
      case scala.util.control.NonFatal(_) => Vector(Array.empty[Byte])
    }

  // ---- serializer ----------------------------------------------------------

  private final class Writer(pdf: Pdf) {
    private val out = new java.io.ByteArrayOutputStream(1 << 16)
    private val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    private val renum = scala.collection.mutable.Map[Int, Int]()
    private val pending = scala.collection.mutable.Queue[(Int, Int)]() // old -> new
    private var nextNum = 0

    def raw(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))

    private def alloc(): Int = { nextNum += 1; offsets += -1; nextNum }

    /** New object number for an OLD object number, scheduling its body. */
    private def mapRef(old: Int): Int = renum.getOrElseUpdate(old, {
      val n = alloc()
      pending.enqueue((old, n))
      n
    })

    /** Names re-emit VERBATIM: [[PdfConvert]]'s lexer never decodes #XX
      * escapes (a crawled /F#31 stays the raw string "F#31" in dict keys
      * AND in the verbatim-copied content streams), so re-escaping '#' or
      * high bytes here would break name identity between a resource key
      * and its content-stream use across the slice round-trip. Whitespace
      * and delimiter bytes cannot occur in a lexed name (the lexer
      * terminates on them), so the only escape kept is the defensive one
      * for them — unreachable from parser-produced names. */
    private def serName(v: String): String = {
      val sb = new StringBuilder("/")
      v.foreach { c =>
        if (c <= ' ' || "()<>[]{}/%".contains(c)) sb.append(f"#${c.toInt}%02X")
        else sb.append(c)
      }
      sb.toString
    }

    private def serNum(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
      else {
        val s = BigDecimal(v).bigDecimal.toPlainString
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
        else s
      }

    /** Strings re-emit as hex — lossless for arbitrary byte payloads
      * (2-byte CID strings, binary IDs) with no escape analysis. */
    private def serStr(v: String): String = {
      val sb = new StringBuilder(v.length * 2 + 2).append('<')
      v.foreach(c => sb.append(f"${c.toInt & 0xff}%02X"))
      sb.append('>').toString
    }

    def ser(o: PObj, sb: StringBuilder): Unit = o match {
      case PNum(v) => sb.append(serNum(v))
      case PName(v) => sb.append(serName(v))
      case PStr(v) => sb.append(serStr(v))
      case PNull => sb.append("null")
      case PRef(n) => sb.append(mapRef(n)).append(" 0 R")
      case PArr(items) =>
        sb.append('[')
        items.zipWithIndex.foreach { case (it, i) =>
          if (i > 0) sb.append(' '); ser(it, sb)
        }
        sb.append(']')
      case PDict(m) => serDict(m, sb)
      case PStream(_, _, _) =>
        sys.error("stream is not a direct value") // §7.3.8: always indirect
    }

    /** /Parent is NEVER followed: the old page tree must not leak into the
      * slice (the new /Pages node is patched in by [[writePage]]), and a
      * /Dest chain reaching an unimported page would otherwise drag the
      * whole source document along — import_pages drops those links too. */
    private def serDict(m: Map[String, PObj], sb: StringBuilder,
        drop: Set[String] = Set("Parent")): Unit = {
      sb.append("<<")
      m.toVector.filterNot(kv => drop(kv._1)).sortBy(_._1).foreach {
        case (k, v) => sb.append(serName(k)).append(' '); ser(v, sb); sb.append(' ')
      }
      sb.append(">>")
    }

    /** Serialize one object body at its assigned number. */
    private def writeObj(newNum: Int, body: PObj): Unit = {
      offsets(newNum - 1) = out.size()
      raw(s"$newNum 0 obj\n")
      body match {
        case PStream(PDict(m), data, rem) =>
          val sb = new StringBuilder
          val base = m -- Vector("Filter", "DecodeParms", "DP", "Length")
          val withLen = base + ("Length" -> PNum(data.length))
          val withFilters =
            if (rem.isEmpty) withLen
            else {
              val fs =
                if (rem.length == 1) PName(rem.head._1)
                else PArr(rem.map(r => PName(r._1)))
              val parms = rem.map(_._2)
              val withF = withLen + ("Filter" -> fs)
              if (parms.forall(_.isEmpty)) withF
              else withF + ("DecodeParms" -> (
                if (parms.length == 1) parms.head.get
                else PArr(parms.map(p => p.getOrElse(PNull)))))
            }
          serDict(withFilters, sb)
          raw(sb.toString)
          raw("\nstream\n")
          out.write(data, 0, data.length)
          raw("\nendstream\nendobj\n")
        case other =>
          val sb = new StringBuilder
          ser(other, sb)
          raw(sb.toString)
          raw("\nendobj\n")
      }
    }

    /** Drain scheduled referenced objects (BFS over the closure). A
      * DANGLING reference — an object number absent from the xref, which
      * real crawl PDFs carry in /Resources (pdfium resolves such refs to
      * null) — serializes as the PDF null object, so the slice degrades
      * exactly like the source parse instead of failing the window. */
    private def drain(): Unit =
      while (pending.nonEmpty) {
        val (old, nn) = pending.dequeue()
        val body =
          try pdf.obj(old)
          catch { case scala.util.control.NonFatal(_) => PNull }
        writeObj(nn, body)
      }

    def emit(pageDicts: Seq[PDict]): Array[Byte] = {
      raw("%PDF-1.7\n%âãÏÓ\n")
      val catalogNum = alloc() // 1
      val pagesNum = alloc() // 2
      val kids = scala.collection.mutable.ArrayBuffer[Int]()
      pageDicts.foreach { pd =>
        val pageNum = alloc()
        val sb = new StringBuilder
        sb.append("<<")
        (pd.m - "Parent").toVector.sortBy(_._1).foreach { case (k, v) =>
          sb.append(serName(k)).append(' '); ser(v, sb); sb.append(' ')
        }
        sb.append(s"/Parent $pagesNum 0 R >>")
        offsets(pageNum - 1) = out.size()
        raw(s"$pageNum 0 obj\n")
        raw(sb.toString)
        raw("\nendobj\n")
        drain()
        kids += pageNum
      }
      // the page tree + catalog
      offsets(pagesNum - 1) = out.size()
      raw(s"$pagesNum 0 obj\n<</Type /Pages /Count ${kids.length} /Kids [")
      raw(kids.map(k => s"$k 0 R").mkString(" "))
      raw("]>>\nendobj\n")
      offsets(catalogNum - 1) = out.size()
      raw(s"$catalogNum 0 obj\n<</Type /Catalog /Pages $pagesNum 0 R>>\nendobj\n")
      // classic xref + trailer
      val xrefAt = out.size()
      raw(s"xref\n0 ${nextNum + 1}\n")
      raw("0000000000 65535 f \n")
      offsets.foreach(off => raw(f"$off%010d 00000 n \n"))
      raw(s"trailer\n<</Size ${nextNum + 1} /Root $catalogNum 0 R>>\n")
      raw(s"startxref\n$xrefAt\n%%EOF\n")
      out.toByteArray
    }
  }

  /** Serialize the selected (already inheritance-merged) page dicts as a
    * fresh document. `skipBroken` = the windowed variant's per-page catch:
    * a page whose closure fails to serialize is dropped from /Kids. */
  private def write(pdf: Pdf, pageDicts: Seq[PDict],
      skipBroken: Boolean): Array[Byte] = {
    if (!skipBroken) new Writer(pdf).emit(pageDicts)
    else {
      // fast path: the common all-healthy window serializes ONCE; only a
      // failing window falls back to per-page probing (clean writer per
      // probe — a failure mid-write would corrupt the shared offset
      // table), then one emit of the survivors
      try new Writer(pdf).emit(pageDicts)
      catch {
        case scala.util.control.NonFatal(_) =>
          val good = pageDicts.filter { pd =>
            try { new Writer(pdf).emit(Seq(pd)); true }
            catch { case scala.util.control.NonFatal(_) => false }
          }
          new Writer(pdf).emit(good)
      }
    }
  }
}
