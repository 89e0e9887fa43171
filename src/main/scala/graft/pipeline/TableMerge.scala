package graft.pipeline

import scala.collection.mutable

/** Cross-page table merge — behavioral port of the reference's protocol
  * (/root/reference/rapid_doc/utils/table_merge.py): header detection
  * (detect_table_headers:483), rowspan-aware header skip
  * (_expand_header_count_by_rowspan:560), merge eligibility
  * (can_merge_tables:598 — continuation-caption and footnote rules plus
  * the structural boundary-row check check_rows_match:646), colspan
  * adjustment of the narrower side (adjust_table_rows_colspan:680), row
  * append, footnote relocation and post-table caption restore
  * (perform_table_merge:857-948, merge_table:950-1006,
  * _restore_post_table_captions_as_text:236).
  *
  * Divergences, documented: (a) the 10%-width bbox check is skipped — the
  * flat span stream carries no geometry; (b) `cell_merge` boundary-cell
  * fusion (_apply_cell_merge:780) is IMPLEMENTED on the merge API (the
  * `cellMerge` hint parameter, spec-pinned) but not wired through the
  * stream pass: the hint is model-supplied in the reference
  * (`owner_block["cell_merge"]`) and the stub kernel emits none. */
object TableMerge {

  val MaxHeaderRows = 5 // table_merge.py:28

  // table_merge.py:13-26 (the full CONTINUATION_END_MARKERS list, incl.
  // "(…continued)" and the bare "续表" suffix)
  private val ContinuationEndMarkers =
    Vector("(续)", "(续表)", "(续上表)", "(continued)", "(cont.)", "(cont’d)",
      "(…continued)", "续表")
  private val ContinuationInlineMarkers = Vector("(continued)")

  /** Continuation-caption test (_is_continuation_caption:197). */
  def isContinuationCaption(text: String): Boolean = {
    val t = graft.textnorm.TextNorm.fullToHalf(text.trim).toLowerCase
    ContinuationEndMarkers.exists(m => t.endsWith(m)) ||
      ContinuationInlineMarkers.exists(m => t.contains(m))
  }

  // -- HTML row model -------------------------------------------------------

  case class Cell(text: String, colspan: Int, rowspan: Int)
  type Row = Vector[Cell]

  private val RowPat = java.util.regex.Pattern.compile(
    "<tr[^>]*>(.*?)</tr>", java.util.regex.Pattern.DOTALL)
  private val CellPat = java.util.regex.Pattern.compile(
    "<t[dh]([^>]*)>(.*?)</t[dh]>", java.util.regex.Pattern.DOTALL)
  private val SpanPat = java.util.regex.Pattern.compile(
    "(colspan|rowspan)=\"(\\d+)\"")

  def parse(html: String): Vector[Row] = {
    val rows = Vector.newBuilder[Row]
    val rm = RowPat.matcher(html)
    while (rm.find()) {
      val cells = Vector.newBuilder[Cell]
      val cm = CellPat.matcher(rm.group(1))
      while (cm.find()) {
        var colspan = 1; var rowspan = 1
        val sm = SpanPat.matcher(cm.group(1))
        while (sm.find()) {
          if (sm.group(1) == "colspan") colspan = sm.group(2).toInt
          else rowspan = sm.group(2).toInt
        }
        cells += Cell(cm.group(2), colspan, rowspan)
      }
      rows += cells.result()
    }
    rows.result()
  }

  def render(rows: Vector[Row]): String = {
    val sb = new StringBuilder("<table>")
    rows.foreach { r =>
      sb.append("<tr>")
      r.foreach { c =>
        sb.append("<td")
        if (c.colspan > 1) sb.append(" colspan=\"").append(c.colspan).append('"')
        if (c.rowspan > 1) sb.append(" rowspan=\"").append(c.rowspan).append('"')
        sb.append('>').append(c.text).append("</td>")
      }
      sb.append("</tr>")
    }
    sb.append("</table>").toString
  }

  /** Per-row effective column count with rowspan carry (the reference's
    * _scan_rows occupancy scan). */
  def effectiveCols(rows: Vector[Row]): Vector[Int] = {
    var pending = Vector.empty[(Int, Int)] // (rows remaining, colspan)
    rows.map { r =>
      val carried = pending.map(_._2).sum
      val own = r.map(_.colspan).sum
      pending = pending.collect { case (n, c) if n > 1 => (n - 1, c) } ++
        r.collect { case c if c.rowspan > 1 => (c.rowspan - 1, c.colspan) }
      carried + own
    }
  }

  def totalCols(rows: Vector[Row]): Int = {
    val eff = effectiveCols(rows)
    if (eff.isEmpty) 0 else eff.max
  }

  private def normText(s: String): String =
    graft.textnorm.TextNorm.fullToHalf(s.trim).toLowerCase

  /** Count of leading rows structurally identical in both tables
    * (detect_table_headers:483 — cell count, colspans, rowspans,
    * normalized texts; stops at the first mismatch). When the structural
    * pass matches nothing, the VISUAL fallback
    * (_detect_table_headers_visual:518) compares only normalized texts and
    * effective column counts, tolerating colspan/rowspan differences
    * between the two parts' recognized headers. */
  def detectHeaders(rows1: Vector[Row], rows2: Vector[Row]): Int = {
    val lim = math.min(math.min(rows1.length, rows2.length), MaxHeaderRows)
    var k = 0
    var go = true
    while (k < lim && go) {
      val a = rows1(k); val b = rows2(k)
      go = a.length == b.length &&
        a.map(_.colspan) == b.map(_.colspan) &&
        a.map(_.rowspan) == b.map(_.rowspan) &&
        a.map(c => normText(c.text)) == b.map(c => normText(c.text))
      if (go) k += 1
    }
    if (k > 0) k
    else {
      val eff1 = effectiveCols(rows1); val eff2 = effectiveCols(rows2)
      var v = 0
      var vgo = true
      while (v < lim && vgo) {
        vgo = rows1(v).map(c => normText(c.text)) == rows2(v).map(c => normText(c.text)) &&
          eff1(v) == eff2(v)
        if (vgo) v += 1
      }
      v
    }
  }

  /** Visual segment count of a row after rendering
    * (calculate_row_rendered_segments:456): each explicit cell is one
    * segment regardless of colspan, and each rowspan placeholder carried
    * from an earlier row is one segment per source cell. */
  def renderedSegments(rows: Vector[Row], target: Int): Int = {
    var pending = 0 // active rowspan sources covering the current row
    var carry = Vector.empty[Int] // remaining rows per source
    var i = 0
    var result = 0
    while (i <= target && i < rows.length) {
      pending = carry.length
      if (i == target) result = rows(i).length + pending
      carry = carry.collect { case n if n > 1 => n - 1 } ++
        rows(i).collect { case c if c.rowspan > 1 => c.rowspan - 1 }
      i += 1
    }
    result
  }

  /** Expand the header skip to cover rows occupied by header rowspans
    * (_expand_header_count_by_rowspan:560). */
  def expandHeaderByRowspan(rows: Vector[Row], headerCount: Int): Int = {
    if (headerCount <= 0 || rows.isEmpty) return headerCount
    var expanded = math.min(headerCount, rows.length)
    var i = 0
    while (i < expanded) {
      rows(i).foreach { c =>
        if (c.rowspan > 1)
          expanded = math.min(math.max(expanded, i + c.rowspan), rows.length)
      }
      i += 1
    }
    expanded
  }

  /** Boundary-row compatibility when total columns differ
    * (check_rows_match:646): effective columns equal, actual cell counts
    * equal, or rendered visual segments equal. */
  private def checkRowsMatch(rows1: Vector[Row], rows2: Vector[Row]): Boolean = {
    if (rows1.isEmpty) return false
    val k = expandHeaderByRowspan(rows2, detectHeaders(rows1, rows2))
    if (k >= rows2.length) return false
    val eff1 = effectiveCols(rows1)
    val eff2 = effectiveCols(rows2)
    eff1.last == eff2(k) || rows1.last.length == rows2(k).length ||
      renderedSegments(rows1, rows1.length - 1) == renderedSegments(rows2, k)
  }

  /** Merge eligibility (can_merge_tables:598). `curMergeCaps` are the
    * current table's captions that can legitimately belong to it (above
    * the body, or carrying a continuation marker); `prevFootnotes` is the
    * previous table's footnote count. */
  def canMerge(prevHtml: String, curHtml: String,
      prevFootnotes: Int = 0, curMergeCaps: Seq[String] = Nil): Boolean = {
    if (curMergeCaps.nonEmpty) {
      if (!curMergeCaps.exists(isContinuationCaption)) return false
      if (prevFootnotes > 1) return false
    } else if (prevFootnotes > 0) return false
    val rows1 = parse(prevHtml)
    val rows2 = parse(curHtml)
    if (rows1.isEmpty || rows2.isEmpty) return false
    if (totalCols(rows1) == totalCols(rows2)) return true
    checkRowsMatch(rows1, rows2)
  }

  /** Colspan adjustment toward `target` columns — structural mirror of
    * adjust_table_rows_colspan:680-720: a row whose VISUAL column count
    * (cell count, calculate_visual_columns:394) equals the reference
    * row's copies the reference colspan structure when the cell counts
    * align and is otherwise left untouched (never widened); only a row
    * with a different visual count widens its last cell by the column
    * deficit. */
  private def adjustRows(rows: Vector[Row], eff: Vector[Int],
      refRow: Row, target: Int): Vector[Row] = {
    val refStructure = refRow.map(_.colspan)
    val refVisualCols = refRow.length
    rows.zipWithIndex.map { case (r, i) =>
      if (r.isEmpty || eff(i) >= target || r.map(_.colspan).sum >= target) r
      else if (r.length == refVisualCols) {
        if (refStructure.length == r.length)
          r.zip(refStructure).map { case (c, cs) => c.copy(colspan = cs) }
        else r
      } else {
        val diff = target - eff(i)
        if (diff > 0) r.init :+ r.last.copy(colspan = r.last.colspan + diff)
        else r
      }
    }
  }

  /** Start visual column of every cell in `rows(target)`, with rowspan
    * carries from earlier rows occupying their columns
    * (build_visual_col_mapping / _scan_row_visual_sources,
    * table_merge.py:400-456). */
  def visualColMapping(rows: Vector[Row], target: Int): Vector[Int] = {
    var pending = Map.empty[Int, Int] // col -> rows remaining below
    var r = 0
    var result = Vector.empty[Int]
    while (r <= target && r < rows.length) {
      val starts = Vector.newBuilder[Int]
      var col = 0
      rows(r).foreach { c =>
        while (pending.getOrElse(col, 0) > 0) col += 1
        starts += col
        if (c.rowspan > 1)
          (col until col + c.colspan).foreach(k => pending += k -> (c.rowspan - 1))
        col += c.colspan
      }
      if (r == target) result = starts.result()
      else pending = pending.collect { case (k, n) if n > 1 => k -> (n - 1) }
      r += 1
    }
    result
  }

  private def cellHasContent(c: Cell): Boolean =
    c.text.trim.nonEmpty || c.text.contains("<img")

  /** Model-hinted boundary-cell fusion (_apply_cell_merge,
    * table_merge.py:780-856): `cellMerge(vi) == 1` appends the
    * continuation's first data-row cell at visual column vi into the
    * previous table's last-row cell at the same visual column (once per
    * unique cell pair — colspans expand the mapping), then clears the
    * transferred source cells; a first data row left without semantic
    * content sinks its blank rowspan placeholders into the next row and
    * is removed. Returns (new rows1, new body2). */
  private def applyCellMerge(rows1: Vector[Row], body2: Vector[Row],
      cellMerge: Seq[Int]): (Vector[Row], Vector[Row]) = {
    if (cellMerge.isEmpty || rows1.isEmpty || body2.isEmpty) return (rows1, body2)
    val cells1 = rows1.last
    val cells2 = body2.head
    val v1 = visualColMapping(rows1, rows1.length - 1)
    val v2 = visualColMapping(body2, 0)
    def expand(starts: Vector[Int], row: Row): Map[Int, Int] =
      starts.zipWithIndex.flatMap { case (s, ci) =>
        (s until s + row(ci).colspan).map(_ -> ci)
      }.toMap
    val toCell1 = expand(v1, cells1)
    val toCell2 = expand(v2, cells2)
    val pairs = cellMerge.zipWithIndex.collect {
      case (1, vi) if toCell1.contains(vi) && toCell2.contains(vi) =>
        (toCell1(vi), toCell2(vi))
    }.distinct
    if (pairs.isEmpty) return (rows1, body2)
    var last1 = cells1
    pairs.foreach { case (ci1, ci2) =>
      last1 = last1.updated(ci1, last1(ci1).copy(text = last1(ci1).text + cells2(ci2).text))
    }
    val clearedIdx = pairs.map(_._2).toSet
    var first2 = cells2.zipWithIndex.map { case (c, ci) =>
      if (clearedIdx(ci)) c.copy(text = "") else c
    }
    val newRows1 = rows1.init :+ last1
    if (first2.exists(cellHasContent)) (newRows1, body2.updated(0, first2))
    else {
      // sink blank rowspan placeholders into the next row, preserving
      // column alignment (_carry_rowspan_structure_to_next_row:833-856)
      if (body2.length > 1) {
        val carried = first2.zip(v2).collect {
          case (c, startV) if c.rowspan > 1 && !cellHasContent(c) =>
            (startV, c.copy(rowspan = c.rowspan - 1))
        }
        var next = body2(1)
        val nextStarts = visualColMapping(body2, 1)
        carried.sortBy(-_._1).foreach { case (startV, cell) =>
          val at = nextStarts.indexWhere(_ > startV)
          next = if (at < 0) next :+ cell else (next.take(at) :+ cell) ++ next.drop(at)
        }
        (newRows1, next +: body2.drop(2))
      } else (newRows1, Vector.empty)
    }
  }

  /** Merged HTML of two table parts (perform_table_merge:857-948): skip the
    * continuation's repeated header (rowspan-expanded), adjust the narrower
    * side's colspans, apply the model's cell_merge hint when present, then
    * append the continuation's data rows. */
  def merge(prevHtml: String, curHtml: String,
      cellMerge: Seq[Int] = Nil): String = {
    var rows1 = parse(prevHtml)
    val rows2 = parse(curHtml)
    val k = expandHeaderByRowspan(rows2, detectHeaders(rows1, rows2))
    var body2 = rows2.drop(k)
    if (rows1.nonEmpty && body2.nonEmpty) {
      val cols1 = totalCols(rows1)
      val cols2 = totalCols(rows2)
      if (cols1 > cols2)
        body2 = adjustRows(body2, effectiveCols(body2), rows1.last, cols1)
      else if (cols2 > cols1)
        rows1 = adjustRows(rows1, effectiveCols(rows1), body2.head, cols2)
    }
    if (cellMerge.nonEmpty) {
      val (r1, b2) = applyCellMerge(rows1, body2, cellMerge)
      rows1 = r1; body2 = b2
    }
    // preserve the previous part's table tag (a wired table stays
    // <table border="1"> after absorbing its continuation)
    val open = {
      val m = java.util.regex.Pattern.compile("^<table[^>]*>").matcher(prevHtml)
      if (m.find()) m.group() else "<table>"
    }
    open + render(rows1 ++ body2).stripPrefix("<table>")
  }

  /** Legacy structural probe (kept for specs): both tables share an
    * identical first row. */
  def headerOf(html: String): Option[Row] = parse(html).headOption

  // -- stream-level pass ----------------------------------------------------

  /** The cross-page merge pass over a flat reading-order block stream,
    * shared verbatim by the golden generator and the pipeline assembly so
    * the merge DECISION can never diverge between them (merge_table:
    * 950-1006 reshaped from nested page blocks to the flat stream).
    * Like the reference, the sweep over a chain runs BACKWARD (last page
    * toward the first): each continuation's header is detected against the
    * immediately preceding part, and a later part that already absorbed its
    * own continuation carries the absorbed rows into the earlier merge.
    *
    *  - a table chain-links to a table on the NEXT page when only its own
    *    trailing attachments, then the continuation's leading captions,
    *    separate them in the stream (the flat-form of "last para_block of
    *    page N-1 / first para_block of page N");
    *  - the continuation's captions (leading ones plus trailing ones that
    *    carry a continuation marker — post-table non-continuation captions
    *    never block, _is_post_table_non_continuation_caption:206) must
    *    include a continuation marker or the merge is blocked; on a merge
    *    the merged-away block's caption children clear
    *    (merge_table:998-1001);
    *  - the previous table's own footnotes block per can_merge_tables; on
    *    a merge they are DELETED and the continuation's footnotes relocate
    *    onto the merged table (perform_table_merge:941-948 rebuilds the
    *    children as non-footnotes + relocated cross-page footnotes);
    *  - the continuation's trailing non-continuation captions restore as
    *    plain text blocks at the merged-away table's position
    *    (_restore_post_table_captions_as_text:236).
    *
    * Like the reference, two adjacent cross-page tables with equal column
    * counts, no blocking captions and no footnotes DO merge even without a
    * repeated header — the env-gated feature's known false-positive class;
    * the corpus's fresh tables author a leading caption, which blocks it in
    * the common case. */
  def mergeStream[B](blocks: Vector[B])(
      kind: B => String, text: B => String, page: B => Int,
      withText: (B, String) => B, toText: B => B): Vector[B] = {
    import graft.schema.Kinds
    def isAttach(b: B): Boolean =
      kind(b) == Kinds.Caption || kind(b) == Kinds.Footnote
    val out = Vector.newBuilder[B]
    var i = 0
    val n = blocks.length
    while (i < n) {
      val b = blocks(i)
      if (kind(b) != Kinds.Table) { out += b; i += 1 }
      else {
        // ---- collect the maximal chain anchored at this table ----
        // part k: lead = caption indices between the previous part's trail
        // and the table (the continuation's caption children), tIdx the
        // table, trailEnd = end of the attach run after it on its page
        case class Part(lead: Vector[Int], tIdx: Int, trailEnd: Int) {
          def trail: Vector[Int] = ((tIdx + 1) until trailEnd).toVector
        }
        val parts = mutable.ArrayBuffer.empty[Part]
        var lead = Vector.empty[Int]
        var tIdx = i
        var scanning = true
        while (scanning) {
          val pg = page(blocks(tIdx))
          var t = tIdx + 1
          while (t < n && page(blocks(t)) == pg && isAttach(blocks(t))) t += 1
          parts += Part(lead, tIdx, t)
          var u = t
          while (u < n && page(blocks(u)) == pg + 1 &&
            kind(blocks(u)) == Kinds.Caption) u += 1
          if (u < n && kind(blocks(u)) == Kinds.Table &&
              page(blocks(u)) == pg + 1) {
            lead = (t until u).toVector
            tIdx = u
          } else scanning = false
        }
        val m = parts.length
        val html = Array.tabulate(m)(k => text(blocks(parts(k).tIdx)))
        val foots = Array.tabulate(m)(k =>
          parts(k).trail.map(blocks).filter(x => kind(x) == Kinds.Footnote))
        val mergedAway = new Array[Boolean](m)
        val absorbed = new Array[Boolean](m)
        val restored = Array.fill(m)(Vector.empty[B])
        // ---- backward sweep (merge_table: last page toward the first) ----
        var k = m - 2
        while (k >= 0) {
          val cur = k + 1
          val curTrailCaps = parts(cur).trail.map(blocks)
            .filter(x => kind(x) == Kinds.Caption)
          val mergeCaps = parts(cur).lead.map(x => text(blocks(x))) ++
            curTrailCaps.map(text).filter(isContinuationCaption)
          if (canMerge(html(k), html(cur), foots(k).length, mergeCaps)) {
            html(k) = merge(html(k), html(cur))
            // prev part's own footnotes are deleted; the continuation's
            // (incl. ones relocated onto it by a later chain step) move in
            foots(k) = foots(cur)
            restored(cur) = curTrailCaps
              .filterNot(x => isContinuationCaption(text(x))).map(toText)
            mergedAway(cur) = true
            absorbed(k) = true
          }
          k -= 1
        }
        // ---- forward emission ----
        k = 0
        while (k < m) {
          val p = parts(k)
          if (mergedAway(k)) out ++= restored(k)
          else {
            p.lead.foreach(li => out += blocks(li))
            val tb = blocks(p.tIdx)
            out += (if (absorbed(k)) withText(tb, html(k)) else tb)
            if (absorbed(k)) {
              // children rebuilt: own non-footnote attachments in order,
              // then the relocated footnotes
              p.trail.foreach { ti =>
                if (kind(blocks(ti)) != Kinds.Footnote) out += blocks(ti)
              }
              foots(k).foreach(out += _)
            } else {
              p.trail.foreach(ti => out += blocks(ti))
            }
          }
          k += 1
        }
        i = parts(m - 1).trailEnd
      }
    }
    out.result()
  }
}
