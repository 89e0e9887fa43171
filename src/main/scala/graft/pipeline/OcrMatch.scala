package graft.pipeline

import graft.schema.{Det, Kinds}
import graft.geom.Geo

/** The XY-cut++ v3 OCR-text-matching layer (the r3 VERDICT's last unported
  * v3 surface): when the layout model emits BLOCK boxes without content and
  * the OCR/text-layer lines arrive as a SEPARATE stream, the reference
  * binds lines into blocks before the enhanced cut —
  * `get_layout_parsing_res` + `standardized_data`
  * (xycut_plus_v3.py:43-366,459-524) and
  * `LayoutBlock.update_text_content` / `group_boxes_into_lines`
  * (layout_objects.py:616-700). Ported behaviors:
  *
  *   1. block↔OCR matching: an OCR line belongs to a block when their
  *      intersection exceeds 3px in BOTH dimensions (`get_overlap_boxes_idx`,
  *      layout_parsing/utils.py:56-79) — not containment;
  *   2. hurdle split: a line matched to 2+ blocks is CROPPED at each
  *      block intersection; other lines of that block overlapping the crop
  *      at >0.8 (over the smaller) are cleared as duplicates
  *      (xycut_plus_v3.py:141-208). The crop's text is what a
  *      re-recognition of the crop pixels yields — in the deterministic
  *      stub world, the characters whose cells center inside the crop
  *      (the line's text maps linearly onto its box);
  *   3. footnote fix: a footnote whose bottom sits ABOVE the lowest text
  *      block's bottom is body text, not a footnote
  *      (xycut_plus_v3.py:117-123) — it becomes an ORDERING ANCHOR instead
  *      of a tie-up attachment;
  *   4. single-title promotion: exactly one paragraph title, no doc title,
  *      and title area > 0.3 × the largest block's area ⇒ the title IS the
  *      doc title (xycut_plus_v3.py:126-139, BLOCK_SETTINGS
  *      title_conversion_area_ratio_threshold) — surfaces as title level 1;
  *   5. no-layout fallback: zero layout boxes but OCR lines present ⇒
  *      every line becomes its own text block (xycut_plus_v3.py:210-218);
  *   6. per-block content: matched pieces group into visual lines by
  *      vertical overlap ≥ 0.8 over the smaller height
  *      (LINE_SETTINGS line_height_iou_threshold, layout_objects.py:640-643),
  *      lines sort top-down, pieces left-to-right, text joins through the
  *      same lang-aware join as the line-merge path.
  *
  * Divergence, documented: the reference matches every label outside
  * {formula, table, seal}; here figure/checkbox/hyperlink/algorithm/list-
  * item content is carried by the model contract (as the reference carries
  * table HTML and seal text), so the eligible set is
  * {text, title, caption, footnote} — the labels whose content genuinely
  * comes from the page's OCR lines. */
object OcrMatch {

  /** `get_overlap_boxes_idx` threshold: >3px in both dimensions. */
  private val MatchPx = 3.0

  /** Duplicate-clearing threshold vs a hurdle crop (overlap over smaller). */
  private val ClearIou = 0.8

  /** `line_height_iou_threshold`: same visual line when the vertical
    * overlap over the smaller height reaches 0.8. */
  private val LineBandIou = 0.8

  /** `title_conversion_area_ratio_threshold`. */
  private val TitleAreaRatio = 0.3

  /** Title boxes at height ≥ 30 already render level 1 (the doc-title
    * ladder step) — promotion applies below it. */
  private val DocTitleMinH = 30.0

  case class Bound(dets: Vector[Det], promoteTitle: Boolean)

  private def eligible(cat: String): Boolean =
    cat == Kinds.Text || cat == Kinds.Title || cat == Kinds.Caption ||
      cat == Kinds.Footnote

  /** Characters of `line` whose cell centers fall inside `crop` — the
    * deterministic analogue of re-recognizing the crop pixels (the line's
    * text maps linearly onto its box). */
  private def textInCrop(line: Det, cx0: Double, cy0: Double, cx1: Double,
      cy1: Double): String = {
    val cyC = (line.y0 + line.y1) / 2
    if (cyC < cy0 || cyC > cy1 || line.text.isEmpty) return ""
    val cw = (line.x1 - line.x0) / line.text.length
    val sb = new StringBuilder
    var i = 0
    while (i < line.text.length) {
      val cxC = line.x0 + (i + 0.5) * cw
      if (cxC >= cx0 && cxC <= cx1) sb.append(line.text.charAt(i))
      i += 1
    }
    sb.toString.trim
  }

  def bind(dets: Vector[Det], ocrLines: Vector[Det]): Bound = {
    // 5. no-layout fallback: each OCR line its own text block, as-is
    if (dets.isEmpty)
      return Bound(ocrLines.map(_.copy(cat = Kinds.Text, order = -1)), false)

    // 4. promotion decision over the ORIGINAL boxes (the reference computes
    //    max_block_area in its first standardization loop)
    val titles = dets.filter(_.cat == Kinds.Title)
    val maxArea = dets.map(_.area).max
    val promote = titles.length == 1 && titles.head.h < DocTitleMinH &&
      titles.head.area > TitleAreaRatio * maxArea

    // 3. footnote fix: bottom_text_y_max over text-labeled blocks, skipping
    //    text misfires living inside figure/table bodies (in the reference
    //    those are OCR lines, not layout boxes, so they never contribute)
    val bodies = dets.filter(d => Kinds.bodies(d.cat))
    def inBody(d: Det): Boolean = d.area > 0 && bodies.exists { b =>
      Geo.interLen(d.x0, d.x1, b.x0, b.x1) *
        Geo.interLen(d.y0, d.y1, b.y0, b.y1) / d.area >= 0.8
    }
    val bottomTextYMax = dets.foldLeft(0.0) { (acc, d) =>
      if (d.cat == Kinds.Text && !inBody(d)) math.max(acc, d.y1) else acc
    }
    val fixed = dets.map { d =>
      if (d.cat == Kinds.Footnote && d.y1 < bottomTextYMax) d.copy(cat = Kinds.Text)
      else d
    }

    // 1. matching
    val elig = fixed.indices.filter(i => eligible(fixed(i).cat)).toVector
    val matchesOf = Array.fill(fixed.length)(Vector.empty[Int])
    val ownersOf = Array.fill(ocrLines.length)(Vector.empty[Int])
    elig.foreach { bi =>
      val b = fixed(bi)
      var li = 0
      while (li < ocrLines.length) {
        val l = ocrLines(li)
        if (Geo.interLen(l.x0, l.x1, b.x0, b.x1) > MatchPx &&
          Geo.interLen(l.y0, l.y1, b.y0, b.y1) > MatchPx) {
          matchesOf(bi) :+= li
          ownersOf(li) :+= bi
        }
        li += 1
      }
    }

    // 2. hurdle split + duplicate clearing
    val cleared = new Array[Boolean](ocrLines.length)
    // pieces per block: whole single-owner lines plus hurdle crops
    val pieces = Array.fill(fixed.length)(Vector.empty[Det])
    var li = 0
    while (li < ocrLines.length) {
      if (ownersOf(li).length >= 2) {
        val l = ocrLines(li)
        ownersOf(li).foreach { bi =>
          val b = fixed(bi)
          val cx0 = math.max(l.x0, b.x0); val cy0 = math.max(l.y0, b.y0)
          val cx1 = math.min(l.x1, b.x1); val cy1 = math.min(l.y1, b.y1)
          // clear this block's other matched lines duplicating the crop
          matchesOf(bi).foreach { oi =>
            if (oi != li && !cleared(oi)) {
              val o = ocrLines(oi)
              if (Geo.overlapOverMin(o.x0, o.y0, o.x1, o.y1, cx0, cy0, cx1, cy1) > ClearIou)
                cleared(oi) = true
            }
          }
          val t = textInCrop(l, cx0, cy0, cx1, cy1)
          if (t.nonEmpty)
            pieces(bi) :+= l.copy(x0 = cx0, y0 = cy0, x1 = cx1, y1 = cy1, text = t)
        }
        cleared(li) = true // the hurdle itself is consumed by its crops
      }
      li += 1
    }
    li = 0
    while (li < ocrLines.length) {
      if (!cleared(li) && ownersOf(li).length == 1)
        pieces(ownersOf(li).head) :+= ocrLines(li)
      li += 1
    }

    // 6. per-block content
    val out = fixed.zipWithIndex.map { case (d, bi) =>
      if (!eligible(d.cat)) d
      else {
        val ls = pieces(bi).filter(_.text.nonEmpty)
          .sortBy(p => (p.y0, p.x0, p.x1))
        if (ls.isEmpty) d.copy(text = "")
        else {
          // group into visual lines by the 0.8 height-overlap band
          val groups = Vector.newBuilder[Vector[Det]]
          var cur = Vector(ls.head)
          ls.tail.foreach { p =>
            val ref = cur.head
            val inter = Geo.interLen(p.y0, p.y1, ref.y0, ref.y1)
            val minH = math.min(p.h, ref.h)
            if (minH > 0 && inter / minH >= LineBandIou) cur :+= p
            else { groups += cur; cur = Vector(p) }
          }
          groups += cur
          val gs = groups.result()
          val lineTexts = gs.map { g =>
            g.sortBy(_.x0).map(_.text)
              .reduce((a, b) => graft.textnorm.TextNorm.joinText(a, b))
          }
          val text =
            if (lineTexts.length == 1) lineTexts.head
            else graft.textnorm.TextNorm.joinAll(lineTexts)
          // right-flush of the LAST visual line vs the block box (the
          // same para-merge precondition buildBlock computes)
          val lastG = gs.last
          val flush = math.abs(d.x1 - lastG.map(_.x1).max) <
            math.max(1.0, lastG.head.h)
          d.copy(text = text, nLines = lineTexts.length, lastFlush = flush)
        }
      }
    }
    Bound(out, promote)
  }
}
