package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema.{Det, Kinds, PageModel}
import graft.pipeline.{OcrMatch, PageOps}

/** Hand fixtures for the v3 OCR-text-matching layer (OcrMatch): each test
  * pins one ported behavior of get_layout_parsing_res /
  * standardized_data (xycut_plus_v3.py) with hand-authored geometry. */
class OcrMatchSpec extends AnyFunSuite {

  private def box(cat: String, x0: Double, y0: Double, x1: Double, y1: Double,
      text: String = "", ord: Int = -1): Det =
    Det(cat, x0, y0, x1, y1, 0.9, text, "", ord)

  test("binding: lines group into blocks, multi-line paragraphs join") {
    val para = box(Kinds.Text, 72, 100, 540, 138) // 3 lines at 14-pitch
    val title = box(Kinds.Title, 72, 60, 540, 82)
    val lines = Vector(
      box(Kinds.Text, 72, 128, 540, 140, "third line here."),
      box(Kinds.Text, 72, 100, 540, 112, "first line of the"),
      box(Kinds.Text, 72, 114, 540, 126, "paragraph continues"),
      box(Kinds.Text, 72, 60, 540, 82, "Section Heading"))
    val b = OcrMatch.bind(Vector(para, title), lines)
    val byCat = b.dets.map(d => d.cat -> d).toMap
    assert(byCat(Kinds.Text).text == "first line of the paragraph continues third line here.")
    assert(byCat(Kinds.Text).nLines == 3)
    assert(byCat(Kinds.Title).text == "Section Heading")
  }

  test("matching is >3px overlap in both dims, not containment") {
    val para = box(Kinds.Text, 72, 100, 300, 112)
    // overhangs the box left AND right but overlaps well: matched
    val wide = box(Kinds.Text, 60, 101, 320, 111, "overhanging line")
    // only 2px of vertical overlap: NOT matched
    val graze = box(Kinds.Text, 72, 110.5, 300, 122, "grazing line")
    val b = OcrMatch.bind(Vector(para), Vector(wide, graze))
    assert(b.dets.head.text == "overhanging line")
  }

  test("hurdle split: a line across two columns is cropped per block, " +
    "duplicates cleared by the 0.8 rule") {
    val left = box(Kinds.Text, 72, 100, 302, 140)
    val right = box(Kinds.Text, 310, 100, 540, 140)
    // the hurdle: one detection spanning both columns at y 100..112; its
    // 46 chars map linearly onto [72, 532] (cw = 10): centers 0..22 fall
    // inside the left crop [72,302], char 23 (a space) lands in the
    // column gap, centers 24..45 inside the right crop [310,532]
    val t = "left col text fragment. right col text portion"
    assert(t.length == 46)
    val hurdle = box(Kinds.Text, 72, 100, 532, 112, t)
    // a duplicate detection of the left piece: cleared against the crop
    val dup = box(Kinds.Text, 72, 100, 302, 112, "left col text fragment.")
    // an ordinary second line of the left block: NOT cleared
    val l2 = box(Kinds.Text, 72, 114, 302, 126, "second left line")
    val b = OcrMatch.bind(Vector(left, right), Vector(hurdle, dup, l2))
    val lt = b.dets(0).text
    val rt = b.dets(1).text
    assert(lt == "left col text fragment. second left line", s"left got '$lt'")
    assert(rt == "right col text portion", s"right got '$rt'")
  }

  test("a sliver hurdle whose crops hold no char centers contributes nothing") {
    // block boxes padded beyond their lines, so the sliver's 4px
    // penetration touches no real line (a sliver INTO a line box clears
    // that line — the reference's crop-replacement degradation, by design)
    val a = box(Kinds.Text, 72, 100, 540, 138)
    val c = box(Kinds.Text, 72, 172, 540, 210)
    val lines = Vector(
      box(Kinds.Text, 72, 100, 540, 112, "block a line"),
      box(Kinds.Text, 72, 196, 540, 208, "block c line"),
      // straddles the gap, enters each block by 4px; its char centers sit
      // at the sliver's y-middle (155) — inside neither crop
      box(Kinds.Text, 72, 134, 540, 176, "smudge artifact"))
    val b = OcrMatch.bind(Vector(a, c), lines)
    assert(b.dets(0).text == "block a line")
    assert(b.dets(1).text == "block c line")
  }

  test("footnote above bottom text relabels to text; one below stays") {
    val para = box(Kinds.Text, 72, 100, 540, 140)
    val fnHigh = box(Kinds.Footnote, 72, 60, 500, 76) // text below -> text
    val fnLow = box(Kinds.Footnote, 72, 200, 500, 216) // nothing below -> stays
    val lines = Vector(
      box(Kinds.Text, 72, 100, 540, 112, "body paragraph line"),
      box(Kinds.Text, 72, 60, 500, 76, "High note."),
      box(Kinds.Text, 72, 200, 500, 216, "Low note."))
    val b = OcrMatch.bind(Vector(para, fnHigh, fnLow), lines)
    assert(b.dets(1).cat == Kinds.Text && b.dets(1).text == "High note.")
    assert(b.dets(2).cat == Kinds.Footnote && b.dets(2).text == "Low note.")
  }

  test("text misfires inside a body do not extend bottom_text_y_max") {
    val figure = box(Kinds.Figure, 72, 150, 540, 270)
    val axis = box(Kinds.Text, 90, 250, 150, 262, "axis 42") // inside the figure
    val fn = box(Kinds.Footnote, 72, 120, 500, 136) // above the axis label
    val lines = Vector(box(Kinds.Text, 72, 120, 500, 136, "Note text."))
    val b = OcrMatch.bind(Vector(figure, axis, fn), lines)
    // were the axis label counted, the footnote would relabel
    assert(b.dets(2).cat == Kinds.Footnote)
  }

  test("single sub-level title over 0.3x max area promotes to level 1") {
    val title = box(Kinds.Title, 72, 60, 540, 82) // h=22 -> ladder level 2
    val para = box(Kinds.Text, 72, 100, 540, 126) // area 468*26
    val lines = Vector(
      box(Kinds.Text, 72, 60, 540, 82, "Promoted Title"),
      box(Kinds.Text, 72, 100, 540, 112, "one line"),
      box(Kinds.Text, 72, 114, 540, 126, "two line"))
    val b = OcrMatch.bind(Vector(title, para), lines)
    assert(b.promoteTitle) // 468*22 > 0.3 * 468*26
    // two titles: no promotion
    val b2 = OcrMatch.bind(Vector(title, title.copy(y0 = 300, y1 = 322), para),
      lines)
    assert(!b2.promoteTitle)
    // a dominant block: no promotion
    val big = box(Kinds.Table, 72, 300, 540, 600) // area 468*300; 0.3x = 140*468 > title
    val b3 = OcrMatch.bind(Vector(title, para, big), lines)
    assert(!b3.promoteTitle)
  }

  test("no-layout fallback: OCR lines become per-line text blocks") {
    val lines = Vector(
      box(Kinds.Text, 72, 100, 540, 112, "first"),
      box(Kinds.Text, 72, 114, 540, 126, "second"))
    val b = OcrMatch.bind(Vector.empty, lines)
    assert(b.dets.map(_.text) == Vector("first", "second"))
    assert(b.dets.forall(_.cat == Kinds.Text))
  }

  test("full page path: a match page flows through process end to end") {
    val pm = PageModel("d", 0, 612, 792,
      dets = Vector(
        box(Kinds.Title, 72, 60, 540, 82, ord = -1),
        box(Kinds.Text, 72, 110, 540, 136)),
      ocrLines = Vector(
        box(Kinds.Text, 72, 110, 540, 122, "body first line"),
        box(Kinds.Text, 72, 124, 540, 136, "and the second"),
        box(Kinds.Text, 72, 60, 540, 82, "Page Title")))
    val out = PageOps.process(pm)
    assert(out.map(b => (b.kind, b.text)) == Vector(
      (Kinds.Title, "Page Title"),
      (Kinds.Text, "body first line and the second")))
    // promotion: single level-2 title (h=22) vs the 26px paragraph
    assert(out.head.level == 1)
  }
}
