package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PageOps
import graft.schema.{Det, Kinds}

/** Geometric list/index classifier (para_split.py:73-270) on hand-built
  * line geometry. */
class ParaSplitSpec extends AnyFunSuite {

  private def line(text: String, x0: Double, y0: Double, x1: Double) =
    Det(Kinds.Text, x0, y0, x1, y0 + 12, 0.9, text, "")

  private def classify(lines: Vector[Det]): String = {
    val bx0 = lines.map(_.x0).min; val by0 = lines.map(_.y0).min
    val bx1 = lines.map(_.x1).max; val by1 = lines.map(_.y1).max
    PageOps.classifyBlock(lines, bx0, by0, bx1, by1, 612.0)
  }

  test("left-flush lines with >=80% end flags classify as list (rule 3)") {
    val lines = Vector(
      line("- spark shuffle;", 36, 100, 180),
      line("- kernel batch;", 36, 114, 170),
      line("- corpus merge.", 36, 128, 168))
    assert(classify(lines) == Kinds.ListK)
  }

  test("left-flush ragged-right lines classify as list without end flags") {
    val lines = Vector(
      line("- alpha", 36, 100, 300),
      line("- a much longer item text here", 36, 114, 300),
      line("- beta", 36, 128, 300)) // block width 264; short lines ragged
    // widen: give ragged structure — two short lines leave > 0.36*W gap
    val ragged = Vector(
      line("- alpha", 36, 100, 96),
      line("- a much longer item body", 36, 114, 300),
      line("- beta", 36, 128, 96))
    assert(classify(ragged) == Kinds.ListK)
  }

  test("both-flush lines ending in digits classify as index (rule 1)") {
    val lines = Vector(
      line("Overview . . . . 3", 36, 100, 540),
      line("Methods . . . . 17", 36, 114, 540),
      line("Results . . . . 29", 36, 128, 540))
    assert(classify(lines) == Kinds.Index)
  }

  test("centered ragged lines with tall aspect classify as list (rule 2)") {
    val lines = Vector(
      line("alpha centered", 248, 100, 364), // defines the box, flush
      line("beta", 260, 114, 352),           // >= 0.7*h from both edges
      line("gamma", 262, 128, 350),
      line("delta", 258, 142, 354))
    // block 248..364 (w=116), h=54 -> 0.47 > 0.4; all centered
    assert(classify(lines) == Kinds.ListK)
  }

  test("justified paragraph lines classify as text") {
    val lines = Vector(
      line("Analysis spark layout document model", 36, 100, 576),
      line("table figure formula page span block.", 36, 114, 576))
    assert(classify(lines) == Kinds.Text)
  }

  test("indented-first-line multi-paragraph blocks are excluded (multiple_para_flag)") {
    val lines = Vector(
      line("indented opening line;", 60, 100, 400),
      line("body continues here;", 36, 114, 576),
      line("short last line;", 36, 128, 300))
    assert(classify(lines) == Kinds.Text)
  }

  test("single line is always text") {
    assert(classify(Vector(line("- one;", 36, 100, 90))) == Kinds.Text)
  }

  // ---- __merge_2_text_blocks geometric conditions (para_split.py:273-314,
  // ported r4): exercised at the assemble level on hand OrderedBlocks -----

  private def blk(text: String, page: Int, idx: Int, nLines: Int = 2,
      width: Double = 540.0, flush: Boolean = true) =
    graft.schema.OrderedBlock(Kinds.Text, text, "", page, idx,
      nLines = nLines, width = width, lastFlush = flush)

  private def mergedTexts(a: graft.schema.OrderedBlock,
      b: graft.schema.OrderedBlock): Seq[String] =
    graft.pipeline.Assemble.assemble("d", Seq(Vector(a), Vector(b)))
      .spans.map(_.text)

  test("right-flush condition: a short last line ends the paragraph (:287-289)") {
    val p1 = blk("continuation begins here and", 0, 0)
    val p2 = blk("finishes on the next page.", 1, 0)
    assert(mergedTexts(p1, p2) ==
      Seq("continuation begins here and finishes on the next page."))
    // same text, but part 1's last line stops short of the right edge:
    // the paragraph already ended — no merge
    val ragged = p1.copy(lastFlush = false)
    assert(mergedTexts(ragged, p2) ==
      Seq("continuation begins here and", "finishes on the next page."))
  }

  test("2x width-ratio bound: a full-width paragraph does not continue into a narrow column (:292)") {
    val p1 = blk("continuation begins here and", 0, 0, width = 540)
    val within = blk("finishes on the next page.", 1, 0, width = 300)
    assert(mergedTexts(p1, within).length == 1, "|540-300| < 300: merged")
    val narrow = blk("finishes on the next page.", 1, 0, width = 230)
    assert(mergedTexts(p1, narrow).length == 2, "|540-230| >= 230: refused")
    // geometry-free paths (converters) carry width 0: the bound is vacuous
    val free = blk("finishes on the next page.", 1, 0, width = 0)
    assert(mergedTexts(p1.copy(width = 0), free).length == 1)
  }

  test("corpus authors the width-mismatch negative variant (non-vacuous)") {
    import graft.corpus.DocGen
    import graft.kernel.StubModel
    var refused = 0
    var allowedCount = 0
    (0 until 400).foreach { i =>
      val id = f"doc-$i%012d"
      val doc = DocGen.authored(id)
      val (_, allowed) = StubModel.contColumnPlan(id,
        doc.pages.map(_.blocks.map(b => (b.kind, b.text))))
      doc.pages.indices.dropRight(1).foreach { p =>
        val isBoundary = doc.pages(p).blocks.nonEmpty &&
          doc.pages(p).blocks.last.contWith
        if (isBoundary) {
          if (allowed(p)) allowedCount += 1 else refused += 1
        }
      }
    }
    assert(refused > 0, "no refused continuation boundary in 400 docs")
    assert(allowedCount > refused, "merges must remain the common case")
  }
}
