package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PageOps
import graft.schema._

/** formula_level config (batch_analyze.py:70,182-187): level 1 removes
  * INLINE-equation detections before processing; display formulas keep
  * their blocks. In this engine's contract the inline det's content
  * already lives in its text span, so the two levels must produce the
  * SAME spans — the filter's job is dropping the redundant det earlier. */
class FormulaLevelSpec extends AnyFunSuite {

  private def pm(dets: Vector[Det]) =
    PageModel("d", 0, 612, 792, dets)

  test("labeled inline dets never become blocks; display formulas survive both levels") {
    val dets = Vector(
      Det(Kinds.Text, 36, 100, 576, 112, 0.9, "with $x_1$ inline.", ""),
      Det(Kinds.InlineFormula, 36, 100, 576, 112, 0.8, "$x_1$", ""),
      Det(Kinds.Formula, 36, 150, 500, 186, 0.9, "$$ y $$", ""))
    val lvl0 = PageOps.process(pm(dets))
    val lvl1 = PageOps.process(pm(dets), formulaLevel = 1)
    assert(lvl0 == lvl1, "levels agree when content lives in the text span")
    assert(lvl0.map(_.kind) == Vector(Kinds.Text, Kinds.Formula))
    assert(lvl0.head.text == "with $x_1$ inline.")
  }

  test("a stray labeled inline det is dropped at either level, never a block") {
    val dets = Vector(
      Det(Kinds.Text, 36, 100, 576, 112, 0.9, "plain line.", ""),
      Det(Kinds.InlineFormula, 36, 300, 200, 320, 0.8, "$z$", ""))
    assert(PageOps.process(pm(dets)).map(_.kind) == Vector(Kinds.Text))
    assert(PageOps.process(pm(dets), formulaLevel = 1).map(_.kind) == Vector(Kinds.Text))
  }

  test("geometric fallback still folds UNLABELED formula dets over text") {
    val dets = Vector(
      Det(Kinds.Text, 36, 100, 576, 112, 0.9, "with $x_1$ inline.", ""),
      Det(Kinds.Formula, 36, 100, 576, 112, 0.8, "$x_1$", ""))
    assert(PageOps.process(pm(dets)).map(_.kind) == Vector(Kinds.Text))
  }

  test("containment dedup drops the smaller block at >= 0.65 over-min; seals protected") {
    // remove_overlaps_min_spans (span_pre_proc.py:90-125): a small block
    // fully inside a big one drops; a seal in the same position survives
    val contained = Vector(
      Det(Kinds.Formula, 36, 100, 400, 300, 0.9, "$$ big $$", ""),
      Det(Kinds.Formula, 100, 150, 200, 200, 0.8, "$$ small $$", ""))
    val out = PageOps.process(pm(contained))
    assert(out.map(_.text) == Vector("$$ big $$"))
    val sealed_ = Vector(
      Det(Kinds.Formula, 36, 100, 400, 300, 0.9, "$$ big $$", ""),
      Det(Kinds.Seal, 100, 150, 200, 200, 0.8, "SEAL X", ""))
    assert(PageOps.process(pm(sealed_)).length == 2, "seal never drops")
  }
}
