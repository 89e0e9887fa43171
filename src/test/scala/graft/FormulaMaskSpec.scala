package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PageOps
import graft.schema.{CharDet, Det, Kinds}

/** Formula-mask det-box update + line rejoin (update_det_boxes,
  * ocr_utils.py:193-217, txt-route call site span_pre_proc.py:172;
  * merge_spans_to_line, ocr_utils.py:20-37): a pre-recognition text-line
  * det splits around y-coinciding formula dets, the inline-equation det
  * becomes the line's in-line span, and the char fill + rejoin reproduce
  * the exact line text. */
class FormulaMaskSpec extends AnyFunSuite {

  private def line(x0: Double, x1: Double, text: String = "") =
    Det(Kinds.Text, x0, 100, x1, 112, 0.9, text, "", order = 7)
  private def inline(x0: Double, x1: Double, latex: String = "$x$") =
    Det(Kinds.InlineFormula, x0, 100, x1, 112, 0.9, latex, "")

  test("empty line det splits around a y-coinciding inline-formula det") {
    val out = PageOps.updateDetBoxes(Vector(line(100, 300), inline(180, 220)))
    assert(out == Vector(
      line(100, 180), line(220, 300),
      inline(180, 220).copy(cat = Kinds.Text))) // carrier reclassed in place
  }

  test("two masks on one line tile it into three pieces") {
    val out = PageOps.updateDetBoxes(
      Vector(line(0, 100), inline(20, 30, "$a$"), inline(60, 70, "$b$")))
    assert(out.filter(d => d.text.isEmpty).map(d => (d.x0, d.x1)) ==
      Vector((0.0, 20.0), (30.0, 60.0), (70.0, 100.0)))
  }

  test("insufficient y-overlap (<=0.8 of the lower box) does not split") {
    val half = inline(180, 220).copy(y0 = 106, y1 = 118) // overlap 6/12 = 0.5
    val out = PageOps.updateDetBoxes(Vector(line(100, 300), half))
    assert(out == Vector(line(100, 300), half)) // carrier NOT reclassed either
  }

  test("a fully-masked line det vanishes (nothing to recognize)") {
    val out = PageOps.updateDetBoxes(Vector(line(100, 300), inline(100, 300)))
    assert(out == Vector(inline(100, 300).copy(cat = Kinds.Text)))
  }

  test("post-rec (non-empty) dets pass through — the ocr route is kernel-split") {
    val rec = line(100, 300, text = "already recognized $x$ line")
    val full = inline(100, 300)
    assert(PageOps.updateDetBoxes(Vector(rec, full)) == Vector(rec, full))
  }

  test("split + char fill + rejoin reproduce the exact line text") {
    // "ab $x$ cd" over [0,90): cw = 10; formula substring [3,6) -> x [30,60)
    val text = "ab $x$ cd"
    val cw = 10.0
    val dets0 = Vector(line(0, 90), inline(30, 60, "$x$"))
    val chars = text.zipWithIndex.map { case (c, j) =>
      CharDet(c.toString, j * cw, 102, (j + 1) * cw, 110, j)
    }
    val split = PageOps.updateDetBoxes(dets0)
    val filled = PageOps.fillChars(split, chars)
    // formula-range chars land on the (non-empty) carrier and are wasted
    assert(filled.map(_.text) == Vector("ab ", " cd", "$x$"))
    val joined = PageOps.joinSplitLines(filled)
    assert(joined.length == 1)
    assert(joined.head.text == text)
    assert((joined.head.x0, joined.head.x1) == (0.0, 90.0))
    assert(joined.head.order == 7) // pieces carry the parent's model order
  }

  test("rejoin ignores dets with a real gap or different y-extent") {
    val a = line(0, 100, "left")
    val gap = line(102, 200, "right")              // 2.0 gap — authored minimum
    val off = line(100, 200, "below").copy(y0 = 114, y1 = 126)
    assert(PageOps.joinSplitLines(Vector(a, gap, off)) == Vector(a, gap, off))
  }

  test("the corpus actually exercises the split path (non-vacuous)") {
    // a char-layer text line carrying an inline equation must exist and its
    // det stream must change under updateDetBoxes
    val hit = (0 until 200).exists { i =>
      val id = f"doc-$i%012d"
      graft.kernel.StubModel.analyze(graft.corpus.DocGen.docRow(id)).exists { pm =>
        val ups = PageOps.restoreOrientation(pm)._3
        PageOps.updateDetBoxes(ups) != ups
      }
    }
    assert(hit, "no doc in the first 200 exercises the formula-mask split")
  }
}
