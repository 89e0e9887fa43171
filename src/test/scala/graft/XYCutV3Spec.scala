package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.order.{XYCut, XYCutV3}
import scala.util.Random

/** XY-cut++ v3 (xycut_plus_v3.py:459-579 / xycut_enhanced) behavioral
  * checks: the column pre-cut must recover column-major order on layouts
  * where the classic cut provably fails, and must agree with the classic
  * cut wherever the classic cut is well-defined. */
class XYCutV3Spec extends AnyFunSuite with TableDrivenPropertyChecks {

  private type Box = (Double, Double, Double, Double)

  test("aligned cross-column y-gap: classic interleaves, v3 reads column-major") {
    // two columns, two rows each, with a whitespace band running across
    // BOTH columns between the rows (the case XYCutSpec round 1 documented
    // as 'the renderer avoids')
    val boxes: IndexedSeq[Box] = Vector(
      (36, 100, 286, 200),  // 0: col1 row1
      (36, 260, 286, 360),  // 1: col1 row2
      (326, 100, 576, 200), // 2: col2 row1
      (326, 260, 576, 360)) // 3: col2 row2
    assert(XYCutV3.order(boxes) == Vector(0, 1, 2, 3), "v3 column-major")
    assert(XYCut.order(boxes) == Vector(0, 2, 1, 3), "classic splits on y first")
  }

  test("full-width title then aligned-gap columns: title first, then columns") {
    val boxes: IndexedSeq[Box] = Vector(
      (36, 50, 576, 82),    // 0: title spans both columns
      (36, 100, 286, 200),  // 1: col1 row1
      (36, 260, 286, 360),  // 2: col1 row2
      (326, 100, 576, 200), // 3: col2 row1
      (326, 260, 576, 360)) // 4: col2 row2
    assert(XYCutV3.order(boxes) == Vector(0, 1, 2, 3, 4))
  }

  test("three columns order left to right") {
    val boxes: IndexedSeq[Box] = Vector(
      (400, 100, 500, 300), // 0: col3
      (36, 100, 136, 300),  // 1: col1
      (218, 100, 318, 300)) // 2: col2
    assert(XYCutV3.order(boxes) == Vector(1, 2, 0))
  }

  test("v3 equals classic on single-column stacks and side-by-side rows") {
    val stacks = Table(
      "boxes",
      Vector[Box]((36, 60, 576, 120), (36, 150, 576, 210), (36, 240, 576, 300)),
      Vector[Box]((36, 60, 286, 120), (326, 60, 576, 120)), // one row, two cells
      Vector[Box]((36, 50, 576, 82), (36, 100, 576, 200), (36, 230, 576, 330)))
    forAll(stacks) { boxes =>
      assert(XYCutV3.order(boxes) == XYCut.order(boxes))
    }
  }

  test("permutation invariance: emitted sequence is independent of input order") {
    val rng = new Random(42)
    val base: IndexedSeq[Box] = Vector(
      (36, 50, 576, 82),
      (36, 100, 286, 200), (36, 260, 286, 360), (36, 420, 286, 520),
      (326, 100, 576, 200), (326, 260, 576, 360))
    val want = XYCutV3.order(base).map(base)
    (1 to 50).foreach { _ =>
      val perm = rng.shuffle(base.indices.toVector)
      val shuffled = perm.map(base)
      val got = XYCutV3.order(shuffled).map(shuffled)
      assert(got == want)
    }
  }

  test("nested insert region: projections interleave, the region layer reads it last") {
    // main flow: full-width above, two narrow wrap columns, full-width
    // below; a boxed INSERT floats between the wraps. Projection cuts see
    // three columns in the middle band and emit the insert between the
    // wraps; the region layer (xycut_plus_v3.py:230-360) reads the main
    // flow whole, then the insert.
    val boxes: IndexedSeq[(Double, Double, Double, Double)] = Vector(
      (36, 60, 576, 120),   // 0: above (full width)
      (36, 160, 186, 400),  // 1: left wrap
      (426, 160, 576, 400), // 2: right wrap
      (36, 450, 576, 600),  // 3: below (full width)
      (214, 172, 398, 380)) // 4: the insert
    val mainRegion = (36.0, 60.0, 576.0, 600.0)
    val insertRegion = (214.0, 172.0, 398.0, 380.0)
    assert(XYCutV3.orderWithRegions(boxes, Seq(mainRegion, insertRegion), 612, 792)
      == Vector(0, 1, 2, 3, 4))
    // without regions the middle band is read as three columns: the insert
    // lands between the wraps
    assert(XYCutV3.order(boxes) == Vector(0, 1, 4, 2, 3))
  }

  test("region assignment: bbox expands to the enclosing fixpoint of its matches") {
    // the detected region box only covers the top half of its second block;
    // the iterative rematch (enclosing bbox -> rematch) must still claim it
    val boxes: IndexedSeq[(Double, Double, Double, Double)] = Vector(
      (40, 60, 200, 100),   // 0: region block
      (40, 120, 200, 200),  // 1: region block, only half-covered initially
      (40, 400, 200, 500))  // 2: outside -> supplementary region
    val region = (36.0, 56.0, 204.0, 160.0) // covers 0 fully, 1 at half
    assert(XYCutV3.orderWithRegions(boxes, Seq(region), 612, 792)
      == Vector(0, 1, 2))
  }

  test("supplementary region shrinks away from a detected region") {
    // unmatched blocks straddle a detected region: the supplementary bbox
    // must shrink along the nearest edge and still order deterministically
    val boxes: IndexedSeq[(Double, Double, Double, Double)] = Vector(
      (320, 60, 576, 200),  // 0: inside the detected region
      (36, 60, 280, 200),   // 1: unmatched, left of the region
      (36, 220, 280, 360))  // 2: unmatched, below-left
    val region = (316.0, 56.0, 580.0, 204.0)
    val got = XYCutV3.orderWithRegions(boxes, Seq(region), 612, 792)
    assert(got.sorted == Vector(0, 1, 2), "a permutation (totality)")
    assert(got.indexOf(1) < got.indexOf(2), "left column top-down")
  }

  test("OCR-text-matching changes the ORDER: the footnote fix turns a " +
    "mis-attachable note into a correctly-placed anchor") {
    import graft.schema.{Det, Kinds, PageModel}
    import graft.pipeline.PageOps
    // a note sits between a text block and tableB, geometrically CLOSER
    // to tableB than to its own context; body text continues below it
    def det(cat: String, y0: Double, y1: Double, text: String = "",
        x1: Double = 540): Det = Det(cat, 72, y0, x1, y1, 0.9, text, "")
    val layout = Vector(
      det(Kinds.Table, 100, 190, "<table><tr><td>a</td></tr></table>"),
      det(Kinds.Text, 220, 246),
      det(Kinds.Footnote, 300, 316, x1 = 500),
      det(Kinds.Text, 330, 356),
      det(Kinds.Table, 380, 470, "<table><tr><td>b</td></tr></table>"))
    val ocr = Vector(
      Det(Kinds.Text, 72, 220, 540, 232, 0.9, "first body paragraph", ""),
      Det(Kinds.Text, 72, 234, 540, 246, 0.9, "continues here", ""),
      Det(Kinds.Text, 72, 300, 500, 316, 0.9, "Note between the tables.", ""),
      Det(Kinds.Text, 72, 330, 540, 342, 0.9, "second body paragraph", ""),
      Det(Kinds.Text, 72, 344, 540, 356, 0.9, "closes the page", ""))
    // v3 matching path: the footnote has body text BELOW it -> relabeled
    // to text -> stays at its authored position as an ordering anchor
    val matched = PageOps.process(PageModel("d", 0, 612, 792, layout, ocrLines = ocr))
    assert(matched.map(_.kind) == Vector(Kinds.Table, Kinds.Text, Kinds.Text,
      Kinds.Text, Kinds.Table))
    assert(matched(2).text == "Note between the tables.")
    // legacy path (text already bound, no separate OCR stream): the
    // tie-up's greedy origin sweep hands the note to tableA as its
    // footnote, so it renders DISPLACED — directly after tableA, two
    // slots before its authored position
    val bound = Vector(
      layout(0),
      layout(1).copy(text = "first body paragraph continues here", nLines = 2),
      layout(2).copy(text = "Note between the tables."),
      layout(3).copy(text = "second body paragraph closes the page", nLines = 2),
      layout(4))
    val legacy = PageOps.process(PageModel("d", 0, 612, 792, bound))
    assert(legacy.map(_.kind) == Vector(Kinds.Table, Kinds.Footnote, Kinds.Text,
      Kinds.Text, Kinds.Table))
    assert(legacy(1).text == "Note between the tables.",
      "without the matching layer the note is dragged to tableA")
  }
}
