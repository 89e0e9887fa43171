package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PageOps
import graft.schema.{CharDet, Det, Kinds, PageModel}

/** Orientation restore (restore_poly analogue): rotated-scan pages map
  * back to upright coordinates exactly, for all four rotations. */
class OrientationSpec extends AnyFunSuite {

  private val up = Det(Kinds.Text, 36, 100, 576, 112, 0.9, "line", "")
  private val upChar = CharDet("a", 36, 102, 48, 110, 0)
  private val W = 612.0; private val H = 792.0

  private def fwd(rot: Int, x0: Double, y0: Double, x1: Double, y1: Double) =
    rot match {
      case 90 => (H - y1, x0, H - y0, x1)
      case 180 => (W - x1, H - y1, W - x0, H - y0)
      case 270 => (y0, W - x1, y1, W - x0)
    }

  test("restore is the exact inverse of the rotated emission, all rotations") {
    Seq(90, 180, 270).foreach { rot =>
      val (dx0, dy0, dx1, dy1) = fwd(rot, up.x0, up.y0, up.x1, up.y1)
      val (cx0, cy0, cx1, cy1) = fwd(rot, upChar.x0, upChar.y0, upChar.x1, upChar.y1)
      val (w, h) = if (rot == 180) (W, H) else (H, W)
      val pm = PageModel("d", 0, w, h,
        Vector(up.copy(x0 = dx0, y0 = dy0, x1 = dx1, y1 = dy1)),
        Vector(upChar.copy(x0 = cx0, y0 = cy0, x1 = cx1, y1 = cy1)), rot)
      val (rw, rh, dets, chars, _, _, _) = PageOps.restoreOrientation(pm)
      assert((rw, rh) == (W, H), s"dims rot=$rot")
      assert(dets.head == up, s"det rot=$rot")
      assert(chars.head == upChar, s"char rot=$rot")
    }
  }

  test("rotated pages occur in the corpus and extract golden-exact") {
    import graft.corpus.DocGen
    import graft.kernel.StubModel
    val rotatedDocs = (0 until 200).map(i => f"doc-$i%012d").filter { id =>
      StubModel.analyze(DocGen.docRow(id)).exists(_.rotation != 0)
    }
    assert(rotatedDocs.nonEmpty, "no rotated pages in the first 200 docs")
    rotatedDocs.take(10).foreach { id =>
      val got = graft.pipeline.Extract.extractDoc(DocGen.docRow(id))
      assert(got.spans == DocGen.golden(id).spans, s"rotated doc $id")
    }
  }
}
