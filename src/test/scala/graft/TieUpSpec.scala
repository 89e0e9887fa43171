package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PageOps
import graft.schema.{Det, Kinds}

/** Unit tests of the tie-up port (magic_model_utils.py:30-169) on
  * hand-built geometries, pinning the behaviors that distinguish the
  * reference's relative rules from an absolute distance bound. */
class TieUpSpec extends AnyFunSuite {

  private def det(cat: String, x0: Double, y0: Double, x1: Double, y1: Double) =
    Det(cat, x0, y0, x1, y1, 1.0, "", "")

  test("3x-nearest rejection: a captionless body cannot steal another body's caption") {
    // F (no caption) at top; T below with caption C 4px under it. The greedy
    // sweep reaches F first and proposes (F, C), but pair_dis (>=100) is
    // >= 3 * nearest_dis (4), so the pair is rejected and C ties to T
    // (magic_model_utils.py:104-113).
    val blocks = Vector(
      det(Kinds.Figure, 36, 60, 286, 180),   // 0: F
      det(Kinds.Table, 36, 214, 286, 304),   // 1: T
      det(Kinds.Caption, 36, 308, 246, 326)) // 2: C  (4px below T)
    val assign = PageOps.tieUp(blocks, Vector(0, 1), Vector(2))
    assert(assign == Map(1 -> Vector(2)))
  }

  test("leftover objects attach to the nearest subject unconditionally (no distance bound)") {
    // C sits 150px below F — an absolute 30px bound would orphan it; the
    // reference's phase 2 (magic_model_utils.py:130-156) attaches any
    // leftover object to its nearest subject at ANY distance.
    val blocks = Vector(
      det(Kinds.Figure, 36, 60, 286, 180),
      det(Kinds.Caption, 36, 330, 246, 348))
    val assign = PageOps.tieUp(blocks, Vector(0), Vector(1))
    assert(assign == Map(0 -> Vector(1)))
  }

  test("no subjects on the page: objects stay standalone") {
    val blocks = Vector(
      det(Kinds.Text, 36, 60, 576, 120),
      det(Kinds.Caption, 36, 150, 246, 168))
    assert(PageOps.tieUp(blocks, Vector.empty, Vector(1)).isEmpty)
  }

  test("two bodies, two captions: greedy sweep pairs each with its own") {
    val blocks = Vector(
      det(Kinds.Figure, 36, 60, 286, 180),    // 0
      det(Kinds.Caption, 36, 184, 246, 202),  // 1: 4px under fig
      det(Kinds.Table, 36, 236, 286, 326),    // 2
      det(Kinds.Caption, 36, 330, 246, 348))  // 3: 4px under table
    val assign = PageOps.tieUp(blocks, Vector(0, 2), Vector(1, 3))
    assert(assign == Map(0 -> Vector(1), 2 -> Vector(3)))
  }

  test("deferred far caption joins its body's group at the MEDIAN index") {
    // Authoring: F (with caption C), then two text blocks. C is placed at
    // the END of the column (below both texts). The tie-up's unconditional
    // leftover attachment pulls C into F's group
    // (magic_model_utils.py:130-156); the group then sits at the MEDIAN of
    // its members' sort indices (process_block_list, block_sort.py:276-292)
    // — median(F=0, C=3) = 1.5, between T1 (1) and T2 (2). An absolute
    // 30px attachment bound would instead orphan C at the very end.
    val blocks = Vector(
      det(Kinds.Figure, 36, 60, 286, 180),   // 0: F
      det(Kinds.Text, 36, 214, 576, 270),    // 1: T1
      det(Kinds.Text, 36, 304, 576, 360),    // 2: T2
      det(Kinds.Caption, 36, 394, 246, 412)) // 3: C (far below F)
    val got = PageOps.orderBlocks(blocks)
    assert(got == Vector(1, 0, 3, 2))
  }

  test("model-order shortcut overrides geometry") {
    // Two text blocks with order fields inverted vs their y positions: the
    // shortcut (block_sort.py:154-170) must follow the model's order.
    val blocks = Vector(
      Det(Kinds.Text, 36, 60, 576, 120, 1.0, "", "", 5),
      Det(Kinds.Text, 36, 150, 576, 210, 1.0, "", "", 2))
    assert(PageOps.orderBlocks(blocks) == Vector(1, 0))
  }
}
