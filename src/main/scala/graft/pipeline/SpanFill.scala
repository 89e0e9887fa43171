package graft.pipeline

import graft.schema.Kinds
import graft.geom.Geo

/** span→block fill — the exact spatial-containment join of the reference
  * (fill_spans_in_blocks + span_block_type_compatible,
  * rapid_doc/utils/span_block_fix.py:9-69): a span lands in the FIRST
  * block (block list order) whose overlap covers more than `radio` of the
  * SPAN's own area (0.9 for image/table spans regardless of the caller's
  * radio) and whose type is compatible; claimed spans leave the pool, and
  * the leftovers flow to the discarded pass
  * (model_json_to_middle_json.py:156) — the set-difference residue of
  * SURVEY §2.6. */
object SpanFill {

  /** span_block_type_compatible (span_block_fix.py:50-69) at the sandbox
    * kind vocabulary: checkbox rides the text row, image/table spans only
    * fill their own bodies, interline equations fill equation or text
    * blocks. */
  def compatible(spanType: String, blockType: String): Boolean = spanType match {
    case Kinds.Text | Kinds.InlineFormula | Kinds.Checkbox =>
      blockType == Kinds.Text || blockType == Kinds.Title ||
        blockType == Kinds.Caption || blockType == Kinds.Footnote ||
        blockType == Kinds.ImageFootnote || blockType == Kinds.FormulaNumber ||
        blockType == Kinds.Abandon
    case Kinds.Formula => blockType == Kinds.Formula || blockType == Kinds.Text
    case Kinds.Figure => blockType == Kinds.Figure
    case Kinds.Table => blockType == Kinds.Table
    case _ => false
  }

  /** One page's fill: `blocks` in list order, `spans` as
    * (id, type, x0, y0, x1, y1). Returns each span's claiming block index
    * (position in `blocks`), or -1 for the discarded-residue leftovers. */
  def fill(blocks: IndexedSeq[(String, Double, Double, Double, Double)],
      spans: IndexedSeq[(Int, String, Double, Double, Double, Double)],
      radio: Double): Vector[(Int, Int)] = {
    val claimed = new Array[Int](spans.length)
    java.util.Arrays.fill(claimed, -1)
    var bi = 0
    while (bi < blocks.length) {
      val (btype, bx0, by0, bx1, by1) = blocks(bi)
      var si = 0
      while (si < spans.length) {
        if (claimed(si) < 0) {
          val (_, stype, sx0, sy0, sx1, sy1) = spans(si)
          val r =
            if (stype == Kinds.Figure || stype == Kinds.Table) 0.9 else radio
          if (compatible(stype, btype) &&
              Geo.overlapInA(sx0, sy0, sx1, sy1, bx0, by0, bx1, by1) > r)
            claimed(si) = bi
        }
        si += 1
      }
      bi += 1
    }
    spans.indices.map(si => (spans(si)._1, claimed(si))).toVector
  }
}
