package graft.order

/** Virtual line injection — the exact slicing ladder the reference applies
  * before its line-level sort (insert_lines_into_block + get_line_height,
  * rapid_doc/utils/block_sort.py:40-130): blocks without native lines
  * (image/table/interline-equation bodies, empty text/title boxes, tall
  * one-line titles, footnote fences) are cut into synthetic lines so the
  * sorter sees fine granularity. The ladder, in reference order:
  *
  *   - not taller than 2 line heights → the whole box, one line;
  *   - taller than a quarter page AND between a quarter and half the page
  *     wide (a probable double-column region) → slice at line height;
  *   - wider than 0.4 page (complex figure) → exactly 3 lines;
  *   - wider than a quarter page (probable three-column) → slice at line
  *     height;
  *   - aspect (h/w) over 1.2 (tall and narrow) → the whole box;
  *   - otherwise → 2 lines.
  *
  * One documented micro-divergence: line y coordinates are produced as
  * `y0 + i·lh` (closed form) rather than the reference's sequential
  * `current_y += line_height` float accumulation — identical up to float
  * ulps, and the closed form is what a SQL replay can reproduce
  * bit-exactly. */
object VirtualLines {

  /** get_line_height (block_sort.py:40-54): exact median of the INT line
    * heights of text/title/caption/footnote lines; 10 when none. */
  def lineHeight(heights: Seq[Int]): Double = {
    if (heights.isEmpty) return 10.0
    val s = heights.sorted
    if (s.length % 2 == 1) s(s.length / 2).toDouble
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** Number of slices the ladder assigns (the aspect branch returns the
    * whole box — 1). */
  def sliceCount(w: Double, h: Double, lineHeight: Double,
      pageW: Double, pageH: Double): Int = {
    if (!(lineHeight * 2 < h)) 1
    else if (h > pageH * 0.25 && pageW * 0.5 > w && w > pageW * 0.25)
      (h / lineHeight).toInt
    else if (w > pageW * 0.4) 3
    else if (w > pageW * 0.25) (h / lineHeight).toInt
    else if (h / w > 1.2) 1
    else 2
  }

  /** insert_lines_into_block (block_sort.py:91-130). */
  def insertLines(x0: Double, y0: Double, x1: Double, y1: Double,
      lineHeight: Double, pageW: Double, pageH: Double)
      : Vector[(Double, Double, Double, Double)] = {
    val n = sliceCount(x1 - x0, y1 - y0, lineHeight, pageW, pageH)
    if (n == 1) Vector((x0, y0, x1, y1))
    else {
      val lh = (y1 - y0) / n
      (0 until n).map(i => (x0, y0 + i * lh, x1, y0 + (i + 1) * lh)).toVector
    }
  }
}
