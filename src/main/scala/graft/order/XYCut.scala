package graft.order

import graft.geom.Geo

/** Classic recursive XY-cut reading order — a behavioral port of the
  * reference's fallback sorter (/root/reference/rapid_doc/model/
  * reading_order/xycut_plus.py:69-209, sort_by_xycut:254-289): project
  * boxes onto y, split at zero-coverage gaps, recurse; inside an
  * unsplittable y-band project onto x and split into columns; a band that
  * splits on neither axis is emitted top-to-bottom, left-to-right.
  *
  * The model-order shortcut (block_sort.py:154-170) bypasses this when the
  * layout model supplies `original_order`; our kernel stub never does, so
  * this is the hot ordering path. Pure, deterministic, page-local. */
object XYCut {

  private val MinGap = 1.0

  /** Returns the indices of `boxes` in reading order. */
  def order(boxes: IndexedSeq[(Double, Double, Double, Double)]): Vector[Int] =
    recurse(boxes.indices.toVector, boxes)

  private def recurse(ids: Vector[Int],
      boxes: IndexedSeq[(Double, Double, Double, Double)]): Vector[Int] = {
    if (ids.length <= 1) return ids
    val ybands = splitByAxis(ids, boxes, vertical = true)
    if (ybands.length > 1) ybands.flatMap(recurse(_, boxes))
    else {
      val xcols = splitByAxis(ids, boxes, vertical = false)
      if (xcols.length > 1)
        xcols.flatMap { col =>
          // inside a column, only y-splits remain meaningful; fall back to
          // positional sort if the column is atomic
          val sub = splitByAxis(col, boxes, vertical = true)
          if (sub.length > 1) sub.flatMap(recurse(_, boxes))
          else col.sortBy(i => (boxes(i)._2, boxes(i)._1))
        }
      else ids.sortBy(i => (boxes(i)._2, boxes(i)._1))
    }
  }

  /** Partition ids into bands/columns separated by zero-coverage gaps on
    * one axis, ordered by coordinate. */
  private def splitByAxis(ids: Vector[Int],
      boxes: IndexedSeq[(Double, Double, Double, Double)],
      vertical: Boolean): Vector[Vector[Int]] = {
    val iv = ids.map { i =>
      val (x0, y0, x1, y1) = boxes(i)
      if (vertical) (y0, y1) else (x0, x1)
    }
    val segs = Geo.coverage(iv, MinGap)
    if (segs.length <= 1) Vector(ids)
    else {
      // assign each box to the segment containing its low edge
      segs.map { case (lo, hi) =>
        ids.filter { i =>
          val (x0, y0, _, _) = boxes(i)
          val v = if (vertical) y0 else x0
          v >= lo - 1e-9 && v <= hi + 1e-9
        }
      }.filter(_.nonEmpty)
    }
  }
}
