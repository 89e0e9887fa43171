package graft.order

/** XY-cut++ "v3" enhanced reading order — the behavioral surface of the
  * reference's primary geometric sorter when the layout model supplies no
  * `original_order` (/root/reference/rapid_doc/model/reading_order/
  * layout_parsing/xycut_plus_v3.py:459-579 via xycut_enhanced/xycuts.py:
  * 460-631). Two enhancements over the classic cut ([[XYCut]]):
  *
  *  1. column pre-cut: a discontinuous x-projection (xycut_enhanced/
  *     utils.py calculate_discontinuous_projection:1070-1113) is checked
  *     BEFORE any y split, so a multi-column region is read column-by-
  *     column even when a horizontal whitespace band runs across all
  *     columns (aligned y-gaps) — the layout class the classic cut
  *     mis-orders by splitting on y first;
  *  2. separator pre-cut: full-width blocks (titles, cross-layout figures
  *     — the reference's `cross_layout` order label and pre_process cut
  *     coordinates, xycuts.py:45-130) segment the region vertically, and
  *     the non-separator intervals BETWEEN them are regrouped into one
  *     segment each, so the column structure under a full-width title is
  *     seen whole instead of being shredded by its own internal y-gaps.
  *
  * A region with neither columns nor separators degrades to the classic
  * behavior (y-gap bands, then atomic top-to-bottom/left-to-right). */
object XYCutV3 {

  type Box = (Double, Double, Double, Double)

  private val MinGap = 1.0
  /** Region-matching thresholds (REGION_SETTINGS,
    * layout_parsing/setting.py): a block belongs to a region when the
    * overlap over the smaller area exceeds 0.8; 0.4 marks a split
    * candidate during supplementary-region shrinking. */
  private val MatchOverlap = 0.8
  private val SplitOverlap = 0.4
  /** A block at least this fraction of the region width is a full-width
    * separator candidate (the reference's centered/cross-layout test,
    * xycuts.py:79-92 tolerance form). */
  private val WideFrac = 0.55

  @inline private def area(b: Box): Double =
    math.abs((b._3 - b._1) * (b._4 - b._2))

  @inline private def overlapSmall(a: Box, b: Box): Double =
    graft.geom.Geo.overlapOverMin(a._1, a._2, a._3, a._4, b._1, b._2, b._3, b._4)

  @inline private def intersects(a: Box, b: Box): Boolean =
    math.min(a._3, b._3) > math.max(a._1, b._1) &&
      math.min(a._4, b._4) > math.max(a._2, b._2)

  private def enclosing(bs: Seq[Box]): Box =
    (bs.map(_._1).min, bs.map(_._2).min, bs.map(_._3).max, bs.map(_._4).max)

  /** Shrink a supplementary region bbox away from an overlapping detected
    * region along the nearest edge — port of shrink_supplement_region_bbox
    * (layout_parsing/utils.py:426-513): up to three edge-swap attempts;
    * blocks matched > 0.8 stay inside, 0.4..0.8 "split" blocks push the
    * edge further and recurse. Returns (shrunk bbox, matched indices). */
  private def shrink(supp: Box, ref: Box, pageW: Double, pageH: Double,
      idxs: Vector[Int], boxes: IndexedSeq[Box]): (Box, Vector[Int]) = {
    if (idxs.isEmpty) return (supp, Vector.empty)
    @inline def get(b: Box, e: Int): Double = e match {
      case 0 => b._1; case 1 => b._2; case 2 => b._3; case _ => b._4
    }
    @inline def set(b: Box, e: Int, v: Double): Box = e match {
      case 0 => (v, b._2, b._3, b._4); case 1 => (b._1, v, b._3, b._4)
      case 2 => (b._1, b._2, v, b._4); case _ => (b._1, b._2, b._3, v)
    }
    val conv = Array(2, 3, 0, 1)
    def edgeDists(a: Box, b: Box): Vector[Double] = Vector(
      (b._1 - a._1) / pageW, (b._2 - a._2) / pageH,
      (a._3 - b._3) / pageW, (a._4 - b._4) / pageH)
    val dists = edgeDists(supp, ref)
    var pool = dists
    var minD = pool.min
    var src = conv(dists.indexOf(minD))
    var result = supp
    var iner = Vector.empty[Int]
    var attempt = 0
    var done = false
    while (attempt < 3 && !done) {
      val dst = conv(src)
      var tmp = set(supp, dst, get(ref, src))
      iner = idxs.filter(i => overlapSmall(tmp, boxes(i)) > MatchOverlap)
      val split = idxs.filter { i =>
        val r = overlapSmall(tmp, boxes(i)); r > SplitOverlap && r <= MatchOverlap
      }
      if (iner.nonEmpty) {
        // split blocks push the edge and recurse over the matched set; the
        // enclosing and the returned match list stay the OUTER set, exactly
        // like the reference (:480-501 — the recursion's indices only gate
        // the continue)
        split.foreach { si =>
          val sb = boxes(si)
          val ds = edgeDists(tmp, sb)
          val src2 = ds.indexOf(ds.max)
          tmp = set(tmp, conv(src2), get(sb, src2))
          val (t2, in2) = shrink(tmp, ref, pageW, pageH, iner, boxes)
          if (in2.nonEmpty) tmp = t2
        }
        result = enclosing(iner.map(boxes))
        done = true
      } else {
        pool = pool.patch(pool.indexOf(minD), Nil, 1)
        if (pool.isEmpty) done = true
        else { minD = pool.min; src = conv(dists.indexOf(minD)) }
      }
      attempt += 1
    }
    (result, iner)
  }

  /** Two-level enhanced cut with detected REGIONS — the v3 region layer
    * (xycut_plus_v3.py:230-360 region_to_block_map + 31-40
    * sort_layout_parsing_blocks): blocks join the (area-ascending) region
    * whose bbox overlaps them > 0.8 over the smaller area, the region bbox
    * iterating to the enclosing-bbox fixpoint of its matches; leftover
    * blocks form supplementary regions (minimum enclosing bbox, shrunk
    * away from overlapping detected regions); regions are ordered by the
    * enhanced cut over region bboxes, then blocks within each region.
    * This reads a NESTED region (a boxed insert between wrap columns) as
    * one unit after its host flow — the layout class projection cuts
    * alone provably interleave. */
  def orderWithRegions(boxes: IndexedSeq[Box], regionBoxes: Seq[Box],
      pageW: Double, pageH: Double): Vector[Int] = {
    if (regionBoxes.isEmpty || boxes.length <= 1) return order(boxes)
    val n = boxes.length
    val remaining = scala.collection.mutable.LinkedHashSet.from(0 until n)
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Box, Vector[Int])]
    regionBoxes.sortBy(area).foreach { r0 =>
      var rb = r0
      var matched = remaining.iterator
        .filter(i => overlapSmall(rb, boxes(i)) > MatchOverlap).toVector
      if (matched.nonEmpty) {
        var prev = Vector.empty[Int]
        while (prev != matched) {
          prev = matched
          rb = enclosing(matched.map(boxes))
          matched = remaining.iterator
            .filter(i => overlapSmall(rb, boxes(i)) > MatchOverlap).toVector
        }
        matched.foreach(remaining.remove)
        groups += ((rb, matched))
      }
    }
    // supplementary regions for unmatched blocks (:287-341)
    var guard = 0
    while (remaining.nonEmpty && guard < n + 1) {
      val left = remaining.toVector
      var supp = enclosing(left.map(boxes))
      var matched = Vector.empty[Int]
      groups.foreach { case (rb, _) =>
        if (intersects(supp, rb)) {
          val (s2, m2) = shrink(supp, rb, pageW, pageH, left, boxes)
          supp = s2
          matched = m2
        }
      }
      if (matched.isEmpty) matched = left
      supp = enclosing(matched.map(boxes))
      matched.foreach(remaining.remove)
      groups += ((supp, matched))
      guard += 1
    }
    // regions by the enhanced cut, then blocks within each region
    val rOrder = order(groups.map(_._1).toIndexedSeq)
    rOrder.flatMap { ri =>
      val (_, blks) = groups(ri)
      order(blks.map(boxes)).map(blks)
    }
  }

  def order(boxes: IndexedSeq[(Double, Double, Double, Double)]): Vector[Int] = {
    val n = boxes.length
    val x0 = new Array[Double](n); val y0 = new Array[Double](n)
    val x1 = new Array[Double](n); val y1 = new Array[Double](n)
    var i = 0
    while (i < n) {
      val b = boxes(i); x0(i) = b._1; y0(i) = b._2; x1(i) = b._3; y1(i) = b._4
      i += 1
    }
    orderArrays(x0, y0, x1, y1).toVector
  }

  def orderArrays(x0: Array[Double], y0: Array[Double],
      x1: Array[Double], y1: Array[Double]): Array[Int] = {
    val ids = Array.range(0, x0.length)
    val out = new Array[Int](ids.length)
    val pos = new Pos(out)
    recurse(ids, x0, y0, x1, y1, pos)
    out
  }

  private final class Pos(val out: Array[Int]) { var i = 0
    def emit(id: Int): Unit = { out(i) = id; i += 1 }
  }

  /** Sort `ids` in place by (lo(id), tie(id)) — insertion sort over
    * primitives, pages hold ~20 boxes. */
  private def sortBy(ids: Array[Int], lo: Array[Double], tie: Array[Double]): Unit = {
    var si = 1
    while (si < ids.length) {
      val id = ids(si)
      val kl = lo(id); val kt = tie(id)
      var sj = si - 1
      while (sj >= 0 && {
        val o = ids(sj)
        lo(o) > kl || (lo(o) == kl && tie(o) > kt)
      }) { ids(sj + 1) = ids(sj); sj -= 1 }
      ids(sj + 1) = id
      si += 1
    }
  }

  /** Zero-coverage split of pre-sorted ids along (lo, hi): returns band
    * end offsets, or null when the projection is continuous. */
  private def bands(sorted: Array[Int], lo: Array[Double], hi: Array[Double]): Array[Int] = {
    val n = sorted.length
    var runningHi = hi(sorted(0))
    var i = 1
    var any = false
    while (i < n && !any) {
      if (lo(sorted(i)) > runningHi + MinGap) any = true
      else { if (hi(sorted(i)) > runningHi) runningHi = hi(sorted(i)); i += 1 }
    }
    if (!any) return null
    val ends = Array.newBuilder[Int]
    runningHi = hi(sorted(0))
    i = 1
    while (i < n) {
      if (lo(sorted(i)) > runningHi + MinGap) { ends += i; runningHi = hi(sorted(i)) }
      else if (hi(sorted(i)) > runningHi) runningHi = hi(sorted(i))
      i += 1
    }
    ends += n
    ends.result()
  }

  private def recurse(ids: Array[Int], x0: Array[Double], y0: Array[Double],
      x1: Array[Double], y1: Array[Double], pos: Pos): Unit = {
    val n = ids.length
    if (n == 0) return
    if (n == 1) { pos.emit(ids(0)); return }

    // 1. column pre-cut: discontinuous x-projection wins over any y split
    val byX = ids.clone()
    sortBy(byX, x0, y0)
    val colEnds = bands(byX, x0, x1)
    if (colEnds != null) {
      var s = 0
      var c = 0
      while (c < colEnds.length) {
        recurse(java.util.Arrays.copyOfRange(byX, s, colEnds(c)), x0, y0, x1, y1, pos)
        s = colEnds(c)
        c += 1
      }
      return
    }

    // 2. y intervals
    val byY = ids.clone()
    sortBy(byY, y0, x0)
    val rowEnds = bands(byY, y0, y1)
    if (rowEnds == null) {
      // continuous on both axes: atomic group, top-to-bottom/left-to-right
      var j = 0
      while (j < byY.length) { pos.emit(byY(j)); j += 1 }
      return
    }

    // 3. separator detection: an interval whose occupants are all
    //    full-width blocks cuts the region; consecutive non-separator
    //    intervals regroup into one segment so their column structure
    //    survives the cut
    var minX = Double.MaxValue; var maxX = Double.MinValue
    var i = 0
    while (i < n) {
      val id = ids(i)
      if (x0(id) < minX) minX = x0(id)
      if (x1(id) > maxX) maxX = x1(id)
      i += 1
    }
    val wideMin = WideFrac * (maxX - minX)
    def isSep(from: Int, until: Int): Boolean = {
      var k = from
      while (k < until) {
        if (x1(byY(k)) - x0(byY(k)) < wideMin) return false
        k += 1
      }
      true
    }
    var anySep = false
    var start = 0
    var r = 0
    while (r < rowEnds.length && !anySep) {
      if (isSep(start, rowEnds(r))) anySep = true
      start = rowEnds(r)
      r += 1
    }
    if (!anySep) {
      // classic y-band recursion
      var s = 0
      r = 0
      while (r < rowEnds.length) {
        recurse(java.util.Arrays.copyOfRange(byY, s, rowEnds(r)), x0, y0, x1, y1, pos)
        s = rowEnds(r)
        r += 1
      }
      return
    }
    // emit segments: separators alone, consecutive non-separators merged
    var segStart = 0 // start offset of the pending merged non-sep segment
    var pend = false
    start = 0
    r = 0
    while (r < rowEnds.length) {
      val end = rowEnds(r)
      if (isSep(start, end)) {
        if (pend) {
          recurse(java.util.Arrays.copyOfRange(byY, segStart, start), x0, y0, x1, y1, pos)
          pend = false
        }
        recurse(java.util.Arrays.copyOfRange(byY, start, end), x0, y0, x1, y1, pos)
      } else if (!pend) { segStart = start; pend = true }
      start = end
      r += 1
    }
    if (pend)
      recurse(java.util.Arrays.copyOfRange(byY, segStart, n), x0, y0, x1, y1, pos)
  }
}
