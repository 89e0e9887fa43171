package graft.order

/** Classic recursive XY-cut reading order — a behavioral port of the
  * reference's fallback sorter (/root/reference/rapid_doc/model/
  * reading_order/xycut_plus.py:69-209, sort_by_xycut:254-289): project
  * boxes onto y, split at zero-coverage gaps (min_gap=1), recurse; inside
  * an unsplittable y-band project onto x and split into columns; a band
  * that splits on neither axis is emitted top-to-bottom, left-to-right.
  *
  * The model-order shortcut (block_sort.py:154-170) bypasses this when the
  * layout model supplies `original_order`; our kernel stub never does, so
  * this is the hot ordering path. Implemented over primitive arrays — it
  * runs once per page per document, so allocation churn here is fleet-wide
  * memory bandwidth at 10^12 documents. */
object XYCut {

  private val MinGap = 1.0

  /** Tuple-friendly wrapper (tests, simulation checks). */
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
    recurse(ids, x0, y0, x1, y1, vertical = true, pos)
    out
  }

  private final class Pos(val out: Array[Int]) { var i = 0
    def emit(id: Int): Unit = { out(i) = id; i += 1 }
  }

  /** Sort ids by low edge on `vertical` axis, then emit bands separated by
    * zero-coverage gaps. Returns band boundaries via recursion. */
  private def recurse(ids: Array[Int], x0: Array[Double], y0: Array[Double],
      x1: Array[Double], y1: Array[Double], vertical: Boolean, pos: Pos): Unit = {
    val n = ids.length
    if (n == 0) return
    if (n == 1) { pos.emit(ids(0)); return }
    val lo = if (vertical) y0 else x0
    val hi = if (vertical) y1 else x1
    // sort ids by (lo, cross-lo): insertion sort on primitives — pages hold
    // ~20 boxes, and boxed tuple keys were a top-5 allocation site fleetwide
    val cross = if (vertical) x0 else y0
    val sorted = ids.clone()
    var si = 1
    while (si < n) {
      val id = sorted(si)
      val kl = lo(id); val kc = cross(id)
      var sj = si - 1
      while (sj >= 0 && {
        val o = sorted(sj)
        lo(o) > kl || (lo(o) == kl && cross(o) > kc)
      }) { sorted(sj + 1) = sorted(sj); sj -= 1 }
      sorted(sj + 1) = id
      si += 1
    }
    // find gap boundaries
    var bandStart = 0
    var runningHi = hi(sorted(0))
    var i = 1
    var splitAny = false
    // first pass: detect whether any split exists to avoid infinite recursion
    while (i < n) {
      val id = sorted(i)
      if (lo(id) > runningHi + MinGap) { splitAny = true; i = n }
      else { if (hi(id) > runningHi) runningHi = hi(id); i += 1 }
    }
    if (splitAny) {
      // emit bands, recursing each on the same axis first (a y-band may
      // itself split on y after the x recursion inside)
      runningHi = hi(sorted(0))
      i = 1
      while (i <= n) {
        if (i == n || lo(sorted(i)) > runningHi + MinGap) {
          val band = java.util.Arrays.copyOfRange(sorted, bandStart, i)
          recurse(band, x0, y0, x1, y1, vertical = true, pos)
          if (i < n) { bandStart = i; runningHi = hi(sorted(i)) }
        } else if (hi(sorted(i)) > runningHi) runningHi = hi(sorted(i))
        i += 1
      }
    } else if (vertical) {
      // no y-split: try x
      recurse(sorted, x0, y0, x1, y1, vertical = false, pos)
    } else {
      // no split on either axis: atomic group, top-to-bottom/left-to-right
      val atomic = ids.clone()
      var ai = 1
      while (ai < atomic.length) {
        val id = atomic(ai)
        val ky = y0(id); val kx = x0(id)
        var aj = ai - 1
        while (aj >= 0 && {
          val o = atomic(aj)
          y0(o) > ky || (y0(o) == ky && x0(o) > kx)
        }) { atomic(aj + 1) = atomic(aj); aj -= 1 }
        atomic(aj + 1) = id
        ai += 1
      }
      var j = 0
      while (j < atomic.length) { pos.emit(atomic(j)); j += 1 }
    }
  }
}
