package graft.util

/** Bit-parallel Levenshtein distance (Myers 1999, blocked form per Hyyrö
  * 2003) over byte strings — the same algorithmic family RapidFuzz uses
  * under the reference's `fuzz.ratio` (chunker/get_bbox_page_fast.py),
  * here hand-written against the published recurrences. One column of the
  * classic DP becomes O(⌈m/64⌉) word operations, a ~60× cell-rate win on
  * the 100-600-byte block texts the fuzzy locator compares.
  *
  * Exact distance, no banding: replacing the r4 banded DP with an exact
  * kernel is result-identical by construction (the band was itself proven
  * result-identical to exact), and removes the band-correctness proof
  * obligation from the hot path. */
object Lev {

  /** Exact byte-level Levenshtein distance. */
  def distance(a: Array[Byte], b: Array[Byte]): Int = {
    // pattern = shorter string (bitvector length), text = longer
    if (a.length > b.length) return distance(b, a)
    val m = a.length
    val n = b.length
    if (m == 0) return n
    if (m <= 64) single(a, b) else blocked(a, b)
  }

  /** Single-word Myers (m ≤ 64). */
  private def single(a: Array[Byte], b: Array[Byte]): Int = {
    val m = a.length
    val peq = new Array[Long](256)
    var i = 0
    while (i < m) { peq(a(i) & 0xff) |= 1L << i; i += 1 }
    var pv = -1L
    var mv = 0L
    var score = m
    val hbit = 1L << (m - 1)
    var j = 0
    while (j < b.length) {
      val eq = peq(b(j) & 0xff)
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & hbit) != 0) score += 1
      if ((mh & hbit) != 0) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    score
  }

  /** Blocked Myers (Hyyrö's multi-word extension): horizontal deltas
    * carry between 64-bit blocks bottom-up; the score rides the top bit
    * of the last block. */
  private def blocked(a: Array[Byte], b: Array[Byte]): Int = {
    val m = a.length
    val w = 64
    val nb = (m + w - 1) / w
    val peq = Array.ofDim[Long](nb, 256)
    var i = 0
    while (i < m) { peq(i / w)(a(i) & 0xff) |= 1L << (i % w); i += 1 }
    val vp = Array.fill(nb)(-1L)
    val vn = new Array[Long](nb)
    val lastHbit = 1L << ((m - 1) % w)
    var score = m
    var j = 0
    while (j < b.length) {
      val c = b(j) & 0xff
      var hin = 1 // left-boundary increment (row 0 horizontal delta)
      var blk = 0
      while (blk < nb) {
        val pv0 = vp(blk)
        val mv0 = vn(blk)
        var eq = peq(blk)(c)
        val xv = eq | mv0
        if (hin < 0) eq |= 1L
        val xh = (((eq & pv0) + pv0) ^ pv0) | eq
        var ph = mv0 | ~(xh | pv0)
        var mh = pv0 & xh
        val hb = if (blk == nb - 1) lastHbit else 1L << (w - 1)
        var hout = 0
        if ((ph & hb) != 0) hout += 1
        if ((mh & hb) != 0) hout -= 1
        ph = ph << 1
        mh = mh << 1
        if (hin > 0) ph |= 1L
        if (hin < 0) mh |= 1L
        vp(blk) = mh | ~(xv | ph)
        vn(blk) = ph & xv
        hin = hout
        blk += 1
      }
      score += hin // hout of the last block
      j += 1
    }
    score
  }
}
