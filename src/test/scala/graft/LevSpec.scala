package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Lev

/** Bit-parallel Levenshtein vs the textbook DP — exactness across word
  * boundaries, unicode bytes, and degenerate shapes. */
class LevSpec extends AnyFunSuite {

  private def dp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  private def check(a: String, b: String): Unit = {
    val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
    assert(Lev.distance(ab, bb) == dp(ab, bb),
      s"lev mismatch for '${a.take(40)}' vs '${b.take(40)}'")
  }

  test("hand cases: empty, equal, classic pairs, unicode bytes") {
    check("", ""); check("", "abc"); check("abc", "")
    check("kitten", "sitting"); check("flaw", "lawn")
    check("abc", "abc"); check("a", "b")
    check("☑a", "a") // 3 byte edits — the DuckDB byte semantics
    check("наука", "наук"); check("日本語テキスト", "日本語のテキスト")
  }

  test("word-boundary shapes: lengths 63/64/65/127/128/129") {
    val base = "abcdefghij" * 13 // 130 chars
    Seq(63, 64, 65, 127, 128, 129).foreach { len =>
      val a = base.take(len)
      check(a, a)
      check(a, a.drop(3))
      check(a, a.reverse)
      check(a.drop(1), a + "xyz")
    }
  }

  test("400 random pairs equal the DP (mixed lengths, mixed alphabet)") {
    val r = new graft.util.SplitMix64(0x5eedL)
    val alphabet = "abcde α☑日\n ".toCharArray
    (0 until 400).foreach { _ =>
      def rand(maxLen: Int): String = {
        val n = r.nextInt(maxLen)
        new String(Array.fill(n)(alphabet(r.nextInt(alphabet.length))))
      }
      check(rand(200), rand(200))
      check(rand(70), rand(400))
    }
  }
}
