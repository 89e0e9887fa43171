package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PageOps
import graft.order.XYCutV3
import graft.schema.{Det, Kinds}
import scala.util.Random

/** Randomized invariants over geometry the corpus never authors — the
  * operators must stay total and self-consistent on arbitrary boxes. */
class PropertySpec extends AnyFunSuite {

  private def randBox(rng: Random): (Double, Double, Double, Double) = {
    val x0 = rng.nextDouble() * 500
    val y0 = rng.nextDouble() * 700
    (x0, y0, x0 + 5 + rng.nextDouble() * 200, y0 + 5 + rng.nextDouble() * 100)
  }

  test("XYCutV3 is a permutation: every index emitted exactly once") {
    val rng = new Random(7)
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(25)
      val boxes = Vector.fill(n)(randBox(rng))
      val out = XYCutV3.order(boxes)
      assert(out.sorted == (0 until n).toVector, s"not a permutation: $out")
    }
  }

  test("orderWithRegions is a permutation under arbitrary boxes and region rects") {
    val rng = new Random(13)
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(25)
      val boxes = Vector.fill(n)(randBox(rng))
      val nR = rng.nextInt(4)
      val regions = Vector.fill(nR)(randBox(rng))
      val out = XYCutV3.orderWithRegions(boxes, regions, 612, 792)
      assert(out.sorted == (0 until n).toVector,
        s"not a permutation with $nR regions: $out")
    }
  }

  test("tie-up: every object attaches exactly once when subjects exist; none without") {
    val rng = new Random(11)
    (1 to 200).foreach { _ =>
      val ns = rng.nextInt(6)
      val no = rng.nextInt(6)
      val blocks = Vector.tabulate(ns + no) { i =>
        val (x0, y0, x1, y1) = randBox(rng)
        Det(if (i < ns) Kinds.Figure else Kinds.Caption, x0, y0, x1, y1, 1.0, "", "")
      }
      val subs = (0 until ns).toVector
      val objs = (ns until ns + no).toVector
      val assign = PageOps.tieUp(blocks, subs, objs)
      val attached = assign.values.flatten.toVector
      if (ns == 0 || no == 0) assert(assign.isEmpty)
      else {
        assert(attached.sorted == objs, "every object attached exactly once")
        assert(assign.keySet.subsetOf(subs.toSet))
      }
    }
  }

  test("emitBlocks is a permutation over arbitrary mixed-category pages") {
    val rng = new Random(13)
    val cats = Vector(Kinds.Text, Kinds.Figure, Kinds.Table, Kinds.Caption,
      Kinds.Footnote, Kinds.Formula, Kinds.FormulaNumber, Kinds.Checkbox, Kinds.Seal)
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(20)
      val blocks = Vector.fill(n) {
        val (x0, y0, x1, y1) = randBox(rng)
        Det(cats(rng.nextInt(cats.length)), x0, y0, x1, y1, 1.0, "", "",
          if (rng.nextBoolean()) rng.nextInt(50) else -1)
      }
      val out = PageOps.emitBlocks(blocks)
      // emitBlocks is a permutation of the NON-reduced blocks: a tie-up
      // candidate fully contained in a same-category candidate leaves the
      // page (reduct_overlap, magic_model_utils.py:9-27)
      val tieCats = Set(Kinds.Caption, Kinds.Footnote, Kinds.FormulaNumber,
        Kinds.Figure, Kinds.Table, Kinds.Formula)
      def grp(c: String) =
        if (c == Kinds.Figure || c == Kinds.Table) "body" else c
      val reduced = blocks.indices.filter { i =>
        val a = blocks(i)
        tieCats(a.cat) && blocks.indices.exists { j =>
          j != i && grp(blocks(j).cat) == grp(a.cat) && {
            val b = blocks(j)
            a.x0 >= b.x0 && a.y0 >= b.y0 && a.x1 <= b.x1 && a.y1 <= b.y1
          }
        }
      }.toSet
      assert(out.map(_._1).sorted ==
        (0 until n).filterNot(reduced).toVector, "emit permutation")
      out.foreach { case (i, kind) =>
        assert(kind == blocks(i).cat || (blocks(i).cat == Kinds.Footnote &&
          kind == Kinds.ImageFootnote), s"kind $kind vs ${blocks(i).cat}")
      }
    }
  }

  test("fillChars never throws on out-of-page char/span geometry") {
    val rng = new Random(17)
    (1 to 100).foreach { _ =>
      val dets = Vector.fill(1 + rng.nextInt(8)) {
        val (x0, y0, x1, y1) = randBox(rng)
        Det(Kinds.Text, x0, y0 - 400, x1, y1 - 400, 0.9, "", "") // may be negative
      }
      val chars = Vector.fill(rng.nextInt(30)) {
        val (x0, y0, x1, y1) = randBox(rng)
        graft.schema.CharDet("a", x0, y0 - 400, x1, y1 - 400, rng.nextInt(100))
      }
      PageOps.fillChars(dets, chars) // must not throw
    }
  }
}
