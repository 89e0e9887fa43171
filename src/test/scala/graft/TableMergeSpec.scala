package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TableMerge
import graft.schema.{Kinds, OrderedBlock}

/** Unit tests of the cross-page table-merge protocol
  * (table_merge.py:483-1006) on hand-built tables. */
class TableMergeSpec extends AnyFunSuite {

  private def blk(kind: String, text: String, page: Int) =
    OrderedBlock(kind, text, "", page, 0, 0)

  private def runStream(blocks: Vector[OrderedBlock]): Vector[OrderedBlock] =
    TableMerge.mergeStream(blocks)(
      _.kind, _.text, _.page_idx,
      (b, t) => b.copy(text = t),
      b => b.copy(kind = Kinds.Text))

  test("repeated header is skipped once (detect + merge)") {
    val t1 = "<table><tr><td>H1</td><td>H2</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H1</td><td>H2</td></tr><tr><td>b</td><td>2</td></tr></table>"
    assert(TableMerge.merge(t1, t2) ==
      "<table><tr><td>H1</td><td>H2</td></tr><tr><td>a</td><td>1</td></tr>" +
        "<tr><td>b</td><td>2</td></tr></table>")
  }

  test("rowspan header expands the skip (expand_header_count_by_rowspan)") {
    val hdr = "<tr><td rowspan=\"2\">M</td><td>G</td></tr><tr><td>S</td></tr>"
    val t1 = s"<table>$hdr<tr><td>a</td><td>1</td></tr></table>"
    val t2 = s"<table>$hdr<tr><td>b</td><td>2</td></tr></table>"
    // only one leading row matches structurally? both match; expansion keeps 2
    assert(TableMerge.merge(t1, t2) ==
      "<table><tr><td rowspan=\"2\">M</td><td>G</td></tr><tr><td>S</td></tr>" +
        "<tr><td>a</td><td>1</td></tr><tr><td>b</td><td>2</td></tr></table>")
  }

  test("colspan adjustment widens the narrower side toward the target") {
    // part1: 2 effective cols with full-width colspan rows; part2: 3 cols
    val t1 = "<table><tr><td>M</td><td>W</td></tr>" +
      "<tr><td colspan=\"2\">wide</td></tr></table>"
    val t2 = "<table><tr><td>x</td><td>1</td></tr>" +
      "<tr><td>y</td><td>2</td><td>3</td></tr></table>"
    assert(TableMerge.canMerge(t1, t2))
    val merged = TableMerge.merge(t1, t2)
    // part1's colspan-2 row must widen to colspan 3 (visual 1 != ref visual 2)
    assert(merged.contains("<td colspan=\"3\">wide</td>"), merged)
  }

  test("continuation caption gates the merge (can_merge_tables)") {
    val t1 = "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>b</td><td>2</td></tr></table>"
    assert(TableMerge.canMerge(t1, t2, 0, Seq("Table 3 (continued)")))
    assert(!TableMerge.canMerge(t1, t2, 0, Seq("Table 4: Fresh Table")))
    assert(!TableMerge.canMerge(t1, t2, 1, Nil), "prev footnote blocks")
    assert(TableMerge.canMerge(t1, t2, 1, Seq("(continued)")))
    assert(!TableMerge.canMerge(t1, t2, 2, Seq("(continued)")), "2 prev footnotes block")
  }

  test("mergeStream: continuation caption drops, stray caption restores, footnote relocates") {
    val t1 = "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>b</td><td>2</td></tr></table>"
    val in = Vector(
      blk(Kinds.Text, "Before.", 0),
      blk(Kinds.Table, t1, 0),
      blk(Kinds.Caption, "Table 1 (continued)", 1),
      blk(Kinds.Table, t2, 1),
      blk(Kinds.Caption, "Remarks here.", 1),
      blk(Kinds.Footnote, "Note: x.", 1),
      blk(Kinds.Text, "After.", 1))
    val out = runStream(in)
    assert(out.map(_.kind) ==
      Vector(Kinds.Text, Kinds.Table, Kinds.Text, Kinds.Footnote, Kinds.Text))
    assert(out(1).text == TableMerge.merge(t1, t2))
    assert(out(2).text == "Remarks here.") // restored caption -> text
  }

  test("mergeStream: fresh table's own caption blocks; footnote on prev blocks") {
    val t1 = "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>b</td><td>2</td></tr></table>"
    val blocked1 = runStream(Vector(
      blk(Kinds.Table, t1, 0),
      blk(Kinds.Caption, "Table 9: Fresh", 1),
      blk(Kinds.Table, t2, 1)))
    assert(blocked1.map(_.kind) == Vector(Kinds.Table, Kinds.Caption, Kinds.Table))
    val blocked2 = runStream(Vector(
      blk(Kinds.Table, t1, 0),
      blk(Kinds.Footnote, "Note: n.", 0),
      blk(Kinds.Table, t2, 1)))
    assert(blocked2.map(_.kind) == Vector(Kinds.Table, Kinds.Footnote, Kinds.Table))
  }

  test("mergeStream: non-adjacent pages and intervening text do not merge") {
    val t1 = "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>b</td><td>2</td></tr></table>"
    val sameGap = runStream(Vector(
      blk(Kinds.Table, t1, 0), blk(Kinds.Table, t2, 2)))
    assert(sameGap.length == 2)
    val interText = runStream(Vector(
      blk(Kinds.Table, t1, 0), blk(Kinds.Text, "T.", 0), blk(Kinds.Table, t2, 1)))
    assert(interText.length == 3)
  }

  test("merge preserves the previous part's table tag (wired stays wired)") {
    val t1 = "<table border=\"1\"><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>b</td><td>2</td></tr></table>"
    assert(TableMerge.merge(t1, t2).startsWith("<table border=\"1\">"))
  }

  test("footnotes relocated by an earlier chain step block the next merge") {
    val t1 = "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>b</td><td>2</td></tr></table>"
    val t3 = "<table><tr><td>H</td><td>I</td></tr><tr><td>c</td><td>3</td></tr></table>"
    val out = runStream(Vector(
      blk(Kinds.Table, t1, 0),
      blk(Kinds.Table, t2, 1),
      blk(Kinds.Footnote, "Note: n.", 1), // relocates onto the merged table
      blk(Kinds.Table, t3, 2)))           // caption-less -> blocked by it
    assert(out.map(_.kind) == Vector(Kinds.Table, Kinds.Footnote, Kinds.Table))
    assert(out.head.text == TableMerge.merge(t1, t2))
  }

  test("three-page chain merges right through") {
    val t1 = "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>b</td><td>2</td></tr></table>"
    val t3 = "<table><tr><td>H</td><td>I</td></tr><tr><td>c</td><td>3</td></tr></table>"
    val out = runStream(Vector(
      blk(Kinds.Table, t1, 0), blk(Kinds.Table, t2, 1), blk(Kinds.Table, t3, 2)))
    assert(out.length == 1)
    assert(out.head.text == TableMerge.merge(TableMerge.merge(t1, t2), t3))
  }
}
