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
    // relocated footnotes are CHILDREN of the merged table and render
    // before the restored (page-level) caption text
    assert(out.map(_.kind) ==
      Vector(Kinds.Text, Kinds.Table, Kinds.Footnote, Kinds.Text, Kinds.Text))
    assert(out(1).text ==
      "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr>" +
        "<tr><td>b</td><td>2</td></tr></table>")
    assert(out(2).text == "Note: x.")
    assert(out(3).text == "Remarks here.") // restored caption -> text
  }

  test("merge with prev footnote + continuation caption DELETES the prev footnote") {
    // perform_table_merge:941-948 rebuilds the previous block's children
    // without its own footnotes before appending the relocated ones
    val t1 = "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>b</td><td>2</td></tr></table>"
    val out = runStream(Vector(
      blk(Kinds.Table, t1, 0),
      blk(Kinds.Footnote, "Old note.", 0),
      blk(Kinds.Caption, "Table 2 (continued)", 1),
      blk(Kinds.Table, t2, 1),
      blk(Kinds.Footnote, "New note.", 1)))
    assert(out.map(_.kind) == Vector(Kinds.Table, Kinds.Footnote))
    assert(out(1).text == "New note.", "prev footnote deleted, continuation's relocated")
    // ...but TWO prev footnotes block even with a continuation caption
    val blocked = runStream(Vector(
      blk(Kinds.Table, t1, 0),
      blk(Kinds.Footnote, "n1.", 0),
      blk(Kinds.Footnote, "n2.", 0),
      blk(Kinds.Caption, "Table 2 (continued)", 1),
      blk(Kinds.Table, t2, 1)))
    assert(blocked.length == 5)
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
    // the sweep runs backward like merge_table: t3 folds into t2 first
    assert(out.head.text ==
      "<table><tr><td>H</td><td>I</td></tr><tr><td>a</td><td>1</td></tr>" +
        "<tr><td>b</td><td>2</td></tr><tr><td>c</td><td>3</td></tr></table>")
  }

  test("3-page chain with differing headers: each header detected against the PREVIOUS part") {
    // merge_table sweeps pages backward, so t3's repeated header is
    // detected against t2 (and skipped) even though it never matches the
    // chain head t1 — a forward chain-head fold would duplicate it
    val t1 = "<table><tr><td>A</td><td>B</td></tr><tr><td>a</td><td>1</td></tr></table>"
    val t2 = "<table><tr><td>C</td><td>D</td></tr><tr><td>b</td><td>2</td></tr></table>"
    val t3 = "<table><tr><td>C</td><td>D</td></tr><tr><td>c</td><td>3</td></tr></table>"
    val out = runStream(Vector(
      blk(Kinds.Table, t1, 0), blk(Kinds.Table, t2, 1), blk(Kinds.Table, t3, 2)))
    assert(out.length == 1)
    assert(out.head.text ==
      "<table><tr><td>A</td><td>B</td></tr><tr><td>a</td><td>1</td></tr>" +
        "<tr><td>C</td><td>D</td></tr><tr><td>b</td><td>2</td></tr>" +
        "<tr><td>c</td><td>3</td></tr></table>")
  }

  test("visual header fallback: same texts + effective cols, differing colspans") {
    // detect_table_headers' structural pass fails on the colspan mismatch;
    // _detect_table_headers_visual matches on normalized texts + effective
    // column counts and the repeated header is still skipped
    val t1 = "<table><tr><td colspan=\"2\">H</td><td>I</td></tr>" +
      "<tr><td>a</td><td>b</td><td>c</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td colspan=\"2\">I</td></tr>" +
      "<tr><td>d</td><td>e</td><td>f</td></tr></table>"
    assert(TableMerge.canMerge(t1, t2))
    assert(TableMerge.merge(t1, t2) ==
      "<table><tr><td colspan=\"2\">H</td><td>I</td></tr>" +
        "<tr><td>a</td><td>b</td><td>c</td></tr>" +
        "<tr><td>d</td><td>e</td><td>f</td></tr></table>")
  }

  test("colspan adjust toward the WIDER previous part: copy-structure and widen branches") {
    // boundary rows match on actual cell count (2 == 2) while total
    // columns differ (3 > 2) -> check_rows_match passes; the continuation's
    // rows adjust toward 3 columns (adjust_table_rows_colspan):
    //  - row [p, q] has the reference row's visual count (2 cells) -> it
    //    COPIES the reference colspan structure (2,1)
    //  - row [pq] differs visually (1 cell) -> its last cell widens by the
    //    column deficit to colspan 3
    val t1 = "<table><tr><td>M</td><td>N</td><td>O</td></tr>" +
      "<tr><td colspan=\"2\">xy</td><td>z</td></tr></table>"
    val t2 = "<table><tr><td>p</td><td>q</td></tr><tr><td>pq</td></tr></table>"
    assert(TableMerge.canMerge(t1, t2))
    assert(TableMerge.merge(t1, t2) ==
      "<table><tr><td>M</td><td>N</td><td>O</td></tr>" +
        "<tr><td colspan=\"2\">xy</td><td>z</td></tr>" +
        "<tr><td colspan=\"2\">p</td><td>q</td></tr>" +
        "<tr><td colspan=\"3\">pq</td></tr></table>")
  }

  test("cell_merge hint: boundary cells fuse, mixed rows keep cleared cells") {
    // _apply_cell_merge:780-856 — flag 1 at a visual column appends the
    // continuation's first data-row cell into the previous last-row cell
    val t1 = "<table><tr><td>H</td><td>I</td></tr><tr><td>alpha</td><td>beta</td></tr></table>"
    val t2 = "<table><tr><td>H</td><td>I</td></tr><tr><td>gamma</td><td>delta</td></tr></table>"
    // mixed flags: col 0 fuses (alpha+gamma), col 1 stays -> row kept with
    // the transferred cell cleared
    assert(TableMerge.merge(t1, t2, Seq(1, 0)) ==
      "<table><tr><td>H</td><td>I</td></tr><tr><td>alphagamma</td><td>beta</td></tr>" +
        "<tr><td></td><td>delta</td></tr></table>")
    // all-1 flags: the emptied first data row is removed entirely
    val t3 = "<table><tr><td>H</td><td>I</td></tr><tr><td>gamma</td><td>delta</td></tr>" +
      "<tr><td>x</td><td>y</td></tr></table>"
    assert(TableMerge.merge(t1, t3, Seq(1, 1)) ==
      "<table><tr><td>H</td><td>I</td></tr><tr><td>alphagamma</td><td>betadelta</td></tr>" +
        "<tr><td>x</td><td>y</td></tr></table>")
  }

  test("cell_merge maps visual columns through colspans") {
    // prev last row: one colspan-2 cell + a normal cell; flags on visual
    // cols 0 and 1 both map to THE SAME prev cell -> one transfer only
    val t1 = "<table><tr><td>A</td><td>B</td><td>C</td></tr>" +
      "<tr><td colspan=\"2\">wide</td><td>z</td></tr></table>"
    val t2 = "<table><tr><td>p</td><td>q</td><td>r</td></tr></table>"
    val merged = TableMerge.merge(t1, t2, Seq(1, 1, 0))
    assert(merged.contains("<td colspan=\"2\">widep</td>") ||
      merged.contains("<td colspan=\"2\">widepq</td>"), merged)
    // p and q are distinct source cells: both fuse into the wide cell once each
    assert(merged.contains("widepq"), merged)
    assert(merged.contains("<tr><td></td><td></td><td>r</td></tr>"), merged)
  }

  test("bare 续表 and (…continued) markers gate like (continued)") {
    assert(TableMerge.isContinuationCaption("表 3 续表"))
    assert(TableMerge.isContinuationCaption("Table 3 (…continued)"))
    assert(!TableMerge.isContinuationCaption("Table 3: Fresh"))
  }
}
