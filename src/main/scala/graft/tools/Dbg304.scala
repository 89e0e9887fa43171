package graft.tools
object Dbg304 {
  def main(args: Array[String]): Unit = {
    val id = args.headOption.getOrElse("doc-000000000304")
    val row = graft.corpus.DocGen.docRow(id)
    row.spans.foreach(s => println(f"IN  ${s.offset}%3d ${s.kind}%-12s ${s.text.take(40)}"))
    val pages = graft.kernel.StubModel.analyze(row)
    pages.foreach { pm =>
      println(s"--- page ${pm.page_idx}")
      pm.dets.sortBy(d => (d.y0, d.x0)).foreach(d =>
        println(f"DET ${d.cat}%-14s y=${d.y0}%5.0f..${d.y1}%5.0f x=${d.x0}%5.0f..${d.x1}%5.0f s=${d.score}%.2f ${d.text.take(30)}"))
    }
    val got = graft.pipeline.Extract.extractDoc(row).spans
    val want = graft.corpus.DocGen.golden(id).spans
    got.zipAll(want, null, null).zipWithIndex.foreach { case ((g, w), i) =>
      if (g != w) println(s"DIFF $i\n  got  $g\n  want $w")
    }
  }
}
