package graft.tools

/** Dev probe: split office tier cost into generate vs convert (single-
  * thread per-doc microbench). */
object OfficeProf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(600)
    (0 until 100).foreach { i => val id = f"doc-$i%012d"
      graft.office.OfficeConvert.convert(id, graft.corpus.OfficeGen.bytes(id)) }
    var t0 = System.nanoTime()
    val blobs = (0 until n).map { i => graft.corpus.OfficeGen.bytes(f"doc-$i%012d") }
    val genMs = (System.nanoTime() - t0) / 1e6
    t0 = System.nanoTime()
    (0 until n).foreach { i => graft.office.OfficeConvert.convert(f"doc-$i%012d", blobs(i)) }
    val convMs = (System.nanoTime() - t0) / 1e6
    println(f"gen: ${genMs / n}%.3f ms/doc  convert: ${convMs / n}%.3f ms/doc")
    // html + ole + img tiers for ingest_raw context
    t0 = System.nanoTime()
    val hb = (0 until n).map { i => graft.corpus.HtmlGen.bytes(f"doc-$i%012d") }
    val hgen = (System.nanoTime() - t0) / 1e6
    t0 = System.nanoTime()
    (0 until n).foreach { i => graft.html.HtmlConvert.convert(f"doc-$i%012d", hb(i)) }
    val hconv = (System.nanoTime() - t0) / 1e6
    println(f"html gen: ${hgen / n}%.3f ms/doc  convert: ${hconv / n}%.3f ms/doc")
    t0 = System.nanoTime()
    val ob = (0 until n).map { i => graft.corpus.OleGen.bytes(f"doc-$i%012d") }
    val ogen = (System.nanoTime() - t0) / 1e6
    t0 = System.nanoTime()
    (0 until n).foreach { i => graft.io.Sniff.convert(f"doc-$i%012d", ob(i)) }
    val oconv = (System.nanoTime() - t0) / 1e6
    println(f"ole  gen: ${ogen / n}%.3f ms/doc  convert: ${oconv / n}%.3f ms/doc")
  }
}
