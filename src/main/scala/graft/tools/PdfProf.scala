package graft.tools

/** Dev probe: split pdf tier cost into generate vs parse (single-thread
  * per-doc microbench over 600 docs). */
object PdfProf {
  def main(args: Array[String]): Unit = {
    val n = 600
    // warm
    (0 until 50).foreach { i => val id = f"doc-$i%012d"
      graft.pdf.PdfConvert.spans(id, graft.corpus.PdfGen.bytes(id)) }
    var t0 = System.nanoTime()
    val blobs = (0 until n).map { i => graft.corpus.PdfGen.bytes(f"doc-$i%012d") }
    val genMs = (System.nanoTime() - t0) / 1e6
    t0 = System.nanoTime()
    (0 until n).foreach { i => graft.pdf.PdfConvert.spans(f"doc-$i%012d", blobs(i)) }
    val parseMs = (System.nanoTime() - t0) / 1e6
    println(f"gen: ${genMs / n}%.3f ms/doc  parse: ${parseMs / n}%.3f ms/doc")
  }
}
