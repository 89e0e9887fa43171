package graft.tools

/** Dev probe: parse an arbitrary on-disk PDF through PdfConvert and dump
  * the recovered spans — the iteration loop for crawl-grade parser work. */
object RealPdfProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/reference/tests/unittest/pdfs/test.pdf")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val t0 = System.nanoTime()
    val res = graft.pdf.PdfConvert.convert("probe", bytes)
    val ms = (System.nanoTime() - t0) / 1e6
    println(s"== $path: ${res.spans.length} spans in $ms ms")
    res.spans.foreach { s =>
      val txt = if (s.text.length > 160) s.text.take(160) + "…" else s.text
      println(f"[${s.order}%3d] ${s.kind}%-10s ${s.media_ref.take(30)}%-30s $txt")
    }
  }
}
