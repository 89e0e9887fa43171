package graft.tools

/** Dev probe: sweep every bundled real-world PDF under a directory through
  * PdfConvert — crash/latency/coverage triage for crawl-grade work. */
object RealPdfSweep {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args.headOption.getOrElse("/root/reference/demo/pdfs"))
    val out = new java.io.PrintWriter("/tmp/probe/sweep.txt", "UTF-8")
    val it = java.nio.file.Files.list(dir).iterator()
    val paths = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    while (it.hasNext) { val p = it.next(); if (p.toString.endsWith(".pdf")) paths += p }
    paths.sortBy(_.getFileName.toString).foreach { p =>
      val name = p.getFileName.toString
      val bytes = java.nio.file.Files.readAllBytes(p)
      val t0 = System.nanoTime()
      try {
        val res = graft.pdf.PdfConvert.convert(name, bytes)
        val ms = (System.nanoTime() - t0) / 1e6
        val chars = res.spans.map(_.text.length).sum
        val bad = res.spans.map(_.text.count(c => c == '�')).sum
        val imgs = res.spans.count(_.kind == "figure")
        out.println(f"$name%-28s ${bytes.length}%9d B ${res.spans.length}%5d spans $chars%8d chars (bad=$bad) $imgs%3d imgs ${ms}%8.1f ms")
        out.println("    " + res.spans.map(_.text).filter(_.nonEmpty).take(4).mkString(" | ").take(220))
      } catch {
        case e: Throwable =>
          out.println(f"$name%-28s ${bytes.length}%9d B  FAIL: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    out.close()
  }
}
