package graft.tools
object RealPdfDump {
  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/root/reference/tests/unittest/pdfs/test.pdf"))
    val res = graft.pdf.PdfConvert.convert("probe", bytes)
    val w = new java.io.PrintWriter("/tmp/probe/out.txt", "UTF-8")
    res.spans.foreach(s => w.println(s"[${s.order}] ${s.kind} ${s.media_ref} ${s.text}"))
    w.close()
  }
}
