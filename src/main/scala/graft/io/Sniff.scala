package graft.io

import graft.schema.DocResult

/** THE raw-blob router: one magic-byte sniff shared by
  * [[ExtractJob.runRaw]] and the `ingest_raw` driver query (two copies
  * drifted once — r3 review; now a single function). Mirrors the
  * reference's byte-sniff dispatch (`utils/guess_suffix_or_lang.py`:
  * PDF_SIG_BYTES `%PDF` :12, OOXML zip probing :13-38, fallback to
  * markup/text; routed from `main.py:604-636`):
  *
  *   - `PK` zip magic at offset 0  → OOXML office converter
  *   - `%PDF-` in the first 1 KiB  → PDF parser (prefix in well-formed
  *     files; the window tolerates crawl-grade leading junk)
  *   - anything else               → tag-soup HTML main-content strip
  */
object Sniff {

  def isZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == 'K'.toByte

  def convert(id: String, bytes: Array[Byte]): DocResult =
    if (isZip(bytes)) graft.office.OfficeConvert.convert(id, bytes)
    else if (graft.pdf.PdfConvert.isPdf(bytes)) graft.pdf.PdfConvert.convert(id, bytes)
    else graft.html.HtmlConvert.result(id, bytes)
}
