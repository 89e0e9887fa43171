package graft.pipeline

/** Cross-page table merge HTML surgery (reference:
  * rapid_doc/utils/table_merge.py perform_table_merge:857-948,
  * can_merge_tables:598, detect_table_headers:483 — simplified to the
  * header-repeat protocol: a continuation table repeats the header row of
  * the part it continues). Feature-gated in Assemble. */
object TableMerge {

  /** Split simple `<table><tr>..</tr>...</table>` html into row strings. */
  def rows(html: String): Vector[String] = {
    val body = html.stripPrefix("<table>").stripSuffix("</table>")
    if (body.isEmpty) Vector.empty
    else body.split("</tr>").toVector.filter(_.nonEmpty).map(_ + "</tr>")
  }

  def headerOf(html: String): Option[String] = rows(html).headOption

  /** Both tables non-empty and sharing an identical header row? */
  def canMerge(html1: String, html2: String): Boolean =
    (headerOf(html1), headerOf(html2)) match {
      case (Some(h1), Some(h2)) => h1 == h2
      case _ => false
    }

  /** part1 rows ++ part2 rows minus its repeated header. */
  def merge(html1: String, html2: String): String =
    "<table>" + (rows(html1) ++ rows(html2).drop(1)).mkString + "</table>"
}
