package graft.corpus

import graft.schema.{Kinds, OutSpan}
import graft.util.{Rng, SplitMix64}

/** HTML corpus for the main-content extraction path (the north rule's
  * "HTML boilerplate strip + DOM heuristics" tier): every doc id maps to
  * one deterministic XHTML page carrying real boilerplate — site header,
  * nav, link-dense promo/related/read-more traps, sidebar, footer,
  * script/style — around an article whose block sequence is the golden.
  *
  * The traps are designed so that TAG rules alone cannot pass: the promo
  * div, the related-links list and the read-more paragraph use plain
  * `div`/`ul`/`p` markup and are only separable from content by LINK
  * DENSITY (anchor chars > half the text — the jusText/readability-family
  * heuristic), while a content paragraph carrying an inline anchor and a
  * plain content list must SURVIVE the same rule. Separate rng stream
  * ("html") — draws nothing from the pdf/office corpora. */
object HtmlGen {

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private sealed trait HBlock
  private case class HPara(pre: String, anchor: String, suf: String) extends HBlock
  private case class HHead(text: String) extends HBlock
  private case class HFigure(ref: String, caption: Option[String]) extends HBlock
  private case class HTable(cells: Vector[Vector[String]]) extends HBlock
  private case class HCode(text: String) extends HBlock
  private case class HList(items: Vector[String]) extends HBlock
  private case class HQuote(text: String) extends HBlock
  /** paragraph with an internal `<br/>` line break (kept as '\n') */
  private case class HBr(a: String, b: String) extends HBlock

  private case class Page(title: String, blocks: Vector[HBlock],
      navLinks: Vector[String], promo: Option[Vector[String]],
      /** trap positions: after block i insert a read-more p / related ul */
      readMoreAfter: Map[Int, String], relatedAfter: Map[Int, Vector[String]],
      siteName: String, asideLinks: Vector[String], footerLinks: Vector[String],
      /** ad-marker trap positions (SHORT-CAPS rule) */
      adAfter: Set[Int],
      /** share-bar trap: plain div, lowercase text, no links — only the
        * UNLIKELY-CLASS rule separates it */
      share: Option[Vector[String]],
      /** comment-section trap: id="comments" div whose paragraphs read
        * exactly like content */
      comments: Option[Vector[String]],
      /** short content sentence after block i — kept only by the CONTEXT
        * rule (good neighbor) */
      shortGoodAfter: Map[Int, String],
      /** short teaser sandwiched between two link farms after block i —
        * dropped only by the CONTEXT rule (both neighbors bad) */
      chromeShortAfter: Set[Int])

  private def page(docId: String): Page = {
    val r = Rng.stream("html", docId)
    val siteName = DocGen.cap(DocGen.word(r)) + " " + DocGen.cap(DocGen.word(r))
    val title = DocGen.titleText(r)
    val nav = Vector.fill(3 + r.nextInt(3))(DocGen.cap(DocGen.word(r)))
    val promo =
      if (r.chance(0.6))
        Some(Vector.fill(3)(DocGen.word(r) + " " + DocGen.word(r)))
      else None
    var figK = 0
    var tabK = 0
    val blocks = Vector.fill(2 + r.nextInt(5)) {
      val roll = r.nextDouble()
      if (roll < 0.45) {
        if (r.chance(0.3)) {
          // inline anchor INSIDE a real paragraph: link density stays low,
          // the paragraph must be KEPT with the anchor text inlined
          HPara(DocGen.paragraphOnce(r) + " See ",
            DocGen.word(r) + " " + DocGen.word(r),
            " there. " + DocGen.paragraphOnce(r))
        } else if (r.chance(0.2))
          HBr(DocGen.paragraphOnce(r), DocGen.paragraphOnce(r))
        else HPara(DocGen.paragraphOnce(r), "", "")
      } else if (roll < 0.58) HHead(DocGen.titleText(r))
      else if (roll < 0.72) {
        figK += 1
        HFigure("img://" + DocGen.sha256Hex(docId + ":html:" + figK),
          if (r.chance(0.8)) Some(s"Figure $figK: " + DocGen.cap(DocGen.word(r))) else None)
      } else if (roll < 0.86) {
        tabK += 1
        HTable(Vector.fill(2 + r.nextInt(2))(Vector.fill(2 + r.nextInt(2))(
          if (r.chance(0.4)) (100 + r.nextInt(900)).toString else DocGen.word(r))))
      } else if (roll < 0.91)
        HCode(s"for i in range(${1 + r.nextInt(20)}):\n    acc += ${DocGen.word(r)}[i]")
      else if (roll < 0.95)
        HQuote(DocGen.paragraphOnce(r))
      else HList(Vector.fill(3 + r.nextInt(3))(
        DocGen.cap(DocGen.word(r)) + " " + DocGen.word(r) + " " + DocGen.word(r)))
    }
    val readMore = blocks.indices.filter(_ => r.chance(0.2))
      .map(i => i -> s"Read more about ${DocGen.word(r)}").toMap
    val related = blocks.indices.filter(_ => r.chance(0.2))
      .map(i => i -> Vector.fill(3 + r.nextInt(2))(
        DocGen.word(r) + " " + DocGen.word(r))).toMap
    val aside = Vector.fill(2 + r.nextInt(2))(DocGen.cap(DocGen.word(r)))
    val footer = Vector.fill(3)(DocGen.cap(DocGen.word(r)))
    val adAfter = blocks.indices.filter(_ => r.chance(0.12)).toSet
    val share =
      if (r.chance(0.5)) Some(Vector.fill(3)(DocGen.cap(DocGen.word(r))))
      else None
    val comments =
      if (r.chance(0.4)) Some(Vector.fill(2 + r.nextInt(2))(DocGen.paragraphOnce(r)))
      else None
    val shortGood = blocks.indices.filter(_ => r.chance(0.15))
      .map(i => i -> (DocGen.cap(DocGen.word(r).take(8)) + " holds."))
      .toMap
    val chromeShort = blocks.indices.filter(_ => r.chance(0.12)).toSet
    Page(title, blocks, nav, promo, readMore, related, siteName, aside, footer,
      adAfter, share, comments, shortGood, chromeShort)
  }

  /** The XHTML page bytes. Block elements carry their text with no inner
    * pretty-printing, so element text content IS the authored text. */
  def bytes(docId: String): Array[Byte] = {
    val p = page(docId)
    val sb = new StringBuilder(4096)
    sb ++= "<html>\n<head>\n"
    sb ++= s"<title>${xmlEsc(p.siteName)} - ${xmlEsc(p.title)}</title>\n"
    sb ++= "<style>body{margin:0;font:16px serif}</style>\n"
    sb ++= "<script>var siteLoaded = 1;</script>\n"
    sb ++= "</head>\n<body>\n"
    sb ++= s"""<header><div class="logo">${xmlEsc(p.siteName)}</div>"""
    sb ++= p.navLinks.map(l => s"""<a href="/${xmlEsc(l).toLowerCase}">${xmlEsc(l)}</a>""")
      .mkString("<nav><ul>", "", "</ul></nav></header>\n")
    p.promo.foreach { links =>
      // the TAG-UNMARKED trap: plain div, anchors dominate the text —
      // only the link-density rule can drop it
      sb ++= links.map(l => s"""<a href="/p/${xmlEsc(l.replace(' ', '-'))}">${xmlEsc(l)}</a>""")
        .mkString("<div>Hot: ", " | ", "</div>\n")
    }
    sb ++= "<main>\n"
    sb ++= s"<h1>${xmlEsc(p.title)}</h1>\n"
    p.blocks.zipWithIndex.foreach { case (b, i) =>
      b match {
        case HPara(pre, "", _) => sb ++= s"<p>${xmlEsc(pre)}</p>\n"
        case HPara(pre, a, suf) =>
          sb ++= s"""<p>${xmlEsc(pre)}<a href="/a/${xmlEsc(a.replace(' ', '-'))}">${xmlEsc(a)}</a>${xmlEsc(suf)}</p>""" + "\n"
        case HHead(t) => sb ++= s"<h2>${xmlEsc(t)}</h2>\n"
        case HFigure(ref, cap) =>
          sb ++= s"""<figure><img src="${xmlEsc(ref)}"/>"""
          cap.foreach(c => sb ++= s"<figcaption>${xmlEsc(c)}</figcaption>")
          sb ++= "</figure>\n"
        case HTable(cells) =>
          sb ++= cells.map(row =>
            row.map(c => s"<td>${xmlEsc(c)}</td>").mkString("<tr>", "", "</tr>"))
            .mkString("<table>", "", "</table>") + "\n"
        case HCode(t) => sb ++= s"<pre>${xmlEsc(t)}</pre>\n"
        case HQuote(t) => sb ++= s"<blockquote>${xmlEsc(t)}</blockquote>\n"
        case HBr(a, b) => sb ++= s"<p>${xmlEsc(a)}<br/>${xmlEsc(b)}</p>\n"
        case HList(items) =>
          sb ++= items.map(it => s"<li>${xmlEsc(it)}</li>")
            .mkString("<ul>", "", "</ul>") + "\n"
      }
      p.shortGoodAfter.get(i).foreach { t =>
        // short content sentence directly after its (good) paragraph — the
        // CONTEXT rule must keep it
        sb ++= s"<p>${xmlEsc(t)}</p>\n"
      }
      p.readMoreAfter.get(i).foreach { t =>
        sb ++= s"""<p><a href="/more">${xmlEsc(t)}</a></p>""" + "\n" // pure-link trap
      }
      p.relatedAfter.get(i).foreach { links =>
        sb ++= links.map(l => s"""<li><a href="/r">${xmlEsc(l)}</a></li>""")
          .mkString("<ul>", "", "</ul>") + "\n" // link-farm ul trap
      }
      if (p.adAfter(i)) // short-caps trap: no tag/class/link marks it
        sb ++= (if (i % 2 == 0) "<p>ADVERTISEMENT</p>\n"
                else "<div>SPONSORED CONTENT</div>\n")
      if (p.chromeShortAfter(i)) // short teaser between two link farms:
        // per-block rules all pass it; only the CONTEXT rule drops it
        sb ++= ("""<ul><li><a href="/r2">more here</a></li><li><a href="/r2">and here</a></li></ul>""" +
          "<p>More stories below.</p>" +
          """<p><a href="/more2">Next page</a></p>""" + "\n")
    }
    p.share.foreach { names => // unlikely-CLASS trap: lowercase, link-free
      sb ++= s"""<div class="share-tools">Share this with ${names.map(xmlEsc).mkString(", ")} readers</div>""" + "\n"
    }
    p.comments.foreach { paras => // unlikely-ID trap: content-like paragraphs
      sb ++= "<div id=\"comments\"><h3>Comments</h3>"
      paras.foreach(t => sb ++= s"<p>${xmlEsc(t)}</p>")
      sb ++= "</div>\n"
    }
    sb ++= "</main>\n"
    sb ++= p.asideLinks.map(l => s"""<a href="/s">${xmlEsc(l)}</a>""")
      .mkString("<aside>More: ", " ", "</aside>\n")
    sb ++= (s"<footer><p>(c) ${xmlEsc(p.siteName)}</p><ul>" +
      p.footerLinks.map(l => s"""<li><a href="/f">${xmlEsc(l)}</a></li>""").mkString +
      "</ul></footer>\n")
    sb ++= "</body>\n</html>\n"
    soupify(sb.toString, docId).getBytes("UTF-8")
  }

  /** Degrade the well-formed page into crawl-grade tag soup for ~half the
    * corpus. Draws come from a SEPARATE "soup" stream so the page-content
    * draws (and therefore the frozen golden) are untouched: every quirk
    * preserves the authored text, it only breaks the markup in ways
    * SoupParser must repair — implied `</p>`/`</li>`, uppercase tags,
    * slash-less void `<img>`, doctype, an entity in chrome text, an
    * unquoted attribute. */
  private def soupify(html: String, docId: String): String = {
    val r = Rng.stream("soup", docId)
    if (!r.chance(0.5)) return html
    var s = html
    if (r.chance(0.7)) s = s.replace("</p>", "")
    if (r.chance(0.7)) s = s.replace("</li>", "")
    if (r.chance(0.5)) s = s.replace("<h2>", "<H2>").replace("</h2>", "</H2>")
    if (r.chance(0.5)) s = s.replace("\"/>", "\">")
    if (r.chance(0.5)) s = "<!DOCTYPE html>" + s.replace("<html>", "<html lang=en>")
    if (r.chance(0.4)) s = s.replace("Hot: ", "Hot:&nbsp;")
    if (r.chance(0.4)) s = s.replace("href=\"/more\"", "href=/more")
    if (r.chance(0.3)) s = s.replace("<ul>", "<ul compact>") // valueless attr
    if (r.chance(0.3)) // single-quoted attr
      s = s.replace("class=\"share-tools\"", "class='share-tools'")
    if (r.chance(0.4)) // lazy-loading images: real src arrives via script
      s = s.replace("<img src=", "<img loading=\"lazy\" data-src=")
    s
  }

  /** Expected main-content span sequence (the article alone). */
  def golden(docId: String): Vector[OutSpan] = {
    val p = page(docId)
    val out = Vector.newBuilder[(String, String, String)]
    out += ((Kinds.Title, p.title, ""))
    p.blocks.zipWithIndex.foreach { case (b, i) =>
      b match {
        case HPara(pre, a, suf) => out += ((Kinds.Text, pre + a + suf, ""))
        case HHead(t) => out += ((Kinds.Title, t, ""))
        case HFigure(ref, cap) =>
          out += ((Kinds.Figure, "", ref))
          cap.foreach(c => out += ((Kinds.Caption, c, "")))
        case HTable(cells) => out += ((Kinds.Table, DocxGen.tableHtmlOf(cells), ""))
        case HCode(t) => out += ((Kinds.Algorithm, t, ""))
        case HQuote(t) => out += ((Kinds.Text, t, ""))
        case HBr(a, b) => out += ((Kinds.Text, a + "\n" + b, ""))
        case HList(items) => out += ((Kinds.ListK, items.mkString("\n"), ""))
      }
      p.shortGoodAfter.get(i).foreach(t => out += ((Kinds.Text, t, "")))
    }
    out.result().zipWithIndex.map { case ((k, t, m), ord) => OutSpan(k, t, m, ord) }
  }
}
