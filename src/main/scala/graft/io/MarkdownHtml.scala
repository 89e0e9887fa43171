package graft.io

/** Markdown -> HTML sink — the Spark-side analogue of the reference's
  * utils/markdown_to_html.py:306-404: renders the engine's own markdown
  * dialect (the exact block forms Assemble.renderMarkdown emits) into a
  * full standalone HTML document. Unlike the reference we embed no
  * external script tags (zero-egress environment); math spans keep their
  * latex delimiters for a client-side renderer. Pure and deterministic —
  * usable inside a typed map as a per-document sink column. */
object MarkdownHtml {

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val Image = java.util.regex.Pattern.compile("^!\\[\\]\\(([^)]*)\\)$")
  private val Link = java.util.regex.Pattern.compile("^\\[([^\\]]*)\\]\\(([^)]*)\\)$")

  /** One markdown block (separated by blank lines) -> one HTML element. */
  private def block(b: String): String = {
    if (b.startsWith("#")) {
      val level = math.min(6, b.takeWhile(_ == '#').length)
      s"<h$level>${esc(b.dropWhile(_ == '#').stripPrefix(" "))}</h$level>"
    } else if (b.startsWith("```")) {
      val nl = b.indexOf('\n')
      val lang = b.substring(3, math.max(3, nl))
      val body = b.substring(nl + 1).stripSuffix("```").stripSuffix("\n")
      val cls = if (lang.nonEmpty) s""" class="language-${esc(lang)}"""" else ""
      s"<pre><code$cls>${esc(body)}</code></pre>"
    } else if (b.startsWith("<table")) {
      b // recognized table HTML passes through, like the reference's html_block
    } else {
      val im = Image.matcher(b)
      val lm = Link.matcher(b)
      if (im.matches()) s"""<p><img src="${esc(im.group(1))}"/></p>"""
      else if (lm.matches()) s"""<p><a href="${esc(lm.group(2))}">${esc(lm.group(1))}</a></p>"""
      else if (b.length > 2 && b.startsWith("*") && b.endsWith("*") &&
        !b.substring(1, b.length - 1).contains("*"))
        s"<p><em>${esc(b.substring(1, b.length - 1))}</em></p>"
      else s"<p>${esc(b)}</p>"
    }
  }

  /** Full HTML document for one markdown string (the reference's
    * html_template shape, markdown_to_html.py:368-399, minus the external
    * MathJax script). */
  def render(markdown: String, title: String = "Document"): String = {
    val body = markdown.split("\n\n").iterator
      .filter(_.nonEmpty).map(block).mkString("\n")
    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |<meta charset="UTF-8"/>
       |<title>${esc(title)}</title>
       |</head>
       |<body>
       |$body
       |</body>
       |</html>""".stripMargin
  }
}
