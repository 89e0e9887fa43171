package graft.html

import org.w3c.dom.{Document, Element}

/** Lenient tag-soup HTML parser: real crawl pages are not well-formed
  * XML, so the strict JDK parser cannot front the extraction walk. This
  * is an HTML5-lite tokenizer + tree builder covering the quirks that
  * dominate crawl data:
  *
  *  - case-insensitive tag names (`<P>`, `</DIV>`)
  *  - void elements (`<img>`, `<br>`, `<hr>`, …) with or without `/>`
  *  - implied end tags (`<p>` closed by the next block open, `<li>` by
  *    the next `<li>`, table cells by the next cell/row)
  *  - unclosed elements at EOF / at an ancestor's close tag (pop-until-
  *    match; an unmatched close tag is ignored)
  *  - unquoted, single-quoted, and valueless attributes
  *  - character entities (named + decimal/hex numeric) in text and
  *    attribute values
  *  - comments, doctype, processing instructions (skipped)
  *  - raw-text elements (`script`, `style`) whose content is opaque
  *
  * Output is a standard org.w3c.dom tree with lowercase tag names, so the
  * extraction walk (`HtmlConvert`) is parser-agnostic: well-formed XHTML
  * parses identically here and under the strict parser. A document with
  * no `<html>`/`<body>` markup is wrapped (html > body) like the HTML5
  * tree construction algorithm does. */
object SoupParser {

  private val Void = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")
  private val RawText = Set("script", "style")
  /** opening one of these implicitly closes an open <p> */
  private val ClosesP = Set("p", "div", "ul", "ol", "table", "figure",
    "blockquote", "pre", "main", "article", "section", "aside", "header",
    "footer", "nav", "h1", "h2", "h3", "h4", "h5", "h6", "hr", "li", "form")
  private val Named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ") // normalized to a plain space (extraction semantics)

  /** Decode character entities; unknown ones pass through verbatim. */
  private[html] def decodeEntities(s: String): String = {
    val amp = s.indexOf('&')
    if (amp < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val dec =
            if (name.startsWith("#x") || name.startsWith("#X"))
              parseInt(name.drop(2), 16).map(cp => new String(Character.toChars(cp)))
            else if (name.startsWith("#"))
              parseInt(name.drop(1), 10).map(cp => new String(Character.toChars(cp)))
            else Named.get(name)
          dec match {
            case Some(d) => sb ++= d; i = semi + 1
            case None => sb += c; i += 1
          }
        } else { sb += c; i += 1 }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def parseInt(s: String, radix: Int): Option[Int] =
    try Some(Integer.parseInt(s, radix)) catch { case _: NumberFormatException => None }

  def parse(html: String): Element = {
    // per-thread reused builder (graft.util.Xml): factory construction per
    // document dominated profile, not the parse itself
    val doc = graft.util.Xml.builder().newDocument()
    val root = doc.createElement("html")
    doc.appendChild(root)
    val head = doc.createElement("head")
    val body = doc.createElement("body")
    root.appendChild(head)
    root.appendChild(body)

    // open-element stack; html/head/body are synthesized and map onto the
    // synthesized nodes when they appear in the input
    var stack: List[Element] = List(body, root)
    var seenBody = false

    def top = stack.head
    def popTo(name: String): Unit =
      if (stack.exists(e => e.getTagName == name && (e ne root)))
        while ({ val t = top; stack = stack.tail; t.getTagName != name }) ()

    def openTag(name: String, attrs: List[(String, String)], selfClose: Boolean): Unit =
      name match {
        case "html" => () // already synthesized
        case "head" => stack = head :: stack.filter(e => (e eq root))
        case "body" =>
          seenBody = true
          stack = body :: List(root)
        case "br" =>
          // line break normalizes to a newline text node — getTextContent
          // then carries the break, the way extraction engines read <br>
          top.appendChild(doc.createTextNode("\n"))
        case _ =>
          if ((top eq head) && seenBody) stack = body :: List(root)
          if (ClosesP(name) && top.getTagName == "p") stack = stack.tail
          if (name == "li" && top.getTagName == "li") stack = stack.tail
          if ((name == "td" || name == "th") &&
            (top.getTagName == "td" || top.getTagName == "th")) stack = stack.tail
          if (name == "tr") {
            if (top.getTagName == "td" || top.getTagName == "th") stack = stack.tail
            if (top.getTagName == "tr") stack = stack.tail
          }
          // pre-body flow content (no <body> tag in the input): into body
          if ((top eq root) || ((top eq head) && !headTag(name)))
            stack = body :: List(root)
          val e = doc.createElement(name)
          attrs.foreach { case (k, v) => e.setAttribute(k, v) }
          top.appendChild(e)
          if (!Void(name) && !selfClose) stack = e :: stack
      }

    def headTag(name: String) =
      Set("title", "meta", "link", "base", "style", "script", "noscript")(name)

    def text(raw: String): Unit = {
      val t = decodeEntities(raw)
      if (t.nonEmpty) {
        val target = if ((top eq root)) body else top
        target.appendChild(doc.createTextNode(t))
      }
    }

    val s = html
    val n = s.length
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) { text(s.substring(i)); i = n }
      else {
        if (lt > i) text(s.substring(i, lt))
        if (lt + 1 >= n) i = n
        else s.charAt(lt + 1) match {
          case '!' | '?' => // comment / doctype / PI
            if (s.startsWith("<!--", lt)) {
              val end = s.indexOf("-->", lt + 4)
              i = if (end < 0) n else end + 3
            } else {
              val end = s.indexOf('>', lt)
              i = if (end < 0) n else end + 1
            }
          case '/' =>
            val end = s.indexOf('>', lt)
            if (end < 0) i = n
            else {
              val name = s.substring(lt + 2, end).trim.toLowerCase
              if (name == "html" || name == "head" || name == "body") {
                if (name == "head") stack = body :: List(root)
              } else popTo(name)
              i = end + 1
            }
          case c if c.isLetter =>
            val (name, attrs, selfClose, after) = readTag(s, lt + 1)
            openTag(name, attrs, selfClose)
            i = after
            if (RawText(name) && !selfClose) {
              // opaque until the matching close tag, case-insensitive
              val close = s.toLowerCase.indexOf(s"</$name", i)
              val stop = if (close < 0) n else close
              if (stop > i) top.appendChild(doc.createTextNode(s.substring(i, stop)))
              stack = stack.tail
              i = if (close < 0) n
                  else { val gt = s.indexOf('>', close); if (gt < 0) n else gt + 1 }
            }
          case _ => text("<"); i = lt + 1 // stray '<' is text
        }
      }
    }
    root
  }

  /** Read a start tag from just after '<'. Returns (lowercase name,
    * attrs, selfClosing, index after '>'). */
  private def readTag(s: String, start: Int): (String, List[(String, String)], Boolean, Int) = {
    val n = s.length
    var i = start
    while (i < n && (s.charAt(i).isLetterOrDigit)) i += 1
    val name = s.substring(start, i).toLowerCase
    val attrs = List.newBuilder[(String, String)]
    var selfClose = false
    var done = false
    while (!done && i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') { selfClose = true; i += 2; done = true }
          else i += 1
        case _ =>
          val ks = i
          while (i < n && !s.charAt(i).isWhitespace &&
            s.charAt(i) != '=' && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
          val key = s.substring(ks, i).toLowerCase
          while (i < n && s.charAt(i).isWhitespace) i += 1
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && s.charAt(i).isWhitespace) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i)
              val vs = i + 1
              val ve = s.indexOf(q, vs)
              val end = if (ve < 0) n else ve
              attrs += key -> decodeEntities(s.substring(vs, end))
              i = if (ve < 0) n else ve + 1
            } else {
              val vs = i
              while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
              attrs += key -> decodeEntities(s.substring(vs, i))
            }
          } else if (key.nonEmpty) attrs += key -> ""
      }
    }
    (name, attrs.result(), selfClose, i)
  }
}
