package graft.pdf

import graft.schema.{Kinds, OutSpan, DocResult, OrderedBlock}
import java.security.MessageDigest

/** PDF byte parser + text-layer extraction for the raw-blob router — the
  * Spark-side analogue of the reference's pdfium parse of its primary
  * `%PDF` input tier (`rapid_doc/main.py:604-636`,
  * `utils/PyPDFium2Parser.py`). Pure per-document function: runs inside
  * `mapPartitions`, no Spark types, no shuffle.
  *
  * Scope (real PDF semantics, bounded to the corpus contract):
  *   - cross-reference table via `startxref` (multiple subsections, free
  *     entries), trailer `/Root`;
  *   - indirect objects: dicts, arrays, names, numbers, literal strings
  *     (nested parens, `\( \) \\ \n \r \t` + octal escapes), hex strings,
  *     references `N G R`, streams with direct or INDIRECT `/Length`,
  *     `/Filter /FlateDecode` (java.util.zip — the real codec);
  *   - page tree walk in `/Kids` order; `/Contents` as one stream or an
  *     array (concatenated with intervening whitespace, PDF 32000
  *     §7.8.2);
  *   - text state machine: `BT/ET, Tf, Td, TD, Tm, TL, T*, Tj, TJ, '` —
  *     TJ kerning numbers are positioning-only and fold away (authored
  *     adjustments ≪ the ~180/1000 em gap extractors read as a space);
  *   - image XObjects via `q cm /ImN Do Q`; `media_ref` is the sha-256
  *     of the embedded stream bytes (the engine-wide media_ref contract).
  *
  * Block recovery from the positioned lines is the classical text-layer
  * heuristic ladder: group consecutive lines while the baseline gap stays
  * within 1.3× leading and the font size is unchanged, classify by the
  * font-size ladder (≥15 → title with a 2-level ladder, 9 → caption,
  * `"- "`-prefixed runs → list), join paragraph lines with spaces. */
object PdfConvert {

  // ---- lexer --------------------------------------------------------------

  private sealed trait Tok
  private case class TNum(v: Double) extends Tok
  private case class TName(v: String) extends Tok
  private case class TStr(v: String) extends Tok
  private case class TKw(v: String) extends Tok // obj endobj R stream BT Tj …
  private case object TArrO extends Tok
  private case object TArrC extends Tok
  private case object TDictO extends Tok
  private case object TDictC extends Tok

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0 || b == '\f'
  private def isDelim(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  /** Tokenizer over a byte range; `pos` advances. */
  private final class Lexer(val buf: Array[Byte], var pos: Int, val end: Int) {
    def skipWs(): Unit = {
      var go = true
      while (go && pos < end) {
        if (isWs(buf(pos))) pos += 1
        else if (buf(pos) == '%') { // comment to EOL
          while (pos < end && buf(pos) != '\n' && buf(pos) != '\r') pos += 1
        } else go = false
      }
    }

    def peekByte(): Int = { skipWs(); if (pos < end) buf(pos) & 0xff else -1 }

    def next(): Tok = {
      skipWs()
      require(pos < end, "unexpected end of PDF data")
      val b = buf(pos)
      if (b == '[') { pos += 1; TArrO }
      else if (b == ']') { pos += 1; TArrC }
      else if (b == '<') {
        if (pos + 1 < end && buf(pos + 1) == '<') { pos += 2; TDictO }
        else { pos += 1; TStr(hexStringBody()) }
      } else if (b == '>') {
        require(pos + 1 < end && buf(pos + 1) == '>', "stray '>'")
        pos += 2; TDictC
      } else if (b == '(') { pos += 1; TStr(literalStringBody()) }
      else if (b == '/') {
        pos += 1
        val s = pos
        while (pos < end && !isWs(buf(pos)) && !isDelim(buf(pos))) pos += 1
        TName(new String(buf, s, pos - s, "ISO-8859-1"))
      } else if (b == '+' || b == '-' || b == '.' || (b >= '0' && b <= '9')) {
        val s = pos
        pos += 1
        while (pos < end && (buf(pos) == '.' || (buf(pos) >= '0' && buf(pos) <= '9')))
          pos += 1
        TNum(new String(buf, s, pos - s, "ISO-8859-1").toDouble)
      } else if (b == '\'') { pos += 1; TKw("'") }
      else if (b == '"') { pos += 1; TKw("\"") }
      else {
        val s = pos
        while (pos < end && !isWs(buf(pos)) && !isDelim(buf(pos))) pos += 1
        require(pos > s, s"unparseable byte '${b.toChar}' at $s")
        TKw(new String(buf, s, pos - s, "ISO-8859-1"))
      }
    }

    /** Literal string after '(': balanced unescaped parens, escapes,
      * 1-3-digit octal. */
    private def literalStringBody(): String = {
      val sb = new StringBuilder
      var depth = 1
      while (depth > 0) {
        require(pos < end, "unterminated string")
        val c = buf(pos); pos += 1
        if (c == '\\') {
          require(pos < end, "unterminated escape in string")
          val e = buf(pos); pos += 1
          e match {
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case '(' => sb.append('(')
            case ')' => sb.append(')')
            case '\\' => sb.append('\\')
            case '\n' => () // line continuation
            case '\r' => if (pos < end && buf(pos) == '\n') pos += 1
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 1
              while (k < 3 && pos < end && buf(pos) >= '0' && buf(pos) <= '7') {
                v = v * 8 + (buf(pos) - '0'); pos += 1; k += 1
              }
              sb.append(v.toChar)
            case other => sb.append(other.toChar)
          }
        } else if (c == '(') { depth += 1; sb.append('(') }
        else if (c == ')') { depth -= 1; if (depth > 0) sb.append(')') }
        else sb.append(c.toChar)
      }
      sb.toString
    }

    /** Hex string after '<' (non-<<): pairs of hex digits to '>'. */
    private def hexStringBody(): String = {
      val bytes = new java.io.ByteArrayOutputStream
      var hi = -1
      var done = false
      while (!done) {
        require(pos < end, "unterminated hex string")
        val c = buf(pos); pos += 1
        if (c == '>') {
          if (hi >= 0) bytes.write(hi << 4) // odd count: trailing 0
          done = true
        } else if (!isWs(c)) {
          val v = Character.digit(c, 16)
          require(v >= 0, s"bad hex digit '${c.toChar}'")
          if (hi < 0) hi = v else { bytes.write((hi << 4) | v); hi = -1 }
        }
      }
      new String(bytes.toByteArray, "UTF-8")
    }
  }

  // ---- object model -------------------------------------------------------

  private sealed trait PObj
  private case class PNum(v: Double) extends PObj
  private case class PName(v: String) extends PObj
  private case class PStr(v: String) extends PObj
  private case class PArr(items: Vector[PObj]) extends PObj
  private case class PDict(m: Map[String, PObj]) extends PObj
  private case class PRef(num: Int) extends PObj
  private case class PStream(dict: PDict, data: Array[Byte]) extends PObj
  private case object PNull extends PObj

  /** Parse one object value; resolves `N G R` via token lookahead. */
  private def parseValue(lx: Lexer, first: Tok): PObj = first match {
    case TNum(v) =>
      // possible reference: NUM NUM R
      val save = lx.pos
      lx.skipWs()
      val b = if (lx.pos < lx.end) lx.buf(lx.pos) else 0.toByte
      if (b >= '0' && b <= '9') {
        val save2 = lx.pos
        val t2 = lx.next()
        lx.skipWs()
        if (lx.pos < lx.end && lx.buf(lx.pos) == 'R' &&
          (lx.pos + 1 >= lx.end || isWs(lx.buf(lx.pos + 1)) || isDelim(lx.buf(lx.pos + 1)))) {
          lx.pos += 1
          PRef(v.toInt)
        } else { lx.pos = save2; PNum(v) }
      } else { lx.pos = save; PNum(v) }
    case TName(n) => PName(n)
    case TStr(s) => PStr(s)
    case TArrO =>
      val items = Vector.newBuilder[PObj]
      var t = lx.next()
      while (t != TArrC) { items += parseValue(lx, t); t = lx.next() }
      PArr(items.result())
    case TDictO =>
      val m = Map.newBuilder[String, PObj]
      var t = lx.next()
      while (t != TDictC) {
        val key = t match {
          case TName(n) => n
          case other => sys.error(s"dict key must be a name, got $other")
        }
        m += key -> parseValue(lx, lx.next())
        t = lx.next()
      }
      PDict(m.result())
    case TKw("null") => PNull
    case TKw("true") => PNum(1)
    case TKw("false") => PNum(0)
    case other => sys.error(s"unexpected token $other")
  }

  // ---- document -----------------------------------------------------------

  /** Where an object lives: directly in the file, or inside an object
    * stream (§7.5.7). */
  private sealed trait Loc
  private case class Direct(off: Int) extends Loc
  private case class InStm(stm: Int, idx: Int) extends Loc

  private final class Pdf(buf: Array[Byte]) {
    private val (offsets: Map[Int, Loc], trailer0: PDict) = readAllXref()
    private val cache = scala.collection.mutable.Map[Int, PObj]()
    private val objstmCache = scala.collection.mutable.Map[Int, Vector[PObj]]()

    def trailer: PDict = trailer0

    private def lastIndexOf(s: String): Int = {
      val pat = s.getBytes("ISO-8859-1")
      var i = buf.length - pat.length
      while (i >= 0) {
        var j = 0
        while (j < pat.length && buf(i + j) == pat(j)) j += 1
        if (j == pat.length) return i
        i -= 1
      }
      sys.error(s"'$s' not found")
    }

    /** Walk the /Prev chain from the LAST startxref: each section is a
      * classic table + trailer or a cross-reference STREAM (§7.5.8).
      * Sections are read newest-first and an entry never overrides one
      * already seen — incremental updates win (§7.5.6). */
    private def readAllXref(): (Map[Int, Loc], PDict) = {
      val sxPos = lastIndexOf("startxref")
      val lx0 = new Lexer(buf, sxPos + "startxref".length, buf.length)
      var pos = (lx0.next(): @unchecked) match { case TNum(v) => v.toInt }
      val out = scala.collection.mutable.Map[Int, Loc]()
      var trailerAcc: PDict = null
      while (pos >= 0) {
        val (entries, tdict) = readSection(pos)
        entries.foreach { case (n, loc) =>
          if (!out.contains(n)) out(n) = loc
        }
        if (trailerAcc == null) trailerAcc = tdict
        pos = tdict.m.get("Prev") match {
          case Some(PNum(p)) => p.toInt
          case _ => -1
        }
      }
      (out.toMap, trailerAcc)
    }

    private def readSection(xrefPos: Int): (Vector[(Int, Loc)], PDict) = {
      val lx = new Lexer(buf, xrefPos, buf.length)
      lx.skipWs()
      if (buf(lx.pos) == 'x') {
        // classic table
        (lx.next(): @unchecked) match { case TKw("xref") => () }
        val out = Vector.newBuilder[(Int, Loc)]
        var done = false
        while (!done) {
          lx.skipWs()
          val b = if (lx.pos < lx.end) lx.buf(lx.pos) else -1
          if (b >= '0' && b <= '9') {
            val start = (lx.next(): @unchecked) match { case TNum(v) => v.toInt }
            val count = (lx.next(): @unchecked) match { case TNum(v) => v.toInt }
            (0 until count).foreach { i =>
              lx.skipWs()
              // 20-byte entries: 10-digit offset, 5-digit gen, n/f
              val off = new String(buf, lx.pos, 10, "ISO-8859-1").toInt
              val kind = buf(lx.pos + 17).toChar
              lx.pos += 18
              if (kind == 'n') out += (start + i) -> Direct(off)
            }
          } else done = true
        }
        (lx.next(): @unchecked) match { case TKw("trailer") => () }
        val tdict = parseValue(lx, lx.next()).asInstanceOf[PDict]
        (out.result(), tdict)
      } else {
        // cross-reference STREAM: an indirect stream object whose dict IS
        // the trailer; /Length must be direct (xref bootstrap)
        val st = (parseObjectAt(xrefPos, requireDirectLength = true): @unchecked) match {
          case s: PStream => s
        }
        def arr(o: PObj): Vector[PObj] = (o: @unchecked) match { case PArr(v) => v }
        def n(o: PObj): Int = (o: @unchecked) match { case PNum(v) => v.toInt }
        val size = n(st.dict.m("Size"))
        val w = arr(st.dict.m("W")).map(n)
        require(w.length == 3, s"bad /W $w")
        val index = st.dict.m.get("Index").map(arr(_).map(n))
          .getOrElse(Vector(0, size))
        val data = st.data
        val rowLen = w.sum
        val out = Vector.newBuilder[(Int, Loc)]
        var row = 0
        index.grouped(2).foreach { case Vector(start, count) =>
          (0 until count).foreach { i =>
            val base = row * rowLen
            var p = base
            def field(width: Int): Int = {
              var v = 0
              (0 until width).foreach { k => v = (v << 8) | (data(p + k) & 0xff) }
              p += width
              v
            }
            val t = if (w(0) == 0) 1 else field(w(0))
            val f2 = field(w(1))
            val f3 = field(w(2))
            t match {
              case 1 => out += (start + i) -> Direct(f2)
              case 2 => out += (start + i) -> InStm(f2, f3)
              case _ => () // type 0: free
            }
            row += 1
          }
        }
        (out.result(), st.dict)
      }
    }

    /** Parse `N G obj …` at a byte offset (stream payload included). */
    private def parseObjectAt(off: Int, requireDirectLength: Boolean = false): PObj = {
      val lx = new Lexer(buf, off, buf.length)
      lx.next() // object number (validated by the caller when known)
      lx.next() // generation
      (lx.next(): @unchecked) match { case TKw("obj") => () }
      val v = parseValue(lx, lx.next())
      lx.skipWs()
      v match {
        case d: PDict if lx.pos + 6 <= lx.end &&
          new String(buf, lx.pos, 6, "ISO-8859-1") == "stream" =>
          lx.pos += 6
          if (buf(lx.pos) == '\r') lx.pos += 1
          if (buf(lx.pos) == '\n') lx.pos += 1
          val len = d.m("Length") match {
            case PNum(l) => l.toInt
            case ref if !requireDirectLength => numOf(resolve(ref)).toInt
            case other => sys.error(s"xref stream needs a direct /Length, got $other")
          }
          val raw = java.util.Arrays.copyOfRange(buf, lx.pos, lx.pos + len)
          val data = d.m.get("Filter") match {
            case Some(PName("FlateDecode")) => inflate(raw)
            case None => raw
            case Some(f) => sys.error(s"unsupported filter $f")
          }
          PStream(d, data)
        case _ => v
      }
    }

    /** Objects of an object stream: "num off …" header then the bare
      * serialized objects at /First + off. */
    private def objstmObjects(stmNum: Int): Vector[PObj] =
      objstmCache.getOrElseUpdate(stmNum, {
        val st = (obj(stmNum): @unchecked) match { case s: PStream => s }
        val count = (st.dict.m("N"): @unchecked) match { case PNum(v) => v.toInt }
        val first = (st.dict.m("First"): @unchecked) match { case PNum(v) => v.toInt }
        val hx = new Lexer(st.data, 0, first)
        val offs = Vector.fill(count) {
          hx.next() // object number (positional — index locates it)
          (hx.next(): @unchecked) match { case TNum(v) => v.toInt }
        }
        offs.map { off =>
          val ox = new Lexer(st.data, first + off, st.data.length)
          parseValue(ox, ox.next())
        }
      })

    def obj(num: Int): PObj = cache.getOrElseUpdate(num, {
      offsets.getOrElse(num, sys.error(s"object $num not in xref")) match {
        case Direct(off) => parseObjectAt(off)
        case InStm(stm, idx) => objstmObjects(stm)(idx)
      }
    })

    def resolve(o: PObj): PObj = o match {
      case PRef(n) => resolve(obj(n))
      case other => other
    }
    def numOf(o: PObj): Double = (resolve(o): @unchecked) match { case PNum(v) => v }
    def dict(o: PObj): PDict = (resolve(o): @unchecked) match {
      case d: PDict => d
      case PStream(d, _) => d
    }

    /** Pages in kid order (nested page trees flattened depth-first). */
    def pages(): Vector[PDict] = {
      val root = dict(trailer.m("Root"))
      def walk(node: PDict): Vector[PDict] =
        node.m.get("Type") match {
          case Some(PName("Pages")) =>
            (resolve(node.m("Kids")): @unchecked) match {
              case PArr(kids) => kids.flatMap(k => walk(dict(k)))
            }
          case _ => Vector(node)
        }
      walk(dict(root.m("Pages")))
    }

    /** Concatenated decoded content bytes of a page (array joined with a
      * newline — streams are independent whitespace-separated op runs). */
    def contentOf(page: PDict): Array[Byte] = {
      val parts: Vector[Array[Byte]] = resolve(page.m("Contents")) match {
        case PStream(_, data) => Vector(data)
        case PArr(items) => items.map(i => (resolve(i): @unchecked) match {
          case PStream(_, data) => data
        })
        case other => sys.error(s"bad /Contents $other")
      }
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p => out.write(p); out.write('\n') }
      out.toByteArray
    }

    /** name -> image stream bytes for the page's XObject resources. */
    def xobjectsOf(page: PDict): Map[String, Array[Byte]] =
      page.m.get("Resources").map(dict).flatMap(_.m.get("XObject")).map(dict) match {
        case Some(xd) => xd.m.map { case (name, ref) =>
          name -> ((resolve(ref): @unchecked) match { case PStream(_, d) => d })
        }
        case None => Map.empty
      }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 16)
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished(), "truncated Flate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // ---- content interpretation --------------------------------------------

  /** One positioned page element recovered from the content stream. */
  private sealed trait Elem { def top: Double }
  private case class Line(x: Double, y: Double, size: Double, font: String,
      text: String) extends Elem { def top: Double = y }
  private case class Img(x: Double, y: Double, h: Double, ref: String)
      extends Elem { def top: Double = y + h }

  private def run(content: Array[Byte],
      xobjects: Map[String, Array[Byte]]): Vector[Elem] = {
    val lx = new Lexer(content, 0, content.length)
    val out = Vector.newBuilder[Elem]
    val operands = scala.collection.mutable.ArrayBuffer[PObj]()
    var ctm = (1.0, 1.0, 0.0, 0.0) // sx, sy, tx, ty (translate+scale only)
    val gsStack = scala.collection.mutable.ArrayBuffer[(Double, Double, Double, Double)]()
    var font = ""
    var size = 0.0
    var leading = 0.0
    var lineX = 0.0
    var lineY = 0.0
    def popN(n: Int): Vector[Double] = {
      val vs = operands.takeRight(n).toVector.map {
        case PNum(v) => v
        case other => sys.error(s"number operand expected, got $other")
      }
      vs
    }
    def show(s: String): Unit = out += Line(lineX, lineY, size, font, s)
    def tjText(arr: PArr): String = arr.items.collect { case PStr(s) => s }.mkString

    var tok: Tok = null
    while ({ lx.skipWs(); lx.pos < lx.end }) {
      tok = lx.next()
      tok match {
        case TKw(op) =>
          op match {
            case "BT" => lineX = 0; lineY = 0
            case "ET" => ()
            case "Tf" =>
              size = popN(1)(0)
              font = operands(operands.length - 2).asInstanceOf[PName].v
            case "Td" =>
              val v = popN(2); lineX += v(0); lineY += v(1)
            case "TD" =>
              val v = popN(2); lineX += v(0); lineY += v(1); leading = -v(1)
            case "Tm" =>
              val v = popN(6); lineX = v(4); lineY = v(5)
            case "TL" => leading = popN(1)(0)
            case "T*" => lineY -= leading
            case "Tj" => show(operands.last match {
              case PStr(s) => s
              case other => sys.error(s"Tj needs a string, got $other")
            })
            case "TJ" => show(tjText(operands.last.asInstanceOf[PArr]))
            case "'" =>
              lineY -= leading
              show(operands.last.asInstanceOf[PStr].v)
            case "\"" =>
              // aw ac string ": set word/char spacing (no metrics here),
              // move to the next line, show — dropping it would silently
              // lose text on real crawled PDFs
              lineY -= leading
              show(operands.last.asInstanceOf[PStr].v)
            case "q" => gsStack += ctm
            case "Q" => ctm = gsStack.remove(gsStack.length - 1)
            case "cm" =>
              val v = popN(6)
              // [a 0 0 d e f] composed onto a translate+scale CTM
              ctm = (ctm._1 * v(0), ctm._2 * v(3),
                ctm._3 + ctm._1 * v(4), ctm._4 + ctm._2 * v(5))
            case "Do" =>
              val name = operands.last.asInstanceOf[PName].v
              val data = xobjects.getOrElse(name, sys.error(s"XObject /$name missing"))
              out += Img(ctm._3, ctm._4, ctm._2, "img://" + sha256Hex(data))
            case _ => () // ops outside the text/image subset are no-ops
          }
          operands.clear()
        case other =>
          operands += parseValue(lx, other)
      }
    }
    out.result()
  }

  // ---- block recovery -----------------------------------------------------

  private val LeadingPt = 14.0

  /** Group positioned lines into blocks and classify by the font-size
    * ladder; elements arrive y-sorted (descending). */
  private def toBlocks(elems: Vector[Elem]): Vector[(String, String, String, Int)] = {
    val sorted = elems.sortBy(e => -e.top)
    val out = Vector.newBuilder[(String, String, String, Int)]
    var group = Vector.empty[Line]
    def flush(): Unit = if (group.nonEmpty) {
      val g = group
      group = Vector.empty
      val size = g.head.size
      if (g.forall(_.text.startsWith("- ")))
        out += ((Kinds.ListK, g.map(_.text.stripPrefix("- ")).mkString("\n"), "", 0))
      else if (size >= 20) out += ((Kinds.Title, g.map(_.text).mkString(" "), "", 1))
      else if (size >= 15) out += ((Kinds.Title, g.map(_.text).mkString(" "), "", 2))
      else if (size <= 9.5) out += ((Kinds.Caption, g.map(_.text).mkString(" "), "", 0))
      else out += ((Kinds.Text, g.map(_.text).mkString(" "), "", 0))
    }
    sorted.foreach {
      case l: Line =>
        val sameBlock = group.nonEmpty && group.last.size == l.size &&
          group.last.font == l.font &&
          (group.last.y - l.y) <= LeadingPt * 1.3 &&
          // a list run and a paragraph run at the same size are distinct
          // blocks: bulletness must not change mid-group
          group.last.text.startsWith("- ") == l.text.startsWith("- ")
        if (!sameBlock) flush()
        group = group :+ l
      case img: Img =>
        flush()
        out += ((Kinds.Figure, "", img.ref, 0))
    }
    flush()
    out.result()
  }

  // ---- public API ---------------------------------------------------------

  /** True when the blob is a PDF: `%PDF-` within the first 1024 bytes
    * (the reference prefix-sniffs PDF_SIG_BYTES,
    * guess_suffix_or_lang.py:12; the 1 KiB window additionally tolerates
    * crawl-grade leading junk, as pdfium itself does). */
  def isPdf(bytes: Array[Byte]): Boolean = {
    val sig = "%PDF-".getBytes("ISO-8859-1")
    val limit = math.min(bytes.length - sig.length, 1024)
    var i = 0
    while (i <= limit) {
      var j = 0
      while (j < sig.length && bytes(i + j) == sig(j)) j += 1
      if (j == sig.length) return true
      i += 1
    }
    false
  }

  def convert(docId: String, bytes: Array[Byte]): DocResult = {
    val pdf = new Pdf(bytes)
    val blocks = pdf.pages().flatMap { page =>
      toBlocks(run(pdf.contentOf(page), pdf.xobjectsOf(page)))
    }
    val ordered = blocks.zipWithIndex.map { case ((k, t, m, lvl), ord) =>
      OrderedBlock(k, t, m, 0, ord, lvl)
    }
    DocResult(docId,
      ordered.map(b => OutSpan(b.kind, b.text, b.media_ref, b.index)),
      graft.pipeline.Assemble.renderMarkdown(ordered))
  }

  def spans(docId: String, bytes: Array[Byte]): Vector[OutSpan] =
    convert(docId, bytes).spans.toVector

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** sha-256 over raw bytes (the media_ref contract). */
  def sha256Hex(bytes: Array[Byte]): String = {
    val md = digest.get()
    md.reset()
    val out = md.digest(bytes)
    val chars = new Array[Char](out.length * 2)
    var i = 0
    while (i < out.length) {
      chars(i * 2) = hexChars((out(i) >> 4) & 0xf)
      chars(i * 2 + 1) = hexChars(out(i) & 0xf)
      i += 1
    }
    new String(chars)
  }
}
