package graft.corpus

import graft.schema.{Kinds, OutSpan}
import graft.util.Rng
import java.io.ByteArrayOutputStream

/** Legacy binary-Office corpus: every doc id maps to a REAL OLE2 compound
  * file (`.doc` — magic `D0 CF 11 E0`, MS-CFB v3 layout: 512-byte
  * sectors, DIFAT→FAT, directory, miniFAT + root mini stream) holding a
  * Word 97 `WordDocument` stream whose FIB text window carries the
  * authored content — the input class the reference converts via
  * LibreOffice (`main.py:616-621` `_convert_legacy_office_bytes`) and
  * [[graft.office.OleConvert]] must parse back from bytes alone.
  *
  * Streams: "olec" draws the CONTENT (title, paragraphs, lists); "oleq"
  * draws byte-level QUIRKS — mini-FAT vs regular-FAT placement of the
  * WordDocument stream (small streams live in the root mini stream),
  * cp1252 vs UTF-16LE text, decoy streams (SummaryInformation/CompObj),
  * directory-entry order — each preserving the authored text exactly. */
object OleGen {

  // ---- content ------------------------------------------------------------

  private sealed trait OBlock
  private case class OPara(text: String) extends OBlock
  private case class OList(items: Vector[String]) extends OBlock

  private def content(docId: String): (String, Vector[OBlock]) = {
    val r = Rng.stream("olec", docId)
    val title = DocGen.titleText(r)
    val blocks = Vector.fill(2 + r.nextInt(4)) {
      if (r.chance(0.7)) OPara(DocGen.paragraphOnce(r))
      else OList(Vector.fill(3 + r.nextInt(3))(
        DocGen.cap(DocGen.word(r)) + " " + DocGen.word(r)))
    }
    (title, blocks)
  }

  def golden(docId: String): Vector[OutSpan] = {
    val (title, blocks) = content(docId)
    val raw = Vector((Kinds.Title, title)) ++ blocks.map {
      case OPara(t) => (Kinds.Text, t)
      case OList(items) => (Kinds.ListK, items.mkString("\n"))
    }
    // the flat `\r`-separated text stream erases the boundary between two
    // ADJACENT authored lists — the converter necessarily reads them as
    // one list block, so the golden merges them too
    val merged = raw.foldLeft(Vector.empty[(String, String)]) {
      case (acc :+ ((Kinds.ListK, prev)), (Kinds.ListK, next)) =>
        acc :+ ((Kinds.ListK, prev + "\n" + next))
      case (acc, b) => acc :+ b
    }
    merged.zipWithIndex.map { case ((k, t), ord) => OutSpan(k, t, "", ord) }
  }

  // ---- CFB writer ---------------------------------------------------------

  private val Sz = 512
  private val MiniSz = 64
  private val MiniCutoff = 4096
  private val EndOfChain = 0xfffffffe
  private val FatSect = 0xfffffffd
  private val FreeSect = 0xffffffff

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  /** Word 97 FIB header (1024 bytes) + text at fcMin. */
  private def wordDocumentStream(text: String, utf16: Boolean,
      padToBig: Boolean): Array[Byte] = {
    val textBytes =
      if (utf16) text.getBytes("UTF-16LE") else text.getBytes("windows-1252")
    val fcMin = 1024
    val fcMac = fcMin + textBytes.length
    val out = new ByteArrayOutputStream(fcMac + 8)
    le16(out, 0xa5ec) // wIdent
    le16(out, 0x00c1) // nFib (Word 97)
    (4 until 24).foreach(_ => out.write(0))
    le32(out, fcMin)
    le32(out, fcMac)
    (32 until fcMin).foreach(_ => out.write(0))
    out.write(textBytes)
    // regular-FAT quirk: pad past the mini cutoff (Word itself pads);
    // fcMac already fences the text so padding is invisible
    if (padToBig) (out.size() until MiniCutoff + 16).foreach(_ => out.write(0))
    out.toByteArray
  }

  private case class Stm(name: String, data: Array[Byte])

  /** Assemble a v3 compound file from named streams. */
  private def writeCfb(streams: Vector[Stm]): Array[Byte] = {
    val (big, mini) = streams.partition(_.data.length >= MiniCutoff)

    // mini container: mini streams padded to 64-byte sectors
    val miniCont = new ByteArrayOutputStream()
    val miniStarts = scala.collection.mutable.Map[String, Int]()
    val miniFat = Vector.newBuilder[Int]
    mini.foreach { s =>
      val startMini = miniCont.size() / MiniSz
      miniStarts(s.name) = startMini
      val nSec = math.max(1, (s.data.length + MiniSz - 1) / MiniSz)
      miniCont.write(s.data)
      (s.data.length until nSec * MiniSz).foreach(_ => miniCont.write(0))
      (1 until nSec).foreach(k => miniFat += startMini + k)
      miniFat += EndOfChain
    }
    val miniContBytes = miniCont.toByteArray
    val miniFatEntries = miniFat.result()

    val nDirEntries = 1 + streams.length
    val nDirSectors = (nDirEntries * 128 + Sz - 1) / Sz
    val nMiniFatSectors = if (miniFatEntries.isEmpty) 0 else
      (miniFatEntries.length * 4 + Sz - 1) / Sz
    val nMiniContSectors = (miniContBytes.length + Sz - 1) / Sz
    val bigSectors = big.map(s => (s.data.length + Sz - 1) / Sz)

    // FAT sizing is self-referential: iterate to a fixed point
    var nFat = 1
    var total = 0
    var settled = false
    while (!settled) {
      total = nFat + nDirSectors + nMiniFatSectors + nMiniContSectors + bigSectors.sum
      val need = (total * 4 + Sz - 1) / Sz
      if (need <= nFat) settled = true else nFat = need
    }

    // sector index plan
    val fatStart = 0
    val dirStart = fatStart + nFat
    val miniFatStart = dirStart + nDirSectors
    val miniContStart = miniFatStart + nMiniFatSectors
    var cursor = miniContStart + nMiniContSectors
    val bigStarts = scala.collection.mutable.Map[String, Int]()
    big.zip(bigSectors).foreach { case (s, n) =>
      bigStarts(s.name) = cursor; cursor += n
    }

    // FAT
    val fat = Array.fill(nFat * (Sz / 4))(FreeSect)
    (0 until nFat).foreach(i => fat(i) = FatSect)
    def chain(start: Int, n: Int): Unit = {
      (0 until n - 1).foreach(k => fat(start + k) = start + k + 1)
      if (n > 0) fat(start + n - 1) = EndOfChain
    }
    chain(dirStart, nDirSectors)
    chain(miniFatStart, nMiniFatSectors)
    chain(miniContStart, nMiniContSectors)
    big.zip(bigSectors).foreach { case (s, n) => chain(bigStarts(s.name), n) }

    // directory
    val dir = new ByteArrayOutputStream(nDirSectors * Sz)
    def entry(name: String, typ: Int, start: Int, size: Long, child: Int): Unit = {
      val nameBytes = name.getBytes("UTF-16LE")
      dir.write(nameBytes, 0, math.min(nameBytes.length, 62))
      (math.min(nameBytes.length, 62) until 64).foreach(_ => dir.write(0))
      le16(dir, math.min(nameBytes.length, 62) + 2)
      dir.write(typ); dir.write(1) // black
      le32(dir, -1); le32(dir, -1); le32(dir, child) // siblings / child
      (80 until 100).foreach(_ => dir.write(0)) // CLSID + state
      (100 until 116).foreach(_ => dir.write(0)) // times
      le32(dir, start)
      le32(dir, size.toInt); le32(dir, 0)
    }
    entry("Root Entry", 5,
      if (nMiniContSectors > 0) miniContStart else EndOfChain,
      miniContBytes.length.toLong, if (streams.nonEmpty) 1 else -1)
    streams.foreach { s =>
      val start =
        if (s.data.length >= MiniCutoff) bigStarts(s.name) else miniStarts(s.name)
      entry(s.name, 2, start, s.data.length.toLong, -1)
    }
    (dir.size() until nDirSectors * Sz).foreach(_ => dir.write(0))

    // assemble file
    val out = new ByteArrayOutputStream(512 + total * Sz)
    // header
    Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).foreach(out.write)
    (8 until 24).foreach(_ => out.write(0)) // CLSID
    le16(out, 0x3e); le16(out, 0x0003) // minor / major (v3)
    le16(out, 0xfffe) // byte order
    le16(out, 9); le16(out, 6) // sector / mini shifts
    (34 until 44).foreach(_ => out.write(0)) // reserved + v4 dir count
    le32(out, nFat)
    le32(out, dirStart)
    le32(out, 0) // transaction
    le32(out, MiniCutoff)
    le32(out, if (nMiniFatSectors > 0) miniFatStart else EndOfChain)
    le32(out, nMiniFatSectors)
    le32(out, EndOfChain); le32(out, 0) // no DIFAT sectors
    (0 until 109).foreach(i => le32(out, if (i < nFat) fatStart + i else FreeSect))
    require(out.size() == 512, s"header ${out.size()}")
    // FAT
    fat.foreach(v => le32(out, v))
    // directory
    out.write(dir.toByteArray)
    // miniFAT
    if (nMiniFatSectors > 0) {
      miniFatEntries.foreach(v => le32(out, v))
      (miniFatEntries.length * 4 until nMiniFatSectors * Sz).foreach(_ => out.write(0))
    }
    // mini container
    out.write(miniContBytes)
    (miniContBytes.length until nMiniContSectors * Sz).foreach(_ => out.write(0))
    // big streams
    big.zip(bigSectors).foreach { case (s, n) =>
      out.write(s.data)
      (s.data.length until n * Sz).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  def bytes(docId: String): Array[Byte] = {
    val q = Rng.stream("oleq", docId)
    val (title, blocks) = content(docId)
    val paras = Vector(title) ++ blocks.flatMap {
      case OPara(t) => Vector(t)
      case OList(items) => items.map("- " + _)
    }
    val text = paras.mkString("\r")
    val utf16 = q.chance(0.3)
    val padToBig = q.chance(0.5)
    val wd = Stm("WordDocument", wordDocumentStream(text, utf16, padToBig))
    var streams = Vector(wd)
    if (q.chance(0.5)) {
      // decoy metadata streams every real .doc carries; junk payloads the
      // converter must route around, not parse
      val junk = new ByteArrayOutputStream()
      (0 until 128 + q.nextInt(128)).foreach(_ => junk.write(q.nextInt(256)))
      streams = streams :+ Stm("SummaryInformation", junk.toByteArray)
      if (q.chance(0.5)) streams = streams :+ Stm("CompObj",
        Array.tabulate[Byte](32)(i => (i * 7).toByte))
    }
    if (q.chance(0.4)) streams = streams.reverse // directory-order quirk
    writeCfb(streams)
  }
}
