package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Rng

/** Crawl-robustness property: deterministic byte mutations of real
  * authored PDFs (truncations, flips, splices, duplications) must NEVER
  * hang, loop, overflow the stack, or throw anything the per-document
  * isolation catch (`NonFatal`) cannot absorb — the contract
  * `ExtractJob.runRaw` / `StreamJobs.rawStream` rely on (ADVICE r4: the
  * cycle guards in readAllXref / resolve / pages make corrupt /Prev
  * chains and self-referencing trees fail fast). The sniff router is the
  * entry point, so a mutated PDF that stops looking like a PDF exercises
  * the fallback routes too. */
class PdfFuzzSpec extends AnyFunSuite {

  private def mutate(bytes: Array[Byte], seed: Long): Array[Byte] = {
    val n = bytes.length
    (seed % 6).toInt match {
      case 0 => // truncate at a hash-picked offset
        java.util.Arrays.copyOfRange(bytes, 0, 1 + math.floorMod(seed, n.toLong).toInt)
      case 1 => // flip 16 bytes
        val b = bytes.clone()
        (0 until 16).foreach { k =>
          val at = math.floorMod(Rng.fnv64(seed + "|" + k), n.toLong).toInt
          b(at) = (b(at) ^ 0x5a).toByte
        }
        b
      case 2 => // splice the middle out (broken offsets everywhere)
        val a = math.floorMod(seed, (n / 2).toLong).toInt
        val c = a + n / 4
        bytes.take(a) ++ bytes.drop(c)
      case 3 => // duplicate a window (duplicate object definitions)
        val a = math.floorMod(seed, (n / 2).toLong).toInt
        bytes.take(a + n / 4) ++ bytes.drop(a)
      case 4 => // zero the xref tail (forces the recovery scan)
        val b = bytes.clone()
        (math.max(0, n - 64) until n).foreach(b(_) = 0)
        b
      case _ => // prepend junk (signature offset tolerance)
        ("%garbage junk header\n" * 3).getBytes("ISO-8859-1") ++ bytes
    }
  }

  test("600 deterministic mutations: parse or fail fast, never hang or escape NonFatal") {
    var parsed = 0; var failed = 0
    (0 until 100).foreach { i =>
      val id = f"doc-$i%012d"
      val bytes = graft.corpus.PdfGen.bytes(id)
      (0 until 6).foreach { m =>
        val mut = mutate(bytes, Rng.fnv64(id + "|fuzz|" + m))
        val t0 = System.nanoTime()
        try {
          val res = graft.io.Sniff.convert(id, mut)
          parsed += 1
          assert(res.spans != null)
        } catch {
          case scala.util.control.NonFatal(_) => failed += 1
          // a StackOverflowError or OOM here fails the suite — by design
        }
        val dt = (System.nanoTime() - t0) / 1e9
        assert(dt < 10.0, s"mutation $m of $id took ${dt}s — runaway parse")
      }
    }
    // both outcomes must be populated or the fuzz is vacuous
    assert(parsed > 100, s"parsed=$parsed")
    assert(failed > 20, s"failed=$failed — mutations too gentle")
  }
}
