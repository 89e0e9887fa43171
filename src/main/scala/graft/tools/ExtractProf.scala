package graft.tools
import graft.corpus.DocGen
import graft.pipeline.Extract
object ExtractProf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    // warm
    (0 until 2000).foreach(i => Extract.extractDoc(DocGen.docRow(f"doc-$i%012d")))
    var bestTp = 0.0
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { Extract.extractDoc(DocGen.docRow(f"doc-$i%012d")); i += 1 }
      val tp = n / ((System.nanoTime() - t0) / 1e9)
      if (tp > bestTp) bestTp = tp
    }
    println(f"single-thread: $bestTp%.0f docs/s (best of 3)")
    // split gen vs extract
    val docs = (0 until 5000).map(i => DocGen.docRow(f"doc-$i%012d")).toArray
    val t1 = System.nanoTime()
    docs.foreach(d => Extract.extractDoc(d))
    val dt1 = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    (0 until 5000).foreach(i => DocGen.docRow(f"doc-$i%012d"))
    val dt2 = (System.nanoTime() - t2) / 1e9
    println(f"extract-only: ${5000 / dt1}%.0f docs/s; gen-only: ${5000 / dt2}%.0f docs/s")
    // analyze vs pageops
    val t3 = System.nanoTime()
    docs.foreach(d => graft.kernel.StubModel.analyze(d))
    val dt3 = (System.nanoTime() - t3) / 1e9
    println(f"analyze-only(incl placement sim): ${5000 / dt3}%.0f docs/s")
    val pms = docs.map(d => graft.kernel.StubModel.analyze(d))
    val t4 = System.nanoTime()
    pms.foreach(ps => ps.map(p => graft.pipeline.PageOps.process(p)))
    val dt4 = (System.nanoTime() - t4) / 1e9
    println(f"pageops-only: ${5000 / dt4}%.0f docs/s")
  }
}
