package graft.tools
import graft.corpus.DocGen
import graft.pipeline.PageOps
object PageOpsProf {
  def main(args: Array[String]): Unit = {
    val docs = (0 until 5000).map(i => DocGen.docRow(f"doc-$i%012d")).toArray
    val pms = docs.flatMap(d => graft.kernel.StubModel.analyze(d))
    println(s"pages: ${pms.length}, avg dets/page: ${pms.map(_.dets.length).sum / pms.length}, " +
      s"pages with chars: ${pms.count(_.chars.nonEmpty)}, avg chars: ${pms.map(_.chars.length).sum / math.max(1, pms.count(_.chars.nonEmpty))}")
    // warm
    pms.take(2000).foreach(p => PageOps.process(p))
    def time(label: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      (1 to 5).foreach { _ =>
        val t = System.nanoTime(); f
        val dt = (System.nanoTime() - t) / 1e9
        if (dt < best) best = dt
      }
      println(f"$label: $best%.3f s (best of 5)")
    }
    time("full process")(pms.foreach(p => PageOps.process(p)))
    time("process, chars stripped")(pms.foreach(p => PageOps.process(p.copy(chars = Nil))))
    // orderBlocks cost in isolation over synthetic mid-size block sets
    val blocks = pms.take(3000).map(p => p.dets.filter(d => d.score > 0.5).toVector)
    time("orderBlocks x3000")(blocks.foreach(b => if (b.nonEmpty) PageOps.orderBlocks(b)))
  }
}
