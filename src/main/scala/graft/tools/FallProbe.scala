package graft.tools
import graft.corpus.DocGen
import graft.kernel.StubModel
object FallProbe {
  def main(args: Array[String]): Unit = {
    var found = 0
    var i = 0
    while (found < 8 && i < 5000) {
      val id = f"doc-$i%012d"
      val before = StubModel.authoredAwayCount.get
      val pms = StubModel.analyze(DocGen.docRow(id))
      if (StubModel.authoredAwayCount.get > before) {
        found += 1
        val doc = DocGen.authored(id)
        println(s"=== $id pages=${pms.length} emitsOrd=${StubModel.emitsOrder(id)}")
        doc.pages.zipWithIndex.foreach { case (pg, p) =>
          val ins = StubModel.usesInsert(id, p)
          println(s"  page $p insert=$ins kinds=${pg.blocks.map(_.kind).mkString(",")}")
        }
      }
      i += 1
    }
  }
}
