package graft.tools

import graft.corpus.DocGen
import graft.kernel.StubModel
import graft.schema.Kinds

/** Dev probe: how often the hard layout paths actually occur over n docs —
  * two-column pages, aligned-gap columns (v3-required), deferred far
  * captions (leftover-attach-required), model-order docs. */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)
    var pages = 0; var twoCol = 0; var shortcutDocs = 0; var deferred = 0
    var alignedTwoCol = 0
    (0 until n).foreach { i =>
      val id = f"doc-$i%012d"
      if (StubModel.emitsOrder(id)) shortcutDocs += 1
      val pms = StubModel.analyze(DocGen.docRow(id))
      pms.foreach { pm =>
        pages += 1
        // a page is two-column iff some main det starts right of the gutter
        // x (left column ends at 286, right starts at 326)
        val mains = pm.dets.filter(d => d.cat != Kinds.Abandon && d.score > 0.05)
        val isTwo = mains.exists(_.x0 > 320.0) && mains.exists(d => d.x0 < 300 && d.x1 <= 300)
        if (isTwo) {
          twoCol += 1
          // aligned gap: a y-band with zero coverage across BOTH columns
          // strictly inside the content region
          val ys = mains.filter(_.y0 > 90).map(d => (d.y0, d.y1)).sortBy(_._1)
          if (ys.nonEmpty) {
            var hi = ys.head._2; var gap = false
            ys.tail.foreach { case (a, b) =>
              if (a > hi + 1.0) gap = true
              if (b > hi) hi = b
            }
            if (gap) alignedTwoCol += 1
          }
        }
        // deferred caption: a caption det whose nearest body is > 30px away
        val caps = mains.filter(_.cat == Kinds.Caption)
        val bodies = mains.filter(d => Kinds.bodies(d.cat))
        caps.foreach { c =>
          if (bodies.nonEmpty) {
            val dmin = bodies.map(b => graft.geom.Geo.edgeDist(
              c.x0, c.y0, c.x1, c.y1, b.x0, b.y0, b.x1, b.y1)).min
            if (dmin > 30.0) deferred += 1
          }
        }
      }
    }
    println(s"docs=$n pages=$pages twoColPages=$twoCol alignedGapTwoCol=$alignedTwoCol " +
      s"farCaptions=$deferred shortcutDocs=$shortcutDocs")
    println(s"insertPages=${StubModel.insertPageCount.get} " +
      s"authoredAway=${StubModel.authoredAwayCount.get} " +
      s"unsolvable=${StubModel.unsolvableCount.get} " +
      s"(authoredAway rate=${StubModel.authoredAwayCount.get.toDouble / pages})")
  }
}
