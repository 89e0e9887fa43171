package graft.tools

import graft.corpus.DocGen
import graft.pipeline.Extract

/** Dev sweep: golden equality over a large id range (parallel, no Spark). */
object GoldenSweep {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 16).map { t =>
      new Thread(() => {
        var i = t
        while (i < n) {
          val id = f"doc-$i%012d"
          val got = Extract.extractDoc(DocGen.docRow(id))
          val want = DocGen.golden(id)
          if (got.spans != want.spans || got.markdown != want.markdown) bad.add(id)
          i += 16
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    if (bad.isEmpty) println(s"SWEEP OK: $n docs golden-exact")
    else {
      println(s"SWEEP FAIL: ${bad.size} of $n mismatch; first: ${bad.peek()}")
      sys.exit(1)
    }
  }
}
