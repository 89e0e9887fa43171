package graft.tools

import graft.pipeline.Extract
import graft.corpus.DocGen
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: raw thread scaling of gen+extract, no Spark. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val perThread = args.headOption.map(_.toInt).getOrElse(6000)
    def run(threads: Int): Double = {
      val counter = new AtomicLong()
      val total = perThread.toLong * threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var i = 0
          while (i < perThread) {
            val id = f"doc-${t * 1000000 + i}%012d"
            counter.addAndGet(Extract.extractDoc(DocGen.docRow(id)).spans.length.toLong)
            i += 1
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      total / ((System.nanoTime() - t0) / 1e9)
    }
    Seq(8, 32, 2, 8, 32, 2, 8, 32).foreach(c => println(f"threads=$c%2d: ${run(c)}%.0f docs/sec"))
  }
}
