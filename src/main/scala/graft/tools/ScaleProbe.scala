package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Extract
import graft.corpus.DocGen

/** Dev probe: single-thread per-doc cost + repeated Spark scaling runs. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(30000L)
    // single-threaded baseline: gen + extract
    val ids = (0 until 2000).map(i => f"doc-$i%012d")
    val t0 = System.nanoTime()
    val rows = ids.map(DocGen.docRow)
    val t1 = System.nanoTime()
    var spans = 0L
    rows.foreach(r => spans += Extract.extractDoc(r).spans.length)
    val t2 = System.nanoTime()
    println(f"single-thread: gen ${(t1 - t0) / 1e9}%.2fs extract ${(t2 - t1) / 1e9}%.2fs for 2000 docs ($spans spans)")

    def run(cores: Int): Double = {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val ids = Extract.idRange(spark, n)
      Extract.runFromIds(ids.limit(64), partitions = cores)
        .write.mode("overwrite").format("noop").save()
      val s0 = System.nanoTime()
      Extract.runFromIds(ids, partitions = cores)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - s0) / 1e9
      spark.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      n / sec
    }
    Seq(8, 32, 2, 8, 32, 2, 8, 32).foreach { c =>
      println(f"local[$c%2d]: ${run(c)}%.0f docs/sec")
    }
  }
}
