package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: job-level breakdown of the fresh dedup chain (pipelineQuery
  * path) — how many Spark jobs run and where the wall time pools. */
object DedupProf2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val rows = scala.collection.mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          rows.synchronized { rows += ((j.jobId, (System.nanoTime() - t0) / 1e9, d)) }
        }
    })
    // warm pass then measured pass
    (1 to 2).foreach { rep =>
      rows.clear()
      val t0 = System.nanoTime()
      graft.io.DedupPipeline.pipelineQuery(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      if (rep == 2) {
        println(f"pipelineQuery count wall $wall%.2f s, jobs ${rows.size}, job-time sum ${rows.map(_._2).sum}%.2f s")
        rows.sortBy(-_._2).take(20).foreach { case (id, t, d) =>
          println(f"  job $id%3d $t%6.3f s  ${d.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
