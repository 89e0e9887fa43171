package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: per-stage wall times of the fresh dedup chain (the
  * dedup_pipeline bench body) + total, on sf0.1 at local[32]. */
object DedupProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { round =>
      val out = java.nio.file.Files.createTempDirectory("graft_dedup_prof").toString
      val t0 = System.nanoTime()
      val reports = graft.io.DedupPipeline.run(spark, dir, out, recordFp = false)
      val tot = (System.nanoTime() - t0) / 1e9
      println(f"== round $round total $tot%.2f s ==")
      reports.foreach { case (name, r) =>
        println(f"  $name%-12s wall ${r.wall_ms / 1000.0}%6.2f s docs ${r.docs} processed ${r.processed}")
      }
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
        f.delete(): Unit
      }
      del(new java.io.File(out))
    }
    spark.stop()
  }
}
