package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: min-of-3 timing for a few named driver queries. */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        qs(name)(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s min ${ts.min}%.2f s (${ts.map(x => f"$x%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
