package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: check codegen coverage + plan shape of key queries. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.headOption.getOrElse("ann_cosine_topk") match {
      case name =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.explain("formatted")
        val t0 = System.nanoTime()
        df.count()
        val t1 = System.nanoTime()
        df.count()
        println(f"$name: first ${(t1 - t0) / 1e9}%.2fs second ${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
