package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: where does office_extract's wall time go under Spark. */
object OfficeProf2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      graft.queries.Queries.officeExtract(spark, dir).count()
      println(f"office_extract count rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
