package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Extract

/** Dev probe (r6, VERDICT next-round #2): extraction-tier linearity at
  * 10x the bench's doc count — 120k vs 1.2M docs at local[32], noop sink
  * (the frozen Bench's own action). Linear scaling = docs/s holds flat,
  * i.e. the 10x run's time ratio tracks the input ratio. */
object ExtractScale10x {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: Long): Double = {
      val ids = Extract.idRange(spark, n)
      val t0 = System.nanoTime()
      Extract.runFromIds(ids, partitions = 32)
        .write.mode("overwrite").format("noop").save()
      n / ((System.nanoTime() - t0) / 1e9)
    }
    run(30000) // warm
    Seq(120000L, 1200000L, 120000L, 1200000L).foreach { n =>
      println(f"n=$n%8d  ${run(n)}%.0f docs/s")
    }
    spark.stop()
  }
}
