package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Extract
import graft.schema.DocRow

/** Dev probe: scaling of read-from-parquet extraction (production shape)
  * vs generation-fused. */
object ParquetScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(120000L)
    val dir = "/tmp/graft_corpus_bench"
    // materialize corpus once at full parallelism
    locally {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      if (!new java.io.File(dir + "/_SUCCESS").exists()) {
        // pre-salted table layout: the write performs the skew-balancing
        // shuffle ONCE; every downstream extraction is then shuffle-free
        Extract.saltRepartition(Extract.corpus(Extract.idRange(spark, n)), 64)
          .write.mode("overwrite").parquet(dir)
      }
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
    def run(cores: Int): Double = {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        // default 128m packs this corpus into ~3 scan partitions; size scan
        // splits so every core gets several
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val docs = spark.read.parquet(dir).as[DocRow]
      // zero-shuffle: scan partitions feed the kernel directly
      docs.limit(256).mapPartitions(it => it.map(Extract.extractDoc(_))).foreach(_ => ())
      val t0 = System.nanoTime()
      docs.mapPartitions(it => it.map(Extract.extractDoc(_))).foreach(_ => ())
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      n / sec
    }
    Seq(8, 32, 2, 8, 32).foreach(c => println(f"parquet local[$c%2d]: ${run(c)}%.0f docs/sec"))
  }
}
