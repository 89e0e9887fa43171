package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Extract
import graft.corpus.DocGen
import graft.schema.DocRow

/** Dev probe: quantify the salted size-bucket repartition vs plain hash
  * partitioning. Metric: distribution of per-partition COST (total pages —
  * the real work unit) and the resulting wall clock. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(30000L)
    val parts = 32
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Extract.corpus(Extract.idRange(spark, n))

    def stats(name: String, ds: org.apache.spark.sql.Dataset[DocRow]): Unit = {
      val pages = ds.mapPartitions { it =>
        var p = 0L
        it.foreach(d => p += DocGen.pageCount(d.doc_id))
        Iterator.single(p)
      }.collect().sorted
      val t0 = System.nanoTime()
      ds.mapPartitions(it => it.map(Extract.extractDoc(_))).foreach(_ => ())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name: partitions=${pages.length} pages max=${pages.max} " +
        f"min=${pages.min} mean=${pages.sum / pages.length} " +
        f"max/mean=${pages.max.toDouble * pages.length / pages.sum}%.2f wall=$sec%.1fs")
    }

    stats("salted ", Extract.saltRepartition(docs, parts))
    stats("hashkey", docs.repartition(parts, col("doc_id")).as[DocRow])
    // the adversarial case salting exists for: partitioning by a CLUSTERING
    // key (source/host) where one source holds the monster docs
    stats("bysrc  ", docs.repartition(parts,
      expr("CAST(substring(doc_id, 5) AS BIGINT) div 1000")).as[DocRow])
    spark.stop()
  }
}
