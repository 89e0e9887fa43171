package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: task fan-out of the converter-tier queries (how many tasks
  * actually run the per-doc parse work). */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long].map(i => f"doc-$i%012d")
    println("ids partitions: " + ids.rdd.getNumPartitions)
    val byTask = ids.mapPartitions { it => Iterator.single(it.size) }
      .collect().sorted.reverse
    println("docs per task: " + byTask.mkString(","))

    def time(name: String, reps: Int)(f: => Unit): Unit = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min ${ts.min}%6.2f s (${ts.map(x => f"$x%.2f").mkString(",")})")
    }
    time("pdf_extract asis", 3) {
      graft.queries.Queries.pdfExtract(spark, dir).count(): Unit
    }
    val p = spark.sparkContext.defaultParallelism
    time("pdf parse repartitioned", 3) {
      ids.repartition(p)
        .mapPartitions { it =>
          it.flatMap { id =>
            graft.pdf.PdfConvert.spans(id, graft.corpus.PdfGen.bytes(id))
              .map(s => (id, s.order, s.kind, s.media_ref, s.text))
          }
        }.toDF("doc_id", "ord", "kind", "media_ref", "text")
        .count(): Unit
    }
    spark.stop()
  }
}
