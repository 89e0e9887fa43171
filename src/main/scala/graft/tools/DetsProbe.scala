package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r6): cost of the shared dets synthesis with and without the
  * pre-explode hash repartition — the documents table is one parquet row
  * group, so the un-repartitioned explode runs single-task. Forces the
  * full det arithmetic with a sum over every generated column. */
object DetsProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def synth(pre: org.apache.spark.sql.DataFrame) = pre
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .withColumn("wlen", length(col("word")))
      .withColumn("page", expr("pos div 24"))
      .withColumn("slot", expr("pos % 12"))
      .withColumn("x0", expr("CAST(40 + (slot % 4) * 130 AS DOUBLE)"))
      .withColumn("y0", expr("CAST(60 + (slot div 4) * 110 AS DOUBLE)"))
      .withColumn("x1", expr("x0 + 20 + 8 * wlen"))
      .withColumn("y1", expr("y0 + 18 + (wlen % 5) * 16"))
      .withColumn("score", expr("((wlen * 7 + pos * 13) % 100) / 100.0"))
      .agg(sum(col("x1") + col("y1") + col("score")), count(lit(1)))

    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    def time(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (0 until 5).map { _ =>
        val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min ${ts.min}%.3f s  (${ts.map(x => f"$x%.2f").mkString(", ")})")
    }
    time("single-task synth", synth(docs))
    time("repartitioned synth", synth(docs.repartition(
      spark.sparkContext.defaultParallelism, col("doc_id"))))
    time("text shuffle only", docs.repartition(
      spark.sparkContext.defaultParallelism, col("doc_id"))
      .agg(count(lit(1)), sum(length(col("text")))))
    spark.stop()
  }
}
