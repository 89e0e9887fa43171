package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: shingle expression cost breakdown. */
object ShingleProf2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(name: String, reps: Int = 3)(f: => Unit): Unit = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"  $name%-34s min ${ts.min}%6.2f s (${ts.map(x => f"$x%.2f").mkString(",")})")
    }
    t("baseline docs.count") { docs.count(): Unit }
    t("split only") {
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3).count(): Unit
    }
    t("grams explode count") {
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .withColumn("grams", expr(
          "array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"))
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .count(): Unit
    }
    t("full shinglesFrom noop") {
      graft.queries.ScaleQueries.shinglesFrom(docs)
        .write.mode("overwrite").format("noop").save()
    }
    // md5 cost in isolation over the exploded grams
    t("explode + md5 noop") {
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1])))")).as("g"))
        .withColumn("g32", expr("CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)"))
        .write.mode("overwrite").format("noop").save()
    }
    // partition count of the scan
    println("  scan partitions: " + docs.rdd.getNumPartitions)
    spark.stop()
  }
}
