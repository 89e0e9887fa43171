package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dissect the dedup-chain SHINGLES stage cost. */
object ShingleProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val out = java.nio.file.Files.createTempDirectory("graft_shingle_prof").toString
      t("shingles count") {
        graft.queries.ScaleQueries.shinglesFrom(docs).count(): Unit
      }
      t("shingles noop") {
        graft.queries.ScaleQueries.shinglesFrom(docs)
          .select(col("doc_id"), col("g32"))
          .write.mode("overwrite").format("noop").save()
      }
      val unit0 = Seq(0, 1, 2, 3)
      val in = docs.filter(pmod(xxhash64(col("doc_id")), lit(8)).cast("int").isin(unit0: _*))
      val res = graft.queries.ScaleQueries.shinglesFrom(in)
        .select(col("doc_id"), col("g32"))
        .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(8)).cast("int"))
        .persist()
      t("unit0 write partitioned") {
        res.write.mode("overwrite").partitionBy("bucket").parquet(s"$out/data")
      }
      t("unit0 stats") {
        res.groupBy(col("bucket")).agg(count(lit(1)).as("docs")).collect(): Unit
      }
      res.unpersist()
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
        f.delete(): Unit
      }
      del(new java.io.File(out))
    }
    spark.stop()
  }
}
