package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe: split chunk_locate_fuzzy's cost into extraction vs walk. */
object FuzzyProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min ${ts.min}%.2f s (${ts.map(x => f"$x%.2f").mkString(", ")})")
    }
    t("extract_unordered") {
      graft.pipeline.Extract.extractSpansUnordered(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    t("extract+regroup") {
      import spark.implicits._
      graft.pipeline.Extract.extractSpansUnordered(spark, dir)
        .select(col("doc_id"), col("ord").cast("int"), col("kind"), col("media_ref"), col("text"))
        .as[(String, Int, String, String, String)]
        .groupByKey(_._1).flatMapGroups { (id, it) => Iterator.single((id, it.size)) }
        .write.mode("overwrite").format("noop").save()
    }
    t("chunk_locate_fuzzy") {
      graft.queries.Queries.chunkLocateFuzzy(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
