package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: dump `.explain("formatted")` of the r5 formulations kept in
  * [[EquivProbe]] into plans/r06/<name>_before.txt — the before-plans for
  * queries whose baseline plan was not captured before the rewrite
  * (the rewrites landed with EquivProbe as the equivalence witness; this
  * re-materializes the old plan shape from the same verbatim copies). */
object PlanDumpOld {

  // old plan SHAPE of chunk_locate_fuzzy / chunk_blocks: groupByKey over
  // the exploded span stream (the flatMapGroups body does not affect the
  // plan shape)
  private def oldGroupByKeyShape(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spans = graft.pipeline.Extract.extractSpansUnordered(spark, dir)
      .select(col("doc_id"), col("ord").cast("int").as("ord"), col("kind"),
        col("media_ref"), col("text"))
      .as[(String, Int, String, String, String)]
    spans.groupByKey(_._1).flatMapGroups {
      (id: String, it: Iterator[(String, Int, String, String, String)]) =>
        it.map(r => (id, 0, r._2))
    }.toDF("doc_id", "chunk_id", "ord")
      .orderBy("doc_id", "chunk_id", "ord")
  }

  private def oldHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long].map(i => f"doc-$i%012d")
    ids.mapPartitions { it =>
      it.flatMap { id =>
        val spans = graft.html.HtmlConvert.convert(id, graft.corpus.HtmlGen.bytes(id))
        spans.map(s => (id, s.order, s.kind, s.media_ref, s.text))
      }
    }.toDF("doc_id", "ord", "kind", "media_ref", "text")
      .orderBy("doc_id", "ord")
  }

  // r5 virtual_lines (no fan-out repartition before the typed ladder)
  private def oldVirtualLines(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = graft.queries.Queries.dets(spark, dir)
      .withColumn("bx1", expr("x0 + 60 + (wlen * 37 + pos * 11) % 280"))
      .withColumn("by1", expr("y0 + 20 + (pos * 17 + wlen * 5) % 220"))
    val lh = d.filter(col("cat").isin("text", "title", "caption", "footnote"))
      .groupBy(col("doc_id"), col("page"))
      .agg(expr("percentile(CAST(by1 - y0 AS INT), 0.5)").as("line_height"))
    d.filter(col("cat") =!= "abandon")
      .join(broadcast(lh), Seq("doc_id", "page"), "left")
      .select(col("doc_id"), col("page").cast("int").as("page"),
        col("pos").cast("int").as("pos"),
        col("x0"), col("y0"), col("bx1"), col("by1"),
        coalesce(col("line_height"), lit(10.0)).as("lh"))
      .as[(Long, Int, Int, Double, Double, Double, Double, Double)]
      .flatMap { case (doc, page, pos, x0, y0, x1, y1, lh0) =>
        graft.order.VirtualLines.insertLines(x0, y0, x1, y1, lh0, 612.0, 792.0)
          .zipWithIndex.map { case ((lx0, ly0, lx1, ly1), li) =>
            (doc, page, pos, li, lx0, ly0, lx1, ly1)
          }
      }
      .toDF("doc_id", "page", "pos", "line_idx", "x0", "y0", "x1", "y1")
      .orderBy("doc_id", "pos", "line_idx")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File("plans/r06").mkdirs()
    def dump(name: String, df: DataFrame): Unit = {
      val pw = new java.io.PrintWriter(s"plans/r06/${name}_before.txt", "UTF-8")
      try pw.write(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally pw.close()
      println(s"dumped $name")
    }
    dump("simhash64", EquivProbe.oldSimhash64(spark, dir))
    dump("cos_neardup_pairs", EquivProbe.oldCosNeardupPairs(spark, dir))
    dump("chunk_locate", EquivProbe.oldChunkLocate(spark, dir))
    dump("chunk_locate_fuzzy", oldGroupByKeyShape(spark, dir))
    dump("html_extract", oldHtmlExtract(spark, dir))
    dump("det_iou_dedup", EquivProbe.oldDetIouDedup(spark, dir))
    dump("virtual_lines", oldVirtualLines(spark, dir))
    spark.stop()
  }
}
