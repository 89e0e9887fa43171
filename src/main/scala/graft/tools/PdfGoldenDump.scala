package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.PdfGen
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Dev tool: freeze the PDF golden span sequences (PdfGen.golden) for doc
  * ids 0..4999 into ONE committed parquet the pdf_extract / ingest_raw
  * oracles join against. The goldens come from the authoring structure
  * ("pdfc" stream); the query's value comes from the real byte-level PDF
  * parse. Regenerate together with the other goldens on any PdfGen
  * content change. */
object PdfGoldenDump {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption
      .getOrElse("src/test/resources/golden/pdf_golden.parquet")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = spark.range(5000).map(i => f"doc-$i%012d")
      .flatMap(id => PdfGen.golden(id).map(s => (id, s.order, s.kind, s.media_ref, s.text)))
      .toDF("doc_id", "ord", "kind", "media_ref", "text")
      .orderBy("doc_id", "ord")
    val tmp = Files.createTempDirectory("pdf_golden").toString
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.move(part, Paths.get(outPath), StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.count()} pdf golden spans to $outPath")
    spark.stop()
  }
}
