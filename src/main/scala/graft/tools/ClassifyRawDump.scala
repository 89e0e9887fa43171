package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.DocGen
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Dev tool: freeze the raw pdfium text layer (DocGen.rawPages) for doc
  * ids 0..4999 into ONE committed parquet the classify_router_v2 oracle
  * reads — the DuckDB side recomputes every ladder signal from this frozen
  * content while Spark generates the same pages live, so the compare
  * verifies generation determinism + measurement + ladder. Regenerate
  * together with FixtureDump/OracleDump whenever DocGen changes. */
object ClassifyRawDump {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption
      .getOrElse("src/test/resources/golden/classify_raw.parquet")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = spark.range(5000).map(i => f"doc-$i%012d")
      .flatMap(id => DocGen.rawPages(id))
      .toDF()
      .orderBy("doc_id", "page_idx")
    val tmp = Files.createTempDirectory("classify_raw").toString
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.move(part, Paths.get(outPath), StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.count()} raw pages to $outPath")
    spark.stop()
  }
}
