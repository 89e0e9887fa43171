package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.DocGen
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Dev tool: freeze the renderer-side golden span sequences for doc ids
  * 0..4999 (covers sf0.01 and sf0.1) into ONE committed parquet file that
  * the driver's DuckDB oracle joins against — giving `extract_pipeline` a
  * full value-level oracle instead of a rows-only check. The goldens come
  * from DocGen.golden (the independent renderer spec), NOT from the
  * pipeline, so this is a real cross-check, same as FixtureSpec but for
  * the whole verify corpus. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption
      .getOrElse("src/test/resources/golden/extract_golden.parquet")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = spark.range(5000).map(i => f"doc-$i%012d")
      .flatMap { id =>
        DocGen.golden(id).spans.map(s => (id, s.order, s.kind, s.media_ref, s.text))
      }
      .toDF("doc_id", "ord", "kind", "media_ref", "text")
      .orderBy("doc_id", "ord")
    val tmp = Files.createTempDirectory("oracle_dump").toString
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.move(part, Paths.get(outPath), StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.count()} golden spans to $outPath")
    spark.stop()
  }
}
