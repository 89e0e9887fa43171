package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Dev tool: freeze the image-tier and OLE2-tier golden span sequences for
  * doc ids 0..4999 into committed parquets the ingest_raw oracle joins
  * against. Regenerate on any ImgGen/OleGen content change. */
object RawGoldenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def freeze(name: String, golden: String => Vector[graft.schema.OutSpan]): Unit = {
      val rows = spark.range(5000).map(i => f"doc-$i%012d")
        .flatMap(id => golden(id).map(s => (id, s.order, s.kind, s.media_ref, s.text)))
        .toDF("doc_id", "ord", "kind", "media_ref", "text")
        .orderBy("doc_id", "ord")
      val tmp = Files.createTempDirectory(name).toString
      rows.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val outPath = s"src/test/resources/golden/$name.parquet"
      Files.createDirectories(Paths.get(outPath).getParent)
      Files.move(part, Paths.get(outPath), StandardCopyOption.REPLACE_EXISTING)
      println(s"wrote ${rows.count()} $name spans")
    }
    freeze("image_golden", graft.corpus.ImgGen.golden)
    freeze("ole_golden", graft.corpus.OleGen.golden)
    spark.stop()
  }
}
