package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.pipeline.Extract
import graft.io.ExtractJob
import java.nio.file.Files

/** Kill-at-50% resume idempotency (FIXTURES.md §4): a run that commits only
  * half its bucket groups, resumed, must produce exactly the output of a
  * cold full run — and already-done buckets must be skipped, not redone. */
class ResumeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collectOut(dir: String): Map[String, Seq[(String, String, String, Int)]] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/data")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(org.apache.spark.sql.functions.col("spans")).as("s"))
      .selectExpr("doc_id", "s.kind", "s.text", "s.media_ref", "s.order")
      .as[(String, String, String, String, Int)]
      .collect().toSeq
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(_._5).map(t => (t._2, t._3, t._4, t._5))
      }
  }

  test("kill at 50% of commit units, resume, output equals cold run") {
    val n = 300L
    val docs = Extract.corpus(Extract.idRange(spark, n))
    val cold = Files.createTempDirectory("graft_cold").toString
    val warm = Files.createTempDirectory("graft_warm").toString

    val r0 = ExtractJob.run(spark, docs, cold, buckets = 16, groups = 4,
      runId = "cold", partitions = 4)
    assert(r0.processed == 16 && r0.docs == n)

    // crash after 2 of 4 commit units
    val r1 = ExtractJob.run(spark, docs, warm, buckets = 16, groups = 4,
      runId = "attempt-1", partitions = 4, failAfterGroups = 2)
    assert(r1.processed == 8 && r1.skipped == 0)

    // resume: skips the 8 done buckets, finishes the rest
    val r2 = ExtractJob.run(spark, docs, warm, buckets = 16, groups = 4,
      runId = "attempt-2", partitions = 4)
    assert(r2.skipped == 8 && r2.processed == 8)

    assert(collectOut(warm) == collectOut(cold))

    // lineage: every bucket has exactly one done row, doc counts add up
    import spark.implicits._
    val ckpt = spark.read.parquet(s"$warm/_checkpoint")
    assert(ckpt.count() == 16)
    assert(ckpt.agg(org.apache.spark.sql.functions.sum("docs")).as[Long].head() == n)

    // layout-validation invariant rides the _metrics table (accumulator
    // channel): rows exist for every run and are ZERO on the clean corpus
    val m = spark.read.parquet(s"$cold/_metrics")
      .filter(org.apache.spark.sql.functions.col("stage") === "layout")
      .select("key", "value").as[(String, Double)].collect().toMap
    assert(m.contains("authored_away_pages") && m.contains("unsolvable_pages"),
      s"layout metric rows missing: $m")
    assert(m("authored_away_pages") == 0.0 && m("unsolvable_pages") == 0.0,
      s"layout invariant violated: $m")
  }

  test("raw-blob ingestion (office + html + pdf + image + ole interleaved) under the same protocol") {
    import spark.implicits._
    val n = 120
    // doc index mod 5 routes office / html / pdf / image / legacy-office
    val blobs = spark.range(n).map { i =>
      val id = f"doc-$i%012d"
      val bytes = (i % 5) match {
        case 0 => graft.corpus.OfficeGen.bytes(id)
        case 1 => graft.corpus.HtmlGen.bytes(id)
        case 2 => graft.corpus.PdfGen.bytes(id)
        case 3 => graft.corpus.ImgGen.bytes(id)
        case _ => graft.corpus.OleGen.bytes(id)
      }
      (id, bytes)
    }.toDF("doc_id", "content")

    val out = Files.createTempDirectory("graft_raw").toString
    val r1 = ExtractJob.runRaw(spark, blobs, out, buckets = 8, groups = 4,
      runId = "raw-1", failAfterGroups = 2)
    assert(r1.processed == 4 && r1.skipped == 0)
    val r2 = ExtractJob.runRaw(spark, blobs, out, buckets = 8, groups = 4,
      runId = "raw-2")
    assert(r2.skipped == 4 && r2.processed == 4)

    val got = collectOut(out)
    assert(got.size == n)
    (0 until n).foreach { i =>
      val id = f"doc-$i%012d"
      val spans = (i % 5) match {
        case 0 => graft.corpus.OfficeGen.golden(id)
        case 1 => graft.corpus.HtmlGen.golden(id)
        case 2 => graft.corpus.PdfGen.golden(id)
        case 3 => graft.corpus.ImgGen.golden(id)
        case _ => graft.corpus.OleGen.golden(id)
      }
      val want = spans.map(s => (s.kind, s.text, s.media_ref, s.order))
      assert(got(id) == want, s"raw ingest mismatch for $id")
    }
  }

  test("corrupt blobs isolate per document: empty spans + a counted metric") {
    import spark.implicits._
    val blobs = spark.createDataset(Seq(
      ("doc-000000000000", graft.corpus.OfficeGen.bytes("doc-000000000000")),
      // truncated zip: PK magic, garbage body
      ("doc-bad-zip", "PK\u0003\u0004garbage".getBytes("ISO-8859-1")),
      // pdf header with a garbage xref
      ("doc-bad-pdf", "%PDF-1.4\ngarbage without startxref".getBytes("ISO-8859-1")),
      ("doc-000000000001", graft.corpus.HtmlGen.bytes("doc-000000000001"))
    )).toDF("doc_id", "content")
    val out = Files.createTempDirectory("graft_corrupt").toString
    val r = ExtractJob.runRaw(spark, blobs, out, buckets = 2, groups = 1)
    assert(r.docs == 4, "every blob row lands, corrupt or not")
    val spans = spark.read.parquet(s"$out/data")
      .selectExpr("doc_id", "size(spans) AS n").as[(String, Int)].collect().toMap
    assert(spans("doc-bad-zip") == 0 && spans("doc-bad-pdf") == 0)
    assert(spans("doc-000000000000") > 0 && spans("doc-000000000001") > 0)
    val failed = spark.read.parquet(s"$out/_metrics")
      .filter(org.apache.spark.sql.functions.col("key") === "failed_docs")
      .selectExpr("value").as[Double].collect().sum
    assert(failed == 2.0, s"failed_docs metric = $failed")
  }
}
