package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.corpus.DocGen
import graft.pipeline.Extract
import graft.streaming.StreamJobs
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming extraction over a landing dir matches golden") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft_landing").toString
    // two file drops, as if a crawler landed batches over time
    Extract.corpus(Extract.idRange(spark, 24)).write.mode("append").parquet(landing)
    Extract.corpus(spark.range(24, 48).map(i => f"doc-$i%012d")).write.mode("append").parquet(landing)

    val q = StreamJobs.extractStream(spark, landing)
      .writeStream.format("memory").queryName("stream_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("stream_out")
      .as[graft.schema.DocResult].collect().map(r => r.doc_id -> r.spans).toMap
    assert(got.size == 48)
    (0 until 48).foreach { i =>
      val id = f"doc-$i%012d"
      assert(got(id) == DocGen.golden(id).spans, s"stream mismatch for $id")
    }
  }

  test("watermarked windowed event counts equal the batch aggregation") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val landing = Files.createTempDirectory("graft_events").toString
    events.write.mode("overwrite").parquet(landing)

    val stream = spark.readStream.schema(events.schema).parquet(landing)
    val q = StreamJobs.eventsWindowed(stream)
      .writeStream.format("memory").queryName("ev_out").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // append mode withholds windows newer than the watermark; everything
    // emitted must exactly match the batch computation of the same window
    val gotCnt = spark.table("ev_out").count()
    val batch = StreamJobs.eventsWindowed(events) // same expr works in batch
    val joined = spark.table("ev_out").alias("s")
      .join(batch.alias("b"), Seq("win_start", "event_type"))
      .where("s.cnt = b.cnt")
    assert(gotCnt > 0, "no finalized windows emitted")
    assert(joined.count() == gotCnt, "stream windows disagree with batch")
  }
}
