package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.{DocRow, DocResult}
import graft.pipeline.Extract
import graft.kernel.StubModel

/** Structured Streaming surface. The reference is pure batch (SURVEY.md
  * §2.10) — these jobs are the streaming-ingest counterparts a production
  * corpus pipeline needs: continuous extraction of newly-landed document
  * files, and watermarked event-rate monitoring. */
object StreamJobs {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType)))))))

  /** Continuous extraction over a parquet landing directory: each
    * micro-batch runs the same per-partition kernel + assembly as the batch
    * job (stateless, so exactly-once with any replayable source/sink). */
  def extractStream(spark: SparkSession, landingDir: String): Dataset[DocResult] = {
    import spark.implicits._
    spark.readStream
      .schema(docSchema)
      .parquet(landingDir)
      .as[DocRow]
      .mapPartitions { it =>
        val m = StubModel
        it.map(d => Extract.extractDoc(d, m))
      }
  }

  /** Watermarked sliding-window event counts (late data tolerated 10 min;
    * append mode emits only finalized windows). */
  def eventsWindowed(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ parquet -> event time
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("total"))
}
