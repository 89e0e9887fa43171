package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import graft.pipeline.Extract
import graft.io.SpanStats
import graft.corpus.DocGen
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Observability surfaces: the typed SpanStats Aggregator and
  * Dataset.observe metrics captured through a QueryExecutionListener —
  * the zero-extra-pass way to get lineage counters off a production run. */
class ObserveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("typed Aggregator computes extraction stats in one pass") {
    import spark.implicits._
    val res = Extract.run(Extract.corpus(Extract.idRange(spark, 60)), partitions = 4)
    val stats = res.select(SpanStats.toColumn).head()
    val expected = (0 until 60).map(i => DocGen.golden(f"doc-$i%012d"))
    assert(stats.docs == 60)
    assert(stats.spans == expected.map(_.spans.length).sum)
    assert(stats.max_spans == expected.map(_.spans.length).max)
  }

  test("Dataset.observe emits metrics to a QueryExecutionListener") {
    import spark.implicits._
    @volatile var observed: Map[String, Any] = Map.empty
    val latch = new CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val m = qe.observedMetrics.get("graft_stats")
        if (m.isDefined) {
          observed = Map("docs" -> m.get.getLong(0), "spans" -> m.get.getLong(1))
          latch.countDown()
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Extract.run(Extract.corpus(Extract.idRange(spark, 40)), partitions = 4)
        .observe("graft_stats", count(lit(1)).as("docs"),
          sum(size(col("spans"))).as("spans"))
        .write.mode("overwrite").format("noop").save()
      assert(latch.await(60, TimeUnit.SECONDS), "observe metrics never arrived")
      assert(observed("docs") == 40L)
      val expectedSpans = (0 until 40).map(i => DocGen.golden(f"doc-$i%012d").spans.length).sum
      assert(observed("spans") == expectedSpans.toLong)
    } finally spark.listenerManager.unregister(listener)
  }
}
