package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.corpus.DocGen
import graft.pipeline.Extract

/** End-to-end Spark run of the extraction job (salted repartition + kernel
  * mapPartitions + assembly) against the golden oracle — the distributed
  * path must agree with the pure per-doc path regardless of partitioning. */
class SparkExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7") // deliberately odd
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Spark extraction equals golden on a 96-doc corpus") {
    import spark.implicits._
    val ids = Extract.idRange(spark, 96)
    val got = Extract.run(Extract.corpus(ids), partitions = 7)
      .collect().map(r => r.doc_id -> r.spans).toMap
    assert(got.size == 96)
    (0 until 96).foreach { i =>
      val id = f"doc-$i%012d"
      val want = DocGen.golden(id).spans
      assert(got(id) == want, s"mismatch for $id")
    }
  }

  test("page-parallel path agrees with golden (monster-doc fan-out)") {
    import spark.implicits._
    val ids = Extract.idRange(spark, 64)
    val got = Extract.runPaged(Extract.corpus(ids), partitions = 7)
      .collect().map(r => r.doc_id -> r.spans).toMap
    (0 until 64).foreach { i =>
      val id = f"doc-$i%012d"
      assert(got(id) == DocGen.golden(id).spans, s"paged mismatch for $id")
    }
  }

  test("flagship entry returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
