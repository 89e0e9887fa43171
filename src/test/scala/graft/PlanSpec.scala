package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The whole-operator Catalyst form (builder preference tier c): custom
  * LogicalPlan -> injected SparkStrategy -> fused physical DocExtractExec
  * emitting UnsafeRows directly. The physical plan must actually contain
  * the custom operator, and its results must equal the Dataset path's. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.ext.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("DocExtractExec appears in the physical plan and matches the Dataset path") {
    import spark.implicits._
    val ids = spark.createDataset((0 until 48).map(i => f"doc-$i%012d")).toDF("doc_id")
    val df = graft.plans.DocExtract(ids)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("DocExtract"), s"operator missing:\n$physical")
    val got = df.orderBy("doc_id", "ord").collect().toVector
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
    val want = (0 until 48).flatMap { i =>
      val id = f"doc-$i%012d"
      graft.corpus.DocGen.golden(id).spans.map(s => (id, s.order, s.kind, s.media_ref, s.text))
    }.toVector.sortBy(t => (t._1, t._2))
    assert(got == want, "exec path diverged from golden")
  }

  test("projection and filter compose above the custom node") {
    import spark.implicits._
    val ids = spark.createDataset(Seq("doc-000000000003")).toDF("doc_id")
    val df = graft.plans.DocExtract(ids)
      .where("kind = 'title'").select("kind", "text")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0) == "title"))
  }
}
