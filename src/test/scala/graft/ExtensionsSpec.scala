package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", "graft.ext.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("native expressions are SQL-callable via SparkSessionExtensions") {
    import spark.implicits._
    val norm = spark.sql("SELECT full_to_half('ｆｕｌｌ　ｗｉｄｔｈ！') AS s")
      .as[String].head()
    assert(norm == "full width!")
    val delig = spark.sql("SELECT deligature('ﬁﬂuent oﬀice') AS s").as[String].head()
    assert(delig == "fifluent office")
    val sim = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
    val orth = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS c").as[Double].head()
    assert(math.abs(orth) < 1e-12)
  }

  test("FoldSelfCosine optimizer rule folds the self-similarity loop away") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("cosine_sim(embedding, embedding) AS c")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosinesim") && !optimized.contains("CosineSim"),
      s"rule did not fire:\n$optimized")
    assert(df.filter("c = 1.0").count() == df.count())
  }

  test("expressions survive whole-stage codegen over a real column") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // slice(...) produces equal VALUES via a different expression tree, so
    // FoldSelfCosine cannot fire and the real codegen loop runs
    val n = df.selectExpr("cosine_sim(embedding, slice(embedding, 1, size(embedding))) AS c")
      .filter("abs(c - 1.0) < 1e-9").count()
    assert(n == df.count())
  }
}
