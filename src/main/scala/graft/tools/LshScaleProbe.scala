package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling evidence for the corpus-sized LSH paths: times the capped
  * candidate queries at two scale factors and prints the time ratio next
  * to the input ratio — a quadratic candidate blow-up would show a time
  * ratio far above the input ratio. Best-of-3 per cell (noisy VM). */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = Seq("minhash_lsh_pairs", "cos_neardup_pairs", "ann_ivf_topk")
    val times = for (q <- queries; d <- dirs) yield {
      val fn = graft.queries.ScaleQueries.all(q)
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$q%-20s $d%-24s ${t}%.2f s")
      (q, d, t)
    }
    for (q <- queries) {
      val ts = times.filter(_._1 == q).map(_._3)
      println(f"$q%-20s time ratio sf0.01->sf0.1: ${ts(1) / ts(0)}%.2f")
    }
    spark.stop()
  }
}
