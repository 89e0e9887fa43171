package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Extract
import graft.corpus.DocGen

/** Dev probe: isolate the encoder share of the extraction job at a given
  * parallelism — (a) full DocResult rows to a noop sink vs (b) the same
  * compute emitting only an Int per doc. The difference is what Spark pays
  * to serialize the heavy nested rows. */
object EncProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(120000L)
    def sess(cores: Int) = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR"); s
    }
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def full(cores: Int): Double = {
      val spark = sess(cores)
      val ids = Extract.idRange(spark, n)
      Extract.runFromIds(ids.limit(64), partitions = cores).write.mode("overwrite").format("noop").save()
      val s = timeIt(Extract.runFromIds(ids, partitions = cores)
        .write.mode("overwrite").format("noop").save())
      spark.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      n / s
    }
    def intOnly(cores: Int): Double = {
      val spark = sess(cores)
      import spark.implicits._
      val ids = Extract.idRange(spark, n)
      def job(d: org.apache.spark.sql.Dataset[String]) =
        d.mapPartitions { it => it.map(id => Extract.extractDoc(DocGen.docRow(id)).spans.length) }
      job(ids.limit(64)).write.mode("overwrite").format("noop").save()
      val s = timeIt(job(ids).write.mode("overwrite").format("noop").save())
      spark.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      n / s
    }
    val best = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    (1 to 3).foreach { _ =>
      for ((label, f) <- Seq("full8" -> (() => full(8)), "int8" -> (() => intOnly(8)),
        "full32" -> (() => full(32)), "int32" -> (() => intOnly(32)))) {
        val tp = f()
        if (tp > best(label)) best(label) = tp
        println(f"$label%-7s ${tp}%.0f docs/s")
      }
    }
    println(best.toSeq.sortBy(_._1).map { case (k, v) => f"$k=${v}%.0f" }.mkString("BEST: ", " ", ""))
  }
}
