package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: r6 restructures must be RESULT-IDENTICAL. This tool keeps a
  * verbatim copy of the r5 formulations and diffs them row-exactly against
  * the restructured queries on the given SF dirs. */
object EquivProbe {

  // ---- r5 verbatim copies --------------------------------------------------

  private def oldShinglesFrom(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("grams", expr(
        "array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"))
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .withColumn("g32", expr("CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)"))

  private def oldCappedBucketPairs(df: DataFrame, keys: Seq[String], id: String,
      cap: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val st = df
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("mn", min(col(id)).over(w))
    val small = st.filter(col("cnt") <= cap)
    val smallPairs = small
      .join(small.select((col(id).as("b_id") +: keys.map(col)): _*), keys)
      .filter(col(id) < col("b_id"))
      .select(col(id).as("a_id"), col("b_id"))
    val starPairs = st.filter(col("cnt") > cap && col(id) > col("mn"))
      .select(col("mn").as("a_id"), col(id).as("b_id"))
    smallPairs.unionByName(starPairs)
  }

  private def oldMinhashPairsFromShingles(sh: DataFrame): DataFrame = {
    val minCols = (0 until 16).map { i =>
      min(expr(s"(${17 + 13 * i} * g32 + ${3 + 7 * i}) % 4294967311")).as(s"mh$i")
    }
    val minh = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until 4).map(r => col(s"mh${b * 4 + r}").cast("string")): _*).as("key"))
    }
    val bands = minh
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    oldCappedBucketPairs(bands, Seq("band", "key"), "doc_id", 64L)
      .groupBy(col("a_id").as("doc_id"), col("b_id"))
      .agg(count(lit(1)).as("nbands"))
  }

  private def oldDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("grams", expr(
        "array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"))
    val ex = docs.select(col("doc_id"), explode(col("grams")).as("gs"))
      .select(col("doc_id"), expr("CAST(conv(substring(md5(gs), 1, 8), 16, 10) AS BIGINT)").as("g"))
    val kept = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("df") <= 32)
      .select(col("doc_id"), col("g"))
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("gsz"))
    val pairs = kept.join(kept.select(col("doc_id").as("b_id"), col("g")), Seq("g"))
      .filter(col("doc_id") < col("b_id"))
      .groupBy(col("doc_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id"), col("gsz").as("a_sz")), Seq("doc_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("gsz").as("b_sz")), Seq("b_id"))
      .withColumn("jac", col("inter") / (col("a_sz") + col("b_sz") - col("inter")).cast("double"))
      .filter(col("jac") >= 0.12)
      .select(col("doc_id"), col("b_id"), col("inter"), col("jac"))
      .orderBy("doc_id", "b_id")
  }

  private[tools] def oldCosNeardupPairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VecFns
    import graft.queries.ScaleQueries.{lshPlanesPerBand, planesFor}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val pB = lshPlanesPerBand(n)
    val nBands = 4
    val pl = planesFor(nBands * pB)
    def bandBucket(emb: org.apache.spark.sql.Column, band: Int): org.apache.spark.sql.Column =
      (0 until pB).map { k =>
        when(VecFns.dotConst(emb, pl(band * pB + k)) >= 0, lit(1L << k)).otherwise(lit(0L))
      }.reduce(_ + _)
    val ids = e.select(col("vec_id") +:
      (0 until nBands).map(b => bandBucket(col("embedding"), b).cast("long").as(s"bb$b")): _*)
    val cand = (0 until nBands).map { b =>
      oldCappedBucketPairs(
        ids.select(col("vec_id"), col(s"bb$b").as("k")), Seq("k"), "vec_id", 256L)
    }.reduce(_ unionByName _).distinct()
    cand
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("va")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("vb")), Seq("b_id"))
      .withColumn("sim", VecFns.cosineSim(col("va"), col("vb")))
      .filter(col("sim") >= 0.42)
      .select(col("a_id"), col("b_id"))
      .orderBy("a_id", "b_id")
  }

  private[tools] def oldSimhash64(spark: SparkSession, dir: String): DataFrame = {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("hi", expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("lo", expr("CAST(conv(substring(md5(tok), 9, 8), 16, 10) AS BIGINT)"))
    val bits = toks
      .select(col("doc_id"), col("hi"), col("lo"), explode(expr("sequence(0, 31)")).as("j"))
      .select(col("doc_id"), col("j"),
        expr("(shiftright(hi, j) & 1)").as("hbit"),
        expr("(shiftright(lo, j) & 1)").as("lbit"))
      .groupBy(col("doc_id"), col("j"))
      .agg(count(lit(1)).as("cnt"), sum(col("hbit")).as("oh"), sum(col("lbit")).as("ol"))
    bits.groupBy(col("doc_id"))
      .agg(
        sum(expr("CASE WHEN 2 * oh >= cnt THEN shiftleft(CAST(1 AS BIGINT), j) ELSE 0 END")).as("sig_hi"),
        sum(expr("CASE WHEN 2 * ol >= cnt THEN shiftleft(CAST(1 AS BIGINT), j) ELSE 0 END")).as("sig_lo"))
      .orderBy("doc_id")
  }

  private def oldPdfHyperlinks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long].map(i => f"doc-$i%012d")
    val pdfExtract = ids.mapPartitions { it =>
      it.flatMap { id =>
        graft.pdf.PdfConvert.spans(id, graft.corpus.PdfGen.bytes(id))
          .map(s => (id, s.order, s.kind, s.media_ref, s.text))
      }
    }.toDF("doc_id", "ord", "kind", "media_ref", "text")
      .orderBy("doc_id", "ord")
    pdfExtract
      .filter(col("kind") === "hyperlink")
      .select(col("doc_id"), col("ord"), col("text"), col("media_ref").as("url"))
      .orderBy("doc_id", "ord")
  }

  private def oldChunkBlocks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Budget = 60
    val MinTok = 12
    val Title = graft.schema.Kinds.Title
    val Table = graft.schema.Kinds.Table
    val Algorithm = graft.schema.Kinds.Algorithm
    val spans = graft.pipeline.Extract.extractSpansUnordered(spark, dir)
      .select(col("doc_id"), col("ord").cast("int").as("ord"), col("kind"), col("text"))
      .as[(String, Int, String, String)]
    spans.groupByKey(_._1).flatMapGroups { (id: String, it: Iterator[(String, Int, String, String)]) =>
      val ss = it.toVector.sortBy(_._2)
      var chunk = 1
      var cum = 0
      val out = Vector.newBuilder[(String, Int, Int, Int)]
      ss.foreach { case (_, ord, kind, text) =>
        val toks = if (text.isEmpty) 0 else text.split(" ", -1).length
        val brk =
          ((kind == Title || kind == Table || kind == Algorithm) && cum >= MinTok) ||
            (cum + toks > Budget && cum >= MinTok)
        if (brk) { chunk += 1; cum = 0 }
        cum += toks
        out += ((id, chunk, ord, toks))
      }
      out.result()
    }.toDF("doc_id", "chunk_id", "ord", "toks")
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(min(col("ord")).as("first_ord"), max(col("ord")).as("last_ord"),
        count(lit(1)).as("n_spans"), sum(col("toks")).as("n_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  private[tools] def oldChunkLocate(spark: SparkSession, dir: String): DataFrame = {
    val spans = graft.pipeline.Extract.extractSpansUnordered(spark, dir)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans
      .withColumn("toks",
        when(col("text") === "", lit(0)).otherwise(size(split(col("text"), " "))))
      .withColumn("cum_before", sum(col("toks")).over(w) - col("toks"))
      .withColumn("chunk_id", expr("CAST(cum_before div 60 AS INT)"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(min(col("ord")).as("first_ord"), max(col("ord")).as("last_ord"),
        count(lit(1)).as("n_spans"), sum(col("toks")).as("n_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  private[tools] def oldDetIouDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.queries.Queries.dets(spark, dir)
    val a = d.select(col("doc_id"), col("page"), col("pos"), col("word"),
      col("x0"), col("y0"), col("x1"), col("y1"), col("score"))
    val b = a.select(a.columns.map(c => col(c).as("b_" + c)): _*)
    val interW = greatest(least(col("x1"), col("b_x1")) - greatest(col("x0"), col("b_x0")), lit(0.0))
    val interH = greatest(least(col("y1"), col("b_y1")) - greatest(col("y0"), col("b_y0")), lit(0.0))
    val inter = interW * interH
    val areaA = (col("x1") - col("x0")) * (col("y1") - col("y0"))
    val areaB = (col("b_x1") - col("b_x0")) * (col("b_y1") - col("b_y0"))
    val iou = inter / (areaA + areaB - inter)
    val losers = a.join(b,
      col("doc_id") === col("b_doc_id") && col("page") === col("b_page") &&
        col("pos") =!= col("b_pos") && iou > 0.9 &&
        (col("b_score") > col("score") ||
          (col("b_score") === col("score") && col("b_pos") < col("pos"))),
      "left_semi")
    a.join(losers.select(col("doc_id").as("l_doc"), col("pos").as("l_pos")),
        col("doc_id") === col("l_doc") && col("pos") === col("l_pos"), "left_anti")
      .select(col("doc_id"), col("pos"), col("word"))
      .orderBy("doc_id", "pos")
  }

  // ---- diff ----------------------------------------------------------------

  def diff(name: String, oldDf: DataFrame, newDf: DataFrame): Boolean = {
    val o = oldDf.collect().map(_.toString).sorted
    val n = newDf.collect().map(_.toString).sorted
    val same = o.sameElements(n) && oldDf.schema == newDf.schema
    println(s"  $name: old=${o.length} new=${n.length} " +
      (if (same) "IDENTICAL" else "*** MISMATCH ***"))
    if (!same) {
      o.diff(n).take(5).foreach(r => println(s"    only-old: $r"))
      n.diff(o).take(5).foreach(r => println(s"    only-new: $r"))
      if (oldDf.schema != newDf.schema) {
        println(s"    old schema: ${oldDf.schema.treeString}")
        println(s"    new schema: ${newDf.schema.treeString}")
      }
    }
    same
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var ok = true
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      println(s"== $dir ==")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      ok &= diff("shinglesFrom",
        oldShinglesFrom(docs), graft.queries.ScaleQueries.shinglesFrom(docs))
      ok &= diff("minhash_pairs_from_shingles",
        oldMinhashPairsFromShingles(oldShinglesFrom(docs).select(col("doc_id"), col("g32"))),
        graft.queries.ScaleQueries.minhashLshPairsFromShingles(
          graft.queries.ScaleQueries.shinglesFrom(docs).select(col("doc_id"), col("g32"))))
      ok &= diff("dedup_ngram_jaccard",
        oldDedupNgramJaccard(spark, dir),
        graft.queries.Queries.dedupNgramJaccard(spark, dir))
      ok &= diff("cos_neardup_pairs",
        oldCosNeardupPairs(spark, dir),
        graft.queries.ScaleQueries.cosNeardupPairs(spark, dir))
      ok &= diff("simhash64",
        oldSimhash64(spark, dir), graft.queries.ScaleQueries.simhash64(spark, dir))
      ok &= diff("pdf_hyperlinks",
        oldPdfHyperlinks(spark, dir), graft.queries.Queries.pdfHyperlinks(spark, dir))
      ok &= diff("chunk_blocks",
        oldChunkBlocks(spark, dir), graft.queries.Queries.chunkBlocks(spark, dir))
      ok &= diff("chunk_locate",
        oldChunkLocate(spark, dir), graft.queries.Queries.chunkLocate(spark, dir))
      ok &= diff("det_iou_dedup",
        oldDetIouDedup(spark, dir), graft.queries.Queries.detIouDedup(spark, dir))
    }
    println(if (ok) "ALL IDENTICAL" else "MISMATCHES FOUND")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
