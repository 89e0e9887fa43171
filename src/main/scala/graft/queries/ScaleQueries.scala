package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VecFns

/** Scale-path similarity/dedup operators: MinHash+LSH banding, 64-bit
  * SimHash, embedding cosine near-dup and hyperplane-LSH bucketing. Like
  * [[Queries]], every arithmetic step is replayable bit-exactly in DuckDB
  * (hashes derive from md5 hex, folds are left-to-right doubles). */
object ScaleQueries {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Distinct word-3-gram shingles with a 32-bit integer hash per shingle. */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("grams", expr(
        "array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"))
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .withColumn("g32", expr("CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)"))

  /** MinHash signature (16 hashes, universal-hash family over the 32-bit
    * shingle space) -> 4 LSH bands of 4 rows -> candidate pairs sharing >=1
    * band. The scalable counterpart of the exact dedup_ngram_jaccard. */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    // all 16 minima as aggregate columns in ONE pass over the shingles —
    // no 16x row explosion, a single map-side-combinable shuffle on doc_id
    val minCols = (0 until 16).map { i =>
      min(expr(s"(${17 + 13 * i} * g32 + ${3 + 7 * i}) % 4294967311")).as(s"mh$i")
    }
    val minh = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    // 4 bands of 4 rows -> (band, key) pairs, then bucket self-join
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until 4).map(r => col(s"mh${b * 4 + r}").cast("string")): _*).as("key"))
    }
    val bands = minh
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val b2 = bands.select(col("doc_id").as("b_id"), col("band"), col("key"))
    bands.join(b2, Seq("band", "key"))
      .filter(col("doc_id") < col("b_id"))
      .groupBy(col("doc_id"), col("b_id"))
      .agg(count(lit(1)).as("nbands"))
      .orderBy("doc_id", "b_id")
  }

  /** 64-bit SimHash over distinct tokens, carried as two 32-bit halves so
    * neither side can overflow a signed 64-bit shift-accumulate. */
  def simhash64(spark: SparkSession, dir: String): DataFrame = {
    val toks = tbl(spark, dir, "documents")
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

  /** Per-band hyperplane bucket: 2 planes per band, 4 bands over the 8
    * planes — banded LSH in the MinHash-band sense (candidates = pairs
    * agreeing on ANY band's bucket). Banding is what keeps recall at a
    * permissive cosine threshold: one 8-plane bucket has (1-θ/π)^8 ≈ 3%
    * recall at θ=65°, 4 bands of 2 planes ≈ 88%; at a stricter real-world
    * near-dup threshold you widen the bands instead. */
  private def bandBucket(emb: org.apache.spark.sql.Column, band: Int): org.apache.spark.sql.Column =
    (0 until 2).map { k =>
      when(VecFns.dotConst(emb, planes(band * 2 + k)) >= 0, lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Embedding cosine near-duplicate pairs, banded-LSH-routed: candidate
    * pairs share at least one band bucket (4 equi-joins + distinct — the
    * 100-TB shape), then the exact codegen'd cosine filters candidates. A
    * bare a.join(b, a_id < b_id) is a BroadcastNestedLoop cartesian:
    * 10^6 vectors = 5*10^11 pairs; banding bounds the fan-out at
    * sum(bucket_size^2) per band. */
  def cosNeardupPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val ids = e.select(col("vec_id") +:
      (0 until 4).map(b => bandBucket(col("embedding"), b).cast("int").as(s"bb$b")): _*)
    val cand = (0 until 4).map { b =>
      ids.select(col("vec_id").as("a_id"), col(s"bb$b").as("k"))
        .join(ids.select(col("vec_id").as("b_id"), col(s"bb$b").as("k")), Seq("k"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
    }.reduce(_ unionByName _).distinct()
    cand
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("va")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("vb")), Seq("b_id"))
      .withColumn("sim", VecFns.cosineSim(col("va"), col("vb")))
      // corpus-relative threshold: the synthetic embeddings are near-
      // orthogonal (max pairwise cosine ~0.51), so "near-dup" here is the
      // far tail of the similarity distribution
      .filter(col("sim") >= 0.42)
      .select(col("a_id"), col("b_id"))
      .orderBy("a_id", "b_id")
  }

  /** Candidate pairs -> dedup GROUPS: connected components over the
    * MinHash-LSH candidate graph by alternating min-label propagation
    * (each round every node takes the min label in its closed
    * neighbourhood; converges in graph-diameter rounds, and near-dup
    * components are tiny cliques in practice). Pairs alone are not a dedup
    * decision — the keeper is the component representative (min doc_id).
    * Every document gets a row; singletons map to themselves. */
  def dedupGroups(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshPairs(spark, dir)
      .select(col("doc_id"), col("b_id")).persist()
    val edges = pairs.select(col("doc_id").as("v"), col("b_id").as("u"))
      .unionByName(pairs.select(col("b_id").as("v"), col("doc_id").as("u")))
      .persist()
    val docs = tbl(spark, dir, "documents").select(col("doc_id"))
    var labels = docs.select(col("doc_id").as("v"), col("doc_id").as("lbl")).persist()
    var iter = 0
    var changed = 1L
    // run to CONVERGENCE: min-label propagation terminates in component-
    // diameter rounds (the label sum strictly decreases every changed
    // round), while a fixed small cap would silently disagree with the
    // oracle's exact transitive closure on long candidate chains. The
    // generous bound only guards a logic regression; localCheckpoint
    // truncates the growing lineage each round.
    while (changed > 0 && iter < 10000) {
      val nbrMin = edges
        .join(labels.select(col("v").as("u"), col("lbl").as("ulbl")), Seq("u"))
        .groupBy(col("v")).agg(min(col("ulbl")).as("nbr_lbl"))
      val next = labels.join(nbrMin, Seq("v"), "left")
        .select(col("v"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      changed = next.join(labels.select(col("v"), col("lbl").as("old")), Seq("v"))
        .filter(col("lbl") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    val out = labels.select(col("v").as("doc_id"), col("lbl").as("group_id"))
      .orderBy("doc_id")
    pairs.unpersist(); edges.unpersist()
    out
  }

  /** Deterministic random-hyperplane LSH planes (8 planes x 64 dims). */
  def planes: Array[Array[Double]] = Array.tabulate(8) { j =>
    Array.tabulate(64) { i =>
      (((j * 64 + i) * 2654435761L) % 1000) / 1000.0 - 0.5
    }
  }

  /** Hyperplane-LSH bucket id per embedding — the scale path for ANN: a
    * 256-way bucketing turns the brute-force O(n^2) into per-bucket search.
    * DotConst embeds the plane as a codegen reference array. */
  def annLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      when(VecFns.dotConst(col("embedding"), p) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    e.select(col("vec_id"), bucket.cast("int").as("bucket"))
      .orderBy("vec_id")
  }

  /** IVF-style ANN top-k — the coarse-quantizer scale path (inverted
    * lists): 8 centroid vectors partition the corpus by nearest-centroid
    * assignment (the inverted lists); each query probes its nprobe=2
    * nearest lists and ranks candidates by exact cosine. At corpus scale
    * the assignment is ONE broadcast-join pass and the search touches
    * ~nprobe/K of the data; centroids would come from a k-means fit — here
    * they are the first 8 vectors, deterministically. */
  def annIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    // inverted lists: every vector assigned to its nearest centroid
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cent_id"))
    val assign = e.select(col("vec_id"), col("embedding"))
      .join(broadcast(cents))
      .withColumn("csim", VecFns.cosineSim(col("embedding"), col("cv")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("cent_id"))
    // each query probes its 2 nearest centroid lists
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("qsim").desc, col("cent_id"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .join(broadcast(cents))
      .withColumn("qsim", VecFns.cosineSim(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 2)
      .select(col("q_id"), col("qv"), col("cent_id"))
    val cands = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("nv"))
      .join(assign.withColumnRenamed("vec_id", "n_id"), Seq("n_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    broadcast(probes).join(cands, Seq("cent_id"))
      .withColumn("sim", VecFns.cosineSim(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("n_id"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** LSH-accelerated cosine top-k: rank only within the query's bucket
    * (plus no candidates -> absent). Rows-only check (recall depends on
    * bucketing); the exact baseline is ann_cosine_topk. */
  def annLshTopK(spark: SparkSession, dir: String): DataFrame = {
    val withBucket = annLshBuckets(spark, dir)
    val e = tbl(spark, dir, "embeddings").join(withBucket, "vec_id")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("bucket"))
    val n = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("nv"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    broadcast(q).join(n, "bucket")
      .withColumn("sim", VecFns.cosineSim(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("n_id"), col("rank"))
      .orderBy("q_id", "rank")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "minhash_lsh_pairs" -> minhashLshPairs _,
    "simhash64" -> simhash64 _,
    "cos_neardup_pairs" -> cosNeardupPairs _,
    "dedup_groups" -> dedupGroups _,
    "ann_ivf_topk" -> annIvfTopK _,
    "ann_lsh_buckets" -> annLshBuckets _,
    "ann_lsh_topk" -> annLshTopK _,
  )
}
