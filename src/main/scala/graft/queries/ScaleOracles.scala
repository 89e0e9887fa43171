package graft.queries

/** DuckDB mirrors for [[ScaleQueries]].
  *
  * The corpus-sized LSH constants are recomputed IN SQL from the same
  * integer-exact formulas (`length(bin(m-1))` = bit length, never floating
  * log2), so the oracle exercises the sizing rule itself: a drift between
  * [[ScaleQueries.lshPlanesPerBand]] and the SQL replica fails the value
  * compare at any scale factor. */
object ScaleOracles {

  private val shinglesCte: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS grams
      |  FROM d WHERE len(w) >= 3),
      |sh AS (SELECT doc_id, ('0x' || substr(md5(gr), 1, 8))::BIGINT AS g32
      |  FROM (SELECT doc_id, UNNEST(grams) AS gr FROM g))""".stripMargin

  /** planes-per-band from the embeddings count — the SQL replica of
    * lshPlanesPerBand (TargetBucketPop = 32): m = ceil(n/32),
    * p = max(2, bit_length(m-1)). */
  private val parCte: String =
    """par AS (SELECT CASE WHEN m <= 1 THEN 2
      |  ELSE greatest(2, length(bin(m - 1))) END::INT AS p
      |  FROM (SELECT ((count(*) + 31) // 32) AS m FROM embeddings))""".stripMargin

  /** Hyperplane table: plane j, 64 weights (the planesFor formula). */
  private val planeCte: String =
    """pl AS (SELECT j, list_transform(range(0, 64),
      |  i -> (((((j * 64 + i) * 2654435761) % 1000) / 1000.0) - 0.5)) AS w
      |  FROM range(0, 512) t(j))""".stripMargin

  /** Cosine similarity fold between two list aliases, bit-identical to the
    * CosineSim expression's accumulation order. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b), z -> z[1] * z[2]), (f1, f2) -> f1 + f2)
       | / (sqrt(list_reduce(list_transform($a, x -> x * x), (f1, f2) -> f1 + f2))
       |    * sqrt(list_reduce(list_transform($b, x -> x * x), (f1, f2) -> f1 + f2)))""".stripMargin

  /** Shared MinHash banding CTEs through CAPPED candidate pairs: buckets at
    * or under the cap expand all-pairs, over-cap buckets emit star pairs to
    * the bucket minimum (ScaleQueries.cappedBucketPairs, cap = 64). */
  private val minhashCtes: String =
    s"""$shinglesCte,
       |mh AS (SELECT doc_id, i, min(((17 + 13 * i) * g32 + (3 + 7 * i)) % 4294967311) AS mh
       |  FROM sh, range(0, 16) t(i) GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, (i // 4) AS band,
       |  string_agg(mh::VARCHAR, '_' ORDER BY i) AS key
       |  FROM mh GROUP BY doc_id, (i // 4)),
       |st AS (SELECT doc_id, band, key,
       |  count(*) OVER (PARTITION BY band, key) AS cnt,
       |  min(doc_id) OVER (PARTITION BY band, key) AS mn FROM bands),
       |raw AS (SELECT a.doc_id, b.doc_id AS b_id
       |  FROM st a JOIN st b ON a.band = b.band AND a.key = b.key
       |    AND a.doc_id < b.doc_id WHERE a.cnt <= 64
       |  UNION ALL
       |  SELECT mn AS doc_id, doc_id AS b_id FROM st WHERE cnt > 64 AND doc_id > mn),
       |cand AS (SELECT doc_id, b_id, count(*)::BIGINT AS nbands
       |  FROM raw GROUP BY doc_id, b_id)""".stripMargin

  /** Band buckets (band = j // p, bit = j % p) over the sized plane count,
    * with the capped pair expansion (cap = 256). */
  private val cosCandCtes: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |$parCte,
       |$planeCte,
       |dots AS (SELECT e.vec_id, pl.j,
       |  list_reduce(list_transform(range(0, 64), i -> e.v[i + 1] * pl.w[i + 1]), (a, b) -> a + b) AS d
       |  FROM e, pl, par WHERE pl.j < 4 * par.p),
       |bk AS (SELECT vec_id, (j // p) AS band,
       |  sum(CASE WHEN d >= 0 THEN (1::BIGINT << (j % p)) ELSE 0 END)::BIGINT AS key
       |  FROM dots, par GROUP BY vec_id, (j // p)),
       |bst AS (SELECT vec_id, band, key,
       |  count(*) OVER (PARTITION BY band, key) AS cnt,
       |  min(vec_id) OVER (PARTITION BY band, key) AS mn FROM bk),
       |cand AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM bst a JOIN bst b ON a.band = b.band AND a.key = b.key
       |    AND a.vec_id < b.vec_id WHERE a.cnt <= 256
       |  UNION
       |  SELECT mn AS a_id, vec_id AS b_id FROM bst WHERE cnt > 256 AND vec_id > mn)""".stripMargin

  /** Full-width ANN bucket bits = max(8, p) over the sized plane count. */
  private val annBucketCtes: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |$parCte,
       |$planeCte,
       |nb AS (SELECT greatest(8, p)::INT AS bits FROM par),
       |dots AS (SELECT e.vec_id, pl.j,
       |  list_reduce(list_transform(range(0, 64), i -> e.v[i + 1] * pl.w[i + 1]), (a, b) -> a + b) AS d
       |  FROM e, pl, nb WHERE pl.j < nb.bits),
       |buck AS (SELECT vec_id,
       |  sum(CASE WHEN d >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
       |  FROM dots GROUP BY vec_id)""".stripMargin

  val all: Map[String, String] = Map(
    "minhash_lsh_pairs" ->
      s"""$minhashCtes
         |SELECT doc_id, b_id, nbands FROM cand ORDER BY doc_id, b_id""".stripMargin,

    // exact-Jaccard verification of the capped candidates: shared-shingle
    // count per pair on the 8-byte shingle hash, integer threshold test
    // 3*inter >= |A|+|B|  <=>  Jaccard >= 1/2
    "minhash_verify" ->
      s"""$minhashCtes,
         |sz AS (SELECT doc_id, count(*)::BIGINT AS nsh FROM sh GROUP BY doc_id),
         |iv AS (SELECT c.doc_id AS a_id, c.b_id, count(*)::BIGINT AS inter
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.doc_id
         |  JOIN sh sb ON sb.doc_id = c.b_id AND sb.g32 = sa.g32
         |  GROUP BY c.doc_id, c.b_id)
         |SELECT a_id AS doc_id, b_id, inter,
         |  (za.nsh + zb.nsh - inter)::BIGINT AS uni
         |FROM iv JOIN sz za ON za.doc_id = a_id JOIN sz zb ON zb.doc_id = b_id
         |WHERE 3 * inter >= za.nsh + zb.nsh
         |ORDER BY doc_id, b_id""".stripMargin,

    // connected components over the candidate graph: transitive closure by
    // recursive CTE (small candidate graph), min-reachable-id per node;
    // singletons map to themselves
    "dedup_groups" ->
      s"""WITH RECURSIVE ${minhashCtes.stripPrefix("WITH ")},
         |e AS (SELECT doc_id AS v, b_id AS u FROM cand
         |      UNION SELECT b_id, doc_id FROM cand),
         |reach AS (SELECT v, u FROM e
         |          UNION SELECT reach.v, e.u FROM reach JOIN e ON reach.u = e.v),
         |m AS (SELECT v, min(u) AS mn FROM reach GROUP BY v)
         |SELECT d.doc_id, least(d.doc_id, coalesce(m.mn, d.doc_id))::BIGINT AS group_id
         |FROM documents d LEFT JOIN m ON m.v = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "dedup_keep" ->
      s"""WITH RECURSIVE ${minhashCtes.stripPrefix("WITH ")},
         |e AS (SELECT doc_id AS v, b_id AS u FROM cand
         |      UNION SELECT b_id, doc_id FROM cand),
         |reach AS (SELECT v, u FROM e
         |          UNION SELECT reach.v, e.u FROM reach JOIN e ON reach.u = e.v),
         |m AS (SELECT v, min(u) AS mn FROM reach GROUP BY v),
         |grp AS (SELECT d.doc_id, least(d.doc_id, coalesce(m.mn, d.doc_id))::BIGINT AS group_id
         |      FROM documents d LEFT JOIN m ON m.v = d.doc_id)
         |SELECT doc_id, group_id,
         |  (CASE WHEN doc_id = group_id THEN 1 ELSE 0 END)::INT AS keep
         |FROM grp ORDER BY doc_id""".stripMargin,

    // the materialized chain's final table must equal the same transitive
    // closure dedup_keep's oracle computes — one SQL, two Spark paths
    "dedup_pipeline" ->
      s"""WITH RECURSIVE ${minhashCtes.stripPrefix("WITH ")},
         |e AS (SELECT doc_id AS v, b_id AS u FROM cand
         |      UNION SELECT b_id, doc_id FROM cand),
         |reach AS (SELECT v, u FROM e
         |          UNION SELECT reach.v, e.u FROM reach JOIN e ON reach.u = e.v),
         |m AS (SELECT v, min(u) AS mn FROM reach GROUP BY v),
         |grp AS (SELECT d.doc_id, least(d.doc_id, coalesce(m.mn, d.doc_id))::BIGINT AS group_id
         |      FROM documents d LEFT JOIN m ON m.v = d.doc_id)
         |SELECT doc_id, group_id,
         |  (CASE WHEN doc_id = group_id THEN 1 ELSE 0 END)::INT AS keep
         |FROM grp ORDER BY doc_id""".stripMargin,

    "simhash64" ->
      """WITH toks AS (SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
        |  ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo FROM toks),
        |bits AS (SELECT doc_id, j, count(*) AS cnt,
        |  sum((hi >> j) & 1) AS oh, sum((lo >> j) & 1) AS ol
        |  FROM h, range(0, 32) t(j) GROUP BY doc_id, j)
        |SELECT doc_id,
        |  sum(CASE WHEN 2 * oh >= cnt THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS sig_hi,
        |  sum(CASE WHEN 2 * ol >= cnt THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS sig_lo
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // banded-LSH candidates over corpus-sized bands (capped), exact cosine
    // on candidates — mirrors the banded scale shape
    "cos_neardup_pairs" ->
      s"""$cosCandCtes,
         |s AS (SELECT a_id, b_id, ${cosSql("ea.v", "eb.v")} AS sim
         |  FROM cand JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id)
         |SELECT a_id, b_id FROM s WHERE sim >= 0.42 ORDER BY a_id, b_id""".stripMargin,

    "ann_lsh_buckets" ->
      s"""$annBucketCtes
         |SELECT vec_id, bucket FROM buck ORDER BY vec_id""".stripMargin,

    // IVF inverted-list search with K = max(8, floor(sqrt(n-1)) + 1)
    // centroids refined by one deterministic k-means pass over
    // floor(x*1000) integer quanta (order-free integer sums -> the refined
    // centroids are bit-identical to the Spark side), nprobe=2 probe lists
    // per query, exact cosine rank within the probed lists
    "ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |kpar AS (SELECT greatest(8, floor(sqrt(count(*) - 1))::INT + 1) AS k FROM e),
         |seeds AS (SELECT vec_id AS cent_id, v AS cv FROM e, kpar WHERE vec_id < kpar.k),
         |a0 AS (SELECT e.vec_id, s.cent_id, ${cosSql("e.v", "s.cv")} AS csim FROM e, seeds s),
         |as0 AS (SELECT vec_id, cent_id FROM (
         |  SELECT vec_id, cent_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
         |  FROM a0) WHERE rn = 1),
         |qd AS (SELECT a.cent_id, t.i AS dim,
         |    sum(floor(e.v[t.i + 1] * 1000)::BIGINT)::BIGINT AS s, count(*)::BIGINT AS c
         |  FROM e JOIN as0 a USING (vec_id), range(0, 64) t(i)
         |  GROUP BY a.cent_id, t.i),
         |cents AS (SELECT cent_id, list((s::DOUBLE / c) / 1000.0 ORDER BY dim) AS cv
         |  FROM qd GROUP BY cent_id),
         |a1 AS (SELECT e.vec_id, c.cent_id, ${cosSql("e.v", "c.cv")} AS csim FROM e, cents c),
         |assign AS (SELECT vec_id, cent_id FROM (
         |  SELECT vec_id, cent_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
         |  FROM a1) WHERE rn = 1),
         |p1 AS (SELECT e.vec_id AS q_id, c.cent_id, ${cosSql("e.v", "c.cv")} AS qsim
         |  FROM e, cents c WHERE e.vec_id < 10),
         |probes AS (SELECT q_id, cent_id FROM (
         |  SELECT q_id, cent_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY qsim DESC, cent_id) AS rn
         |  FROM p1) WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.vec_id AS n_id FROM probes p
         |  JOIN assign a ON a.cent_id = p.cent_id WHERE a.vec_id >= 10),
         |s AS (SELECT q_id, n_id, ${cosSql("eq.v", "en.v")} AS sim FROM cand
         |  JOIN e eq ON eq.vec_id = q_id JOIN e en ON en.vec_id = n_id),
         |r AS (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
         |SELECT q_id, n_id, rank::INT AS rank FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // within-bucket windowed top-k, mirroring ScaleQueries.annLshTopK over
    // the corpus-sized bucket bits
    "ann_lsh_topk" ->
      s"""$annBucketCtes,
         |eb AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buck b USING (vec_id)),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM eb WHERE vec_id < 10),
         |n AS (SELECT vec_id AS n_id, v AS nv, bucket FROM eb WHERE vec_id >= 10),
         |s AS (SELECT q_id, n_id, ${cosSql("qv", "nv")} AS sim
         |  FROM q JOIN n USING (bucket)),
         |r AS (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
         |SELECT q_id, n_id, rank::INT AS rank FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,
  )
}
