package graft.queries

/** DuckDB mirrors for [[ScaleQueries]]. */
object ScaleOracles {

  private val shinglesCte: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS grams
      |  FROM d WHERE len(w) >= 3),
      |sh AS (SELECT doc_id, ('0x' || substr(md5(gr), 1, 8))::BIGINT AS g32
      |  FROM (SELECT doc_id, UNNEST(grams) AS gr FROM g))""".stripMargin

  /** One LSH bit term for plane `j` with the given weight, mirroring
    * DotConst exactly. */
  private def bucketTerm(j: Int, weight: Int): String =
    s"""(CASE WHEN list_reduce(list_transform(range(0, 64),
       |  i -> v[i + 1] * ((((($j * 64 + i) * 2654435761) % 1000) / 1000.0) - 0.5)),
       |  (a, b) -> a + b) >= 0 THEN $weight ELSE 0 END)""".stripMargin

  /** 8-plane full bucket. */
  private def bucketSql: String =
    (0 until 8).map(j => bucketTerm(j, 1 << j)).mkString(" + ")

  /** 2-plane band bucket (band b covers planes 2b, 2b+1). */
  private def bandSql(b: Int): String =
    bucketTerm(2 * b, 1) + " + " + bucketTerm(2 * b + 1, 2)

  /** Cosine similarity fold between two list aliases, bit-identical to the
    * CosineSim expression's accumulation order. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b), z -> z[1] * z[2]), (p, q) -> p + q)
       | / (sqrt(list_reduce(list_transform($a, x -> x * x), (p, q) -> p + q))
       |    * sqrt(list_reduce(list_transform($b, x -> x * x), (p, q) -> p + q)))""".stripMargin

  /** Shared MinHash banding CTEs (through candidate pairs). */
  private val minhashCtes: String =
    s"""$shinglesCte,
       |mh AS (SELECT doc_id, i, min(((17 + 13 * i) * g32 + (3 + 7 * i)) % 4294967311) AS mh
       |  FROM sh, range(0, 16) t(i) GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, (i // 4) AS band,
       |  string_agg(mh::VARCHAR, '_' ORDER BY i) AS key
       |  FROM mh GROUP BY doc_id, (i // 4)),
       |cand AS (SELECT a.doc_id, b.doc_id AS b_id, count(*)::BIGINT AS nbands
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)""".stripMargin

  val all: Map[String, String] = Map(
    "minhash_lsh_pairs" ->
      s"""$minhashCtes
         |SELECT doc_id, b_id, nbands FROM cand ORDER BY doc_id, b_id""".stripMargin,

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

    // banded-LSH candidates (pairs sharing ANY 2-plane band bucket), exact
    // cosine on candidates — mirrors the banded scale shape
    "cos_neardup_pairs" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, ${(0 until 4).map(i => s"(${bandSql(i)})::INT AS bb$i").mkString(", ")} FROM e),
         |cand AS (${(0 until 4).map(i =>
        s"SELECT a.vec_id AS a_id, c.vec_id AS b_id FROM b a JOIN b c ON a.bb$i = c.bb$i AND a.vec_id < c.vec_id")
        .mkString("\n UNION \n")}),
         |s AS (SELECT a_id, b_id,
         |  list_reduce(list_transform(list_zip(ea.v, eb.v), z -> z[1] * z[2]), (p, q) -> p + q)
         |  / (sqrt(list_reduce(list_transform(ea.v, x -> x * x), (p, q) -> p + q))
         |     * sqrt(list_reduce(list_transform(eb.v, x -> x * x), (p, q) -> p + q))) AS sim
         |  FROM cand JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id)
         |SELECT a_id, b_id FROM s WHERE sim >= 0.42 ORDER BY a_id, b_id""".stripMargin,

    "ann_lsh_buckets" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
         |SELECT vec_id, ($bucketSql)::INT AS bucket FROM e ORDER BY vec_id""".stripMargin,

    // IVF inverted-list search: nearest-centroid assignment, nprobe=2
    // probe lists per query, exact cosine rank within the probed lists
    "ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
         |a1 AS (SELECT e.vec_id, c.cent_id, ${cosSql("e.v", "c.cv")} AS csim FROM e, c),
         |assign AS (SELECT vec_id, cent_id FROM (
         |  SELECT vec_id, cent_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
         |  FROM a1) WHERE rn = 1),
         |p1 AS (SELECT e.vec_id AS q_id, c.cent_id, ${cosSql("e.v", "c.cv")} AS qsim
         |  FROM e, c WHERE e.vec_id < 10),
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

    // within-bucket windowed top-k, mirroring ScaleQueries.annLshTopK: the
    // bucket expr is the DotConst mirror above, the cosine the same
    // left-to-right fold as ann_cosine_topk
    "ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, ($bucketSql)::INT AS bucket FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 10),
         |n AS (SELECT vec_id AS n_id, v AS nv, bucket FROM b WHERE vec_id >= 10),
         |s AS (SELECT q_id, n_id,
         |  list_reduce(list_transform(list_zip(qv, nv), z -> z[1] * z[2]), (p, q2) -> p + q2)
         |  / (sqrt(list_reduce(list_transform(qv, x -> x * x), (p, q2) -> p + q2))
         |     * sqrt(list_reduce(list_transform(nv, x -> x * x), (p, q2) -> p + q2))) AS sim
         |  FROM q JOIN n USING (bucket)),
         |r AS (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
         |SELECT q_id, n_id, rank::INT AS rank FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,
  )
}
