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

  /** One LSH-bucket bit expression per plane, mirroring DotConst exactly. */
  private def bucketSql: String = (0 until 8).map { j =>
    s"""(CASE WHEN list_reduce(list_transform(range(0, 64),
       |  i -> v[i + 1] * ((((($j * 64 + i) * 2654435761) % 1000) / 1000.0) - 0.5)),
       |  (a, b) -> a + b) >= 0 THEN ${1 << j} ELSE 0 END)""".stripMargin
  }.mkString(" + ")

  val all: Map[String, String] = Map(
    "minhash_lsh_pairs" ->
      s"""$shinglesCte,
         |mh AS (SELECT doc_id, i, min(((17 + 13 * i) * g32 + (3 + 7 * i)) % 4294967311) AS mh
         |  FROM sh, range(0, 16) t(i) GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, (i // 4) AS band,
         |  string_agg(mh::VARCHAR, '_' ORDER BY i) AS key
         |  FROM mh GROUP BY doc_id, (i // 4))
         |SELECT a.doc_id, b.doc_id AS b_id, count(*)::BIGINT AS nbands
         |FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id ORDER BY a.doc_id, b_id""".stripMargin,

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

    "cos_neardup_pairs" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]), (p, q) -> p + q)
        |  / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (p, q) -> p + q))
        |     * sqrt(list_reduce(list_transform(b.v, x -> x * x), (p, q) -> p + q))) AS sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id FROM s WHERE sim >= 0.42 ORDER BY a_id, b_id""".stripMargin,

    "ann_lsh_buckets" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
         |SELECT vec_id, ($bucketSql)::INT AS bucket FROM e ORDER BY vec_id""".stripMargin,

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
