package graft

/** DuckDB oracle SQL for each oracle-expressible query in [[Queries]].
  * Column aliases match the Spark side exactly (the driver sorts columns
  * by name and hashes values). Queries whose semantics rely on
  * Spark-specific hashes (xxhash64-based MinHash/SimHash/LSH signatures,
  * fingerprints) have no SQL equivalent and are deliberately absent →
  * rows-only check.
  */
object Oracles {

  /** Words as a SQL list literal, with `''` doubling — a word
    * containing an apostrophe (don't, it's) must not terminate the
    * string literal early. */
  private[graft] def sqlStringList(ws: Seq[String]): String =
    ws.map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")

  /** Shared CTE prefix replicating [[graft.operators.SimilarityOps
    * .kmeansTrain]] (cells = 16, iters = 2) in DuckDB: deterministic
    * first-16-by-id init (cb0), then two unrolled Lloyd rounds — argmax
    * cosine assignment (ties → smaller cell) and per-(cell, dim) means
    * rounded to 6 dp with -0.0 normalized, exactly as the Spark side
    * rounds between iterations. A cell that loses all members carries
    * its previous centroid (the UNION ALL arms). Ends at `cb2`, the
    * trained codebook q40/q88/q101 consume. */
  private val lloyd2cb16: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
      |  FROM embeddings),
      |cb0 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
      |      AS cell,
      |    CAST(embedding AS DOUBLE[]) AS cv
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
      |asn0 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT v.vec_id, cb0.cell, row_number() OVER (
      |      PARTITION BY v.vec_id
      |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
      |    FROM v CROSS JOIN cb0) WHERE rn = 1),
      |mm0 AS (
      |  SELECT cell, dim, round(avg(x), 6) + 0 AS mx FROM (
      |    SELECT asn0.cell,
      |      CAST(generate_subscripts(v.vv, 1) - 1 AS INT) AS dim,
      |      unnest(v.vv) AS x
      |    FROM asn0 JOIN v USING (vec_id))
      |  GROUP BY cell, dim),
      |cb1 AS (
      |  SELECT cell, list(mx ORDER BY dim) AS cv FROM mm0 GROUP BY cell
      |  UNION ALL
      |  SELECT cell, cv FROM cb0
      |  WHERE cell NOT IN (SELECT cell FROM mm0)),
      |asn1 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT v.vec_id, cb1.cell, row_number() OVER (
      |      PARTITION BY v.vec_id
      |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
      |    FROM v CROSS JOIN cb1) WHERE rn = 1),
      |mm1 AS (
      |  SELECT cell, dim, round(avg(x), 6) + 0 AS mx FROM (
      |    SELECT asn1.cell,
      |      CAST(generate_subscripts(v.vv, 1) - 1 AS INT) AS dim,
      |      unnest(v.vv) AS x
      |    FROM asn1 JOIN v USING (vec_id))
      |  GROUP BY cell, dim),
      |cb2 AS (
      |  SELECT cell, list(mx ORDER BY dim) AS cv FROM mm1 GROUP BY cell
      |  UNION ALL
      |  SELECT cell, cv FROM cb1
      |  WHERE cell NOT IN (SELECT cell FROM mm1))""".stripMargin

  /** Per-document (doc_id, quality, n_tokens) — the DuckDB mirror of
    * TextFunctions.qualityScore (4 dp) + whitespace tokenCount, shared
    * by the selection oracles (q107). */
  private val docQualityTokens: String =
    """doc AS (
      |  SELECT doc_id,
      |    round(
      |      (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
      |       * (1.0 - least(
      |           (CAST(len(regexp_extract_all(text, '[[:punct:]]'))
      |              AS DOUBLE)
      |            / greatest(CAST(length(text) AS DOUBLE), 1.0))
      |           * 4.0, 1.0) * 0.5))
      |      * sqrt(
      |          CAST(len(list_distinct(CASE WHEN trim(text) = ''
      |            THEN [] ELSE string_split_regex(
      |              trim(lower(text)), '\s+') END)) AS DOUBLE)
      |          / greatest(CAST(CASE WHEN trim(text) = '' THEN 0
      |            ELSE len(string_split_regex(trim(text), '\s+'))
      |            END AS DOUBLE), 1.0)), 4) AS quality,
      |    CAST(CASE WHEN trim(text) = '' THEN 0
      |      ELSE len(string_split_regex(trim(text), '\s+'))
      |      END AS BIGINT) AS n_tokens
      |  FROM documents)""".stripMargin

  /** Winnowing pipeline (q109/q110): per-token md5 values, Karp-Rabin
    * 3-gram polynomial mod the 31-bit prime, distinct window-4 minima
    * — bit-for-bit the arithmetic of operators.Winnowing. Ends at
    * `fp(doc_id, fp)`. */
  private val winnowFp: String =
    """WITH v AS (
      |  SELECT doc_id, list_transform(CASE WHEN trim(text) = '' THEN []
      |    ELSE string_split_regex(trim(lower(text)), '\s+') END,
      |    t -> CAST(concat('0x', substring(md5(t), 1, 8)) AS BIGINT)
      |      % 2147483587) AS tv
      |  FROM documents),
      |kh AS (
      |  SELECT doc_id, CASE WHEN len(tv) < 3 THEN []
      |    ELSE list_transform(range(1, len(tv) - 1),
      |      i -> (tv[i]*131*131 + tv[i+1]*131 + tv[i+2]) % 2147483587)
      |    END AS kh
      |  FROM v),
      |fp AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(kh) - 4, 0) + 2),
      |    j -> list_min(kh[j:j+3])))) AS fp
      |  FROM kh WHERE len(kh) > 0)""".stripMargin

  /** Unrolled BPE merge training (q111/q112): `steps` iterations of
    * weighted pair counting over the word vocab, deterministic argmax
    * (count desc, pair asc), and boundary-spaced replace — the same
    * left-to-right non-overlapping merge the Spark side applies.
    * Returns the WITH-chain up to vN; callers append their final
    * SELECT over tN (merge rows) or vN (the trained vocab). */
  private def bpeChain(steps: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH v0 AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS n,
      |    ' ' || regexp_replace(word, '(.)', '\1  ', 'g') || '</w> '
      |      AS sym
      |  FROM (SELECT unnest(CASE WHEN trim(text) = '' THEN []
      |      ELSE string_split_regex(trim(lower(text)), '\s+') END)
      |      AS word FROM documents)
      |  GROUP BY word)""".stripMargin
    for (s <- 1 to steps) {
      sb ++= s""",
      |p$s AS (
      |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(n) AS BIGINT) AS cnt
      |  FROM (SELECT n, unnest(list_transform(range(1, len(sy)),
      |      i -> [sy[i], sy[i+1]])) AS pr
      |    FROM (SELECT n, string_split_regex(trim(sym), ' +') AS sy
      |      FROM v${s - 1}))
      |  GROUP BY 1, 2),
      |t$s AS (SELECT l, r, cnt FROM p$s ORDER BY cnt DESC, l, r
      |  LIMIT 1),
      |v$s AS (
      |  SELECT word, n,
      |    replace(sym, ' '||l||'  '||r||' ', ' '||l||r||' ') AS sym
      |  FROM v${s - 1} CROSS JOIN t$s)""".stripMargin
    }
    sb.result()
  }

  /** PQ oracle (q115): per subspace j — init codebook from the first
    * `cells` vectors' slices, one L2 Lloyd round (argmin ties → smaller
    * cell, means rounded 6 dp, empty cells carry), then final codes +
    * per-subspace min distances; recon_mse averages over all dims.
    * Mirrors [[graft.operators.SimilarityOps.pqEncode]] exactly. */
  private def pqD2(sub: Int)(sv: String, cv: String): String =
    s"list_sum(list_transform(range(1, ${sub + 1}), " +
      s"i -> ($sv[i]-$cv[i])*($sv[i]-$cv[i])))"

  /** The per-subspace CTE chain shared by the PQ oracles (assumes a
    * `v(vec_id, vv)` CTE is already in scope): init codebook c{j}_0,
    * one L2 Lloyd round (a{j}, m{j}, c{j}_1), final codes + min
    * distances f{j}. */
  private def pqChainsBody(m: Int, sub: Int, cells: Int): String = {
    val d2 = pqD2(sub) _
    val chains = (0 until m).map { j =>
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      s"""s$j AS (SELECT vec_id, vv[$lo:$hi] AS sv FROM v),
        |c${j}_0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |      AS cell,
        |    (CAST(embedding AS DOUBLE[]))[$lo:$hi] AS cv
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id
        |    LIMIT $cells)),
        |a$j AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY d2, cell) AS rn
        |    FROM (SELECT s$j.vec_id, c${j}_0.cell,
        |        ${d2(s"s$j.sv", s"c${j}_0.cv")} AS d2
        |      FROM s$j CROSS JOIN c${j}_0)) WHERE rn = 1),
        |m$j AS (
        |  SELECT cell, dim, round(avg(x), 6) + 0 AS mx FROM (
        |    SELECT a$j.cell,
        |      CAST(generate_subscripts(s$j.sv, 1) - 1 AS INT) AS dim,
        |      unnest(s$j.sv) AS x
        |    FROM a$j JOIN s$j USING (vec_id))
        |  GROUP BY cell, dim),
        |c${j}_1 AS (
        |  SELECT cell, list(mx ORDER BY dim) AS cv FROM m$j
        |  GROUP BY cell
        |  UNION ALL
        |  SELECT cell, cv FROM c${j}_0
        |  WHERE cell NOT IN (SELECT cell FROM m$j)),
        |f$j AS (
        |  SELECT vec_id, cell AS code_$j, d2 FROM (
        |    SELECT vec_id, cell, d2, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY d2, cell) AS rn
        |    FROM (SELECT s$j.vec_id, c${j}_1.cell,
        |        ${d2(s"s$j.sv", s"c${j}_1.cv")} AS d2
        |      FROM s$j CROSS JOIN c${j}_1)) WHERE rn = 1)"""
        .stripMargin
    }
    chains.mkString(",\n")
  }

  private def pqChainsSql(m: Int, sub: Int, cells: Int): String =
    s"""WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
      |  FROM embeddings),
      |${pqChainsBody(m, sub, cells)}""".stripMargin

  private def pqEncodeSql(m: Int, sub: Int, cells: Int): String = {
    val dim = m * sub
    val joins = (1 until m)
      .map(j => s"JOIN f$j USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(j => s"code_$j").mkString(", ")
    val mseSum = (0 until m).map(j => s"f$j.d2").mkString(" + ")
    s"""${pqChainsSql(m, sub, cells)}
      |SELECT vec_id, $codeCols,
      |  round(($mseSum) / $dim, 8) + 0 AS recon_mse
      |FROM f0 $joins ORDER BY vec_id""".stripMargin
  }

  /** PQ-ADC top-k (q116): every corpus vector is represented by its m
    * codes only; distance = Σ_j L2²(query slice j, centroid(code_j)),
    * ranked (distance asc, neighbor asc) per query. */
  private def pqAdcSql(m: Int, sub: Int, cells: Int, k: Int,
      nQueries: Int): String = {
    val d2 = pqD2(sub) _
    val codeJoins = (1 until m)
      .map(j => s"JOIN f$j USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(j => s"code_$j").mkString(", ")
    val cbJoins = (0 until m)
      .map(j => s"JOIN c${j}_1 b$j ON b$j.cell = cd.code_$j")
      .mkString(" ")
    val adSum = (0 until m).map { j =>
      val off = j * sub
      d2(s"(q.vv[${off + 1}:${off + sub}])", s"b$j.cv")
    }.mkString(" + ")
    s"""${pqChainsSql(m, sub, cells)},
      |codes AS (
      |  SELECT f0.vec_id, $codeCols FROM f0 $codeJoins),
      |qv AS (SELECT vec_id AS query_id, vv FROM v
      |  WHERE vec_id < $nQueries),
      |scored AS (
      |  SELECT q.query_id, cd.vec_id AS neighbor_id, $adSum AS ad
      |  FROM qv q CROSS JOIN codes cd $cbJoins
      |  WHERE cd.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, round(ad, 8) + 0 AS adc_d2,
      |  CAST(rn AS INT) AS rn
      |FROM (SELECT query_id, neighbor_id, ad, row_number() OVER (
      |    PARTITION BY query_id ORDER BY ad, neighbor_id) AS rn
      |  FROM scored)
      |WHERE rn <= $k ORDER BY query_id, rn""".stripMargin
  }

  /** Per-doc BPE token counts under the `steps`-merge vocab: appends
    * CTEs ending in `nt(doc_id, n_tokens)` — the length table the
    * packing oracles (q63/q122) consume. Token-less docs count 0. */
  private def bpeCountChain(steps: Int): String =
    bpeChain(steps) + s""",
      |enc AS (
      |  SELECT word,
      |    CAST(len(string_split_regex(trim(sym), ' +')) AS BIGINT)
      |      AS nsym
      |  FROM v$steps),
      |dw AS (
      |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
      |      ELSE string_split_regex(trim(lower(text)), '\\s+') END)
      |    AS word FROM documents),
      |pd AS (
      |  SELECT dw.doc_id, CAST(sum(e.nsym) AS BIGINT) AS nbpe
      |  FROM dw JOIN enc e USING (word) GROUP BY dw.doc_id),
      |nt AS (
      |  SELECT d.doc_id, coalesce(pd.nbpe, 0) AS n_tokens
      |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)"""
      .stripMargin

  /** BPE token-id sequences (q125): symbol ids are sorted-symbol ranks
    * over the post-merge vocab's distinct symbols; each doc's sequence
    * splices its words' id runs in document order. */
  private def bpeTokenIds(steps: Int): String =
    bpeChain(steps) + s""",
      |syms AS (
      |  SELECT DISTINCT unnest(string_split_regex(trim(sym), ' +'))
      |    AS s FROM v$steps),
      |ids AS (
      |  SELECT s, CAST(row_number() OVER (ORDER BY s) - 1 AS INT)
      |    AS sid FROM syms),
      |wsym AS (
      |  SELECT word, generate_subscripts(sy, 1) AS si, unnest(sy) AS s
      |  FROM (SELECT word, string_split_regex(trim(sym), ' +') AS sy
      |    FROM v$steps)),
      |wids AS (
      |  SELECT word, list(sid ORDER BY si) AS ids
      |  FROM wsym JOIN ids USING (s) GROUP BY word),
      |dw AS (
      |  SELECT doc_id, generate_subscripts(ws, 1) AS pos,
      |    unnest(ws) AS word
      |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
      |      ELSE string_split_regex(trim(lower(text)), '\\s+') END
      |      AS ws FROM documents)),
      |seqs AS (
      |  SELECT dw.doc_id, flatten(list(w.ids ORDER BY dw.pos))
      |    AS token_ids
      |  FROM dw JOIN wids w USING (word) GROUP BY dw.doc_id)
      |SELECT d.doc_id,
      |  coalesce(array_to_string(s2.token_ids, ','), '')
      |    AS token_ids_csv,
      |  CAST(coalesce(len(s2.token_ids), 0) AS BIGINT)
      |    AS n_bpe_tokens
      |FROM documents d LEFT JOIN seqs s2 ON d.doc_id = s2.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Unigram-tokenizer vocabulary CTE chain (q176/q177): weighted
    * substring candidates over the distinct-word table, top-40 by
    * (count, piece), single-char closure, and the kept-set total the
    * scaled-int ln scores normalize by. */
  private val unigramVocabBody: String =
    """w AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT unnest(CASE WHEN trim(text) = '' THEN []
      |        ELSE string_split_regex(trim(lower(text)), '\s+') END)
      |      AS word FROM documents)
      |  GROUP BY word),
      |cand AS (
      |  SELECT substr(word, CAST(s + 1 AS INT), CAST(l AS INT))
      |      AS piece,
      |    CAST(sum(n) AS BIGINT) AS cnt
      |  FROM w,
      |    LATERAL unnest(range(0, len(word))) AS t(s),
      |    LATERAL unnest(range(1, 5)) AS u(l)
      |  WHERE s + l <= len(word)
      |  GROUP BY 1),
      |top AS (
      |  SELECT piece, cnt FROM cand
      |  ORDER BY cnt DESC, piece LIMIT 40),
      |vocab0 AS (
      |  SELECT DISTINCT piece, cnt FROM (
      |    SELECT * FROM top
      |    UNION ALL
      |    SELECT piece, cnt FROM cand WHERE len(piece) = 1)),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM vocab0)"""
      .stripMargin

  private val unigramVocabCtes: String =
    "WITH " + unigramVocabBody + "\n"

  private def bpeMerges(steps: Int): String =
    bpeChain(steps) + (1 to steps).map(s =>
        s"SELECT $s AS step, l AS lhs, r AS rhs, cnt AS pair_count " +
          s"FROM t$s")
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY step")

  private def bpeEncode(steps: Int): String =
    bpeChain(steps) + s""",
      |enc AS (
      |  SELECT word, n,
      |    CAST(len(string_split_regex(trim(sym), ' +')) AS BIGINT)
      |      AS nsym
      |  FROM v$steps),
      |dw AS (
      |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
      |      ELSE string_split_regex(trim(lower(text)), '\\s+') END)
      |    AS word FROM documents),
      |pd AS (
      |  SELECT dw.doc_id, CAST(sum(e.nsym) AS BIGINT) AS n_bpe_tokens,
      |    CAST(count(*) AS BIGINT) AS n_words
      |  FROM dw JOIN enc e USING (word) GROUP BY dw.doc_id)
      |SELECT d.doc_id,
      |  coalesce(pd.n_bpe_tokens, 0) AS n_bpe_tokens,
      |  coalesce(pd.n_words, 0) AS n_words,
      |  round(CAST(length(d.text) AS DOUBLE)
      |    / greatest(coalesce(pd.n_bpe_tokens, 0), 1), 4)
      |    AS chars_per_token
      |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** BM25 CTE chain (no leading WITH, no final SELECT): postings
    * stats + 1e-6-scaled integer contribution sums, ending at `ranked`
    * (query_id, doc_id, score, rn over ALL matched docs). `qrawSql` is
    * a CTE body producing (query_id BIGINT, token) — the tokenized
    * query set. */
  private def bm25Ctes(qrawSql: String,
      corpusSql: String = "SELECT doc_id, text FROM documents")
      : String =
      s"""corpus AS ($corpusSql),
        |toks AS (
        |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\\s+') END)
        |    AS token
        |  FROM corpus),
        |tf AS (SELECT doc_id, token, count(*) AS tf
        |  FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs,
        |  avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
        |qraw AS ($qrawSql),
        |qterms AS (SELECT DISTINCT query_id, token FROM qraw),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    sum(CAST(round(
        |      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |      * CAST(tf AS DOUBLE) * (1.2 + 1.0)
        |      / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |      * 1000000.0) AS BIGINT)) AS score_s
        |  FROM tf
        |  JOIN qterms qt USING (token)
        |  JOIN dfreq USING (token)
        |  JOIN dl USING (doc_id)
        |  CROSS JOIN stats
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id,
        |    round(CAST(score_s AS DOUBLE) / 1000000.0, 4) AS score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_s DESC, doc_id) AS INTEGER) AS rn
        |  FROM scored)""".stripMargin

  /** Corpus-derived query set shared by q141/q142: first 8 tokens of
    * docs 0-2; the source doc is the known positive (pos_id ==
    * query_id). */
  private val bm25DerivedQueries: String =
    """SELECT query_id, unnest(CASE WHEN qtext = '' THEN []
      |    ELSE string_split_regex(qtext, '\s+') END) AS token
      |  FROM (SELECT doc_id AS query_id,
      |      array_to_string((CASE WHEN trim(text) = '' THEN []
      |        ELSE string_split_regex(trim(lower(text)), '\s+')
      |        END)[1:8], ' ') AS qtext
      |    FROM documents WHERE doc_id < 3)""".stripMargin

  private val bm25LiteralQueries: String =
    """SELECT CAST(query_id AS BIGINT) AS query_id,
      |    unnest(string_split_regex(trim(lower(qtext)), '\s+'))
      |      AS token
      |  FROM (VALUES (0, 'hash join table'), (1, 'window agg scan'),
      |    (2, 'fast merge batch')) AS q(query_id, qtext)""".stripMargin

  private val bm25FullCorpus: String =
    "WITH " + bm25Ctes(bm25LiteralQueries) + """
      |SELECT query_id, doc_id, score, rn FROM ranked
      |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin


  /** Hybrid-retrieval CTE chain shared by q146/q154: the full BM25
    * chain (bm25Ctes over the derived queries) + the dense hashed-
    * vector side reusing the same toks/tf/dfreq postings + 1/(60+rank)
    * RRF fusion. Ends at `hout(query_id, doc_id, rrf, rank_sparse,
    * rank_dense, rn)` over the fused candidate set; also leaves
    * hbb/hnorm (corpus bucket vectors) for consumers needing dense
    * vectors. */
  /** Bucket-vector prefix shared by the hybrid oracles: the BM25
    * chain + corpus (hbb/hnorm) and external-query (qbb/qnorm) scaled
    * bucket vectors. */
  private lazy val hybridBucketCtes: String =
    "WITH " + bm25Ctes(bm25DerivedQueries) + """,
      |hn AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      |hsc AS (
      |  SELECT doc_id, token,
      |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4)
      |      AS tfidf
      |  FROM tf JOIN dfreq USING (token) CROSS JOIN hn),
      |hbb AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 64
      |      AS bucket,
      |    sum(CAST(round(tfidf * 10000.0, 0) AS BIGINT)) AS ws
      |  FROM hsc GROUP BY 1, 2),
      |hnorm AS (SELECT doc_id, sum(ws * ws) AS n2
      |  FROM hbb GROUP BY 1),
      |qtf AS (SELECT query_id, token, count(*) AS tf
      |  FROM qraw GROUP BY 1, 2),
      |qsc AS (
      |  SELECT query_id, token,
      |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4)
      |      AS tfidf
      |  FROM qtf JOIN dfreq USING (token) CROSS JOIN hn),
      |qbb AS (
      |  SELECT query_id,
      |    CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 64
      |      AS bucket,
      |    sum(CAST(round(tfidf * 10000.0, 0) AS BIGINT)) AS ws
      |  FROM qsc GROUP BY 1, 2),
      |qnorm AS (SELECT query_id, sum(ws * ws) AS n2
      |  FROM qbb GROUP BY 1)""".stripMargin

  private lazy val hybridFusedCtes: String =
    hybridBucketCtes + """,
      |dnum AS (
      |  SELECT q.query_id, h.doc_id, sum(q.ws * h.ws) AS num
      |  FROM qbb q JOIN hbb h USING (bucket) GROUP BY 1, 2),
      |dsc AS (
      |  SELECT d.query_id, d.doc_id,
      |    CAST(num AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE))
      |      * sqrt(CAST(hn2.n2 AS DOUBLE))) AS cs
      |  FROM dnum d JOIN qnorm qn USING (query_id)
      |  JOIN hnorm hn2 USING (doc_id)),
      |dranked AS (
      |  SELECT query_id, doc_id, CAST(row_number() OVER (
      |      PARTITION BY query_id ORDER BY cs DESC, doc_id)
      |    AS INTEGER) AS rn
      |  FROM dsc),
      |fused AS (
      |  SELECT coalesce(s.query_id, dd.query_id) AS query_id,
      |    coalesce(s.doc_id, dd.doc_id) AS doc_id,
      |    coalesce(1.0 / (60 + s.rn), 0.0)
      |      + coalesce(1.0 / (60 + dd.rn), 0.0) AS rrf,
      |    s.rn AS rank_sparse, dd.rn AS rank_dense
      |  FROM (SELECT query_id, doc_id, rn FROM ranked
      |    WHERE rn <= 20) s
      |  FULL JOIN (SELECT query_id, doc_id, rn FROM dranked
      |    WHERE rn <= 20) dd
      |    ON s.query_id = dd.query_id AND s.doc_id = dd.doc_id),
      |hout AS MATERIALIZED (
      |  SELECT query_id, doc_id, rrf, rank_sparse, rank_dense,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf DESC, doc_id) AS INTEGER) AS rn
      |  FROM fused)""".stripMargin

  /** Unrolled greedy MMR tail shared by q149/q154: assumes CTEs
    * `sl(query_id, neighbor_id, rel)` (the shortlist) and
    * `ps(query_id, i, j, sim)` (candidate pair sims) exist; emits the
    * k selection rounds (round 1 = argmax 0.7*rel; later rounds score
    * 0.7*rel - (1.0-0.7)*max sim to selected, ties -> smaller id) and
    * the final (query_id, neighbor_id, mmr_score, rn) SELECT. */
  private def mmrUnrolledTail(k: Int): String = {
    val rounds = (2 to k).map { i =>
      s""",
         |s$i AS (
         |  SELECT query_id, neighbor_id, mmr, $i AS rn FROM (
         |    SELECT c.query_id, c.neighbor_id,
         |      0.7 * c.rel - (1.0 - 0.7) * coalesce(mx.msim, 0.0)
         |        AS mmr,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY 0.7 * c.rel
         |          - (1.0 - 0.7) * coalesce(mx.msim, 0.0) DESC,
         |          c.neighbor_id) AS rk
         |    FROM sl c
         |    LEFT JOIN (
         |      SELECT ps.query_id, ps.i AS neighbor_id,
         |        max(ps.sim) AS msim
         |      FROM ps JOIN sel${i - 1} s
         |        ON ps.query_id = s.query_id
         |        AND ps.j = s.neighbor_id
         |      GROUP BY 1, 2) mx
         |      ON mx.query_id = c.query_id
         |      AND mx.neighbor_id = c.neighbor_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} s2
         |      WHERE s2.query_id = c.query_id
         |      AND s2.neighbor_id = c.neighbor_id))
         |  WHERE rk = 1),
         |sel$i AS (SELECT query_id, neighbor_id FROM sel${i - 1}
         |  UNION ALL SELECT query_id, neighbor_id FROM s$i)""".stripMargin
    }.mkString
    """,
      |s1 AS (
      |  SELECT query_id, neighbor_id, mmr, 1 AS rn FROM (
      |    SELECT query_id, neighbor_id, 0.7 * rel AS mmr,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY 0.7 * rel DESC, neighbor_id) AS rk
      |    FROM sl) WHERE rk = 1),
      |sel1 AS (SELECT query_id, neighbor_id FROM s1)""".stripMargin +
      rounds + ("""
      |SELECT query_id, neighbor_id, round(mmr, 4) + 0 AS mmr_score,
      |  rn
      |FROM (""".stripMargin +
      (1 to k).map(i => s"SELECT * FROM s$i").mkString(
        "", " UNION ALL ", ")") + """
      |ORDER BY query_id, rn""".stripMargin)
  }

  /** PageRank power-iteration CTE rounds (no leading WITH): assumes a
    * CTE `e(src, dst, w)` exists; defines nodes/outw/n/r0 and
    * c_i/d_i/r_i for i = 1..iters, mirroring ops/PageRank bit-for-bit
    * (scaled-int ranks, exact-IEEE contribution rounding, dangling
    * redistribution). MATERIALIZED: round i references r_{i-1} twice.
    */
  private def pageRankRounds(iters: Int): String = {
    val head =
      """nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM e
        |  UNION ALL SELECT dst AS node FROM e)),
        |outw AS MATERIALIZED (
        |  SELECT src, sum(w) AS out_w FROM e GROUP BY 1),
        |n AS (SELECT count(*) AS n_nodes FROM nodes),
        |r0 AS MATERIALIZED (
        |  SELECT node, CAST(round(1000000000.0 /
        |    CAST(n_nodes AS DOUBLE)) AS BIGINT) AS rank_s
        |  FROM nodes CROSS JOIN n)""".stripMargin
    val steps = (1 to iters).map { k =>
      s""",
         |c$k AS MATERIALIZED (
         |  SELECT dst, sum(CAST(round(CAST(rank_s AS DOUBLE)
         |    * CAST(w AS DOUBLE) / CAST(out_w AS DOUBLE)) AS BIGINT))
         |    AS in_s
         |  FROM r${k - 1} JOIN e ON r${k - 1}.node = e.src
         |  JOIN outw USING (src)
         |  GROUP BY 1),
         |d$k AS (SELECT coalesce(sum(rank_s), 0) AS dangling_s
         |  FROM r${k - 1} LEFT JOIN outw ON r${k - 1}.node = outw.src
         |  WHERE outw.src IS NULL),
         |r$k AS MATERIALIZED (
         |  SELECT node, CAST(round((1.0 - 0.85) * 1000000000.0
         |      / CAST(n_nodes AS DOUBLE)
         |      + 0.85 * (CAST(coalesce(in_s, 0) AS DOUBLE)
         |        + CAST(dangling_s AS DOUBLE) / CAST(n_nodes AS DOUBLE)))
         |    AS BIGINT) AS rank_s
         |  FROM nodes LEFT JOIN c$k ON nodes.node = c$k.dst
         |  CROSS JOIN d$k CROSS JOIN n)""".stripMargin
    }.mkString
    head + steps
  }

  val all: Map[String, String] = Map(

    "q01_global_agg" ->
      """SELECT count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(max(l_extendedprice), 4) AS max_price,
        |  round(min(l_discount), 4) AS min_disc,
        |  round(avg(l_tax), 4) AS avg_tax
        |FROM lineitem""".stripMargin,

    "q02_groupby_stats" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  round(min(l_discount), 4) AS min_disc,
        |  round(max(l_tax), 4) AS max_tax
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_conditional_agg" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
        |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
        |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q04_join_left" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q05_join_multikey" ->
      """WITH rev AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_date, l_returnflag,
        |    round(sum(l_extendedprice), 2) AS revenue
        |  FROM lineitem GROUP BY 1, 2),
        |qty AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_date, l_returnflag,
        |    round(sum(l_quantity), 2) AS qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT rev.ship_date, rev.l_returnflag, rev.revenue, qty.qty
        |FROM rev LEFT JOIN qty
        |  ON rev.ship_date = qty.ship_date
        | AND rev.l_returnflag = qty.l_returnflag
        |ORDER BY rev.ship_date, rev.l_returnflag""".stripMargin,

    "q06_join_inner" ->
      """SELECT p_brand, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q07_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q08_join_semi" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q09_dedup_latest" ->
      """SELECT user_id, event_id, event_type, value, ts FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q10_topn_group" ->
      """SELECT event_type, event_id, value, rn FROM (
        |  SELECT event_type, event_id, value, CAST(row_number() OVER (
        |    PARTITION BY event_type ORDER BY value DESC, event_id)
        |    AS INTEGER) AS rn
        |  FROM events) WHERE rn <= 3
        |ORDER BY event_type, rn""".stripMargin,

    "q11_dense_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice, CAST(dense_rank() OVER (
        |    PARTITION BY p_brand ORDER BY p_retailprice DESC)
        |    AS INTEGER) AS rnk
        |  FROM part) WHERE rnk <= 3
        |ORDER BY p_brand, rnk, p_partkey""".stripMargin,

    "q12_toplimit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q13_distinct_union" ->
      """SELECT DISTINCT c_mktsegment AS v FROM customer
        |UNION
        |SELECT DISTINCT o_orderstatus AS v FROM orders
        |ORDER BY v""".stripMargin,

    "q14_filters" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(coalesce(l_discount, 0.0)), 4) AS sum_disc
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_quantity BETWEEN 10 AND 30
        |  AND l_shipdate IS NOT NULL
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q15_case_map" ->
      """SELECT o_orderkey,
        |  CAST(CASE o_orderpriority
        |    WHEN '1-URGENT' THEN 1.5 WHEN '2-HIGH' THEN 1.2
        |    WHEN '3-MEDIUM' THEN 1.0 ELSE 0.8 END AS DOUBLE)
        |    AS priority_factor,
        |  round(o_totalprice * CAST(CASE o_orderpriority
        |    WHEN '1-URGENT' THEN 1.5 WHEN '2-HIGH' THEN 1.2
        |    WHEN '3-MEDIUM' THEN 1.0 ELSE 0.8 END AS DOUBLE), 4)
        |    AS weighted_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q16_datetime" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS event_hour,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_date, event_hour""".stripMargin,

    "q17_window_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 minute', ts) AS w_start,
        |  event_type, count(*) AS n_readings,
        |  round(avg(value), 4) AS avg_value,
        |  round(max(value), 4) AS max_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY w_start, event_type""".stripMargin,

    "q18_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(NULLIF(regexp_extract(props, '[0-9]+'), '')
        |    AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q19_dq_duplicates" ->
      """SELECT user_id, CAST(ts AS DATE) AS event_date,
        |  count(*) AS n_dup
        |FROM events
        |GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY user_id, event_date""".stripMargin,

    "q20_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END
        |    AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]')) AS BIGINT) AS n_units,
        |  round(CAST(len(regexp_extract_all(text, '[[:punct:]]'))
        |    AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0), 4)
        |    AS punct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_quality_score" ->
      """SELECT doc_id,
        |  round(
        |    (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |     * (1.0 - least(
        |         (CAST(len(regexp_extract_all(text, '[[:punct:]]'))
        |            AS DOUBLE)
        |          / greatest(CAST(length(text) AS DOUBLE), 1.0))
        |         * 4.0, 1.0) * 0.5))
        |    * sqrt(
        |        CAST(len(list_distinct(CASE WHEN trim(text) = ''
        |          THEN [] ELSE string_split_regex(
        |            trim(lower(text)), '\s+') END)) AS DOUBLE)
        |        / greatest(CAST(CASE WHEN trim(text) = '' THEN 0
        |          ELSE len(string_split_regex(trim(text), '\s+'))
        |          END AS DOUBLE), 1.0)), 4) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q22_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END
        |      AS DOUBLE) AS n_toks,
        |    CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
        |      AS DOUBLE) AS cjk
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang, n_toks, cjk,
        |    len(list_filter(toks, x -> x IN ('the','and','of','to','is',
        |      'in','that','with'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','los','las','de',
        |      'que','y','en','una'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und',
        |      'ist','nicht','mit','ein'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('le','la','les','des','et',
        |      'est','dans','une','du'))) AS s_fr
        |  FROM t)
        |SELECT doc_id, lang,
        |  CASE WHEN cjk > n_toks / 2.0 THEN 'zh'
        |    WHEN greatest(s_en, s_es, s_de, s_fr) > 0 THEN
        |      CASE
        |        WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de
        |          THEN 'fr'
        |        WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
        |        WHEN s_en >= s_de THEN 'en'
        |        ELSE 'de' END
        |    ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,

    "q23_exact_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)
        |ORDER BY doc_id""".stripMargin,

    "q26_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents WHERE doc_id < 100)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CASE
        |      WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) = 0
        |      THEN CAST(1 AS DOUBLE)
        |      ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |      END, 4) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.01
        |ORDER BY id_a, id_b""".stripMargin,

    "q28_ann_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id,
        |    list_cosine_similarity(qv, cv) AS cs
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |r AS (
        |  SELECT query_id, neighbor_id, round(cs, 4) AS cos_sim,
        |    CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |      AS INTEGER) AS rn
        |  FROM s)
        |SELECT query_id, neighbor_id, cos_sim, rn FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,

    "q31_upsert" ->
      """WITH target AS (
        |  SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
        |  WHERE c_custkey <= 100),
        |src AS (
        |  SELECT o_custkey AS c_custkey, round(max(o_totalprice), 2)
        |    AS bal
        |  FROM orders GROUP BY 1)
        |SELECT c_custkey, bal FROM src
        |UNION ALL
        |SELECT t.c_custkey, t.bal FROM target t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM src s WHERE s.c_custkey = t.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q32_multiformat_ts" ->
      """SELECT event_id, ts AS parsed_ts FROM events
        |ORDER BY event_id""".stripMargin,

    "q33_approx_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_exact,
        |  (CAST(abs(approx_count_distinct(user_id)
        |      - count(DISTINCT user_id)) AS DOUBLE)
        |    / count(DISTINCT user_id) < 0.10) AS approx_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q34_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin,

    "q35_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin,

    "q36_session_window" ->
      """WITH w AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |        IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |        >= INTERVAL '10 minutes'
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT *, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM w)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '10 minutes' AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q37_sliding_window" ->
      """SELECT w_start, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM (
        |  SELECT unnest([
        |      time_bucket(INTERVAL '5 minutes', ts),
        |      time_bucket(INTERVAL '5 minutes', ts)
        |        - INTERVAL '5 minutes']) AS w_start,
        |    value
        |  FROM events)
        |GROUP BY w_start
        |ORDER BY w_start""".stripMargin,

    "q38_salted_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT user_id,
        |    'u' || CAST(user_id AS VARCHAR) AS user_tag
        |  FROM events)
        |SELECT e.user_id, d.user_tag, count(*) AS n,
        |  round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY e.user_id, d.user_tag
        |ORDER BY e.user_id""".stripMargin,

    "q41_string_funcs" ->
      """SELECT event_id,
        |  concat_ws('-', event_type,
        |    lpad(CAST(user_id AS VARCHAR), 4, '0')) AS tag,
        |  regexp_replace(props, '[0-9]+', 'N', 'g') AS props_norm,
        |  strftime(ts, '%Y-%m-%d %H') AS hour_str
        |FROM events ORDER BY event_id""".stripMargin,

    "q42_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q43_stats" ->
      """SELECT l_linestatus,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4)
        |    AS corr_qty_price,
        |  round(covar_samp(l_discount, l_tax), 6) AS cov_disc_tax
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "q44_curation" ->
      """WITH ann AS (
        |  SELECT doc_id, text,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END
        |      AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text,
        |      '[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]')) AS BIGINT)
        |      AS n_units,
        |    round(
        |      (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |       * (1.0 - least(
        |           (CAST(len(regexp_extract_all(text, '[[:punct:]]'))
        |              AS DOUBLE)
        |            / greatest(CAST(length(text) AS DOUBLE), 1.0))
        |           * 4.0, 1.0) * 0.5))
        |      * sqrt(
        |          CAST(len(list_distinct(CASE WHEN trim(text) = ''
        |            THEN [] ELSE string_split_regex(
        |              trim(lower(text)), '\s+') END)) AS DOUBLE)
        |          / greatest(CAST(CASE WHEN trim(text) = '' THEN 0
        |            ELSE len(string_split_regex(trim(text), '\s+'))
        |            END AS DOUBLE), 1.0)), 4) AS quality
        |  FROM documents),
        |keepers AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents)),
        |shu AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |  FROM shu a JOIN shu b ON a.g = b.g AND a.doc_id < b.doc_id),
        |neardup_drops AS (
        |  SELECT DISTINCT c.dst AS doc_id FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.src
        |  JOIN sh sb ON sb.doc_id = c.dst
        |  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
        |    >= 0.95)
        |SELECT a.doc_id, a.n_tokens, a.n_units, a.quality
        |FROM ann a JOIN keepers k ON a.doc_id = k.doc_id
        |WHERE a.doc_id NOT IN (SELECT doc_id FROM neardup_drops)
        |  AND a.n_tokens >= 10 AND a.quality >= 0.05
        |ORDER BY a.doc_id""".stripMargin,

    "q45_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) FILTER (o_orderpriority = '1-URGENT')
        |    AS BIGINT) AS n_urgent,
        |  CAST(count(*) FILTER (o_orderpriority = '2-HIGH')
        |    AS BIGINT) AS n_high,
        |  CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM')
        |    AS BIGINT) AS n_medium,
        |  CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
        |    AS BIGINT) AS n_notspec,
        |  CAST(count(*) FILTER (o_orderpriority = '5-LOW')
        |    AS BIGINT) AS n_low
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q46_token_freq" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(CASE WHEN trim(text) = '' THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |    AS token
        |  FROM documents)
        |GROUP BY token
        |ORDER BY n DESC, token LIMIT 50""".stripMargin,

    "q47_collect_set" ->
      """SELECT lang,
        |  array_to_string(list_sort(list(DISTINCT source)), ',')
        |    AS sources,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q48_setops" ->
      """WITH wo AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
        |ac AS (SELECT c_custkey FROM customer)
        |SELECT c_custkey, 'no_orders' AS kind FROM
        |  (SELECT c_custkey FROM ac EXCEPT SELECT c_custkey FROM wo)
        |UNION ALL
        |SELECT c_custkey, 'has_orders' AS kind FROM
        |  (SELECT c_custkey FROM ac INTERSECT SELECT c_custkey FROM wo)
        |ORDER BY kind, c_custkey""".stripMargin,

    "q29_embedding_norms" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> x * x))), 4) AS l2_norm,
        |  label
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // DuckDB has native ASOF JOIN — ideal oracle for our union+window
    // formulation (inclusive backward match, right side pre-deduped).
    "q49_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id AS purchase_id,
        |    round(value, 4) AS purchase_value
        |  FROM (SELECT *, row_number() OVER (
        |      PARTITION BY user_id, ts ORDER BY event_id DESC) AS drn
        |    FROM events WHERE event_type = 'purchase')
        |  WHERE drn = 1),
        |clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts,
        |  p.purchase_id, p.purchase_value, p.ts AS purchase_ts
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "q79_asof_forward" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id AS purchase_id,
        |    round(value, 4) AS purchase_value
        |  FROM (SELECT *, row_number() OVER (
        |      PARTITION BY user_id, ts ORDER BY event_id DESC) AS drn
        |    FROM events WHERE event_type = 'purchase')
        |  WHERE drn = 1),
        |clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts,
        |  p.purchase_id, p.purchase_value, p.ts AS purchase_ts
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "q50_range_join" ->
      """WITH ranges AS (
        |  SELECT o_orderkey, o_orderdate AS lo,
        |    o_orderdate + INTERVAL 30 DAY AS hi
        |  FROM orders WHERE o_orderkey < 1000)
        |SELECT o_orderkey, count(*) AS n_ship,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN ranges
        |  ON l_shipdate >= lo AND l_shipdate <= hi
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q51_det_sample" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <
        |  (CASE o_orderstatus WHEN 'O' THEN '20' WHEN 'F' THEN '10'
        |    WHEN 'P' THEN '80' ELSE '00' END)
        |ORDER BY o_orderkey""".stripMargin,

    "q52_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |    AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf
        |  FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, token, tf,
        |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4)
        |      AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |ranked AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, token)
        |    AS INTEGER) AS rn
        |  FROM scored)
        |SELECT doc_id, token, tf, tfidf, rn FROM ranked
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q53_text_scrub" ->
      """WITH noisy AS (
        |  SELECT doc_id, text || ' see https://ex.com/d/'
        |    || CAST(doc_id AS VARCHAR) || ' or  mail user'
        |    || CAST(doc_id AS VARCHAR) || '@ex.com .' AS noisy
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN trim(noisy) = '' THEN 0
        |    ELSE len(string_split_regex(trim(noisy), '\s+')) END
        |    AS BIGINT) AS n_tokens_noisy,
        |  CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(
        |    noisy,
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g'),
        |    '\s+', ' ', 'g'))) AS BIGINT) AS len_clean,
        |  CAST(len(regexp_extract_all(noisy, 'https?://[^\s]+'))
        |    AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(noisy,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    AS BIGINT) AS n_emails
        |FROM noisy ORDER BY doc_id""".stripMargin,

    // oracle for the bucketed join is the plain join — bucketing must
    // not change results, only the physical plan
    "q54_bucketed_join" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(max(o_totalprice), 4) AS o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q55_lag_lead" ->
      """SELECT user_id, event_id, round(value, 4) AS value,
        |  round(lag(value, 1) OVER w, 4) AS prev_value,
        |  round(lead(value, 1) OVER w, 4) AS next_value,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q56_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST, n""".stripMargin,

    "q57_window_frames" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_sum,
        |  round(avg(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
        |    AS moving_avg3
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q58_group_sample" ->
      """SELECT event_type, event_id, rn FROM (
        |  SELECT event_type, event_id, CAST(row_number() OVER (
        |    PARTITION BY event_type
        |    ORDER BY md5(CAST(event_id AS VARCHAR))) AS INTEGER) AS rn
        |  FROM events) WHERE rn <= 5
        |ORDER BY event_type, rn""".stripMargin,

    // exact-jaccard edge set (same formulation q44 hash-matched) +
    // transitive closure — shared scale-safe CTEs (inverted-index
    // candidates, unrolled label prop with fixpoint guard)
    "q59_dedup_clusters" -> (closureCtes() + """
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY doc_id""".stripMargin),

    // q134: incremental admission must equal the full-corpus closure
    // (old components enter as star edges, which have the same
    // transitive closure as the old intra-corpus jaccard edges)
    "q134_incremental_clusters" -> (closureCtes() + """
        |SELECT doc_id, cluster_id FROM lab
        |ORDER BY doc_id""".stripMargin),

    // q131: q59's exact-jaccard closure (LSH recall 1-4e-12 at 0.95,
    // same argument as q44/q59) + q74's md5 split hash on cluster_id
    "q131_leakage_safe_split" -> (closureCtes() + """,
        |b AS (
        |  SELECT doc_id, cluster_id,
        |    (position(substring(md5('graft:'
        |        || CAST(cluster_id AS VARCHAR)), 1, 1)
        |      IN '0123456789abcdef') - 1) * 16
        |    + position(substring(md5('graft:'
        |        || CAST(cluster_id AS VARCHAR)), 2, 1)
        |      IN '0123456789abcdef') - 1 AS bucket
        |  FROM lab)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN bucket < 205 THEN 'train'
        |       WHEN bucket < 230 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin),

    // q141: BM25 hard negatives — the bm25 chain seeded from derived
    // queries (first 8 tokens of docs 0-2, positive = source doc),
    // then the closure's cluster map excludes the positive's near-dups
    "q141_hard_negatives" -> (closureCtes() + ",\n" +
      bm25Ctes(bm25DerivedQueries) + """,
        |neg AS (
        |  SELECT r.query_id, r.doc_id, r.score, r.rn
        |  FROM ranked r
        |  JOIN lab pl ON pl.doc_id = r.query_id
        |  JOIN lab cl ON cl.doc_id = r.doc_id
        |  WHERE r.rn <= 20 AND r.doc_id <> r.query_id
        |    AND cl.cluster_id <> pl.cluster_id),
        |fin AS (
        |  SELECT query_id, doc_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY rn) AS INTEGER) AS neg_rank
        |  FROM neg)
        |SELECT query_id, doc_id, score, neg_rank FROM fin
        |WHERE neg_rank <= 5 ORDER BY query_id, neg_rank""".stripMargin),

    // q157: q141's mining chain packed into one training-ready row per
    // query — negatives csv'd in rank order, positive = the source doc
    "q157_contrastive_triplets" -> (closureCtes() + ",\n" +
      bm25Ctes(bm25DerivedQueries) + """,
        |neg AS (
        |  SELECT r.query_id, r.doc_id, r.rn
        |  FROM ranked r
        |  JOIN lab pl ON pl.doc_id = r.query_id
        |  JOIN lab cl ON cl.doc_id = r.doc_id
        |  WHERE r.rn <= 20 AND r.doc_id <> r.query_id
        |    AND cl.cluster_id <> pl.cluster_id),
        |fin AS (
        |  SELECT query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY rn) AS INTEGER) AS neg_rank
        |  FROM neg),
        |trip AS (
        |  SELECT query_id,
        |    string_agg(CAST(doc_id AS VARCHAR), ','
        |      ORDER BY neg_rank) AS neg_ids_csv,
        |    CAST(count(*) AS BIGINT) AS n_negs
        |  FROM fin WHERE neg_rank <= 5 GROUP BY query_id)
        |SELECT t.query_id,
        |  array_to_string((CASE WHEN trim(d.text) = '' THEN []
        |    ELSE string_split_regex(trim(lower(d.text)), '\s+')
        |    END)[1:8], ' ') AS qtext,
        |  t.query_id AS pos_id, t.neg_ids_csv, t.n_negs
        |FROM trip t JOIN documents d ON d.doc_id = t.query_id
        |ORDER BY t.query_id""".stripMargin),

    // q145: syndication graph — the closure's exact-jaccard pair CTE
    // (same LSH-recall argument as q44/q59) aggregated to canonical
    // cross-source edges, then the shared PageRank rounds
    "q145_syndication_rank" -> (closureCtes() + """,
        |und AS (
        |  SELECT least(da.source, db.source) AS a,
        |    greatest(da.source, db.source) AS b, count(*) AS w
        |  FROM edges
        |  JOIN documents da ON da.doc_id = edges.src
        |  JOIN documents db ON db.doc_id = edges.dst
        |  WHERE da.source <> db.source
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (
        |  SELECT a AS src, b AS dst, w FROM und
        |  UNION ALL
        |  SELECT b AS src, a AS dst, w FROM und),
        |""".stripMargin + pageRankRounds(3) + """
        |SELECT node, rank_s,
        |  round(CAST(rank_s AS DOUBLE) / 1000000000.0, 6) AS rank
        |FROM r3 ORDER BY node""".stripMargin),

    // q144: PSI drift — bucket counts exact, per-bucket terms replay
    // the identical IEEE op order, scaled to BIGINT before the sum
    "q144_psi_drift" ->
      """WITH rb AS (
        |  SELECT (CASE WHEN value >= 10.0 THEN 1 ELSE 0 END
        |    + CASE WHEN value >= 25.0 THEN 1 ELSE 0 END
        |    + CASE WHEN value >= 50.0 THEN 1 ELSE 0 END
        |    + CASE WHEN value >= 100.0 THEN 1 ELSE 0 END
        |    + CASE WHEN value >= 200.0 THEN 1 ELSE 0 END) AS bucket
        |  FROM events WHERE event_id % 2 = 0),
        |rc AS (SELECT bucket, count(*) AS n_ref FROM rb GROUP BY 1),
        |ub AS (
        |  SELECT (CASE WHEN value >= 10.0 THEN 1 ELSE 0 END
        |    + CASE WHEN value >= 25.0 THEN 1 ELSE 0 END
        |    + CASE WHEN value >= 50.0 THEN 1 ELSE 0 END
        |    + CASE WHEN value >= 100.0 THEN 1 ELSE 0 END
        |    + CASE WHEN value >= 200.0 THEN 1 ELSE 0 END) AS bucket
        |  FROM events WHERE event_id % 2 = 1),
        |cc AS (SELECT bucket, count(*) AS n_cur FROM ub GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 6)) AS bucket),
        |j AS (
        |  SELECT spine.bucket, coalesce(n_ref, 0) AS n_ref,
        |    coalesce(n_cur, 0) AS n_cur
        |  FROM spine LEFT JOIN rc USING (bucket)
        |  LEFT JOIN cc USING (bucket)),
        |t AS (SELECT *, sum(n_ref) OVER () AS tr,
        |  sum(n_cur) OVER () AS tc FROM j),
        |s AS (
        |  SELECT bucket, n_ref, n_cur,
        |    CAST(round((greatest(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE), 1e-6)
        |        - greatest(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE), 1e-6))
        |      * ln(greatest(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE), 1e-6)
        |        / greatest(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE), 1e-6))
        |      * 1000000000.0) AS BIGINT) AS term_s
        |  FROM t)
        |SELECT bucket, n_ref, n_cur,
        |  round(CAST(term_s AS DOUBLE) / 1000000000.0, 6) AS psi_term,
        |  round(CAST(sum(term_s) OVER () AS DOUBLE) / 1000000000.0, 6)
        |    AS psi
        |FROM s ORDER BY bucket""".stripMargin,

    // q143: incremental IVF admission must equal a full rebuild from
    // the SAME (old-slice, first-16-by-id) frozen codebook
    "q143_ivf_incremental" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |      AS cell,
        |    CAST(embedding AS DOUBLE[]) AS cv
        |  FROM (SELECT * FROM embeddings WHERE vec_id % 5 <> 0
        |    ORDER BY vec_id LIMIT 16)),
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, cb.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT v.vec_id AS query_id, cb.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb WHERE v.vec_id < 10) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv.vv, nv.vv) AS cs
        |  FROM probes p JOIN asn a ON p.cell = a.cell
        |  JOIN v qv ON qv.vec_id = p.query_id
        |  JOIN v nv ON nv.vec_id = a.vec_id
        |  WHERE a.vec_id <> p.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cs, CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |    AS INT) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cs, 4) AS cos_sim, rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,

    // q142: retrieval eval metrics over the bm25 chain — pos_rank is
    // an exact integer rank; rr replays the identical IEEE divide+round
    // q174: tombstoned vectors filtered from the full-corpus
    // assignment must equal never having admitted them (dense-side
    // takedown; codebook = first 16 of the FULL corpus, frozen)
    "q174_ivf_forget" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |      AS cell,
        |    CAST(embedding AS DOUBLE[]) AS cv
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, cb.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb) WHERE rn = 1 AND vec_id % 7 <> 2),
        |probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT v.vec_id AS query_id, cb.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb WHERE v.vec_id < 10) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv.vv, nv.vv) AS cs
        |  FROM probes p JOIN asn a ON p.cell = a.cell
        |  JOIN v qv ON qv.vec_id = p.query_id
        |  JOIN v nv ON nv.vec_id = a.vec_id
        |  WHERE a.vec_id <> p.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cs, CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |    AS INT) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cs, 4) AS cos_sim, rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,

    "q142_retrieval_metrics" -> ("WITH " +
      bm25Ctes(bm25DerivedQueries) + """,
        |qr AS (SELECT doc_id AS query_id, doc_id AS pos_id
        |  FROM documents WHERE doc_id < 3),
        |top AS (SELECT query_id, doc_id, rn FROM ranked
        |  WHERE rn <= 20),
        |m AS (
        |  SELECT qr.query_id, t.rn AS pos_rank
        |  FROM qr LEFT JOIN top t
        |    ON t.query_id = qr.query_id AND t.doc_id = qr.pos_id)
        |SELECT query_id, pos_rank,
        |  coalesce(round(1.0 / CAST(pos_rank AS DOUBLE), 6),
        |    CAST(0.0 AS DOUBLE)) AS rr,
        |  CASE WHEN pos_rank IS NULL THEN false
        |    ELSE pos_rank <= 5 END AS hit_at_k
        |FROM m ORDER BY query_id""".stripMargin),

    // q140: Cavnar–Trenkle language ID — integer ranks and sums only;
    // char n-grams are code-point substrings in both engines
    "q140_langid_trained" ->
      """WITH train AS (
        |  SELECT lang, lower(text) AS t FROM documents
        |  WHERE doc_id % 2 = 0),
        |tg AS (
        |  SELECT lang, unnest(CASE WHEN length(t) = 0 THEN []
        |    WHEN length(t) < 3 THEN [t]
        |    ELSE list_transform(range(1, length(t) - 1),
        |      i -> substring(t, i, 3)) END) AS gram
        |  FROM train),
        |tc AS (SELECT lang, gram, count(*) AS cnt FROM tg GROUP BY 1, 2),
        |prof AS (
        |  SELECT lang, gram, rank FROM (
        |    SELECT lang, gram, row_number() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, gram) AS rank
        |    FROM tc) WHERE rank <= 100),
        |test AS (
        |  SELECT doc_id, lower(text) AS t FROM documents
        |  WHERE doc_id % 2 = 1),
        |dg AS (
        |  SELECT doc_id, unnest(CASE WHEN length(t) = 0 THEN []
        |    WHEN length(t) < 3 THEN [t]
        |    ELSE list_transform(range(1, length(t) - 1),
        |      i -> substring(t, i, 3)) END) AS gram
        |  FROM test),
        |dc AS (SELECT doc_id, gram, count(*) AS cnt FROM dg GROUP BY 1, 2),
        |dt AS (
        |  SELECT doc_id, gram, doc_rank FROM (
        |    SELECT doc_id, gram, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY cnt DESC, gram) AS doc_rank
        |    FROM dc) WHERE doc_rank <= 50),
        |langs AS (SELECT DISTINCT lang FROM prof),
        |sc AS (
        |  SELECT doc_id, lang,
        |    CAST(coalesce(abs(doc_rank - rank), 100) AS BIGINT) AS oop
        |  FROM dt CROSS JOIN langs LEFT JOIN prof USING (lang, gram)),
        |dist AS (
        |  SELECT doc_id, lang, CAST(sum(oop) AS BIGINT) AS distance
        |  FROM sc GROUP BY 1, 2),
        |best AS (
        |  SELECT doc_id, lang AS lang_pred, distance,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY distance, lang) AS rn
        |  FROM dist)
        |SELECT doc_id, lang_pred, distance FROM best
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // q138: blocked fuzzy linkage — DuckDB levenshtein and Spark
    // levenshtein share the unit-cost edit-distance definition
    "q138_fuzzy_link" ->
      """WITH vals AS (
        |  SELECT p_name AS value, count(*) AS n_rows
        |  FROM part GROUP BY 1),
        |k AS (
        |  SELECT string_split_regex(value, '\s+')[1] AS block,
        |    value, n_rows FROM vals
        |  UNION
        |  SELECT string_split_regex(value, '\s+')[-1] AS block,
        |    value, n_rows FROM vals),
        |pairs AS (
        |  SELECT DISTINCT a.value AS value_a, b.value AS value_b,
        |    a.n_rows AS n_a, b.n_rows AS n_b
        |  FROM k a JOIN k b USING (block)
        |  WHERE a.value < b.value)
        |SELECT value_a, value_b,
        |  CAST(levenshtein(value_a, value_b) AS INTEGER) AS dist,
        |  n_a, n_b
        |FROM pairs WHERE levenshtein(value_a, value_b) <= 4
        |ORDER BY value_a, value_b""".stripMargin,

    // q137: same closure + md5 bucket as q131, folded mod k
    "q137_kfold" -> (closureCtes() + """,
        |b AS (
        |  SELECT doc_id, cluster_id,
        |    (position(substring(md5('graft:'
        |        || CAST(cluster_id AS VARCHAR)), 1, 1)
        |      IN '0123456789abcdef') - 1) * 16
        |    + position(substring(md5('graft:'
        |        || CAST(cluster_id AS VARCHAR)), 2, 1)
        |      IN '0123456789abcdef') - 1 AS bucket
        |  FROM lab)
        |SELECT doc_id, cluster_id, bucket % 5 AS fold
        |FROM b ORDER BY doc_id""".stripMargin),

    // q148: soft dedup — every member kept, weight = 1/|cluster| over
    // the same exact-jaccard closure the other cluster consumers pin
    "q148_soft_dedup_weights" -> (closureCtes() + """,
        |sizes AS (
        |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |  FROM lab GROUP BY 1)
        |SELECT doc_id, cluster_id, cluster_size,
        |  greatest(round(1.0 / cluster_size, 6) + 0, 0.000001)
        |    AS weight
        |FROM lab JOIN sizes USING (cluster_id)
        |ORDER BY doc_id""".stripMargin),

    // q158: the q148 weights fed to the q94 A-ES draw — inclusion
    // probability ∝ 1/|cluster|; key math replayed exactly (the
    // weight entering the division is the 6-dp-rounded q148 value)
    "q158_soft_dedup_sample" -> (closureCtes() + """,
        |sizes AS (
        |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |  FROM lab GROUP BY 1),
        |wts AS (
        |  SELECT doc_id, cluster_id, cluster_size,
        |    greatest(round(1.0 / cluster_size, 6) + 0, 0.000001)
        |      AS w
        |  FROM lab JOIN sizes USING (cluster_id)),
        |keyed AS (
        |  SELECT doc_id, cluster_id, cluster_size,
        |    ln((CAST(concat('0x', substring(
        |          md5('softdedup:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) + 0.5) / 4294967296.0) / w AS k
        |  FROM wts WHERE w > 0),
        |drawn AS (
        |  SELECT doc_id, cluster_id, cluster_size,
        |    round(k, 6) AS sample_key,
        |    CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS INT)
        |      AS rn
        |  FROM keyed)
        |SELECT doc_id, cluster_id, cluster_size, sample_key, rn
        |FROM drawn WHERE rn <= 25 ORDER BY rn""".stripMargin),

    // floor(x/s + 0.5) on both sides — engine-identical tie-break
    "q60_embedding_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
        |  FROM embeddings),
        |s AS (SELECT vec_id, x,
        |  greatest(list_max(list_transform(x, a -> abs(a))), 1e-12)
        |    / 127.0 AS sc FROM v)
        |SELECT vec_id, round(sc, 6) AS scale,
        |  round(list_sum(list_transform(x, a ->
        |    pow(a - least(greatest(floor(a / sc + 0.5), -127.0), 127.0)
        |      * sc, 2))) / len(x), 8) AS mse
        |FROM s ORDER BY vec_id""".stripMargin,

    // bit-interleave generated to mirror ZOrder.zvalue exactly
    "q61_zorder_code" -> {
      val terms = for {
        (c, i) <- Seq("(o_custkey % 256)", "(o_orderkey % 256)").zipWithIndex
        b <- 0 until 8
      } yield s"((($c >> $b) & 1) << ${b * 2 + i})"
      s"""SELECT o_orderkey,
         |  CAST(${terms.mkString(" | ")} AS BIGINT) AS z
         |FROM orders ORDER BY o_orderkey""".stripMargin
    },

    "q62_chunking" ->
      """WITH tk AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |    ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, len(toks), 48)) AS s
        |  FROM tk WHERE len(toks) > 0)
        |SELECT doc_id, CAST(s // 48 AS INT) AS chunk_idx,
        |  array_to_string(list_slice(toks, s + 1, s + 64), ' ')
        |    AS chunk_text,
        |  CAST(len(list_slice(toks, s + 1, s + 64)) AS INT)
        |    AS n_chunk_tokens
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,

    "q63_sequence_pack" ->
      (bpeCountChain(5) + """,
        |t AS (
        |  SELECT doc_id, n_tokens, CAST(doc_id % 8 AS INT) AS shard
        |  FROM nt),
        |o AS (
        |  SELECT *, CAST(COALESCE(sum(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS stream_offset
        |  FROM t)
        |SELECT doc_id, n_tokens, shard, stream_offset,
        |  CAST(shard AS BIGINT) * 1099511627776
        |    + CAST(floor(stream_offset / 512) AS BIGINT) AS pack_id,
        |  CAST(stream_offset % 512 AS BIGINT) AS offset_in_pack,
        |  (stream_offset % 512) + n_tokens > 512 AS spans_boundary
        |FROM o ORDER BY doc_id""".stripMargin),

    "q64_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderstatus,
        |    CAST(count(*) FILTER (o_orderpriority = '1-URGENT')
        |      AS BIGINT) AS n_urgent,
        |    CAST(count(*) FILTER (o_orderpriority = '5-LOW')
        |      AS BIGINT) AS n_low
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, priority, n
        |FROM wide UNPIVOT (n FOR priority IN (n_urgent, n_low))
        |ORDER BY o_orderstatus, priority""".stripMargin,

    "q65_decontam" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents)),
        |bench AS (
        |  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |corpus AS (
        |  SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
        |ov AS (
        |  SELECT doc_id, count(*) AS n_overlap
        |  FROM corpus JOIN bench USING (g) GROUP BY doc_id),
        |tot AS (
        |  SELECT doc_id, CAST(len(s) AS BIGINT) AS n_ngrams
        |  FROM sh WHERE doc_id % 97 <> 0)
        |SELECT t.doc_id, t.n_ngrams,
        |  CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  round(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE)
        |    / greatest(t.n_ngrams, 1), 4) AS contamination_ratio,
        |  COALESCE(o.n_overlap, 0) > 0 AS contaminated
        |FROM tot t LEFT JOIN ov o USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q66_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END
        |      AS BIGINT) AS n_tokens,
        |    CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, n_tokens, toks AS g1,
        |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1]) END AS g2,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END AS g3
        |  FROM tk)
        |SELECT doc_id, n_tokens,
        |  round(CASE WHEN len(g1) > 0 THEN
        |    CAST(len(g1) - len(list_distinct(g1)) AS DOUBLE) / len(g1)
        |    ELSE 0.0 END, 4) AS dup_unigram_frac,
        |  round(CASE WHEN len(g2) > 0 THEN
        |    CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
        |    ELSE 0.0 END, 4) AS dup_bigram_frac,
        |  round(CASE WHEN len(g3) > 0 THEN
        |    CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
        |    ELSE 0.0 END, 4) AS dup_trigram_frac
        |FROM ng ORDER BY doc_id""".stripMargin,

    "q67_scd2" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type
        |      THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT *, sum(chg) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM o),
        |c AS (
        |  SELECT user_id, run, min(event_type) AS event_type,
        |    min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
        |  FROM r GROUP BY user_id, run)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER v AS valid_to, n_events,
        |  lead(valid_from) OVER v IS NULL AS is_current
        |FROM c
        |WINDOW v AS (PARTITION BY user_id ORDER BY valid_from, run)
        |ORDER BY user_id, valid_from, event_type""".stripMargin,

    "q68_corpus_mix" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END
        |      AS DOUBLE) AS ntok
        |  FROM documents),
        |tgt AS (SELECT * FROM (VALUES
        |  ('src0', CAST(0.4 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        |  ('src2', CAST(0.2 AS DOUBLE)), ('src3', CAST(0.1 AS DOUBLE)))
        |  t(source, share)),
        |st AS (
        |  SELECT source, sum(ntok) AS toks, min(share) AS share
        |  FROM tk JOIN tgt USING (source) GROUP BY source),
        |f AS (SELECT min(toks / share) AS tt FROM st),
        |r AS (
        |  SELECT source,
        |    least(CAST(1 AS DOUBLE), share * tt / toks) AS rate
        |  FROM st, f),
        |rt AS (
        |  SELECT source, CASE WHEN rate >= 1.0 THEN 'zzzz'
        |    ELSE printf('%04x', CAST(floor(rate * 65536) AS BIGINT))
        |    END AS thresh
        |  FROM r)
        |SELECT tk.doc_id, tk.source, CAST(tk.ntok AS BIGINT) AS n_tokens
        |FROM tk JOIN rt USING (source)
        |WHERE substr(md5(CAST(tk.doc_id AS VARCHAR)), 1, 4) < thresh
        |ORDER BY doc_id""".stripMargin,

    "q71_curation_v2" ->
      """WITH corpus AS (
        |  SELECT * FROM documents WHERE doc_id % 97 <> 0),
        |benchd AS (
        |  SELECT * FROM documents WHERE doc_id % 97 = 0),
        |ann AS (
        |  SELECT doc_id, text,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END
        |      AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text,
        |      '[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]')) AS BIGINT)
        |      AS n_units,
        |    round(
        |      (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |       * (1.0 - least(
        |           (CAST(len(regexp_extract_all(text, '[[:punct:]]'))
        |              AS DOUBLE)
        |            / greatest(CAST(length(text) AS DOUBLE), 1.0))
        |           * 4.0, 1.0) * 0.5))
        |      * sqrt(
        |          CAST(len(list_distinct(CASE WHEN trim(text) = ''
        |            THEN [] ELSE string_split_regex(
        |              trim(lower(text)), '\s+') END)) AS DOUBLE)
        |          / greatest(CAST(CASE WHEN trim(text) = '' THEN 0
        |            ELSE len(string_split_regex(trim(text), '\s+'))
        |            END AS DOUBLE), 1.0)), 4) AS quality
        |  FROM corpus),
        |keepers AS (
        |  SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
        |sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM corpus)),
        |shb AS (
        |  SELECT DISTINCT unnest(list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END)) AS g
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM benchd)),
        |shu AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |  FROM shu a JOIN shu b ON a.g = b.g AND a.doc_id < b.doc_id),
        |neardup_drops AS (
        |  SELECT DISTINCT c.dst AS doc_id FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.src
        |  JOIN sh sb ON sb.doc_id = c.dst
        |  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
        |    >= 0.95),
        |ov AS (
        |  SELECT cs.doc_id, count(*) AS n_overlap
        |  FROM (SELECT doc_id, unnest(s) AS g FROM sh) cs
        |  JOIN shb USING (g) GROUP BY cs.doc_id),
        |contam_drops AS (
        |  SELECT sh.doc_id FROM sh LEFT JOIN ov USING (doc_id)
        |  WHERE round(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE)
        |    / greatest(len(sh.s), 1), 4) > 0.05),
        |rep AS (
        |  SELECT doc_id,
        |    round(CASE WHEN len(g3) > 0 THEN
        |      CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
        |        / len(g3) ELSE 0.0 END, 4) AS dup_trigram_frac
        |  FROM (SELECT doc_id, CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END AS g3
        |    FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |        ELSE string_split_regex(trim(lower(text)), '\s+') END
        |        AS toks FROM corpus)))
        |SELECT a.doc_id, a.n_tokens, a.n_units, a.quality,
        |  r.dup_trigram_frac
        |FROM ann a
        |JOIN keepers k ON a.doc_id = k.doc_id
        |JOIN rep r ON a.doc_id = r.doc_id
        |WHERE a.doc_id NOT IN (SELECT doc_id FROM neardup_drops)
        |  AND a.doc_id NOT IN (SELECT doc_id FROM contam_drops)
        |  AND a.n_tokens >= 10 AND a.quality >= 0.05
        |  AND r.dup_trigram_frac <= 0.2
        |ORDER BY a.doc_id""".stripMargin,

    "q70_top_ngram" ->
      """WITH tk AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END
        |    AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(CASE WHEN len(toks) < 2
        |    THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1]) END) AS gram
        |  FROM tk),
        |c AS (
        |  SELECT doc_id, gram, count(*) AS c
        |  FROM g GROUP BY doc_id, gram)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
        |  CAST(max(c) AS BIGINT) AS top_ngram_count,
        |  round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_ngram_share
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q69_rolling_time" ->
      """SELECT user_id, event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_10m,
        |  round(sum(value) OVER w, 2) AS sum_10m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    // bloom pruning is transparent to the result: the oracle is the
    // plain inner join the operator must be indistinguishable from
    "q72_bloom_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q73_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey,
        |  round(o_totalprice, 2) AS o_totalprice, rn
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q74_stratified_split" ->
      """WITH b AS (
        |  SELECT source,
        |    (position(substring(md5('graft:' || CAST(doc_id AS VARCHAR)),
        |        1, 1) IN '0123456789abcdef') - 1) * 16
        |    + position(substring(md5('graft:' || CAST(doc_id AS VARCHAR)),
        |        2, 1) IN '0123456789abcdef') - 1 AS bucket
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN bucket < 205 THEN 'train'
        |       WHEN bucket < 230 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM b GROUP BY source, split ORDER BY source, split""".stripMargin,

    // exact shingle-jaccard over (batch×corpus ∪ batch×batch) pairs —
    // same exhaustive formulation as q44's near-dup stage, so a hash
    // match certifies the incremental path's recall end-to-end
    "q76_incremental_dedup" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents)),
        |pairs AS (
        |  SELECT n.doc_id AS id_new, o.doc_id AS id_dup,
        |    CAST(len(list_intersect(n.s, o.s)) AS DOUBLE)
        |      / (len(n.s) + len(o.s) - len(list_intersect(n.s, o.s)))
        |      AS j,
        |    'corpus' AS match_in
        |  FROM sh n JOIN sh o
        |    ON n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT a.doc_id, b.doc_id,
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |      AS j,
        |    'batch' AS match_in
        |  FROM sh a JOIN sh b
        |    ON a.doc_id % 5 = 0 AND b.doc_id % 5 = 0
        |      AND a.doc_id < b.doc_id)
        |SELECT id_new, id_dup, round(j, 4) AS jaccard, match_in
        |FROM pairs
        |WHERE j >= 0.95
        |ORDER BY id_new, id_dup""".stripMargin,

    "q78_upsample" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    CAST(CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.25
        |      ELSE 1.0 END AS DOUBLE) AS r,
        |    (position(substring(md5('upsample:'
        |        || CAST(doc_id AS VARCHAR)), 1, 1)
        |      IN '0123456789abcdef') - 1) * 16
        |    + position(substring(md5('upsample:'
        |        || CAST(doc_id AS VARCHAR)), 2, 1)
        |      IN '0123456789abcdef') - 1 AS bucket
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |    CAST(floor(r) AS INT)
        |    + CASE WHEN bucket < CAST(round((r - floor(r)) * 256) AS INT)
        |        THEN 1 ELSE 0 END AS n_copies
        |  FROM f)
        |SELECT doc_id, source,
        |  unnest(generate_series(1, n_copies)) AS copy_idx
        |FROM c WHERE n_copies > 0
        |ORDER BY doc_id, copy_idx""".stripMargin,

    "q80_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value,
           |  (count(DISTINCT $c) = 0 OR
           |   CAST(abs(approx_count_distinct($c) - count(DISTINCT $c))
           |     AS DOUBLE) / count(DISTINCT $c) < 0.10) AS distinct_ok
           |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q77_domain_cap" ->
      """WITH b AS (
        |  SELECT source, doc_id,
        |    (position(substring(md5('cap:' || CAST(doc_id AS VARCHAR)),
        |        1, 1) IN '0123456789abcdef') - 1) * 16
        |    + position(substring(md5('cap:' || CAST(doc_id AS VARCHAR)),
        |        2, 1) IN '0123456789abcdef') - 1 AS bucket
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source ORDER BY bucket, doc_id) AS rn
        |  FROM b)
        |SELECT source, doc_id, rn FROM r WHERE rn <= 10
        |ORDER BY source, rn""".stripMargin,

    // like q33: the sketch is impl-specific, so the oracle checks the
    // exact counts plus the same 5% envelope with ITS OWN estimator
    "q75_sketch_rollup" ->
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
        |  count(DISTINCT user_id) AS n_exact,
        |  (CAST(abs(approx_count_distinct(user_id)
        |      - count(DISTINCT user_id)) AS DOUBLE)
        |    / count(DISTINCT user_id) < 0.05) AS approx_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q81_percent_rank" ->
      """SELECT o_orderpriority, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  round(nth_value(o_totalprice, 2) OVER w, 2) AS second_lowest
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q82_date_spine" ->
      """WITH bounds AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |         CAST(max(o_orderdate) AS DATE) AS d1
        |  FROM orders),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day
        |  FROM bounds),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
        |    round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT spine.day, coalesce(n_orders, 0) AS n_orders,
        |  coalesce(revenue, 0.0) AS revenue
        |FROM spine LEFT JOIN daily USING (day)
        |ORDER BY day""".stripMargin,

    "q83_winsorize" ->
      """WITH b AS (
        |  SELECT quantile_cont(o_totalprice, 0.05) AS lo,
        |         quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CASE WHEN o_totalprice < lo OR o_totalprice > hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  round(avg(least(greatest(o_totalprice, lo), hi)), 4) AS mean_w,
        |  round(stddev_samp(least(greatest(o_totalprice, lo), hi)), 4)
        |    AS sd_w
        |FROM orders, b
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q84_pmi_bigrams" ->
      """WITH docs AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |uni AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(toks) AS w FROM docs) GROUP BY w),
        |n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |bi AS (
        |  SELECT p[1] AS w1, p[2] AS w2, count(*) AS c12
        |  FROM (SELECT unnest(list_zip(toks[1:len(toks)-1],
        |                               toks[2:len(toks)])) AS p
        |        FROM docs WHERE len(toks) >= 2)
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 5)
        |SELECT bi.w1, bi.w2, bi.c12,
        |  round(ln(CAST(bi.c12 AS DOUBLE) * n1.n / (u1.c * u2.c)), 4)
        |    + 0 AS pmi
        |FROM bi, n1
        |JOIN uni u1 ON bi.w1 = u1.w
        |JOIN uni u2 ON bi.w2 = u2.w
        |ORDER BY w1, w2""".stripMargin,

    "q85_entropy" ->
      """WITH cnt AS (
        |  SELECT source, w, count(*) AS c
        |  FROM (SELECT source, unnest(
        |          string_split_regex(trim(lower(text)), '\s+')) AS w
        |        FROM documents WHERE trim(text) <> '')
        |  GROUP BY source, w),
        |tot AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |    count(*) AS n_types
        |  FROM cnt GROUP BY source)
        |SELECT cnt.source, max(tot.n) AS n_tokens,
        |  max(tot.n_types) AS n_types,
        |  round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)),
        |    4) + 0 AS entropy
        |FROM cnt JOIN tot ON cnt.source = tot.source
        |GROUP BY cnt.source
        |ORDER BY cnt.source""".stripMargin,

    "q86_hof_arrays" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
        |    AS INT) AS n_pos,
        |  round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> x * x)), 4) AS sum_sq,
        |  round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> abs(x))), 4) AS l1_norm,
        |  round(list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> abs(x))), 4) AS max_abs
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // exact SQL replica of the IVF path: same first-16-by-id codebook,
    // same cosine-argmax cell assignment (ties → smaller cell), same
    // nprobe-cell probing, same (cos desc, id asc) top-k
    "q40_ann_ivf" ->
      (lloyd2cb16 + """,
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, cb2.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb2) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT v.vec_id AS query_id, cb2.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb2 WHERE v.vec_id < 10) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv.vv, nv.vv) AS cs
        |  FROM probes p JOIN asn a ON p.cell = a.cell
        |  JOIN v qv ON qv.vec_id = p.query_id
        |  JOIN v nv ON nv.vec_id = a.vec_id
        |  WHERE a.vec_id <> p.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cs, CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |    AS INT) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cs, 4) AS cos_sim, rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin),

    // like q75/q33: the sketch is impl-specific; the oracle pins the
    // exact counts and the envelope verdict the estimates must meet
    "q89_heavy_hitters" ->
      """SELECT user_id, n_exact, TRUE AS approx_ok FROM (
        |  SELECT user_id, count(*) AS n_exact FROM events
        |  GROUP BY user_id ORDER BY n_exact DESC, user_id LIMIT 10)
        |ORDER BY user_id""".stripMargin,

    "q88_semdedup" ->
      (lloyd2cb16 + """,
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, cb2.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb2) WHERE rn = 1),
        |cnt AS (SELECT cell, count(*) AS n FROM asn GROUP BY cell),
        |sub AS (
        |  SELECT asn.vec_id, asn.cell,
        |    CASE WHEN cnt.n <= 400 THEN 0
        |      ELSE CAST(concat('0x', substring(md5('cellsplit:' ||
        |          CAST(asn.vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |        % CAST(ceil(cnt.n / 400.0) AS BIGINT) END AS subcell
        |  FROM asn JOIN cnt USING (cell)),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(va.vv, vb.vv) AS cs
        |  FROM sub a JOIN sub b ON a.cell = b.cell
        |    AND a.subcell = b.subcell AND a.vec_id < b.vec_id
        |  JOIN v va ON va.vec_id = a.vec_id
        |  JOIN v vb ON vb.vec_id = b.vec_id),
        |dropped AS (
        |  SELECT id_b, min(id_a) AS dup_of,
        |    round(arg_min(cs, id_a), 4) AS dup_sim
        |  FROM pairs WHERE cs >= 0.95 GROUP BY id_b)
        |SELECT sub.vec_id, sub.cell, (d.dup_of IS NULL) AS kept,
        |  d.dup_of, d.dup_sim
        |FROM sub LEFT JOIN dropped d ON sub.vec_id = d.id_b
        |ORDER BY sub.vec_id""".stripMargin),

    // like q75/q89: the sketch is impl-specific; the oracle pins the
    // per-day row counts and the rank-envelope verdicts
    "q92_quantile_rollup" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  count(*) AS n_events, TRUE AS ok50, TRUE AS ok95
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q99_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
        |  FROM events GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, any_value(s1.t1) AS t1,
        |    min(CASE WHEN e.event_type = 'click' AND e.ts > s1.t1
        |      THEN e.ts END) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, any_value(s2.t1) AS t1,
        |    any_value(s2.t2) AS t2,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t2
        |      THEN e.ts END) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  GROUP BY e.user_id)
        |SELECT user_id, t1 IS NOT NULL AS did_signup,
        |  t2 IS NOT NULL AS did_click_after,
        |  t3 IS NOT NULL AS did_purchase_after,
        |  t3 AS purchase_ts
        |FROM s3 ORDER BY user_id""".stripMargin,

    "q100_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(date_diff('day', DATE '1995-01-02',
        |      CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(week) AS cohort_week
        |  FROM uw GROUP BY user_id)
        |SELECT cohort.cohort_week, uw.week - cohort.cohort_week
        |    AS weeks_since,
        |  count(DISTINCT uw.user_id) AS n_active
        |FROM uw JOIN cohort ON uw.user_id = cohort.user_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q97_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-06-30'
        |  AND CAST(l_shipdate AS DATE) > DATE '1997-06-30'
        |GROUP BY l_orderkey, o_date, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q98_local_supplier_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM region, nation, customer, orders, lineitem, supplier
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND c_nationkey = n_nationkey
        |  AND o_custkey = c_custkey
        |  AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = c_nationkey
        |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q124_blocklist" ->
      """WITH h AS (
        |  SELECT doc_id, list_filter(
        |    ['slow fast', 'big table', 'key agg', 'forbidden phrase'],
        |    p -> contains(text, p)) AS hits
        |  FROM documents)
        |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits,
        |  CASE WHEN len(hits) > 0 THEN hits[1] ELSE NULL END
        |    AS first_hit,
        |  len(hits) > 0 AS blocked
        |FROM h ORDER BY doc_id""".stripMargin,

    // q133: table-driven blocklist — re-derives the same top-20
    // doc-frequency bigram table (count desc, phrase asc), then the
    // contains scan; blocklist order is lexicographic, so first_hit
    // is the min matched phrase
    // PageRank: 3 unrolled power iterations mirroring ops/PageRank —
    // scaled-integer ranks, per-edge contributions rounded from the
    // identical IEEE multiply/divide, all cross-row sums over BIGINTs.
    // Iterative CTEs are MATERIALIZED (each r_i is referenced twice by
    // round i+1; inline expansion is exponential in iters).
    "q136_pagerank" ->
      ("""WITH e AS MATERIALIZED (
        |  SELECT l_partkey AS src, l_suppkey + 1000000 AS dst,
        |    count(*) AS w
        |  FROM lineitem GROUP BY 1, 2
        |  UNION ALL
        |  SELECT l_suppkey + 1000000 AS src, l_partkey AS dst,
        |    count(*) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |""".stripMargin + pageRankRounds(3) + """
        |SELECT node, rank_s,
        |  round(CAST(rank_s AS DOUBLE) / 1000000000.0, 6) AS rank
        |FROM r3 ORDER BY node""".stripMargin),

    // BM25: per-term contributions rounded at 1e-6 and summed as exact
    // integers (mirrors Bm25.topK), so rank ties resolve identically.
    // Float literals are spelled as the same arithmetic the Spark side
    // performs ((1.2 + 1.0), not 2.2) so both engines evaluate the
    // identical IEEE operation sequence.
    "q135_bm25" -> bm25FullCorpus,

    // q139: the incrementally-maintained index must produce the exact
    // full-corpus BM25 result — same oracle as q135 by construction
    "q139_bm25_incremental" -> bm25FullCorpus,

    // q173: tombstone deletion must equal a REBUILD on the remaining
    // corpus — the q135 chain with the forgotten docs never indexed
    "q173_bm25_forget" ->
      ("WITH " + bm25Ctes(bm25LiteralQueries,
        corpusSql =
          "SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3") +
        """
        |SELECT query_id, doc_id, score, rn FROM ranked
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin),

    // q155: passage-level retrieval with doc-level max-pooling — the
    // long-document RAG shape: BM25 over 16-token chunks (overlap 4),
    // per-doc best passage, top-5 docs. The corpus fed to the BM25
    // chain is the CHUNK table (cid = doc_id*1000 + chunk_idx)
    "q155_passage_search" -> ("WITH " + bm25Ctes(bm25DerivedQueries,
      corpusSql = """SELECT doc_id * 1000 + chunk_idx AS doc_id,
        |      chunk_text AS text FROM (
        |    SELECT doc_id, CAST(s // 12 AS INT) AS chunk_idx,
        |      array_to_string(list_slice(toks0, s + 1, s + 16), ' ')
        |        AS chunk_text
        |    FROM (
        |      SELECT doc_id, toks0, unnest(range(0, len(toks0), 12))
        |        AS s
        |      FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |          ELSE string_split_regex(trim(text), '\s+') END
        |          AS toks0 FROM documents)
        |      WHERE len(toks0) > 0))""".stripMargin) + """,
      |dh AS (
      |  SELECT query_id, doc_id // 1000 AS doc_id, score
      |  FROM ranked WHERE rn <= 50),
      |agg AS (
      |  SELECT query_id, doc_id, max(score) AS best_score,
      |    CAST(count(*) AS BIGINT) AS n_passages
      |  FROM dh GROUP BY 1, 2),
      |fin AS (
      |  SELECT query_id, doc_id, best_score, n_passages,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY best_score DESC, doc_id) AS INTEGER) AS rn
      |  FROM agg)
      |SELECT query_id, doc_id, best_score, n_passages, rn
      |FROM fin WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin),

    // q146: hybrid retrieval — the BM25 chain (bm25Ctes: toks/tf/dl/
    // dfreq/stats/qraw/ranked) plus a dense side reusing the SAME
    // toks/tf/dfreq postings, replicating HashingVectorizer's scaled-
    // integer bucket discipline for corpus AND external query vectors,
    // fused by 1/(60+rank). Both engines compute the two IEEE
    // divisions and one fixed-order add on integer ranks, so the
    // fusion scores are bit-identical.
    "q146_hybrid_rrf" -> (hybridFusedCtes + """
      |SELECT query_id, doc_id, round(rrf, 6) + 0 AS rrf_score,
      |  rank_sparse, rank_dense, rn
      |FROM hout WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin),

    // q154: the RAG context-assembly capstone — hybrid top-10 (the
    // full q146 chain) re-ranked by 5 unrolled MMR rounds over the
    // hashed dense vectors, rel = the 6-dp fused score
    "q154_rag_context" -> (hybridFusedCtes + """,
      |w AS (
      |  SELECT doc_id, bucket,
      |    round(CAST(ws AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)), 6) + 0
      |      AS weight
      |  FROM hbb JOIN hnorm USING (doc_id)),
      |grid AS (
      |  SELECT doc_id, unnest(range(0, 64)) AS b
      |  FROM (SELECT DISTINCT doc_id FROM w)),
      |dense0 AS (
      |  SELECT g.doc_id, g.b, coalesce(w.weight, 0.0) AS x
      |  FROM grid g LEFT JOIN w
      |    ON w.doc_id = g.doc_id AND w.bucket = g.b),
      |dv AS (
      |  SELECT doc_id, list(x ORDER BY b) AS vv
      |  FROM dense0 GROUP BY doc_id),
      |sl AS MATERIALIZED (
      |  SELECT query_id, doc_id AS neighbor_id,
      |    round(rrf, 6) + 0 AS rel
      |  FROM hout WHERE rn <= 10),
      |ps AS MATERIALIZED (
      |  SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
      |    list_cosine_similarity(vi.vv, vj.vv) AS sim
      |  FROM sl a JOIN sl b ON a.query_id = b.query_id
      |    AND a.neighbor_id <> b.neighbor_id
      |  JOIN dv vi ON vi.doc_id = a.neighbor_id
      |  JOIN dv vj ON vj.doc_id = b.neighbor_id)""".stripMargin +
      mmrUnrolledTail(5)),

    // q156: per-query A/B of rank-of-positive/rr/hit@5 for BM25-only
    // vs the RRF hybrid — the positive is the query's source doc
    // (doc_id = query_id), so both metric joins filter on it
    "q156_hybrid_ab_eval" -> (hybridFusedCtes + """,
      |qrels AS (SELECT DISTINCT query_id FROM qraw),
      |ms AS (
      |  SELECT q.query_id, s.rn AS sparse_rank FROM qrels q
      |  LEFT JOIN (SELECT query_id, rn FROM ranked
      |    WHERE doc_id = query_id AND rn <= 20) s USING (query_id)),
      |mh AS (
      |  SELECT q.query_id, h.rn AS hybrid_rank FROM qrels q
      |  LEFT JOIN (SELECT query_id, rn FROM hout
      |    WHERE doc_id = query_id AND rn <= 20) h USING (query_id))
      |SELECT ms.query_id, sparse_rank,
      |  coalesce(round(1.0 / sparse_rank, 6) + 0, 0.0) AS sparse_rr,
      |  coalesce(sparse_rank <= 5, false) AS sparse_hit5,
      |  hybrid_rank,
      |  coalesce(round(1.0 / hybrid_rank, 6) + 0, 0.0) AS hybrid_rr,
      |  coalesce(hybrid_rank <= 5, false) AS hybrid_hit5
      |FROM ms JOIN mh USING (query_id)
      |ORDER BY query_id""".stripMargin),

    // q159: the scale-path hybrid — the same fusion as q146 with the
    // dense half on IVF: dense corpus + query vectors from the shared
    // bucket chain, first-16-by-id codebook, nprobe=4 probing, exact
    // cosine only inside probed cells. No self-exclusion (queries are
    // an external relation; the Spark side passes excludeSelf=false)
    "q159_hybrid_ivf" -> (hybridBucketCtes + """,
      |w AS (
      |  SELECT doc_id, bucket,
      |    round(CAST(ws AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)), 6) + 0
      |      AS weight
      |  FROM hbb JOIN hnorm USING (doc_id)),
      |grid AS (
      |  SELECT doc_id, unnest(range(0, 64)) AS b
      |  FROM (SELECT DISTINCT doc_id FROM w)),
      |dense0 AS (
      |  SELECT g.doc_id, g.b, coalesce(w.weight, 0.0) AS x
      |  FROM grid g LEFT JOIN w
      |    ON w.doc_id = g.doc_id AND w.bucket = g.b),
      |dv AS (
      |  SELECT doc_id, list(x ORDER BY b) AS vv
      |  FROM dense0 GROUP BY doc_id),
      |qw AS (
      |  SELECT query_id, bucket,
      |    round(CAST(ws AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)), 6) + 0
      |      AS weight
      |  FROM qbb JOIN qnorm USING (query_id)),
      |qgrid AS (
      |  SELECT query_id, unnest(range(0, 64)) AS b
      |  FROM (SELECT DISTINCT query_id FROM qw)),
      |qdense AS (
      |  SELECT g.query_id, g.b, coalesce(qw.weight, 0.0) AS x
      |  FROM qgrid g LEFT JOIN qw
      |    ON qw.query_id = g.query_id AND qw.bucket = g.b),
      |qdv AS (
      |  SELECT query_id, list(x ORDER BY b) AS vv
      |  FROM qdense GROUP BY query_id),
      |cb AS (
      |  SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
      |      AS INTEGER) AS cell, vv AS cv
      |  FROM (SELECT doc_id, vv FROM dv ORDER BY doc_id LIMIT 16)),
      |asn AS (
      |  SELECT doc_id, cell FROM (
      |    SELECT dv.doc_id, cb.cell, row_number() OVER (
      |      PARTITION BY dv.doc_id
      |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
      |    FROM dv CROSS JOIN cb) WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, cell FROM (
      |    SELECT qdv.query_id, cb.cell, row_number() OVER (
      |      PARTITION BY qdv.query_id
      |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
      |    FROM qdv CROSS JOIN cb) WHERE rn <= 4),
      |probescore AS (
      |  SELECT p.query_id, a.doc_id AS neighbor_id,
      |    list_cosine_similarity(qv2.vv, nv.vv) AS cs
      |  FROM probes p JOIN asn a ON p.cell = a.cell
      |  JOIN qdv qv2 ON qv2.query_id = p.query_id
      |  JOIN dv nv ON nv.doc_id = a.doc_id),
      |ivfranked AS (
      |  SELECT query_id, neighbor_id AS doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cs DESC, neighbor_id) AS INTEGER) AS rn
      |  FROM probescore),
      |fused2 AS (
      |  SELECT coalesce(s.query_id, dd.query_id) AS query_id,
      |    coalesce(s.doc_id, dd.doc_id) AS doc_id,
      |    coalesce(1.0 / (60 + s.rn), 0.0)
      |      + coalesce(1.0 / (60 + dd.rn), 0.0) AS rrf,
      |    s.rn AS rank_sparse, dd.rn AS rank_dense
      |  FROM (SELECT query_id, doc_id, rn FROM ranked
      |    WHERE rn <= 20) s
      |  FULL JOIN (SELECT query_id, doc_id, rn FROM ivfranked
      |    WHERE rn <= 20) dd
      |    ON s.query_id = dd.query_id AND s.doc_id = dd.doc_id)
      |SELECT query_id, doc_id, round(rrf, 6) + 0 AS rrf_score,
      |  rank_sparse, rank_dense, rn
      |FROM (
      |  SELECT query_id, doc_id, rrf, rank_sparse, rank_dense,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf DESC, doc_id) AS INTEGER) AS rn
      |  FROM fused2)
      |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin),

    // q160: q151's IVF probe + top-5, but votes are ×10⁶-scaled
    // 4-dp cosines summed per label; argmax (sum desc, label asc)
    "q160_knn_weighted" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |tr AS (SELECT * FROM v WHERE vec_id % 5 <> 0),
        |te AS (SELECT * FROM v WHERE vec_id % 5 = 0),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
        |      AS INTEGER) AS cell, vv AS cv
        |  FROM (SELECT vec_id, vv FROM tr ORDER BY vec_id LIMIT 16)),
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT tr.vec_id, cb.cell, row_number() OVER (
        |      PARTITION BY tr.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM tr CROSS JOIN cb) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT te.vec_id AS query_id, cb.cell, row_number() OVER (
        |      PARTITION BY te.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM te CROSS JOIN cb) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv.vv, nv.vv) AS cs
        |  FROM probes p JOIN asn a USING (cell)
        |  JOIN te qv ON qv.vec_id = p.query_id
        |  JOIN tr nv ON nv.vec_id = a.vec_id),
        |topk AS (
        |  SELECT query_id, neighbor_id, round(cs, 4) AS cs4 FROM (
        |    SELECT query_id, neighbor_id, cs, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |      AS rn
        |    FROM scored) WHERE rn <= 5),
        |votes AS (
        |  SELECT t.query_id, nv.label,
        |    sum(CAST(round(t.cs4 * 1000000.0) AS BIGINT)) AS ws
        |  FROM topk t JOIN tr nv ON nv.vec_id = t.neighbor_id
        |  GROUP BY 1, 2),
        |pick AS (
        |  SELECT query_id, label AS pred_label, ws FROM (
        |    SELECT query_id, label, ws, row_number() OVER (
        |      PARTITION BY query_id ORDER BY ws DESC, label) AS rk
        |    FROM votes) WHERE rk = 1)
        |SELECT p.query_id AS vec_id, te.label AS true_label,
        |  p.pred_label,
        |  round(CAST(p.ws AS DOUBLE) / 1000000.0, 4) + 0
        |    AS vote_weight,
        |  (p.pred_label = te.label) AS correct
        |FROM pick p JOIN te ON te.vec_id = p.query_id
        |ORDER BY vec_id""".stripMargin,

    // q147: nearest-centroid classification — per-label 6-dp-rounded
    // mean centroids on the 80% slice (the k-means means discipline),
    // held-out rows classified by cosine argmax (ties → smaller
    // label), the same list_cosine_similarity ↔ CosineSim agreement
    // the ANN oracles rely on.
    "q147_centroid_classify" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, dim, round(avg(x), 6) + 0 AS mx FROM (
        |    SELECT label,
        |      CAST(generate_subscripts(vv, 1) - 1 AS INT) AS dim,
        |      unnest(vv) AS x
        |    FROM v WHERE vec_id % 5 <> 0)
        |  GROUP BY label, dim),
        |cb AS (
        |  SELECT label, list(mx ORDER BY dim) AS cv
        |  FROM cent GROUP BY label),
        |scoredc AS (
        |  SELECT te.vec_id, te.label AS true_label,
        |    cb.label AS pred_label,
        |    list_cosine_similarity(te.vv, cb.cv) AS cs,
        |    row_number() OVER (PARTITION BY te.vec_id
        |      ORDER BY list_cosine_similarity(te.vv, cb.cv) DESC,
        |        cb.label) AS rk
        |  FROM (SELECT * FROM v WHERE vec_id % 5 = 0) te
        |  CROSS JOIN cb)
        |SELECT vec_id, true_label, pred_label,
        |  round(cs, 4) + 0 AS pred_cos,
        |  (pred_label = true_label) AS correct
        |FROM scoredc WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    // q149: MMR re-rank — shortlist chosen on RAW cosine rank (the
    // bruteForceTopK ordering), relevance consumed at its 4-dp surface
    // rounding, 5 unrolled greedy rounds scoring
    // 0.7·rel − (1.0−0.7)·max_sim (the (1.0 - 0.7) form keeps the
    // IEEE constant identical to Spark's `lit(1.0 - lambda)`),
    // argmax ties → smaller id.
    "q149_mmr_rerank" -> (
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |sl AS MATERIALIZED (
        |  SELECT query_id, neighbor_id, round(cs, 4) + 0 AS rel FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      list_cosine_similarity(q.vv, c.vv) AS cs,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(q.vv, c.vv) DESC,
        |          c.vec_id) AS rk
        |    FROM v q CROSS JOIN v c
        |    WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
        |  WHERE rk <= 20),
        |ps AS MATERIALIZED (
        |  SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
        |    list_cosine_similarity(vi.vv, vj.vv) AS sim
        |  FROM sl a JOIN sl b ON a.query_id = b.query_id
        |    AND a.neighbor_id <> b.neighbor_id
        |  JOIN v vi ON vi.vec_id = a.neighbor_id
        |  JOIN v vj ON vj.vec_id = b.neighbor_id)""".stripMargin +
        mmrUnrolledTail(5)),


    "q133_blocklist_table" ->
      """WITH tk AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END
        |    AS toks
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) < 2
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1]) END)) AS phrase
        |  FROM tk),
        |top AS (
        |  SELECT phrase FROM (
        |    SELECT phrase, count(*) AS df FROM big
        |    WHERE len(phrase) > 0
        |    GROUP BY phrase ORDER BY df DESC, phrase LIMIT 20)),
        |hits AS (
        |  SELECT d.doc_id, t.phrase
        |  FROM documents d JOIN top t
        |    ON contains(lower(d.text), t.phrase)),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
        |    min(phrase) AS first_hit
        |  FROM hits GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_hits, 0) AS n_hits, a.first_hit,
        |  (a.n_hits IS NOT NULL) AS blocked
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q123_curation_funnel" ->
      """WITH b AS (
        |  SELECT doc_id, source, md5(text) AS dg,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END
        |      AS BIGINT) AS n_tokens,
        |    (round(
        |      (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |       * (1.0 - least(
        |           (CAST(len(regexp_extract_all(text, '[[:punct:]]'))
        |              AS DOUBLE)
        |            / greatest(CAST(length(text) AS DOUBLE), 1.0))
        |           * 4.0, 1.0) * 0.5))
        |      * sqrt(
        |          CAST(len(list_distinct(CASE WHEN trim(text) = ''
        |            THEN [] ELSE string_split_regex(
        |              trim(lower(text)), '\s+') END)) AS DOUBLE)
        |          / greatest(CAST(CASE WHEN trim(text) = '' THEN 0
        |            ELSE len(string_split_regex(trim(text), '\s+'))
        |            END AS DOUBLE), 1.0)), 4) >= 0.3) AS gated
        |  FROM documents),
        |k AS (SELECT min(doc_id) AS doc_id FROM b WHERE gated
        |  GROUP BY dg)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN gated THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_gated,
        |  CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
        |  CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN n_tokens
        |    ELSE 0 END) AS BIGINT) AS tokens_kept
        |FROM b LEFT JOIN k USING (doc_id)
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q122_training_export" ->
      (bpeCountChain(5) + """,
        |g AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE round(
        |    (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |     * (1.0 - least(
        |         (CAST(len(regexp_extract_all(text, '[[:punct:]]'))
        |            AS DOUBLE)
        |          / greatest(CAST(length(text) AS DOUBLE), 1.0))
        |         * 4.0, 1.0) * 0.5))
        |    * sqrt(
        |        CAST(len(list_distinct(CASE WHEN trim(text) = ''
        |          THEN [] ELSE string_split_regex(
        |            trim(lower(text)), '\s+') END)) AS DOUBLE)
        |        / greatest(CAST(CASE WHEN trim(text) = '' THEN 0
        |          ELSE len(string_split_regex(trim(text), '\s+'))
        |          END AS DOUBLE), 1.0)), 4) >= 0.3),
        |k AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY md5(text)),
        |c AS (SELECT g.doc_id, g.text FROM g JOIN k USING (doc_id)),
        |t AS (
        |  SELECT c.doc_id, nt.n_tokens,
        |    CAST(c.doc_id % 4 AS INT) AS shard
        |  FROM c JOIN nt ON c.doc_id = nt.doc_id),
        |o AS (
        |  SELECT *, CAST(COALESCE(sum(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS stream_offset
        |  FROM t),
        |h AS (
        |  SELECT doc_id, CAST(concat('0x', substring(
        |    md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    AS order_key
        |  FROM c),
        |ord AS (
        |  SELECT doc_id, order_key % 4 AS order_shard,
        |    CAST(row_number() OVER (PARTITION BY order_key % 4
        |      ORDER BY order_key, doc_id) AS BIGINT) AS order_pos
        |  FROM h)
        |SELECT o.doc_id, n_tokens, shard,
        |  CAST(shard AS BIGINT) * 1099511627776
        |    + CAST(floor(stream_offset / 512) AS BIGINT) AS pack_id,
        |  CAST(stream_offset % 512 AS BIGINT) AS offset_in_pack,
        |  order_shard, order_pos
        |FROM o JOIN ord USING (doc_id)
        |ORDER BY o.doc_id""".stripMargin),

    "q121_market_share" ->
      """WITH base AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    round(sum(CASE WHEN sn.n_name = 'NATION_1'
        |      THEN l_extendedprice * (1 - l_discount)
        |      ELSE CAST(0 AS DOUBLE) END), 2) AS nation_volume,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2)
        |      AS total_volume
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |    AND r_name = 'AMERICA'
        |  WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        |    AND CAST(o_orderdate AS DATE) <= DATE '1996-12-31'
        |  GROUP BY 1)
        |SELECT o_year, nation_volume, total_volume,
        |  round(nation_volume / total_volume, 4) AS mkt_share
        |FROM base ORDER BY o_year""".stripMargin,

    "q96_span_corrupt" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |m AS (
        |  SELECT doc_id, toks,
        |    list_transform(toks, (t, i) ->
        |      substring(md5('t5:' || CAST(doc_id AS VARCHAR) || ':'
        |        || CAST(i - 1 AS VARCHAR)), 1, 2) < '2a') AS hit
        |  FROM docs)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(hit, h -> h)) AS BIGINT) AS n_masked,
        |  array_to_string(list_transform(toks, (t, i) ->
        |    CASE WHEN hit[i] THEN '<X>' ELSE t END), ' ')
        |    AS masked_text,
        |  coalesce(array_to_string(
        |    list_filter(toks, (t, i) -> hit[i]), ' '), '') AS targets
        |FROM m
        |ORDER BY doc_id""".stripMargin,

    "q95_kmeans_step" ->
      """WITH cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |      AS cell,
        |    CAST(embedding AS DOUBLE[]) AS cv
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |      FROM embeddings),
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, cb.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb) WHERE rn = 1),
        |long AS (
        |  SELECT asn.cell,
        |    CAST(generate_subscripts(v.vv, 1) - 1 AS INT) AS dim,
        |    unnest(v.vv) AS x
        |  FROM asn JOIN v ON asn.vec_id = v.vec_id)
        |SELECT cell, dim, count(*) AS n_members,
        |  round(avg(x), 6) + 0 AS mean_val
        |FROM long GROUP BY cell, dim
        |ORDER BY cell, dim""".stripMargin,

    "q94_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END
        |      AS n_tokens
        |  FROM documents),
        |keyed AS (
        |  SELECT doc_id, n_tokens,
        |    ln((CAST(concat('0x', substring(
        |          md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) + 0.5) / 4294967296.0)
        |      / n_tokens AS k
        |  FROM w WHERE n_tokens >= 1),
        |ranked AS (
        |  SELECT doc_id, n_tokens, round(k, 6) AS sample_key,
        |    CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS INT)
        |      AS rn
        |  FROM keyed)
        |SELECT doc_id, n_tokens, sample_key, rn
        |FROM ranked WHERE rn <= 25
        |ORDER BY rn""".stripMargin,

    "q93_containment" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents WHERE doc_id < 100)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CASE WHEN len(a.s) = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |        / len(a.s) END, 4) AS containment
        |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
        |SELECT id_a, id_b, containment FROM p
        |WHERE containment >= 0.02
        |ORDER BY id_a, id_b""".stripMargin,

    "q90_lm_score" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |tris AS (
        |  SELECT doc_id, t[1] AS w1, t[2] AS w2, t[3] AS w3
        |  FROM (SELECT doc_id, unnest(list_zip(toks[1:len(toks)-2],
        |          toks[2:len(toks)-1], toks[3:len(toks)])) AS t
        |        FROM docs WHERE len(toks) >= 3)),
        |bis AS (
        |  SELECT p[1] AS w1, p[2] AS w2
        |  FROM (SELECT unnest(list_zip(toks[1:len(toks)-1],
        |          toks[2:len(toks)])) AS p
        |        FROM docs WHERE len(toks) >= 2)),
        |c3 AS (SELECT w1, w2, w3, count(*) AS c FROM tris
        |       GROUP BY 1, 2, 3),
        |c2 AS (SELECT w1, w2, count(*) AS c FROM bis GROUP BY 1, 2)
        |SELECT tris.doc_id, count(*) AS n_trigrams,
        |  round(avg(ln(CAST(c3.c AS DOUBLE) / c2.c)), 4) + 0
        |    AS avg_logprob
        |FROM tris JOIN c3 USING (w1, w2, w3) JOIN c2 USING (w1, w2)
        |GROUP BY tris.doc_id
        |ORDER BY doc_id""".stripMargin,

    "q91_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_custkey AS c_custkey,
        |    CASE o_orderstatus WHEN 'P' THEN 'D' WHEN 'O' THEN 'I'
        |      ELSE 'U' END AS op,
        |    o_orderkey AS seq,
        |    'cust-' || CAST(o_orderkey AS VARCHAR) AS c_name,
        |    o_orderpriority AS c_mktsegment
        |  FROM orders),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY seq DESC,
        |        CASE WHEN op = 'D' THEN 0 ELSE 1 END, op) AS rn
        |    FROM log) WHERE rn = 1),
        |deletes AS (SELECT c_custkey FROM latest WHERE op = 'D'),
        |upserts AS (SELECT c_custkey, c_name, c_mktsegment
        |            FROM latest WHERE op <> 'D')
        |SELECT b.c_custkey,
        |  coalesce(u.c_name, b.c_name) AS c_name,
        |  coalesce(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment
        |FROM customer b
        |LEFT JOIN upserts u ON b.c_custkey = u.c_custkey
        |WHERE b.c_custkey NOT IN (SELECT c_custkey FROM deletes)
        |UNION ALL
        |SELECT u.c_custkey, u.c_name, u.c_mktsegment
        |FROM upserts u
        |WHERE u.c_custkey NOT IN (SELECT c_custkey FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q87_sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev IS NULL
        |      OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |g AS (
        |  SELECT *, CAST(sum(new_s) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start,
        |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 3)
        |    AS duration_sec,
        |  round(sum(value), 2) AS sum_value
        |FROM g GROUP BY 1, 2
        |ORDER BY user_id, session_id""".stripMargin,

    "q101_kmeans_train" ->
      (lloyd2cb16 + """
        |SELECT cell, CAST(generate_subscripts(cv, 1) - 1 AS INT)
        |    AS dim,
        |  unnest(cv) AS mean_val
        |FROM cb2 ORDER BY cell, dim""".stripMargin),

    "q102_capped_semdedup" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |      AS cell,
        |    CAST(embedding AS DOUBLE[]) AS cv
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)),
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, cb.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb) WHERE rn = 1),
        |cnt AS (SELECT cell, count(*) AS n FROM asn GROUP BY cell),
        |sub AS (
        |  SELECT asn.vec_id, asn.cell,
        |    CASE WHEN cnt.n <= 16 THEN 0
        |      ELSE CAST(concat('0x', substring(md5('cellsplit:' ||
        |          CAST(asn.vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |        % CAST(ceil(cnt.n / 16.0) AS BIGINT) END AS subcell
        |  FROM asn JOIN cnt USING (cell)),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(va.vv, vb.vv) AS cs
        |  FROM sub a JOIN sub b ON a.cell = b.cell
        |    AND a.subcell = b.subcell AND a.vec_id < b.vec_id
        |  JOIN v va ON va.vec_id = a.vec_id
        |  JOIN v vb ON vb.vec_id = b.vec_id),
        |dropped AS (
        |  SELECT id_b, min(id_a) AS dup_of,
        |    round(arg_min(cs, id_a), 4) AS dup_sim
        |  FROM pairs WHERE cs >= 0.2 GROUP BY id_b)
        |SELECT sub.vec_id, sub.cell, (d.dup_of IS NULL) AS kept,
        |  d.dup_of, d.dup_sim
        |FROM sub LEFT JOIN dropped d ON sub.vec_id = d.id_b
        |ORDER BY sub.vec_id""".stripMargin,

    // ---- LSH pipelines, oracle-checked downstream of the hash ---------
    // The hash families themselves (64-hash MinHash + xxhash64 banding,
    // SimHash64, seeded hyperplane signs) are not replicable in DuckDB,
    // so Spark dumps them as fixtures (q103/q104/q105) and these oracles
    // recompute the entire candidate-generation + verification pipeline
    // in SQL from the fixture: band/chunk/bucket self-join, pair dedup,
    // and exact jaccard/hamming/cosine verification against the source
    // tables. __VERIFY_OUT__ is substituted with the dump dir by Verify.

    "q24_minhash_neardups" ->
      """WITH bands AS (
        |  SELECT * FROM
        |    read_parquet('__VERIFY_OUT__/q104_minhash_band_fixture/*.parquet')),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_hash = b.band_hash
        |    AND a.doc_id < b.doc_id),
        |sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents)),
        |p AS (
        |  SELECT id_a, id_b, CASE
        |    WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) = 0
        |    THEN CAST(1 AS DOUBLE)
        |    ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    END AS j
        |  FROM cand JOIN sh a ON a.doc_id = cand.id_a
        |  JOIN sh b ON b.doc_id = cand.id_b)
        |SELECT id_a, id_b, round(j, 4) AS jaccard
        |FROM p WHERE j >= 0.2 ORDER BY id_a, id_b""".stripMargin,

    "q25_simhash_neardups" ->
      """WITH h AS (
        |  SELECT doc_id, simhash FROM
        |    read_parquet('__VERIFY_OUT__/q103_simhash_fixture/*.parquet')),
        |ch AS (
        |  SELECT doc_id, simhash, r.i AS chunk,
        |    (simhash >> (r.i * 16)) & 65535 AS chunk_val
        |  FROM h, (SELECT unnest(range(4)) AS i) r),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM ch a JOIN ch b
        |    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
        |    AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM cand
        |WHERE hamming <= 8 ORDER BY id_a, id_b""".stripMargin,

    "q30_embedding_neardups" ->
      """WITH bk AS (
        |  SELECT * FROM
        |    read_parquet('__VERIFY_OUT__/q105_lsh_bucket_fixture/*.parquet')),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM bk x JOIN bk y
        |    ON x.tbl = y.tbl AND x.bucket = y.bucket
        |    AND x.vec_id < y.vec_id),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |s AS (
        |  SELECT id_a, id_b, list_cosine_similarity(va.vv, vb.vv) AS cs
        |  FROM cand JOIN v va ON va.vec_id = cand.id_a
        |  JOIN v vb ON vb.vec_id = cand.id_b)
        |SELECT id_a, id_b, round(cs, 4) AS cos_sim
        |FROM s WHERE cs >= 0.2 ORDER BY id_a, id_b""".stripMargin,

    // fingerprint equivalence classes checked against the normalized
    // token stream itself — the hash-free ground truth of q27's contract
    "q106_fingerprint_groups" ->
      """WITH k AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN ''
        |    ELSE array_to_string(
        |      string_split_regex(trim(text), '\s+'), chr(1))
        |    END AS key
        |  FROM documents),
        |g AS (
        |  SELECT key, min(doc_id) AS rep_id,
        |    CAST(count(*) AS BIGINT) AS n_copies
        |  FROM k GROUP BY key)
        |SELECT k.doc_id, g.rep_id, g.n_copies
        |FROM k JOIN g USING (key) ORDER BY doc_id""".stripMargin,

    "q107_token_budget" ->
      ("WITH " + docQualityTokens + """,
        |d2 AS (
        |  SELECT *, CAST(round(quality * 10000, 0) AS INT) AS b
        |  FROM doc),
        |bk AS (SELECT b, sum(n_tokens) AS tok FROM d2 GROUP BY b),
        |cum AS (
        |  SELECT b, tok, CAST(coalesce(sum(tok) OVER (
        |    ORDER BY b DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cum_before
        |  FROM bk),
        |f AS (
        |  SELECT b, cum_before, (cum_before + tok <= 10000) AS is_full
        |  FROM cum),
        |j AS (
        |  SELECT d2.doc_id, d2.quality, d2.n_tokens, d2.b,
        |    f.cum_before, f.is_full
        |  FROM d2 JOIN f USING (b)),
        |part AS (
        |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
        |    PARTITION BY b ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS doc_before
        |  FROM j WHERE NOT is_full AND cum_before < 10000)
        |SELECT doc_id, quality, n_tokens FROM j WHERE is_full
        |UNION ALL
        |SELECT doc_id, quality, n_tokens FROM part
        |WHERE cum_before + doc_before + n_tokens <= 10000
        |ORDER BY doc_id""".stripMargin),

    "q108_dsir_weights" ->
      """WITH bg AS (
        |  SELECT doc_id, (source = 'src0') AS t, unnest(
        |    CASE WHEN len(toks) < 2 THEN []
        |      ELSE list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1]) END) AS fg
        |  FROM (SELECT doc_id, source, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents)),
        |fb AS (
        |  SELECT doc_id, t, CAST(concat('0x', substring(md5(fg), 1, 8))
        |    AS BIGINT) % 256 AS fbk
        |  FROM bg),
        |cnt AS (
        |  SELECT fbk,
        |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
        |    sum(CASE WHEN t THEN 0 ELSE 1 END) AS cs
        |  FROM fb GROUP BY fbk),
        |tot AS (SELECT sum(ct) AS nt, sum(cs) AS ns FROM cnt),
        |lr AS (
        |  SELECT fbk, round(ln(
        |    (CAST(ct + 1 AS DOUBLE) / CAST(nt + 256 AS DOUBLE))
        |    / (CAST(cs + 1 AS DOUBLE) / CAST(ns + 256 AS DOUBLE))), 6)
        |    AS lrv
        |  FROM cnt CROSS JOIN tot),
        |lrt AS (
        |  SELECT list(coalesce(lr.lrv, 0.0) ORDER BY r.range) AS lrl
        |  FROM range(0, 256) r LEFT JOIN lr ON lr.fbk = r.range),
        |bl AS (
        |  SELECT doc_id, CASE WHEN len(toks) < 2 THEN []
        |      ELSE list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1]) END AS bgl
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents))
        |SELECT bl.doc_id, CAST(len(bgl) AS BIGINT) AS n_feats,
        |  round(coalesce(list_sum(list_transform(bgl, g ->
        |    lrl[(CAST(concat('0x', substring(md5(g), 1, 8)) AS BIGINT)
        |      % 256) + 1])), 0.0), 4) + 0 AS weight
        |FROM bl CROSS JOIN lrt
        |ORDER BY bl.doc_id""".stripMargin,

    "q109_winnowing" ->
      (winnowFp + """
        |SELECT doc_id, fp FROM fp ORDER BY doc_id, fp""".stripMargin),

    "q110_overlap_pairs" ->
      (winnowFp + """,
        |rare AS (
        |  SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY fp)
        |  WHERE df <= 50),
        |pr AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin),

    "q111_bpe_merges" -> bpeMerges(5),

    "q112_bpe_encode" -> bpeEncode(5),

    "q125_bpe_token_ids" -> bpeTokenIds(5),

    // q59's exact-Jaccard closure + q21's quality formula; the
    // representative is the (quality desc, doc_id asc) argmax
    "q113_cluster_best" -> (closureCtes() + """,
        |q AS (SELECT doc_id,
        |  round(
        |    (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
        |     * (1.0 - least(
        |         (CAST(len(regexp_extract_all(text, '[[:punct:]]'))
        |            AS DOUBLE)
        |          / greatest(CAST(length(text) AS DOUBLE), 1.0))
        |         * 4.0, 1.0) * 0.5))
        |    * sqrt(
        |        CAST(len(list_distinct(CASE WHEN trim(text) = ''
        |          THEN [] ELSE string_split_regex(
        |            trim(lower(text)), '\s+') END)) AS DOUBLE)
        |        / greatest(CAST(CASE WHEN trim(text) = '' THEN 0
        |          ELSE len(string_split_regex(trim(text), '\s+'))
        |          END AS DOUBLE), 1.0)), 4) AS quality
        |  FROM documents),
        |j AS (SELECT lab.doc_id, lab.cluster_id, q.quality
        |  FROM lab JOIN q USING (doc_id)),
        |r AS (SELECT cluster_id, doc_id AS rep_id, row_number()
        |    OVER (PARTITION BY cluster_id
        |      ORDER BY quality DESC, doc_id) AS rn
        |  FROM j)
        |SELECT j.doc_id, j.cluster_id, j.quality, r.rep_id,
        |  j.doc_id = r.rep_id AS keep
        |FROM j JOIN r ON j.cluster_id = r.cluster_id AND r.rn = 1
        |ORDER BY j.doc_id""".stripMargin),

    // same md5-prefix hash as the Spark side → identical permutation
    "q114_training_order" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substring(
        |      md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      AS order_key
        |  FROM documents)
        |SELECT doc_id, order_key % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY order_key % 8
        |    ORDER BY order_key, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,

    // q152: the q112 encode chain grouped by language — fertility =
    // Σtokens/Σwords on exact integer sums
    "q152_tokenizer_fertility" -> (bpeChain(5) + s""",
      |enc AS (
      |  SELECT word, n,
      |    CAST(len(string_split_regex(trim(sym), ' +')) AS BIGINT)
      |      AS nsym
      |  FROM v5),
      |dw AS (
      |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
      |      ELSE string_split_regex(trim(lower(text)), '\\s+') END)
      |    AS word FROM documents),
      |pd AS (
      |  SELECT dw.doc_id, CAST(sum(e.nsym) AS BIGINT) AS n_bpe_tokens,
      |    CAST(count(*) AS BIGINT) AS n_words
      |  FROM dw JOIN enc e USING (word) GROUP BY dw.doc_id),
      |pl AS (
      |  SELECT d.lang, coalesce(pd.n_bpe_tokens, 0) AS nb,
      |    coalesce(pd.n_words, 0) AS nw
      |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
      |  CAST(sum(nw) AS BIGINT) AS n_words,
      |  round(CAST(sum(nb) AS DOUBLE)
      |    / CAST(greatest(sum(nw), 1) AS DOUBLE), 4) + 0 AS fertility
      |FROM pl GROUP BY lang ORDER BY lang""".stripMargin),

    // q153: q114's permutation ×3 epochs, epoch folded into the seed
    "q153_epoch_orders" ->
      """WITH e AS (
        |  SELECT doc_id, unnest([0, 1, 2]) AS epoch FROM documents),
        |h AS (
        |  SELECT doc_id, epoch,
        |    CAST(concat('0x', substring(
        |      md5('42:' || CAST(epoch AS VARCHAR) || ':'
        |        || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      AS order_key
        |  FROM e)
        |SELECT doc_id, epoch, order_key % 8 AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY epoch, order_key % 8
        |    ORDER BY order_key, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY doc_id, epoch""".stripMargin,

    "q115_pq_encode" -> pqEncodeSql(m = 4, sub = 16, cells = 16),

    "q116_pq_adc" -> pqAdcSql(m = 4, sub = 16, cells = 16, k = 5,
      nQueries = 10),

    // full IVF-PQ: coarse probe (trained cb2, as q40) → ADC shortlist
    // from PQ codes → exact-cosine re-rank of the top-20
    "q119_dup_spans" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) < 5
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 3),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |          || ' ' || toks[i+3] || ' ' || toks[i+4]) END)) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents)),
        |d AS (SELECT doc_id, md5(s) AS dg FROM sh),
        |dfr AS (SELECT dg, count(*) AS dfreq FROM d GROUP BY dg)
        |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup,
        |  round(CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS dup_fraction
        |FROM d JOIN dfr USING (dg)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Lee 2022 span removal: same window digests as q119 but with
    // start positions; covered positions are dropped from the
    // original-case token stream and the remainder re-joined
    // q129/q130: the md5 term hash and scaled-integer aggregation make
    // the hashing-trick vectors engine-portable; cosine numerators are
    // exact integer sums, so ranks agree bit-for-bit.
    "q129_hashed_tfidf" -> (hashedVectorCtes + """
        |SELECT doc_id, bucket,
        |  round(CAST(ws AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)), 6) + 0
        |    AS weight
        |FROM bb JOIN norms USING (doc_id)
        |ORDER BY doc_id, bucket""".stripMargin),

    "q130_text_ann" -> (hashedVectorCtes + """,
        |qv AS (SELECT doc_id AS query_id, bucket, ws AS wq, n2 AS nq
        |  FROM bb JOIN norms USING (doc_id) WHERE doc_id < 10),
        |cv AS (SELECT doc_id AS neighbor_id, bucket, ws AS wc,
        |    n2 AS nc
        |  FROM bb JOIN norms USING (doc_id)),
        |num AS (
        |  SELECT query_id, neighbor_id, sum(wq * wc) AS num
        |  FROM qv JOIN cv USING (bucket)
        |  WHERE neighbor_id <> query_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    CAST(coalesce(n.num, 0) AS DOUBLE)
        |      / (sqrt(CAST(q.nq AS DOUBLE))
        |         * sqrt(CAST(c.nc AS DOUBLE))) AS cs
        |  FROM (SELECT DISTINCT query_id, nq FROM qv) q
        |  CROSS JOIN (SELECT DISTINCT neighbor_id, nc FROM cv) c
        |  LEFT JOIN num n USING (query_id, neighbor_id)
        |  WHERE c.neighbor_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, round(cs, 4) + 0 AS cos_sim,
        |    CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |      AS INTEGER) AS rn
        |  FROM pairs)
        |SELECT query_id, neighbor_id, cos_sim, rn FROM ranked
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin),

    // q132: the SCALE path for text ANN — q129's hashed vectors
    // densified, then the exact IVF replica q40 uses: first-16-by-id
    // codebook, cosine-argmax cell assignment (ties → smaller cell),
    // nprobe=4 probing, (cos desc, id asc) top-5 within probed cells
    "q132_text_ann_ivf" -> (hashedVectorCtes + """,
        |w AS (
        |  SELECT doc_id, bucket,
        |    round(CAST(ws AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)), 6) + 0
        |      AS weight
        |  FROM bb JOIN norms USING (doc_id)),
        |grid AS (
        |  SELECT doc_id, unnest(range(0, 64)) AS b
        |  FROM (SELECT DISTINCT doc_id FROM w)),
        |dense AS (
        |  SELECT g.doc_id, g.b, coalesce(w.weight, 0.0) AS x
        |  FROM grid g LEFT JOIN w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.b),
        |dv AS (
        |  SELECT doc_id, list(x ORDER BY b) AS vv
        |  FROM dense GROUP BY doc_id),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
        |      AS INTEGER) AS cell, vv AS cv
        |  FROM (SELECT doc_id, vv FROM dv ORDER BY doc_id LIMIT 16)),
        |asn AS (
        |  SELECT doc_id, cell FROM (
        |    SELECT dv.doc_id, cb.cell, row_number() OVER (
        |      PARTITION BY dv.doc_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM dv CROSS JOIN cb) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT dv.doc_id AS query_id, cb.cell, row_number() OVER (
        |      PARTITION BY dv.doc_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM dv CROSS JOIN cb WHERE dv.doc_id < 10) WHERE rn <= 4),
        |probescore AS (
        |  SELECT p.query_id, a.doc_id AS neighbor_id,
        |    list_cosine_similarity(qv.vv, nv.vv) AS cs
        |  FROM probes p JOIN asn a ON p.cell = a.cell
        |  JOIN dv qv ON qv.doc_id = p.query_id
        |  JOIN dv nv ON nv.doc_id = a.doc_id
        |  WHERE a.doc_id <> p.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cs, CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |    AS INTEGER) AS rn
        |  FROM probescore)
        |SELECT query_id, neighbor_id, round(cs, 4) AS cos_sim, rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin),

    // q39: the mixed-modality feature surface re-derived from the
    // generator's closed-form pixel/sample/byte formulas (the
    // q127/q128/q161 discipline applied to the whole table): BMP and
    // PNG red-channel means, WAV PCM means, noise byte-histogram
    // mass, container sizes where the container is a content function
    // (BMP geometry, WAV PCM length, raw noise), header dims/rates
    // for every sniffable format. The float32 feature quantization is
    // replayed with an explicit CAST(AS FLOAT) round-trip. Encoder-
    // sized bytes (PNG deflate, JPEG) and the lossy JPEG mean are
    // NULL on both sides by construction.
    "q39_multimodal_features" ->
      """WITH a AS (SELECT CAST(i AS BIGINT) AS i FROM range(0, 300) t(i)),
        |bmp AS (SELECT i, 8 + i % 9 AS w, 6 + i % 7 AS h
        |  FROM a WHERE i % 5 = 0),
        |bmppx AS (
        |  SELECT i, w, h, x, unnest(range(0, h)) AS y
        |  FROM (SELECT i, w, h, unnest(range(0, w)) AS x FROM bmp)),
        |bmpf AS (
        |  SELECT i AS asset_id, 'image' AS modality,
        |    CAST(54 + ((any_value(w) * 3 + 3) // 4 * 4)
        |      * any_value(h) AS BIGINT) AS n_bytes,
        |    CAST(1 AS BIGINT) AS decoded_flag,
        |    round(CAST(CAST(CAST(sum((i*7 + x*3 + y*5) % 256)
        |        AS DOUBLE) / (255.0 * count(*)) AS FLOAT) AS DOUBLE)
        |      * 10000.0) / 10000.0 + 0 AS mean_ch1,
        |    'bmp' AS sniffed_format,
        |    CAST(any_value(w) AS INT) AS sniffed_width,
        |    CAST(NULL AS INT) AS sniffed_sample_rate
        |  FROM bmppx GROUP BY i),
        |png AS (SELECT i, 8 + i % 9 AS w, 6 + i % 7 AS h
        |  FROM a WHERE i % 5 = 1),
        |pngpx AS (
        |  SELECT i, w, h, x, unnest(range(0, h)) AS y
        |  FROM (SELECT i, w, h, unnest(range(0, w)) AS x FROM png)),
        |pngf AS (
        |  SELECT i AS asset_id, 'image' AS modality,
        |    CAST(NULL AS BIGINT) AS n_bytes,
        |    CAST(1 AS BIGINT) AS decoded_flag,
        |    round(CAST(CAST(CAST(sum((i*7 + x*3 + y*5) % 256)
        |        AS DOUBLE) / (255.0 * count(*)) AS FLOAT) AS DOUBLE)
        |      * 10000.0) / 10000.0 + 0 AS mean_ch1,
        |    'png' AS sniffed_format,
        |    CAST(any_value(w) AS INT) AS sniffed_width,
        |    CAST(NULL AS INT) AS sniffed_sample_rate
        |  FROM pngpx GROUP BY i),
        |jpgf AS (
        |  SELECT i AS asset_id, 'image' AS modality,
        |    CAST(NULL AS BIGINT) AS n_bytes,
        |    CAST(1 AS BIGINT) AS decoded_flag,
        |    CAST(NULL AS DOUBLE) AS mean_ch1,
        |    'jpeg' AS sniffed_format,
        |    CAST(16 + i % 17 AS INT) AS sniffed_width,
        |    CAST(NULL AS INT) AS sniffed_sample_rate
        |  FROM a WHERE i % 5 = 2),
        |wav AS (SELECT i, 60 + (i % 50) * 3 AS m
        |  FROM a WHERE i % 5 = 3),
        |wavs AS (SELECT i, m, unnest(range(0, m)) AS t FROM wav),
        |wavf AS (
        |  SELECT i AS asset_id, 'audio' AS modality,
        |    CAST(44 + 2 * any_value(m) AS BIGINT) AS n_bytes,
        |    CAST(1 AS BIGINT) AS decoded_flag,
        |    round(CAST(CAST(CAST(sum((i*37 + t*101) % 65536 - 32768)
        |        AS DOUBLE) / (32768.0 * count(*)) AS FLOAT) AS DOUBLE)
        |      * 10000.0) / 10000.0 + 0 AS mean_ch1,
        |    'wav' AS sniffed_format,
        |    CAST(NULL AS INT) AS sniffed_width,
        |    CAST(8600 AS INT) AS sniffed_sample_rate
        |  FROM wavs GROUP BY i),
        |vidb AS (SELECT i, unnest(range(0, 96)) AS j
        |  FROM a WHERE i % 5 = 4),
        |vidf AS (
        |  SELECT i AS asset_id, 'video' AS modality,
        |    CAST(96 AS BIGINT) AS n_bytes,
        |    CAST(0 AS BIGINT) AS decoded_flag,
        |    round(CAST(CAST(CAST(sum(CASE WHEN (i*31 + j*7) % 251 < 32
        |          THEN 1 ELSE 0 END) AS DOUBLE) / 96.0 AS FLOAT)
        |        AS DOUBLE)
        |      * 10000.0) / 10000.0 + 0 AS mean_ch1,
        |    CAST(NULL AS VARCHAR) AS sniffed_format,
        |    CAST(NULL AS INT) AS sniffed_width,
        |    CAST(NULL AS INT) AS sniffed_sample_rate
        |  FROM vidb GROUP BY i)
        |SELECT * FROM (
        |  SELECT * FROM bmpf UNION ALL SELECT * FROM pngf
        |  UNION ALL SELECT * FROM jpgf UNION ALL SELECT * FROM wavf
        |  UNION ALL SELECT * FROM vidf)
        |ORDER BY asset_id""".stripMargin,

    // q127/q128: the engine decodes REAL container bytes (BMP pixel
    // rows / WAV PCM samples); the oracle re-derives the expected
    // stats from the generator's closed-form pixel/sample formulas —
    // independent paths that agree only if the byte-level decode
    // (row padding, BGR order, chunk walk, sign extension) is right.
    "q127_bmp_decode" ->
      """WITH img AS (
        |  SELECT CAST(i AS BIGINT) AS i FROM range(0, 120) t(i)
        |  WHERE i % 3 = 0),
        |dims AS (
        |  SELECT i, 8 + i % 9 AS w, 6 + i % 7 AS h FROM img),
        |xs AS (
        |  SELECT i, w, h, unnest(range(0, w)) AS x FROM dims),
        |px AS (
        |  SELECT i, w, h, x, unnest(range(0, h)) AS y FROM xs)
        |SELECT i AS asset_id,
        |  CAST(any_value(w) AS BIGINT) AS width,
        |  CAST(any_value(h) AS BIGINT) AS height,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  round(CAST(sum((i*7 + x*3 + y*5) % 256) AS DOUBLE)
        |    / count(*), 6) + 0 AS mean_r,
        |  round(CAST(sum((i*11 + x*13 + y*17) % 256) AS DOUBLE)
        |    / count(*), 6) + 0 AS mean_g,
        |  round(CAST(sum((i*19 + x*23 + y*29) % 256) AS DOUBLE)
        |    / count(*), 6) + 0 AS mean_b
        |FROM px GROUP BY i ORDER BY asset_id""".stripMargin,

    "q167_url_canon" ->
      """WITH d AS (
        |  SELECT CAST(i AS BIGINT) AS i FROM range(0, 110) t(i)),
        |raw AS (
        |  SELECT i, CASE WHEN i % 11 = 10
        |    THEN 'not a url ' || CAST(i AS VARCHAR)
        |    ELSE
        |      (CASE WHEN i % 2 = 0 THEN 'HTTP' ELSE 'https' END)
        |      || '://'
        |      || (CASE WHEN i % 7 = 3 THEN 'u:p@' ELSE '' END)
        |      || 'WWW.Example' || CAST(i % 7 AS VARCHAR) || '.COM'
        |      || (['', ':80', ':443', ':8080'])[(i % 4) + 1]
        |      || (['', '/', '//a//b/', '/a/b'])[((i // 4) % 4) + 1]
        |      || (CASE WHEN i % 3 = 0
        |          THEN '?q=' || CAST(i AS VARCHAR) || '&x=1'
        |          ELSE '' END)
        |      || (CASE WHEN i % 5 = 0 THEN '#sec' ELSE '' END)
        |    END AS url
        |  FROM d),
        |parts AS (
        |  SELECT i, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$',
        |      1)) AS scheme,
        |    regexp_replace(lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$',
        |      2)), '^[^@]*@', '') AS auth,
        |    regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$',
        |      3) AS path0,
        |    regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$',
        |      4) AS query
        |  FROM raw),
        |norm AS (
        |  SELECT i, url, scheme, query,
        |    CASE WHEN scheme = 'http'
        |        THEN regexp_replace(auth, ':80$', '')
        |      WHEN scheme = 'https'
        |        THEN regexp_replace(auth, ':443$', '')
        |      ELSE auth END AS authport,
        |    regexp_replace(path0, '/{2,}', '/', 'g') AS path1
        |  FROM parts),
        |fin AS (
        |  SELECT i, url, scheme, query, authport,
        |    regexp_replace(authport, ':[0-9]+$', '') AS host,
        |    CASE WHEN path1 = '' THEN '/'
        |      WHEN length(path1) > 1
        |        THEN regexp_replace(path1, '/$', '')
        |      ELSE path1 END AS path2
        |  FROM norm)
        |SELECT i AS url_id, url,
        |  CASE WHEN scheme = '' OR host = '' THEN NULL
        |    ELSE scheme || '://' || authport || path2 || query END
        |    AS canon_url,
        |  CASE WHEN scheme = '' OR host = '' THEN NULL
        |    ELSE host END AS url_host
        |FROM fin ORDER BY url_id""".stripMargin,

    // exact threshold-Jaccard pairs, computed via the exploded-shingle
    // equi-join (equivalent to the n² cross join for any t > 0 — a
    // pair with Jaccard >= t shares at least one shingle — but
    // tractable at sf0.1 where the cross join is 12.5M list_intersects)
    "q168_setsim_join" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END)) AS tok
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents)),
        |ln AS (SELECT doc_id, count(*) AS len FROM sh GROUP BY doc_id),
        |ov AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / (la.len + lb.len - inter), 4)
        |    AS jaccard
        |FROM ov
        |JOIN ln la ON ov.id_a = la.doc_id
        |JOIN ln lb ON ov.id_b = lb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (la.len + lb.len - inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // compression-ratio quality gate, fixture-oracled the q103-q105
    // way: DuckDB has no zlib, so the per-doc ratios come from q171's
    // Spark dump and the oracle replays the whole downstream gate —
    // threshold filter + per-source rollup — in SQL. A wrong join,
    // threshold, or rollup breaks the hash; the codec itself stays
    // under DeflateRatioSpec's roundtrip law
    "q187_compress_gate" ->
      """WITH r AS (
        |  SELECT doc_id, ratio FROM
        |    read_parquet('__VERIFY_OUT__/q171_compress_ratio/*.parquet'))
        |SELECT d.source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN r.ratio < 0.42 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_repetitive,
        |  CAST(sum(CAST(round(r.ratio * 10000) AS BIGINT))
        |    AS BIGINT) AS sum_ratio_e4
        |FROM documents d JOIN r ON d.doc_id = r.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // EWMA replayed as the identical sequential IEEE fold: list the
    // ordered series per user, fold prefix i with the same
    // s := 0.3·x + 0.7·s update (CASTs because DuckDB bare decimals
    // are DECIMAL, and DECIMAL·DOUBLE could round differently)
    "q190_ewma" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT user_id, t_us,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS rn
        |  FROM r),
        |l AS (
        |  SELECT user_id, list(v ORDER BY t_us) AS vs FROM r GROUP BY 1)
        |SELECT o.user_id, o.t_us,
        |  round(list_reduce(list_slice(l.vs, 1, o.rn),
        |    (s, x) -> CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * s),
        |    4) AS ewma
        |FROM o JOIN l USING (user_id)
        |ORDER BY 1, 2""".stripMargin,

    // bilinear resize replayed from the PNG generator's closed-form
    // pixel formulas: identical double operation order (half-pixel
    // centers, clamp, nested lerp association), float-cast at the
    // output exactly where the expression casts — any defect in the
    // decode, orientation, coordinate mapping, or weight arithmetic
    // moves a 4th decimal somewhere in the 3840 cells
    "q192_image_resize" ->
      """WITH img AS (
        |  SELECT CAST(i AS BIGINT) AS i FROM range(0, 120) t(i)
        |  WHERE i % 3 < 2),
        |dims AS (SELECT i, 8 + i % 9 AS w, 6 + i % 7 AS h FROM img),
        |oys AS (SELECT i, w, h, unnest(range(0, 4)) AS oy FROM dims),
        |cell AS (SELECT i, w, h, oy, unnest(range(0, 4)) AS ox FROM oys),
        |coord AS (
        |  SELECT i, w, h, oy, ox,
        |    least(greatest(((oy + CAST(0.5 AS DOUBLE)) * h) / 4
        |        - CAST(0.5 AS DOUBLE), CAST(0 AS DOUBLE)),
        |      CAST(h - 1 AS DOUBLE)) AS sy,
        |    least(greatest(((ox + CAST(0.5 AS DOUBLE)) * w) / 4
        |        - CAST(0.5 AS DOUBLE), CAST(0 AS DOUBLE)),
        |      CAST(w - 1 AS DOUBLE)) AS sx
        |  FROM cell),
        |pts AS (
        |  SELECT i, w, h, oy, ox,
        |    CAST(floor(sy) AS BIGINT) AS y0, sy - floor(sy) AS fy,
        |    CAST(floor(sx) AS BIGINT) AS x0, sx - floor(sx) AS fx,
        |    least(CAST(floor(sy) AS BIGINT) + 1, h - 1) AS y1,
        |    least(CAST(floor(sx) AS BIGINT) + 1, w - 1) AS x1
        |  FROM coord),
        |chans AS (SELECT p.*, unnest([0, 1, 2]) AS c FROM pts p),
        |corner AS (
        |  SELECT i, oy, ox, c, fy, fx,
        |    CASE c WHEN 0 THEN (i*7 + x0*3 + y0*5) % 256
        |           WHEN 1 THEN (i*11 + x0*13 + y0*17) % 256
        |           ELSE (i*19 + x0*23 + y0*29) % 256 END AS p00,
        |    CASE c WHEN 0 THEN (i*7 + x1*3 + y0*5) % 256
        |           WHEN 1 THEN (i*11 + x1*13 + y0*17) % 256
        |           ELSE (i*19 + x1*23 + y0*29) % 256 END AS p01,
        |    CASE c WHEN 0 THEN (i*7 + x0*3 + y1*5) % 256
        |           WHEN 1 THEN (i*11 + x0*13 + y1*17) % 256
        |           ELSE (i*19 + x0*23 + y1*29) % 256 END AS p10,
        |    CASE c WHEN 0 THEN (i*7 + x1*3 + y1*5) % 256
        |           WHEN 1 THEN (i*11 + x1*13 + y1*17) % 256
        |           ELSE (i*19 + x1*23 + y1*29) % 256 END AS p11
        |  FROM chans)
        |SELECT i AS asset_id, (oy * 4 + ox) * 3 + c AS idx,
        |  round(CAST(CAST(
        |    (1 - fy) * ((1 - fx) * p00 + fx * p01) +
        |    fy * ((1 - fx) * p10 + fx * p11)
        |  AS FLOAT) AS DOUBLE), 4) AS v
        |FROM corner ORDER BY asset_id, idx""".stripMargin,

    // PCM resample replayed from the WAV generator's sample formula:
    // the q192 sampling law in 1-D, identical double order, float-cast
    // where the expression casts
    "q193_wav_resample" ->
      """WITH aud AS (
        |  SELECT CAST(i AS BIGINT) AS i, 60 + (i % 50) * 3 AS n
        |  FROM range(0, 120) t(i) WHERE i % 3 = 1),
        |cell AS (SELECT i, n, unnest(range(0, 32)) AS o FROM aud),
        |coord AS (
        |  SELECT i, n, o,
        |    least(greatest(((o + CAST(0.5 AS DOUBLE)) * n) / 32
        |        - CAST(0.5 AS DOUBLE), CAST(0 AS DOUBLE)),
        |      CAST(n - 1 AS DOUBLE)) AS sx
        |  FROM cell),
        |pts AS (
        |  SELECT i, n, o,
        |    CAST(floor(sx) AS BIGINT) AS x0, sx - floor(sx) AS fx,
        |    least(CAST(floor(sx) AS BIGINT) + 1, n - 1) AS x1
        |  FROM coord)
        |SELECT i AS asset_id, o AS idx,
        |  round(CAST(CAST(
        |    (1 - fx) * (((i*37 + x0*101) % 65536) - 32768) +
        |    fx * (((i*37 + x1*101) % 65536) - 32768)
        |  AS FLOAT) AS DOUBLE), 4) AS v
        |FROM pts ORDER BY asset_id, idx""".stripMargin,

    // Holt replayed step-exactly by a recursive CTE (q191's shape):
    // the new level expression is DUPLICATED inside the trend update
    // exactly as the aggregate re-derives it, same parenthesization
    "q194_holt" ->
      """WITH RECURSIVE r AS (
        |  SELECT user_id, t_us, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS rn
        |  FROM (
        |    SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events
        |    WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |c AS (
        |  SELECT user_id, t_us, rn, v AS s, CAST(0 AS DOUBLE) AS b
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.t_us, r.rn,
        |    CAST(0.4 AS DOUBLE) * r.v
        |      + CAST(0.6 AS DOUBLE) * (c.s + c.b),
        |    CAST(0.3 AS DOUBLE) * ((CAST(0.4 AS DOUBLE) * r.v
        |        + CAST(0.6 AS DOUBLE) * (c.s + c.b)) - c.s)
        |      + CAST(0.7 AS DOUBLE) * c.b
        |  FROM c JOIN r ON r.user_id = c.user_id AND r.rn = c.rn + 1)
        |SELECT user_id, t_us,
        |  round(s, 4) + 0 AS level, round(b, 4) + 0 AS trend,
        |  round(s + b, 4) + 0 AS forecast
        |FROM c ORDER BY 1, 2""".stripMargin,

    // Holt-Winters replayed step-exactly by a recursive CTE carrying
    // the period-6 seasonal cycle as a LIST column: the new level is
    // DUPLICATED inside the trend and seasonal updates exactly as the
    // aggregate re-derives it, same parenthesization; the cycle rewrite
    // (list_transform CASE on the slot) mirrors the concat-of-slices
    "q195_holt_winters" ->
      """WITH RECURSIVE r AS (
        |  SELECT user_id, t_us, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS rn
        |  FROM (
        |    SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events
        |    WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |c AS (
        |  SELECT user_id, t_us, rn, CAST(v AS DOUBLE) AS l,
        |    CAST(0 AS DOUBLE) AS b,
        |    list_transform(range(0, 6), j -> CAST(0 AS DOUBLE)) AS seas
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.t_us, r.rn,
        |    CAST(0.3 AS DOUBLE) * (r.v - c.seas[((r.rn - 1) % 6) + 1])
        |      + CAST(0.7 AS DOUBLE) * (c.l + c.b),
        |    CAST(0.2 AS DOUBLE) * ((CAST(0.3 AS DOUBLE)
        |          * (r.v - c.seas[((r.rn - 1) % 6) + 1])
        |        + CAST(0.7 AS DOUBLE) * (c.l + c.b)) - c.l)
        |      + CAST(0.8 AS DOUBLE) * c.b,
        |    list_transform(range(0, 6), j ->
        |      CASE WHEN j = (r.rn - 1) % 6
        |        THEN CAST(0.4 AS DOUBLE) * (r.v - (CAST(0.3 AS DOUBLE)
        |              * (r.v - c.seas[((r.rn - 1) % 6) + 1])
        |            + CAST(0.7 AS DOUBLE) * (c.l + c.b)))
        |          + CAST(0.6 AS DOUBLE) * c.seas[((r.rn - 1) % 6) + 1]
        |        ELSE c.seas[j + 1] END)
        |  FROM c JOIN r ON r.user_id = c.user_id AND r.rn = c.rn + 1)
        |SELECT user_id, t_us,
        |  round(l, 4) + 0 AS level, round(b, 4) + 0 AS trend,
        |  round(seas[((rn - 1) % 6) + 1], 4) + 0 AS seasonal,
        |  round(l + b + seas[(rn % 6) + 1], 4) + 0 AS forecast
        |FROM c ORDER BY 1, 2""".stripMargin,

    // classical additive decomposition replayed step-exactly: the MA
    // numerator and all slot sums are INTEGER arithmetic on the 1e-4
    // quantized values (Decompose's determinism contract), each double
    // division on identical operands — window frames, slot grouping,
    // centering and the left join mirror the operator stage by stage
    "q199_seasonal_decompose" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, t_us, v,
        |    CAST((row_number() OVER w - 1) % 6 AS INTEGER) AS slot,
        |    sum(CAST(round(v * 10000) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY t_us
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
        |    count(*) OVER (
        |      PARTITION BY user_id ORDER BY t_us
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7,
        |    lag(CAST(round(v * 10000) AS BIGINT), 3) OVER w AS vlag,
        |    lead(CAST(round(v * 10000) AS BIGINT), 3) OVER w AS vlead
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
        |de AS (
        |  SELECT user_id, t_us, v, slot, trend,
        |    CAST(round((v - trend) * 10000) AS BIGINT) AS d_e4
        |  FROM (
        |    SELECT user_id, t_us, v, slot,
        |      CASE WHEN c7 = 7 THEN
        |        CAST(2 * s7 - vlag - vlead AS DOUBLE) / 120000.0
        |      END AS trend
        |    FROM r)),
        |slots AS (
        |  SELECT user_id, slot,
        |    CAST(round(CAST(sum(d_e4) AS DOUBLE) / count(*)) AS BIGINT)
        |      AS sme
        |  FROM de WHERE d_e4 IS NOT NULL GROUP BY 1, 2),
        |ctr AS (
        |  SELECT user_id, slot,
        |    (CAST(sme AS DOUBLE)
        |      - CAST(sum(sme) OVER (PARTITION BY user_id) AS DOUBLE)
        |        / count(*) OVER (PARTITION BY user_id)) / 10000.0
        |      AS seasonal
        |  FROM slots)
        |SELECT d.user_id, d.t_us, round(d.v, 4) AS v, d.slot,
        |  round(d.trend, 4) + 0 AS trend,
        |  round(c.seasonal, 4) + 0 AS seasonal,
        |  round(d.v - d.trend - c.seasonal, 4) + 0 AS resid
        |FROM de d LEFT JOIN ctr c
        |  ON c.user_id = d.user_id AND c.slot = d.slot
        |ORDER BY 1, 2""".stripMargin,

    // EW mean/variance replayed step-exactly by a recursive CTE
    // (q194's shape): the PINNED parenthesization Δ·(α·Δ), variance
    // reading the pre-step mean; α=0.25 so α and 1−α are exact
    "q200_ewvar" ->
      """WITH RECURSIVE r AS (
        |  SELECT user_id, t_us, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS rn
        |  FROM (
        |    SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events
        |    WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |c AS (
        |  SELECT user_id, t_us, rn, CAST(v AS DOUBLE) AS m,
        |    CAST(0 AS DOUBLE) AS s2
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.t_us, r.rn,
        |    c.m + CAST(0.25 AS DOUBLE) * (r.v - c.m),
        |    CAST(0.75 AS DOUBLE) * (c.s2 + (r.v - c.m)
        |      * (CAST(0.25 AS DOUBLE) * (r.v - c.m)))
        |  FROM c JOIN r ON r.user_id = c.user_id AND r.rn = c.rn + 1)
        |SELECT user_id, t_us,
        |  round(m, 4) + 0 AS ew_mean, round(s2, 4) + 0 AS ew_var
        |FROM c ORDER BY 1, 2""".stripMargin,

    // the z-score detector over the same fold: each point tested
    // against the PRIOR (μ, σ²) via lag(1); warmups read false
    "q201_ew_anomaly" ->
      """WITH RECURSIVE r AS (
        |  SELECT user_id, t_us, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS rn
        |  FROM (
        |    SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events
        |    WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |c AS (
        |  SELECT user_id, t_us, rn, v, CAST(v AS DOUBLE) AS m,
        |    CAST(0 AS DOUBLE) AS s2
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.t_us, r.rn, r.v,
        |    c.m + CAST(0.25 AS DOUBLE) * (r.v - c.m),
        |    CAST(0.75 AS DOUBLE) * (c.s2 + (r.v - c.m)
        |      * (CAST(0.25 AS DOUBLE) * (r.v - c.m)))
        |  FROM c JOIN r ON r.user_id = c.user_id AND r.rn = c.rn + 1),
        |z AS (
        |  SELECT user_id, t_us, v,
        |    lag(m) OVER (PARTITION BY user_id ORDER BY t_us) AS pm,
        |    lag(s2) OVER (PARTITION BY user_id ORDER BY t_us) AS pv
        |  FROM c)
        |SELECT user_id, t_us, round(v, 4) AS v,
        |  CASE WHEN pv > 0
        |    THEN round((v - pm) / sqrt(pv), 4) + 0 END AS zscore,
        |  coalesce(CASE WHEN pv > 0
        |    THEN abs((v - pm) / sqrt(pv)) > 3 END, FALSE) AS anomaly
        |FROM z ORDER BY 1, 2""".stripMargin,

    // MAD outlier flags replayed exactly: quantile_cont over the same
    // integer-scaled values interpolates exact binary fractions (d is
    // always 0 or 0.5), so median, MAD and the flag comparison are
    // bit-identical to Spark's exact `percentile` despite the two
    // engines' different (algebraically equal) interpolation forms
    "q202_mad_outliers" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v,
        |    CAST(round(max(value) * 100) AS BIGINT) AS ve
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |med AS (
        |  SELECT user_id, quantile_cont(ve, 0.5) AS med
        |  FROM base GROUP BY 1),
        |dev AS (
        |  SELECT b.user_id, b.t_us, b.v, m.med,
        |    abs(b.ve - m.med) AS ad
        |  FROM base b JOIN med m USING (user_id)),
        |mad AS (
        |  SELECT user_id, quantile_cont(ad, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.user_id, d.t_us, round(d.v, 4) AS v,
        |  round(d.med / 100.0, 4) AS med,
        |  round(m.mad / 100.0, 4) AS mad,
        |  d.ad > 3.0 * m.mad AS outlier
        |FROM dev d JOIN mad m USING (user_id)
        |ORDER BY 1, 2""".stripMargin,

    // seasonal-adjusted outliers: q199's decomposition chain verbatim,
    // then q202's MAD chain over the RESIDUAL at 1e-4 scale — both
    // already proven hash-exact on their own, composed here
    "q203_seasonal_outliers" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, t_us, v,
        |    CAST((row_number() OVER w - 1) % 6 AS INTEGER) AS slot,
        |    sum(CAST(round(v * 10000) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY t_us
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
        |    count(*) OVER (
        |      PARTITION BY user_id ORDER BY t_us
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7,
        |    lag(CAST(round(v * 10000) AS BIGINT), 3) OVER w AS vlag,
        |    lead(CAST(round(v * 10000) AS BIGINT), 3) OVER w AS vlead
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
        |de AS (
        |  SELECT user_id, t_us, v, slot, trend,
        |    CAST(round((v - trend) * 10000) AS BIGINT) AS d_e4
        |  FROM (
        |    SELECT user_id, t_us, v, slot,
        |      CASE WHEN c7 = 7 THEN
        |        CAST(2 * s7 - vlag - vlead AS DOUBLE) / 120000.0
        |      END AS trend
        |    FROM r)),
        |slots AS (
        |  SELECT user_id, slot,
        |    CAST(round(CAST(sum(d_e4) AS DOUBLE) / count(*)) AS BIGINT)
        |      AS sme
        |  FROM de WHERE d_e4 IS NOT NULL GROUP BY 1, 2),
        |ctr AS (
        |  SELECT user_id, slot,
        |    (CAST(sme AS DOUBLE)
        |      - CAST(sum(sme) OVER (PARTITION BY user_id) AS DOUBLE)
        |        / count(*) OVER (PARTITION BY user_id)) / 10000.0
        |      AS seasonal
        |  FROM slots),
        |res AS (
        |  SELECT d.user_id, d.t_us,
        |    d.v - d.trend - c.seasonal AS resid,
        |    CAST(round((d.v - d.trend - c.seasonal) * 10000) AS BIGINT)
        |      AS ve
        |  FROM de d JOIN ctr c
        |    ON c.user_id = d.user_id AND c.slot = d.slot
        |  WHERE d.trend IS NOT NULL),
        |med2 AS (
        |  SELECT user_id, quantile_cont(ve, 0.5) AS med
        |  FROM res GROUP BY 1),
        |dev2 AS (
        |  SELECT b.user_id, b.t_us, b.resid, m.med,
        |    abs(b.ve - m.med) AS ad
        |  FROM res b JOIN med2 m USING (user_id)),
        |mad2 AS (
        |  SELECT user_id, quantile_cont(ad, 0.5) AS mad
        |  FROM dev2 GROUP BY 1)
        |SELECT d.user_id, d.t_us, round(d.resid, 4) + 0 AS resid,
        |  round(d.med / 10000.0, 4) + 0 AS med,
        |  round(m.mad / 10000.0, 4) AS mad,
        |  d.ad > 3.0 * m.mad AS outlier
        |FROM dev2 d JOIN mad2 m USING (user_id)
        |ORDER BY 1, 2""".stripMargin,

    // forecast backtest: q194's Holt CTE (same α/β literals and
    // parenthesization), one-step forecasts via lag, absolute errors
    // quantized e4 and summed as BIGINTs — winner compares integers
    "q204_forecast_backtest" ->
      """WITH RECURSIVE r AS (
        |  SELECT user_id, t_us, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS rn
        |  FROM (
        |    SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events
        |    WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |c AS (
        |  SELECT user_id, t_us, rn, v, v AS s, CAST(0 AS DOUBLE) AS b
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.t_us, r.rn, r.v,
        |    CAST(0.4 AS DOUBLE) * r.v
        |      + CAST(0.6 AS DOUBLE) * (c.s + c.b),
        |    CAST(0.3 AS DOUBLE) * ((CAST(0.4 AS DOUBLE) * r.v
        |        + CAST(0.6 AS DOUBLE) * (c.s + c.b)) - c.s)
        |      + CAST(0.7 AS DOUBLE) * c.b
        |  FROM c JOIN r ON r.user_id = c.user_id AND r.rn = c.rn + 1),
        |fc AS (
        |  SELECT user_id, t_us, v,
        |    lag(s + b) OVER (PARTITION BY user_id ORDER BY t_us)
        |      AS fc_holt,
        |    lag(v) OVER (PARTITION BY user_id ORDER BY t_us)
        |      AS fc_naive
        |  FROM c),
        |ag AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(abs(v - fc_holt) * 10000) AS BIGINT))
        |      AS BIGINT) AS ah,
        |    CAST(sum(CAST(round(abs(v - fc_naive) * 10000) AS BIGINT))
        |      AS BIGINT) AS an
        |  FROM fc WHERE fc_holt IS NOT NULL GROUP BY 1)
        |SELECT user_id, n,
        |  round(CAST(ah AS DOUBLE) / n / 10000.0, 4) AS mae_holt,
        |  round(CAST(an AS DOUBLE) / n / 10000.0, 4) AS mae_naive,
        |  CASE WHEN ah < an THEN 'holt'
        |       WHEN ah > an THEN 'naive' ELSE 'tie' END AS winner
        |FROM ag ORDER BY user_id""".stripMargin,

    // OHLC bars: plain bucket aggregation; min_by/max_by tie-free
    // because duplicate timestamps collapse first
    "q205_ohlc_bars" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT user_id, t_us, v,
        |    t_us - ((t_us % 21600000000 + 21600000000) % 21600000000)
        |      AS bucket_us
        |  FROM base)
        |SELECT user_id, bucket_us, CAST(count(*) AS BIGINT) AS n,
        |  round(min_by(v, t_us), 4) AS open,
        |  round(max(v), 4) AS high,
        |  round(min(v), 4) AS low,
        |  round(max_by(v, t_us), 4) AS close
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // rolling lag-1 autocorrelation: all five Pearson components are
    // window sums of integers (HUGEINT-exact in DuckDB, long-exact in
    // Spark — both < 2^53 so the DOUBLE casts agree bit-for-bit); the
    // final sqrt/divide runs on identical operands
    "q206_rolling_autocorr" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS t_us,
        |    CAST(round(max(value) * 100) AS BIGINT) AS ve
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |f AS (
        |  SELECT user_id, t_us, x, y FROM (
        |    SELECT user_id, t_us, ve AS x,
        |      lag(ve) OVER (PARTITION BY user_id ORDER BY t_us) AS y
        |    FROM base) WHERE y IS NOT NULL),
        |wnd AS (
        |  SELECT user_id, t_us,
        |    count(*) OVER w AS n,
        |    CAST(12 * sum(x * y) OVER w
        |      - sum(x) OVER w * sum(y) OVER w AS DOUBLE) AS num,
        |    CAST(12 * sum(x * x) OVER w
        |      - sum(x) OVER w * sum(x) OVER w AS DOUBLE) AS dx,
        |    CAST(12 * sum(y * y) OVER w
        |      - sum(y) OVER w * sum(y) OVER w AS DOUBLE) AS dy
        |  FROM f
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t_us
        |    ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
        |SELECT user_id, t_us,
        |  round(num / (sqrt(dx) * sqrt(dy)), 4) + 0 AS ac1
        |FROM wnd WHERE n = 12 AND dx > 0 AND dy > 0
        |ORDER BY 1, 2""".stripMargin,

    // Kalman local-level filter replayed step-exactly (q194's shape):
    // every output column re-derives P⁻ and K VERBATIM as the
    // aggregate's update expressions do, same parenthesization; Q and
    // R are exactly representable doubles
    "q207_kalman" ->
      """WITH RECURSIVE r AS (
        |  SELECT user_id, t_us, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS rn
        |  FROM (
        |    SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events
        |    WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |c AS (
        |  SELECT user_id, t_us, rn, CAST(v AS DOUBLE) AS xh,
        |    CAST(4 AS DOUBLE) AS p, CAST(0 AS DOUBLE) AS g
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.t_us, r.rn,
        |    c.xh + ((c.p + CAST(0.25 AS DOUBLE))
        |        / ((c.p + CAST(0.25 AS DOUBLE)) + CAST(4 AS DOUBLE)))
        |      * (r.v - c.xh),
        |    (CAST(1 AS DOUBLE) - ((c.p + CAST(0.25 AS DOUBLE))
        |        / ((c.p + CAST(0.25 AS DOUBLE)) + CAST(4 AS DOUBLE))))
        |      * (c.p + CAST(0.25 AS DOUBLE)),
        |    (c.p + CAST(0.25 AS DOUBLE))
        |      / ((c.p + CAST(0.25 AS DOUBLE)) + CAST(4 AS DOUBLE))
        |  FROM c JOIN r ON r.user_id = c.user_id AND r.rn = c.rn + 1)
        |SELECT user_id, t_us,
        |  round(xh, 4) + 0 AS estimate, round(p, 4) AS variance,
        |  round(g, 4) AS gain
        |FROM c ORDER BY 1, 2""".stripMargin,

    // CUSUM replayed step-exactly by a recursive CTE walking rn = 1..n
    // per user (true recursion — bounded by the longest series, NOT the
    // exponential inline-CTE trap); same parenthesization
    // s + ((x - mu) - slack) as the Spark update expressions
    "q191_cusum" ->
      """WITH RECURSIVE r AS (
        |  SELECT user_id, t_us, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS rn
        |  FROM (
        |    SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events
        |    WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |c AS (
        |  SELECT user_id, t_us, rn,
        |    greatest(CAST(0 AS DOUBLE),
        |      (v - CAST(100 AS DOUBLE)) - CAST(10 AS DOUBLE)) AS sp,
        |    greatest(CAST(0 AS DOUBLE),
        |      (CAST(100 AS DOUBLE) - v) - CAST(10 AS DOUBLE)) AS sn
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.t_us, r.rn,
        |    greatest(CAST(0 AS DOUBLE),
        |      c.sp + ((r.v - CAST(100 AS DOUBLE)) - CAST(10 AS DOUBLE))),
        |    greatest(CAST(0 AS DOUBLE),
        |      c.sn + ((CAST(100 AS DOUBLE) - r.v) - CAST(10 AS DOUBLE)))
        |  FROM c JOIN r ON r.user_id = c.user_id AND r.rn = c.rn + 1)
        |SELECT user_id, t_us, round(sp, 4) AS s_pos, round(sn, 4) AS s_neg,
        |  (sp > 150 OR sn > 150) AS alarm
        |FROM c ORDER BY 1, 2""".stripMargin,

    // multimodal ANN capstone: the ENTIRE pipeline downstream of the
    // resize — vector assembly, deterministic codebook, cosine cell
    // assignment (ties to the smaller cell), 2-probe, exclude-self
    // exact cosine, (score desc, id) ranking — replayed in SQL from
    // the dumped q192 tensor fixture (the q132 oracle's shape over
    // image features). Only the decode+resize arithmetic itself stays
    // with q192's own generator-formula oracle.
    "q196_image_ann_ivf" ->
      """WITH fx AS (
        |  SELECT * FROM
        |    read_parquet('__VERIFY_OUT__/q192_image_resize/*.parquet')),
        |dv AS (
        |  SELECT asset_id, list(v ORDER BY idx) AS vv
        |  FROM fx GROUP BY 1),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY asset_id) - 1
        |      AS INTEGER) AS cell, vv AS cv
        |  FROM (SELECT asset_id, vv FROM dv ORDER BY asset_id LIMIT 8)),
        |asn AS (
        |  SELECT asset_id, cell FROM (
        |    SELECT dv.asset_id, cb.cell, row_number() OVER (
        |      PARTITION BY dv.asset_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM dv CROSS JOIN cb) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT dv.asset_id AS query_id, cb.cell, row_number() OVER (
        |      PARTITION BY dv.asset_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM dv CROSS JOIN cb WHERE dv.asset_id < 30) WHERE rn <= 2),
        |probescore AS (
        |  SELECT p.query_id, a.asset_id AS neighbor_id,
        |    list_cosine_similarity(qv.vv, nv.vv) AS cs
        |  FROM probes p JOIN asn a ON p.cell = a.cell
        |  JOIN dv qv ON qv.asset_id = p.query_id
        |  JOIN dv nv ON nv.asset_id = a.asset_id
        |  WHERE a.asset_id <> p.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cs, CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |    AS INTEGER) AS rn
        |  FROM probescore)
        |SELECT query_id, neighbor_id, round(cs, 4) AS cos_sim, rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,

    // the maintained smoothed view's batch twin: q188's grid + ASOF
    // LOCF at a 6-hour step, then q190's slice/list_reduce EWMA fold
    // over the GRID values in grid order — one oracle for the
    // composition TimeSeriesView maintains incrementally
    "q198_smoothed_view" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS t, max(value) AS v
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT user_id,
        |    min(t) + ((21600000000 - (min(t) % 21600000000 + 21600000000)
        |      % 21600000000) % 21600000000) AS lo,
        |    max(t) - ((max(t) % 21600000000 + 21600000000)
        |      % 21600000000) AS hi
        |  FROM r GROUP BY 1),
        |g AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, 21600000000)) AS g_us
        |  FROM b WHERE lo <= hi),
        |loc AS (
        |  SELECT g.user_id, g.g_us, r.v
        |  FROM g ASOF LEFT JOIN r
        |    ON g.user_id = r.user_id AND g.g_us >= r.t),
        |o AS (
        |  SELECT user_id, g_us, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY g_us) AS rn
        |  FROM loc),
        |l AS (
        |  SELECT user_id, list(v ORDER BY g_us) AS vs FROM loc GROUP BY 1)
        |SELECT o.user_id, o.g_us, round(o.v, 4) AS value,
        |  round(list_reduce(list_slice(l.vs, 1, o.rn),
        |    (s, x) -> CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * s),
        |    4) AS ewma
        |FROM o JOIN l USING (user_id)
        |ORDER BY 1, 2""".stripMargin,

    // regular-grid LOCF resample: per-user aligned hourly grid over the
    // click-series span, latest observation at-or-before each point via
    // DuckDB's native ASOF JOIN (inclusive >=, mirroring the Spark
    // union-window formulation's tie order)
    "q188_resample_locf" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS t, max(value) AS v
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT user_id,
        |    min(t) + ((3600000000 - (min(t) % 3600000000 + 3600000000)
        |      % 3600000000) % 3600000000) AS lo,
        |    max(t) - ((max(t) % 3600000000 + 3600000000)
        |      % 3600000000) AS hi
        |  FROM r GROUP BY 1),
        |g AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, 3600000000)) AS g_us
        |  FROM b WHERE lo <= hi)
        |SELECT g.user_id, g.g_us, r.v AS value
        |FROM g ASOF LEFT JOIN r
        |  ON g.user_id = r.user_id AND g.g_us >= r.t
        |ORDER BY 1, 2""".stripMargin,

    // linear interpolation on the same grid: prev neighbour inclusive
    // (ASOF >=), next strictly-after (ASOF <); at an exact observation
    // hit the fraction is 0 so both engines emit the raw value. The
    // lerp is the identical IEEE sequence as the Spark side:
    // pv + (nv-pv) * ((g-pt)/(nt-pt)) over exact-integer micros
    "q189_resample_linear" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS t, max(value) AS v
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT user_id,
        |    min(t) + ((3600000000 - (min(t) % 3600000000 + 3600000000)
        |      % 3600000000) % 3600000000) AS lo,
        |    max(t) - ((max(t) % 3600000000 + 3600000000)
        |      % 3600000000) AS hi
        |  FROM r GROUP BY 1),
        |g AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, 3600000000)) AS g_us
        |  FROM b WHERE lo <= hi),
        |p AS (
        |  SELECT g.user_id, g.g_us, r.t AS pt, r.v AS pv
        |  FROM g ASOF LEFT JOIN r
        |    ON g.user_id = r.user_id AND g.g_us >= r.t),
        |n AS (
        |  SELECT g.user_id, g.g_us, r.t AS nt, r.v AS nv
        |  FROM g ASOF LEFT JOIN r
        |    ON g.user_id = r.user_id AND g.g_us < r.t)
        |SELECT p.user_id, p.g_us,
        |  round(CASE WHEN n.nt IS NULL THEN p.pv
        |    ELSE p.pv + (n.nv - p.pv) * ((p.g_us - p.pt) / (n.nt - p.pt))
        |    END, 4) AS value
        |FROM p LEFT JOIN n ON p.user_id = n.user_id AND p.g_us = n.g_us
        |ORDER BY 1, 2""".stripMargin,

    // rebuild the fixture pages line-for-line, replay the keep rule,
    // and compare the exact cleaned text by md5
    "q172_boilerplate" ->
      """WITH d AS (
        |  SELECT CAST(i AS BIGINT) AS i FROM range(0, 110) t(i)),
        |lines AS (
        |  SELECT i, CAST(j AS BIGINT) AS j,
        |    CASE WHEN (i + j) % 3 = 0
        |    THEN 'nav' || CAST((i + j) % 5 AS VARCHAR)
        |      || ' item' || CAST((i * 3 + j) % 4 AS VARCHAR)
        |      || ' link' || CAST(j % 6 AS VARCHAR)
        |    ELSE 'the w' || CAST((i * 7 + j * 3) % 13 AS VARCHAR)
        |      || ' and w' || CAST((i + j * 5) % 11 AS VARCHAR)
        |      || ' is on the w' || CAST((i * 2 + j) % 7 AS VARCHAR)
        |      || ' of w' || CAST((i * 11 + j * 13) % 17 AS VARCHAR)
        |    END AS ln
        |  FROM d, LATERAL unnest(range(0, 6 + i % 7)) AS u(j)),
        |cls AS (
        |  SELECT i, j, ln,
        |    len(string_split(ln, ' ')) >= 4 AND
        |    CAST(len(list_filter(string_split(ln, ' '), t ->
        |      list_contains(['the','a','of','and','to','in','is','it',
        |        'on','for'], t))) AS DOUBLE)
        |      / len(string_split(ln, ' ')) >= 0.2 AS keep
        |  FROM lines)
        |SELECT i AS doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  md5(coalesce(string_agg(CASE WHEN keep THEN ln END, chr(10)
        |    ORDER BY j), '')) AS clean_md5
        |FROM cls GROUP BY i
        |ORDER BY doc_id""".stripMargin,

    // the deleted probe must be unreachable everywhere (0 leaks); the
    // control probe must remain fully reachable on every surface —
    // its per-surface count derives from the corpus, so a dead audit
    // (vacuous zeros) or an over-deletion both break the match
    "q175_takedown_audit" ->
      """WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 10 = 4)
        |SELECT probe, surface, n_leaked FROM (
        |  SELECT 'control' AS probe, 'base' AS surface, n AS n_leaked
        |    FROM c
        |  UNION ALL SELECT 'control', 'bm25', n FROM c
        |  UNION ALL SELECT 'control', 'ivf', n FROM c
        |  UNION ALL SELECT 'deleted', 'base', CAST(0 AS BIGINT)
        |  UNION ALL SELECT 'deleted', 'bm25', CAST(0 AS BIGINT)
        |  UNION ALL SELECT 'deleted', 'ivf', CAST(0 AS BIGINT))
        |ORDER BY probe, surface""".stripMargin,

    // byte-level erasure: after purge + vacuum every surface must
    // carry zero stray files and zero raw rows for the forgotten
    // ids, and the surviving distinct ids must equal the corpus
    // minus the takedown set (every doc has non-empty text, so the
    // doclen/postings doc sets equal the base doc set)
    "q179_erasure_audit" ->
      """WITH live AS (SELECT CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 10 <> 3)
        |SELECT surface, n_stray_files, n_raw_hits, n_live_docs FROM (
        |  SELECT 'base' AS surface, 0 AS n_stray_files,
        |    CAST(0 AS BIGINT) AS n_raw_hits, n AS n_live_docs FROM live
        |  UNION ALL SELECT 'bm25_doclen', 0, CAST(0 AS BIGINT), n
        |    FROM live
        |  UNION ALL SELECT 'bm25_postings', 0, CAST(0 AS BIGINT), n
        |    FROM live)
        |ORDER BY surface""".stripMargin,

    // unigram vocab: re-derive the weighted-substring selection, the
    // single-char closure, and the scaled-int ln scores
    "q176_unigram_vocab" ->
      (unigramVocabCtes +
        """SELECT piece, cnt,
        |  CAST(round(ln(CAST(cnt AS DOUBLE) / t) * 1000000.0)
        |    AS BIGINT) AS score
        |FROM vocab0 CROSS JOIN tot
        |ORDER BY piece""".stripMargin),

    // unigram encode: enumerate EVERY segmentation of every distinct
    // word recursively and take the same BIGINT objective max
    // (score·1024 − count) the engine's Viterbi computes
    "q177_unigram_encode" ->
      ("WITH RECURSIVE " + unigramVocabBody + """,
        |pieces AS (
        |  SELECT piece, CAST(round(ln(CAST(cnt AS DOUBLE) / t)
        |    * 1000000.0) AS BIGINT) AS score
        |  FROM vocab0 CROSS JOIN tot),
        |ws AS (SELECT DISTINCT word FROM w),
        |rec AS (
        |  SELECT word, CAST(0 AS BIGINT) AS pos,
        |    CAST(0 AS BIGINT) AS val FROM ws
        |  UNION ALL
        |  SELECT r.word, r.pos + len(p.piece),
        |    r.val + p.score * 1024 - 1
        |  FROM rec r JOIN pieces p
        |    ON substr(r.word, CAST(r.pos + 1 AS INT),
        |         len(p.piece)) = p.piece
        |  WHERE r.pos + len(p.piece) <= len(r.word)),
        |best AS (
        |  SELECT word, max(val) AS val FROM rec
        |  WHERE pos = len(word) GROUP BY word),
        |pw AS (
        |  SELECT word, (-val) % 1024 AS c,
        |    -(((-val) - ((-val) % 1024)) // 1024) AS s
        |  FROM best),
        |dw AS (
        |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |    AS word FROM documents)
        |SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(pw.c) AS BIGINT) AS n_pieces,
        |  CAST(sum(pw.s) AS BIGINT) AS score_s
        |FROM dw JOIN pw USING (word) GROUP BY dw.doc_id
        |ORDER BY doc_id""".stripMargin),

    // unigram hard-EM: enumerate every segmentation per distinct word
    // carrying the piece list, pick the canonical one (max BIGINT
    // objective, lex-smallest list on ties — the engine's greedy
    // shortest-piece walk provably picks the same array), aggregate
    // frequency-weighted usage, then replay the M-step: prune unused
    // multi-char pieces, floor single chars at 1, re-score over the
    // refined total
    "q182_unigram_em" ->
      ("WITH RECURSIVE " + unigramVocabBody + """,
        |pieces AS (
        |  SELECT piece, CAST(round(ln(CAST(cnt AS DOUBLE) / t)
        |    * 1000000.0) AS BIGINT) AS score
        |  FROM vocab0 CROSS JOIN tot),
        |ws AS (SELECT DISTINCT word FROM w),
        |rec AS (
        |  SELECT word, CAST(0 AS BIGINT) AS pos,
        |    CAST(0 AS BIGINT) AS val,
        |    CAST([] AS VARCHAR[]) AS lst FROM ws
        |  UNION ALL
        |  SELECT r.word, r.pos + len(p.piece),
        |    r.val + p.score * 1024 - 1,
        |    list_append(r.lst, p.piece)
        |  FROM rec r JOIN pieces p
        |    ON substr(r.word, CAST(r.pos + 1 AS INT),
        |         len(p.piece)) = p.piece
        |  WHERE r.pos + len(p.piece) <= len(r.word)),
        |canon AS (
        |  SELECT word, lst FROM (
        |    SELECT word, lst, row_number() OVER (PARTITION BY word
        |      ORDER BY val DESC, lst ASC) AS rn
        |    FROM rec WHERE pos = len(word)) WHERE rn = 1),
        |usage AS (
        |  SELECT piece, CAST(sum(n) AS BIGINT) AS usage FROM (
        |    SELECT w.n, unnest(c.lst) AS piece
        |    FROM w JOIN canon c USING (word))
        |  GROUP BY piece),
        |kept AS (
        |  SELECT v.piece,
        |    coalesce(u.usage,
        |      CASE WHEN len(v.piece) = 1 THEN CAST(1 AS BIGINT) END)
        |      AS cnt
        |  FROM vocab0 v LEFT JOIN usage u USING (piece)
        |  WHERE coalesce(u.usage,
        |    CASE WHEN len(v.piece) = 1 THEN CAST(1 AS BIGINT) END)
        |    IS NOT NULL),
        |tot2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t2 FROM kept)
        |SELECT piece, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(round(ln(CAST(cnt AS DOUBLE) / t2) * 1000000.0)
        |    AS BIGINT) AS score
        |FROM kept CROSS JOIN tot2
        |ORDER BY piece""".stripMargin),

    // REPLACE WHERE backfill: the oracle applies the correction to
    // the raw table — the doubled window must be exactly the
    // 1-URGENT rows and every other row must survive untouched
    "q186_replace_where" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN 2 * CAST(round(o_totalprice * 100) AS BIGINT)
        |    ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
        |    AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // enrichment rollup: the oracle derives the per-nation revenue
    // from the raw join and pins mode='incremental' — both a wrong
    // delta merge AND a silent fallback to recompute break the hash
    "q185_incremental_join_agg" ->
      """SELECT 'incremental' AS mode, c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_val
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    // dim-delta view repair: the oracle is the FULL recompute under
    // the updated dim — the repaired view must be indistinguishable
    // from it, and the pinned mode proves the cheap path produced it
    "q197_dim_delta_view" ->
      """SELECT 'dim_delta' AS mode, c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_val
        |FROM orders JOIN (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 100 = 0 THEN (c_nationkey + 1) % 25
        |         ELSE c_nationkey END AS c_nationkey
        |  FROM customer) c ON o_custkey = c_custkey
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    // JSONL round-trip: the oracle reads the parquet directly, so any
    // infidelity in the engine's JSON escape/parse of free text
    // (newlines, quotes, unicode) breaks the hash
    "q183_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    // ORC round-trip with a pushdown predicate: same fidelity check
    "q184_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE n_chars >= 200
        |ORDER BY doc_id""".stripMargin,

    // both branches derive from the raw corpus: the source must be
    // the untouched table, the experiment the filtered one
    "q178_clone_branch" ->
      """SELECT branch, n_docs, sum_chars FROM (
        |  SELECT 'source' AS branch, CAST(count(*) AS BIGINT)
        |      AS n_docs,
        |    CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT 'experiment', CAST(count(*) AS BIGINT),
        |    CAST(sum(coalesce(n_chars, 0)) AS BIGINT)
        |  FROM documents WHERE doc_id % 7 <> 1)
        |ORDER BY branch""".stripMargin,

    // bloom-pruned point lookup must equal the plain filter
    "q170_bloom_skip" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
        |WHERE doc_id IN (3, 77, 202, 333, 444)
        |ORDER BY doc_id""".stripMargin,

    // delta-maintained aggregate must equal the full-corpus GROUP BY
    "q169_incremental_agg" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_val
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    // sketch-backed view: exact row counts from the maintained state;
    // the sketch estimates are impl-specific, so the oracle pins the
    // booleans (the q75/q92 discipline) — a sketch drifting past its
    // envelope flips a TRUE and reds the row
    "q181_sketch_view" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  TRUE AS ok_distinct, TRUE AS ok50, TRUE AS ok95
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // delta-maintained extrema must equal the plain GROUP BY (min/max
    // ignore nulls on both engines; all-null groups yield null)
    "q180_incremental_minmax" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_val,
        |  CAST(min(n_chars) AS BIGINT) AS min_val,
        |  CAST(max(n_chars) AS BIGINT) AS max_val
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    "q166_entity_resolve" ->
      """WITH RECURSIVE vals AS (
        |  SELECT p_name AS value, count(*) AS n_rows
        |  FROM part GROUP BY 1),
        |k AS (
        |  SELECT string_split_regex(value, '\s+')[1] AS block,
        |    value FROM vals
        |  UNION
        |  SELECT string_split_regex(value, '\s+')[-1] AS block,
        |    value FROM vals),
        |pairs AS (
        |  SELECT DISTINCT a.value AS value_a, b.value AS value_b
        |  FROM k a JOIN k b USING (block)
        |  WHERE a.value < b.value
        |    AND jaro_winkler_similarity(a.value, b.value) >= 0.9),
        |edges AS (
        |  SELECT value_a AS u, value_b AS v FROM pairs
        |  UNION SELECT value_b, value_a FROM pairs),
        |lab(value, lbl) AS (
        |  SELECT value, value FROM vals
        |  UNION
        |  SELECT e.u, l.lbl FROM edges e JOIN lab l ON l.value = e.v),
        |ent AS (
        |  SELECT value, min(lbl) AS entity FROM lab GROUP BY 1),
        |can AS (
        |  SELECT entity, value AS canonical FROM (
        |    SELECT e.entity, v.value,
        |      row_number() OVER (PARTITION BY e.entity
        |        ORDER BY v.n_rows DESC, v.value) AS rn
        |    FROM ent e JOIN vals v USING (value)) WHERE rn = 1)
        |SELECT v.value, e.entity, c.canonical, v.n_rows
        |FROM vals v JOIN ent e USING (value) JOIN can c USING (entity)
        |ORDER BY e.entity, v.value""".stripMargin,

    "q165_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  count(*) >= 10 AS anonymous,
        |  CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |    AS BIGINT) AS l_distinct
        |FROM customer GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q164_jaro_link" ->
      """WITH vals AS (
        |  SELECT p_name AS value, count(*) AS n_rows
        |  FROM part GROUP BY 1),
        |k AS (
        |  SELECT string_split_regex(value, '\s+')[1] AS block,
        |    value, n_rows FROM vals
        |  UNION
        |  SELECT string_split_regex(value, '\s+')[-1] AS block,
        |    value, n_rows FROM vals),
        |pairs AS (
        |  SELECT DISTINCT a.value AS value_a, b.value AS value_b,
        |    a.n_rows AS n_a, b.n_rows AS n_b
        |  FROM k a JOIN k b USING (block)
        |  WHERE a.value < b.value)
        |SELECT value_a, value_b,
        |  round(jaro_winkler_similarity(value_a, value_b), 4) + 0
        |    AS jw_sim,
        |  n_a, n_b
        |FROM pairs
        |WHERE jaro_winkler_similarity(value_a, value_b) >= 0.9
        |ORDER BY value_a, value_b""".stripMargin,

    "q163_nfc_normalize" ->
      """WITH d AS (
        |  SELECT CAST(i AS BIGINT) AS i FROM range(0, 90) t(i)),
        |tok AS (
        |  SELECT i, unnest(range(0, 10 + i % 20)) AS j FROM d),
        |w AS (
        |  SELECT i, j, CASE (i*3 + j) % 5
        |    WHEN 0 THEN 'we' || chr(769)
        |    WHEN 1 THEN 'wa' || chr(776)
        |    WHEN 2 THEN 'wo' || chr(770)
        |    WHEN 3 THEN 'w' || chr(233)
        |    ELSE 'w' || CAST((i + j) % 10 AS VARCHAR) END AS tokstr
        |  FROM tok),
        |txt AS (
        |  SELECT i, string_agg(tokstr, ' ' ORDER BY j) AS text
        |  FROM w GROUP BY i)
        |SELECT i AS doc_id,
        |  CAST(length(text) AS BIGINT) AS n_raw,
        |  CAST(length(nfc_normalize(text)) AS BIGINT) AS n_norm,
        |  md5(nfc_normalize(text)) AS norm_md5
        |FROM txt ORDER BY doc_id""".stripMargin,

    "q162_gzip_decode" ->
      """WITH d AS (
        |  SELECT CAST(i AS BIGINT) AS i FROM range(0, 120) t(i)
        |  WHERE i % 3 < 2),
        |tok AS (
        |  SELECT i, unnest(range(0, 20 + i % 30)) AS j FROM d),
        |w AS (
        |  SELECT i, j,
        |    'w' || CAST((i*7 + j*3) % 11 AS VARCHAR) AS tokstr
        |  FROM tok),
        |txt AS (
        |  SELECT i, string_agg(tokstr, ' ' ORDER BY j) AS text
        |  FROM w GROUP BY i)
        |SELECT i AS doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(20 + i % 30 AS BIGINT) AS n_tokens,
        |  md5(text) AS text_md5
        |FROM txt ORDER BY doc_id""".stripMargin,

    "q161_png_decode" ->
      """WITH img AS (
        |  SELECT CAST(i AS BIGINT) AS i, i % 3 = 1 AS has_a
        |  FROM range(0, 120) t(i) WHERE i % 3 < 2),
        |dims AS (
        |  SELECT i, has_a, 8 + i % 9 AS w, 6 + i % 7 AS h FROM img),
        |xs AS (
        |  SELECT i, has_a, w, h, unnest(range(0, w)) AS x FROM dims),
        |px AS (
        |  SELECT i, has_a, w, h, x, unnest(range(0, h)) AS y FROM xs)
        |SELECT i AS asset_id,
        |  CAST(any_value(w) AS BIGINT) AS width,
        |  CAST(any_value(h) AS BIGINT) AS height,
        |  CAST(any_value(CASE WHEN has_a THEN 4 ELSE 3 END) AS BIGINT)
        |    AS channels,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  round(CAST(sum((i*7 + x*3 + y*5) % 256) AS DOUBLE)
        |    / count(*), 6) + 0 AS mean_r,
        |  round(CAST(sum((i*11 + x*13 + y*17) % 256) AS DOUBLE)
        |    / count(*), 6) + 0 AS mean_g,
        |  round(CAST(sum((i*19 + x*23 + y*29) % 256) AS DOUBLE)
        |    / count(*), 6) + 0 AS mean_b,
        |  CASE WHEN any_value(has_a)
        |    THEN round(CAST(sum((i*13 + x*11 + y*3) % 256) AS DOUBLE)
        |      / count(*), 6) + 0
        |    ELSE NULL END AS mean_a
        |FROM px GROUP BY i ORDER BY asset_id""".stripMargin,

    "q128_wav_decode" ->
      """WITH aud AS (
        |  SELECT CAST(i AS BIGINT) AS i FROM range(0, 120) t(i)
        |  WHERE i % 3 = 1),
        |ts AS (
        |  SELECT i, unnest(range(0, 60 + (i % 50) * 3)) AS t
        |  FROM aud),
        |smp AS (
        |  SELECT i, ((i*37 + t*101) % 65536) - 32768 AS s FROM ts)
        |SELECT i AS asset_id,
        |  CAST(any_value(8000 + 200 * (i % 5)) AS BIGINT)
        |    AS sample_rate,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  round(CAST(sum(s) AS DOUBLE) / count(*), 6) + 0
        |    AS mean_amp,
        |  round(sqrt(CAST(sum(s*s) AS DOUBLE) / count(*)), 6) + 0
        |    AS rms,
        |  CAST(max(abs(s)) AS BIGINT) AS peak_abs
        |FROM smp GROUP BY i ORDER BY asset_id""".stripMargin,

    "q126_span_removal" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(text), '\s+') END AS toks,
        |    CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS lt
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, n, s,
        |    md5(array_to_string(lt[s+1 : s+5], ' ')) AS dg
        |  FROM (SELECT doc_id, lt, len(lt) AS n,
        |      unnest(CASE WHEN len(lt) >= 5
        |        THEN range(0, len(lt) - 4) ELSE [0] END) AS s
        |    FROM tk)),
        |dfr AS (
        |  SELECT dg FROM (SELECT DISTINCT doc_id, dg FROM w)
        |  GROUP BY dg HAVING count(*) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(range(s, least(s + 5, n))) AS p
        |  FROM w JOIN dfr USING (dg)),
        |pt AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS p,
        |    unnest(toks) AS t
        |  FROM tk),
        |kept AS (
        |  SELECT pt.doc_id, pt.p, pt.t
        |  FROM pt LEFT JOIN cov
        |    ON pt.doc_id = cov.doc_id AND pt.p = cov.p
        |  WHERE cov.p IS NULL),
        |res AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY p) AS cleaned,
        |    count(*) AS nk
        |  FROM kept GROUP BY doc_id)
        |SELECT tk.doc_id,
        |  coalesce(res.cleaned, '') AS cleaned_text,
        |  CAST(coalesce(res.nk, 0) AS BIGINT) AS n_kept,
        |  CAST(len(tk.toks) - coalesce(res.nk, 0) AS BIGINT)
        |    AS n_removed
        |FROM tk LEFT JOIN res ON tk.doc_id = res.doc_id
        |ORDER BY tk.doc_id""".stripMargin,

    "q120_quality_classifier" -> lrGdOracle(iters = 3),

    "q150_calibration_curve" ->
      lrCalibrationOracle(iters = 3, buckets = 100),

    // q151: kNN voting over the IVF probe — train slice provides the
    // first-16-by-id codebook, test vectors probe 4 cells, top-5
    // cosine neighbors vote; argmax (votes desc, label asc)
    "q151_knn_classify" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |tr AS (SELECT * FROM v WHERE vec_id % 5 <> 0),
        |te AS (SELECT * FROM v WHERE vec_id % 5 = 0),
        |cb AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
        |      AS INTEGER) AS cell, vv AS cv
        |  FROM (SELECT vec_id, vv FROM tr ORDER BY vec_id LIMIT 16)),
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT tr.vec_id, cb.cell, row_number() OVER (
        |      PARTITION BY tr.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM tr CROSS JOIN cb) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT te.vec_id AS query_id, cb.cell, row_number() OVER (
        |      PARTITION BY te.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM te CROSS JOIN cb) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv.vv, nv.vv) AS cs
        |  FROM probes p JOIN asn a USING (cell)
        |  JOIN te qv ON qv.vec_id = p.query_id
        |  JOIN tr nv ON nv.vec_id = a.vec_id),
        |topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |      AS rn
        |    FROM scored) WHERE rn <= 5),
        |votes AS (
        |  SELECT t.query_id, nv.label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM topk t JOIN tr nv ON nv.vec_id = t.neighbor_id
        |  GROUP BY 1, 2),
        |pick AS (
        |  SELECT query_id, label AS pred_label, votes FROM (
        |    SELECT query_id, label, votes, row_number() OVER (
        |      PARTITION BY query_id ORDER BY votes DESC, label) AS rk
        |    FROM votes) WHERE rk = 1)
        |SELECT p.query_id AS vec_id, te.label AS true_label,
        |  p.pred_label, p.votes,
        |  (p.pred_label = te.label) AS correct
        |FROM pick p JOIN te ON te.vec_id = p.query_id
        |ORDER BY vec_id""".stripMargin,

    "q117_ivfpq" -> (ivfPqCtes + """
        |SELECT query_id, neighbor_id, round(cs, 4) AS cos_sim,
        |  CAST(rn AS INT) AS rn
        |FROM (SELECT query_id, neighbor_id, cs, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn
        |  FROM rr)
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin),

    // ANN quality audit: IVF-PQ top-5 overlap vs exact top-5
    "q118_ann_recall" -> (ivfPqCtes + """,
        |appr AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id)
        |      AS rn FROM rr) WHERE rn <= 5),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT qv.vec_id AS query_id, nv.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY qv.vec_id
        |        ORDER BY list_cosine_similarity(qv.vv, nv.vv) DESC,
        |          nv.vec_id) AS rn
        |    FROM v qv JOIN v nv ON nv.vec_id <> qv.vec_id
        |    WHERE qv.vec_id < 10) WHERE rn <= 5)
        |SELECT q.query_id, CAST(coalesce(o.n, 0) AS BIGINT)
        |  AS recall_at_5
        |FROM (SELECT vec_id AS query_id FROM v WHERE vec_id < 10) q
        |LEFT JOIN (SELECT a.query_id, count(*) AS n FROM appr a
        |  JOIN ex USING (query_id, neighbor_id)
        |  GROUP BY a.query_id) o USING (query_id)
        |ORDER BY query_id""".stripMargin),

    // bucketed Mann-Whitney AUC: identical 2U formula, identical final
    // division order (u2 -> double, 2.0 * P * N)
    "q208_roc_auc" ->
      """WITH e AS (
        |  SELECT label, CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6, 0)
        |    AS BIGINT) AS s
        |  FROM embeddings),
        |cls AS (SELECT DISTINCT label AS cls FROM e),
        |r AS (SELECT cls, s, CASE WHEN label = cls THEN 1 ELSE 0 END AS y
        |  FROM e CROSS JOIN cls),
        |b AS (SELECT cls, s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS neg FROM r GROUP BY 1, 2),
        |wdw AS (SELECT cls, pos, neg,
        |    sum(neg) OVER (PARTITION BY cls ORDER BY s) - neg AS negbelow
        |  FROM b),
        |u AS (SELECT cls,
        |    CAST(sum(pos * (2 * negbelow + neg)) AS BIGINT) AS u2,
        |    CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg
        |  FROM wdw GROUP BY cls)
        |SELECT cls, round(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6)
        |    AS auc,
        |  n_pos, n_neg
        |FROM u ORDER BY cls""".stripMargin,

    // out-of-fold target encoding: per-(cat, fold) sums once, every
    // total derived from that bounded table, same IEEE op order
    "q209_target_encode" ->
      """WITH pf AS (
        |  SELECT o_orderpriority AS cat,
        |    CAST(o_orderkey % 5 AS INTEGER) AS fold,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS s,
        |    count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |cw AS (SELECT cat, fold, s, c,
        |    CAST(sum(s) OVER (PARTITION BY cat) AS BIGINT) AS cs,
        |    CAST(sum(c) OVER (PARTITION BY cat) AS BIGINT) AS cc FROM pf),
        |fw AS (SELECT fold, CAST(sum(s) AS BIGINT) AS fs,
        |    CAST(sum(c) AS BIGINT) AS fc FROM pf GROUP BY 1),
        |g AS (SELECT CAST(sum(s) AS BIGINT) AS gs,
        |    CAST(sum(c) AS BIGINT) AS gc FROM pf)
        |SELECT cat, fold, cc - c AS n_oof,
        |  round(CASE WHEN (cc - c) + 20.0 > 0 AND (gc - fc) > 0 THEN
        |    (CAST(cs - s AS DOUBLE)
        |      + 20.0 * (CAST(gs - fs AS DOUBLE) / CAST(gc - fc AS DOUBLE)))
        |    / (CAST(cc - c AS DOUBLE) + 20.0) END, 6) AS enc
        |FROM cw JOIN fw USING (fold) CROSS JOIN g
        |ORDER BY cat, fold""".stripMargin,

    // 2x2 chi-square per term on doc-level presence; counts are exact,
    // the statistic's numerator/denominator replicate the Spark op order
    "q210_chi2_terms" ->
      """WITH pres AS (
        |  SELECT DISTINCT doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, token AS term
        |  FROM (SELECT doc_id, lang,
        |      unnest(CASE WHEN trim(text) = '' THEN []
        |        ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |      AS token
        |    FROM documents)
        |  WHERE length(token) >= 3),
        |tot AS (SELECT count(*) AS nn,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS aa
        |  FROM documents),
        |pt AS (SELECT term, CAST(sum(y) AS BIGINT) AS a,
        |    CAST(count(*) - sum(y) AS BIGINT) AS b
        |  FROM pres GROUP BY 1 HAVING count(*) >= 5),
        |x AS (SELECT term, a, b, aa - a AS c, (nn - aa) - b AS dd, nn
        |  FROM pt CROSS JOIN tot)
        |SELECT term, a, b,
        |  round(CAST(nn AS DOUBLE)
        |      * pow(CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * c, 2)
        |    / (CAST(a + b AS DOUBLE) * CAST(c + dd AS DOUBLE)
        |      * CAST(a + c AS DOUBLE) * CAST(b + dd AS DOUBLE)), 4) AS chi2
        |FROM x ORDER BY chi2 DESC, term LIMIT 30""".stripMargin,

    // naive u<v<w triangle enumeration — same triangles as the
    // degree-oriented Spark plan, deliberately different algorithm
    "q211_triangles" ->
      """WITH pairs AS (
        |  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |edges AS (
        |  SELECT x.pk AS u, y.pk AS v FROM pairs x
        |  JOIN pairs y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM edges e1 JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v),
        |nodes AS (
        |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT node, count(*) AS n_tri FROM nodes GROUP BY 1
        |ORDER BY n_tri DESC, node""".stripMargin,

    // seeded-LCG Laplace inverse CDF replayed exactly: the rank window,
    // the modular arithmetic, and the ln argument clamp all match
    "q212_dp_counts" ->
      """WITH c AS (
        |  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, lang, n,
        |    row_number() OVER (ORDER BY source NULLS FIRST,
        |      lang NULLS FIRST) AS gid FROM c),
        |nz AS (SELECT source, lang, n,
        |    (CAST((gid * 1103515245 + 12345) % 2147483648 AS DOUBLE)
        |      / 2147483648.0) - 0.5 AS u FROM r),
        |o AS (SELECT source, lang,
        |    round((CAST(n AS DOUBLE) + (-2.0) * sign(u)
        |        * ln(greatest(1.0 - 2.0 * abs(u), 1e-12))) * 1e4) / 1e4
        |      AS n_noisy
        |  FROM nz)
        |SELECT source, lang, n_noisy, n_noisy >= 10.0 AS released
        |FROM o ORDER BY source, lang""".stripMargin,

    // lag-explode ACF argmax: long Pearson components per (user, lag),
    // rounded acf BEFORE the argmax ordering so ulp noise can't flip it
    "q213_period_detect" ->
      """WITH base AS (
        |  SELECT user_id, t_us, CAST(round(v * 100) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) AS idx
        |  FROM (SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |lags AS (SELECT unnest(range(1, 7)) AS lag),
        |p AS (SELECT c.user_id, l.lag, c.x, p2.x AS y
        |  FROM base c CROSS JOIN lags l
        |  JOIN base p2 ON p2.user_id = c.user_id
        |    AND p2.idx = c.idx - l.lag),
        |st AS (SELECT user_id, lag, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2 HAVING count(*) >= 8),
        |ac AS (SELECT user_id, lag,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS dy FROM st),
        |f AS (SELECT user_id, lag,
        |    round(num / (sqrt(dx) * sqrt(dy)), 4) AS acf
        |  FROM ac WHERE dx > 0 AND dy > 0),
        |best AS (SELECT user_id, lag, acf, row_number() OVER (
        |    PARTITION BY user_id ORDER BY acf DESC, lag) AS rn FROM f)
        |SELECT user_id, CAST(lag AS INTEGER) AS best_lag, acf + 0 AS acf
        |FROM best WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // exact KS: cross-multiplied BIGINT CDF gaps, one division after
    // the max, smallest-value tie-break on the argmax
    "q214_ks_drift" ->
      """WITH vals AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |rc AS (SELECT v, count(*) AS n_ref FROM vals
        |  WHERE event_type = 'view' GROUP BY 1),
        |cc AS (SELECT v, count(*) AS n_cur FROM vals
        |  WHERE event_type = 'click' GROUP BY 1),
        |j AS (SELECT coalesce(rc.v, cc.v) AS v,
        |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM rc FULL OUTER JOIN cc ON rc.v = cc.v),
        |g AS (SELECT v, n_ref, n_cur,
        |    CAST(sum(n_ref) OVER () AS BIGINT) AS tr,
        |    CAST(sum(n_cur) OVER () AS BIGINT) AS tc,
        |    CAST(sum(n_ref) OVER (ORDER BY v) AS BIGINT) AS cr,
        |    CAST(sum(n_cur) OVER (ORDER BY v) AS BIGINT) AS cu
        |  FROM j),
        |gap AS (SELECT v, tr, tc, abs(cr * tc - cu * tr) AS gp FROM g),
        |best AS (SELECT v, tr, tc, gp, row_number() OVER (
        |    ORDER BY gp DESC, v) AS rn FROM gap)
        |SELECT tr AS n_ref, tc AS n_cur, v AS ks_at,
        |  round(CAST(gp AS DOUBLE) / CAST(tr * tc AS DOUBLE), 6) AS ks,
        |  round(CAST(gp AS DOUBLE) / CAST(tr * tc AS DOUBLE), 6)
        |    AS ks_hi
        |FROM best WHERE rn = 1""".stripMargin,

    // split conformal replayed exactly: same halves, same
    // ceil(0.8*(n+1)) rank, same exact order statistic on long errors
    "q215_conformal" ->
      """WITH base AS (
        |  SELECT user_id, t_us, CAST(round(v * 100) AS BIGINT) AS x
        |  FROM (SELECT user_id, epoch_us(ts) AS t_us, max(value) AS v
        |    FROM events WHERE event_type = 'click' AND value IS NOT NULL
        |    GROUP BY 1, 2)),
        |e0 AS (SELECT user_id,
        |    abs(x - lag(x) OVER (PARTITION BY user_id ORDER BY t_us))
        |      AS err,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_us) - 1
        |      AS eidx
        |  FROM base),
        |e AS (SELECT user_id, err, eidx,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e0 WHERE err IS NOT NULL),
        |f AS (SELECT user_id, err, eidx <= floor(n / 2.0) AS cal
        |  FROM e WHERE n >= 11),
        |q AS (SELECT user_id, n_cal, qhat FROM (
        |    SELECT user_id, err AS qhat,
        |      row_number() OVER (PARTITION BY user_id ORDER BY err)
        |        AS rn,
        |      count(*) OVER (PARTITION BY user_id) AS n_cal
        |    FROM f WHERE cal)
        |  WHERE rn = ceil(0.8 * (n_cal + 1))),
        |t AS (SELECT f.user_id, count(*) AS n_test,
        |    CAST(sum(CASE WHEN f.err <= q.qhat THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_covered,
        |    max(q.n_cal) AS n_cal, max(q.qhat) AS qhat
        |  FROM f LEFT JOIN q ON f.user_id = q.user_id WHERE NOT cal
        |  GROUP BY 1)
        |SELECT user_id, CAST(n_cal AS BIGINT) AS n_cal, qhat, n_test,
        |  CASE WHEN qhat IS NOT NULL THEN n_covered END AS n_covered,
        |  CASE WHEN qhat IS NOT NULL AND n_test > 0 THEN
        |    round(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE)
        |      * 1e4) / 1e4 END AS coverage
        |FROM t ORDER BY user_id""".stripMargin,

    // the maintained bucket view must be indistinguishable from the
    // one-shot AUC over the full log: q208's math for class 0
    "q216_incremental_auc" ->
      """WITH e AS (
        |  SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
        |    CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6, 0) AS BIGINT)
        |      AS s
        |  FROM embeddings),
        |b AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS neg FROM e GROUP BY 1),
        |w AS (SELECT pos, neg, sum(neg) OVER (ORDER BY s) - neg
        |    AS negbelow
        |  FROM b),
        |u AS (SELECT CAST(sum(pos * (2 * negbelow + neg)) AS BIGINT)
        |      AS u2,
        |    CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg
        |  FROM w)
        |SELECT round(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6)
        |    AS auc,
        |  n_pos, n_neg FROM u""".stripMargin,

    // first-order Markov: identical lag window, tie order, and the
    // PSI-style integer-scaled entropy terms
    "q217_markov_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |tr AS (SELECT prev, event_type AS next, count(*) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, n, next,
        |    CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS t FROM tr),
        |terms AS (SELECT prev, next, n, t,
        |    round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE) * 1e4) / 1e4 AS p,
        |    CAST(round(-(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
        |      * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9)
        |      AS BIGINT) AS term_s FROM tot),
        |h AS (SELECT prev, next, n, p,
        |    round(CAST(sum(term_s) OVER (PARTITION BY prev) AS DOUBLE)
        |      / 1e9 * 1e6) / 1e6 AS h_prev,
        |    row_number() OVER (PARTITION BY prev ORDER BY n DESC, next)
        |      AS rn FROM terms)
        |SELECT prev, next, n, p, rn = 1 AS is_modal, h_prev
        |FROM h ORDER BY prev, next""".stripMargin,

    // hourly-bucket alignment and long Pearson components replayed
    // verbatim; xcorr null below the support floor
    "q218_lead_lag" ->
      """WITH c AS (
        |  SELECT user_id,
        |    CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hb,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |v AS (
        |  SELECT user_id,
        |    CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hb,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE event_type = 'view' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |lags AS (SELECT unnest(range(-3, 4)) AS lag),
        |p AS (SELECT l.lag, c.x, v.y
        |  FROM c CROSS JOIN lags l
        |  JOIN v ON v.user_id = c.user_id AND v.hb = c.hb + l.lag),
        |st AS (SELECT lag, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1),
        |f AS (SELECT lag, n,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS dy FROM st)
        |SELECT CAST(lag AS INTEGER) AS lag, n,
        |  CASE WHEN n >= 30 AND dx > 0 AND dy > 0 THEN
        |    round(num / (sqrt(dx) * sqrt(dy)) * 1e4) / 1e4 + 0 END
        |    AS xcorr
        |FROM f ORDER BY lag""".stripMargin,

    // average precision from the q208 buckets: descending cumulative
    // counts, 1e-9-scaled block terms, one final division chain
    "q219_pr_auc" ->
      """WITH e AS (
        |  SELECT label, CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6, 0)
        |    AS BIGINT) AS s
        |  FROM embeddings),
        |cls AS (SELECT DISTINCT label AS cls FROM e),
        |r AS (SELECT cls, s, CASE WHEN label = cls THEN 1 ELSE 0 END AS y
        |  FROM e CROSS JOIN cls),
        |b AS (SELECT cls, s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS neg FROM r GROUP BY 1, 2),
        |cum AS (SELECT cls, pos, neg,
        |    CAST(sum(pos) OVER (PARTITION BY cls ORDER BY s DESC)
        |      AS BIGINT) AS cp,
        |    CAST(sum(neg) OVER (PARTITION BY cls ORDER BY s DESC)
        |      AS BIGINT) AS cn
        |  FROM b),
        |terms AS (SELECT cls, pos, neg,
        |    CASE WHEN pos > 0 THEN CAST(round(CAST(pos AS DOUBLE)
        |      * (CAST(cp AS DOUBLE) / CAST(cp + cn AS DOUBLE)) * 1e9)
        |      AS BIGINT)
        |    ELSE 0 END AS term_s FROM cum),
        |u AS (SELECT cls, CAST(sum(term_s) AS BIGINT) AS ts,
        |    CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg
        |  FROM terms GROUP BY cls)
        |SELECT cls, round(CAST(ts AS DOUBLE) / 1e9 / CAST(n_pos AS DOUBLE)
        |    * 1e6) / 1e6 AS pr_auc,
        |  n_pos, n_neg FROM u ORDER BY cls""".stripMargin,

    // exact rank-formulation Gini over the (lang, source) mass table;
    // tie order cannot change the rank sum
    "q220_source_gini" ->
      """WITH m AS (SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS x
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, x,
        |    row_number() OVER (PARTITION BY lang ORDER BY x) AS i FROM m),
        |a AS (SELECT lang, count(*) AS n_entities,
        |    CAST(sum(x) AS BIGINT) AS total,
        |    CAST(sum(i * x) AS BIGINT) AS ix FROM r GROUP BY 1)
        |SELECT lang, n_entities, total,
        |  round((2.0 * CAST(ix AS DOUBLE)
        |      / CAST(n_entities * total AS DOUBLE)
        |    - CAST(n_entities + 1 AS DOUBLE) / CAST(n_entities AS DOUBLE))
        |    * 1e6) / 1e6 AS gini
        |FROM a ORDER BY lang""".stripMargin,

    // GK envelope oracle (the q75 discipline for order statistics):
    // the exact n per user is replayed; the rank-envelope booleans the
    // Spark side derives from its own sketch output are pinned TRUE
    "q221_mad_approx" ->
      """WITH base AS (
        |  SELECT user_id, ts FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |  GROUP BY user_id, ts)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  TRUE AS med_ok, TRUE AS mad_ok
        |FROM base GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q214's KS replay with the guard's coarsening arithmetic replayed
    // exactly: lo over the joint spine, ceil-step to <= 256 buckets,
    // integer floor-div re-bucketing keyed by lower edge. The guard is
    // SUPPORT-CONDITIONAL exactly like the Spark side (step = 1, i.e.
    // the identity bucketing, when the joint distinct support fits) —
    // the oracle must not rest on an out-of-band "support > 256 at
    // every sf" assertion. ks_hi replays the two-sided bound: on a
    // coarse spine, lower bound + the largest one-sided within-bucket
    // mass, capped at 1; on a fine spine it equals ks
    "q222_ks_coarse" ->
      """WITH vals AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |rc0 AS (SELECT v, count(*) AS n FROM vals
        |  WHERE event_type = 'view' GROUP BY 1),
        |cc0 AS (SELECT v, count(*) AS n FROM vals
        |  WHERE event_type = 'click' GROUP BY 1),
        |st AS (SELECT min(v) AS lo, count(DISTINCT v) AS d,
        |    CASE WHEN count(DISTINCT v) <= 256 THEN CAST(1 AS BIGINT)
        |      ELSE (max(v) - min(v) + 1 + 255) // 256 END AS step
        |  FROM (SELECT v FROM rc0 UNION ALL SELECT v FROM cc0)),
        |rc AS (SELECT (r.v - st.lo) // st.step * st.step + st.lo AS v,
        |    CAST(sum(r.n) AS BIGINT) AS n_ref
        |  FROM rc0 r, st GROUP BY 1),
        |cc AS (SELECT (c.v - st.lo) // st.step * st.step + st.lo AS v,
        |    CAST(sum(c.n) AS BIGINT) AS n_cur
        |  FROM cc0 c, st GROUP BY 1),
        |j AS (SELECT coalesce(rc.v, cc.v) AS v,
        |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM rc FULL OUTER JOIN cc ON rc.v = cc.v),
        |g AS (SELECT v, n_ref, n_cur,
        |    CAST(sum(n_ref) OVER () AS BIGINT) AS tr,
        |    CAST(sum(n_cur) OVER () AS BIGINT) AS tc,
        |    CAST(sum(n_ref) OVER (ORDER BY v) AS BIGINT) AS cr,
        |    CAST(sum(n_cur) OVER (ORDER BY v) AS BIGINT) AS cu
        |  FROM j),
        |gap AS (SELECT v, tr, tc, abs(cr * tc - cu * tr) AS gp,
        |    max(greatest(n_ref * tc, n_cur * tr)) OVER () AS bmx
        |  FROM g),
        |best AS (SELECT v, tr, tc, gp, bmx, row_number() OVER (
        |    ORDER BY gp DESC, v) AS rn FROM gap)
        |SELECT tr AS n_ref, tc AS n_cur, v AS ks_at,
        |  round(CAST(gp AS DOUBLE) / CAST(tr * tc AS DOUBLE), 6) AS ks,
        |  CASE WHEN st.d <= 256
        |    THEN round(CAST(gp AS DOUBLE) / CAST(tr * tc AS DOUBLE), 6)
        |    ELSE least(CAST(1 AS DOUBLE),
        |      round(CAST(CAST(gp AS HUGEINT) + bmx AS DOUBLE)
        |        / CAST(tr * tc AS DOUBLE), 6)) END AS ks_hi
        |FROM best, st WHERE rn = 1""".stripMargin,

    // q217's entropy discipline keyed by the bigram state; the >= 5
    // floor applies to the state total computed over the UNfiltered
    // matrix, exactly as the Spark window does
    "q223_markov2" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS p1,
        |    lag(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS p2
        |  FROM events),
        |tr AS (SELECT p2, p1, event_type AS next, count(*) AS n
        |  FROM seq WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |tot AS (SELECT p2, p1, next, n,
        |    CAST(sum(n) OVER (PARTITION BY p2, p1) AS BIGINT) AS t
        |  FROM tr),
        |f AS (SELECT * FROM tot WHERE t >= 5),
        |terms AS (SELECT p2, p1, next, n, t,
        |    round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE) * 1e4) / 1e4 AS p,
        |    CAST(round(-(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
        |      * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9)
        |      AS BIGINT) AS term_s FROM f),
        |h AS (SELECT p2, p1, next, n, p,
        |    round(CAST(sum(term_s) OVER (PARTITION BY p2, p1) AS DOUBLE)
        |      / 1e9 * 1e6) / 1e6 AS h_state,
        |    row_number() OVER (PARTITION BY p2, p1
        |      ORDER BY n DESC, next) AS rn FROM terms)
        |SELECT p2, p1, next, n, p, rn = 1 AS is_modal, h_state
        |FROM h ORDER BY p2, p1, next""".stripMargin,

    // the maintained histogram is additive under appends, so the
    // oracle derives the SAME KS from the raw tables and pins that the
    // delta path produced it
    "q226_incremental_ks" ->
      """WITH vals AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |rc AS (SELECT v, count(*) AS n_ref FROM vals
        |  WHERE event_type = 'view' GROUP BY 1),
        |cc AS (SELECT v, count(*) AS n_cur FROM vals
        |  WHERE event_type = 'click' GROUP BY 1),
        |j AS (SELECT coalesce(rc.v, cc.v) AS v,
        |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM rc FULL OUTER JOIN cc ON rc.v = cc.v),
        |g AS (SELECT v, n_ref, n_cur,
        |    CAST(sum(n_ref) OVER () AS BIGINT) AS tr,
        |    CAST(sum(n_cur) OVER () AS BIGINT) AS tc,
        |    CAST(sum(n_ref) OVER (ORDER BY v) AS BIGINT) AS cr,
        |    CAST(sum(n_cur) OVER (ORDER BY v) AS BIGINT) AS cu
        |  FROM j),
        |gap AS (SELECT v, tr, tc, abs(cr * tc - cu * tr) AS gp FROM g),
        |best AS (SELECT v, tr, tc, gp, row_number() OVER (
        |    ORDER BY gp DESC, v) AS rn FROM gap)
        |SELECT 'incremental' AS mode, tr AS n_ref, tc AS n_cur,
        |  v AS ks_at,
        |  round(CAST(gp AS DOUBLE) / CAST(tr * tc AS DOUBLE), 6) AS ks
        |FROM best WHERE rn = 1""".stripMargin,

    // exact power-of-two decay replayed with the same bit shift; the
    // recency rank counts TRANSITIONS per user (newest = 0)
    "q225_markov_decay" ->
      """WITH seq0 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |seq AS (SELECT user_id, event_type, prev,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) - 1 AS k
        |  FROM seq0 WHERE prev IS NOT NULL),
        |wt AS (SELECT prev, event_type AS next,
        |    CASE WHEN k <= 30
        |      THEN CAST(1 AS BIGINT) << CAST(30 - k AS INT)
        |      ELSE CAST(0 AS BIGINT) END AS w
        |  FROM seq),
        |tr AS (SELECT prev, next, CAST(sum(w) AS BIGINT) AS mass,
        |    count(*) AS n FROM wt GROUP BY 1, 2),
        |tt AS (SELECT prev, next, n, mass,
        |    CAST(sum(mass) OVER (PARTITION BY prev) AS BIGINT) AS t
        |  FROM tr),
        |f AS (SELECT * FROM tt WHERE t > 0),
        |r AS (SELECT prev, next, n, mass,
        |    round(CAST(mass AS DOUBLE) / CAST(t AS DOUBLE) * 1e6) / 1e6
        |      AS p_decay,
        |    row_number() OVER (PARTITION BY prev
        |      ORDER BY mass DESC, next) AS rn FROM f)
        |SELECT prev, next, n, mass, p_decay, rn = 1 AS is_modal
        |FROM r ORDER BY prev, next""".stripMargin,

    // soft-EM replay: the α/β lattice recursions run as recursive CTEs
    // carrying the three lagged values, with the IDENTICAL op order the
    // Scala expression pins (ascending piece length, left-assoc adds,
    // ((α·p)·β/Z)·1e6 per occurrence, per-word integer quantization) —
    // probabilities are exact rationals, so every float op is IEEE-
    // reproducible across engines
    "q224_unigram_soft_em" ->
      ("WITH RECURSIVE " + unigramVocabBody + """,
        |prob AS (SELECT piece, CAST(cnt AS DOUBLE) / t AS p
        |  FROM vocab0 CROSS JOIN tot),
        |ws AS (SELECT DISTINCT word FROM w),
        |alpha AS (
        |  SELECT word, CAST(0 AS BIGINT) AS j,
        |    CAST(1.0 AS DOUBLE) AS a0, CAST(0.0 AS DOUBLE) AS a1,
        |    CAST(0.0 AS DOUBLE) AS a2, CAST(0.0 AS DOUBLE) AS a3
        |  FROM ws
        |  UNION ALL
        |  SELECT r.word, r.j + 1,
        |    r.a0 * coalesce(p1.p, 0.0) + r.a1 * coalesce(p2.p, 0.0)
        |      + r.a2 * coalesce(p3.p, 0.0) + r.a3 * coalesce(p4.p, 0.0),
        |    r.a0, r.a1, r.a2
        |  FROM alpha r
        |  LEFT JOIN prob p1
        |    ON p1.piece = substr(r.word, CAST(r.j + 1 AS INT), 1)
        |  LEFT JOIN prob p2 ON r.j >= 1
        |    AND p2.piece = substr(r.word, CAST(r.j AS INT), 2)
        |  LEFT JOIN prob p3 ON r.j >= 2
        |    AND p3.piece = substr(r.word, CAST(r.j - 1 AS INT), 3)
        |  LEFT JOIN prob p4 ON r.j >= 3
        |    AND p4.piece = substr(r.word, CAST(r.j - 2 AS INT), 4)
        |  WHERE r.j < len(r.word)),
        |beta AS (
        |  SELECT word, CAST(len(word) AS BIGINT) AS i,
        |    CAST(1.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1,
        |    CAST(0.0 AS DOUBLE) AS b2, CAST(0.0 AS DOUBLE) AS b3
        |  FROM ws
        |  UNION ALL
        |  SELECT r.word, r.i - 1,
        |    coalesce(p1.p, 0.0) * r.b0 + coalesce(p2.p, 0.0) * r.b1
        |      + coalesce(p3.p, 0.0) * r.b2 + coalesce(p4.p, 0.0) * r.b3,
        |    r.b0, r.b1, r.b2
        |  FROM beta r
        |  LEFT JOIN prob p1
        |    ON p1.piece = substr(r.word, CAST(r.i AS INT), 1)
        |  LEFT JOIN prob p2 ON r.i + 1 <= len(r.word)
        |    AND p2.piece = substr(r.word, CAST(r.i AS INT), 2)
        |  LEFT JOIN prob p3 ON r.i + 2 <= len(r.word)
        |    AND p3.piece = substr(r.word, CAST(r.i AS INT), 3)
        |  LEFT JOIN prob p4 ON r.i + 3 <= len(r.word)
        |    AND p4.piece = substr(r.word, CAST(r.i AS INT), 4)
        |  WHERE r.i > 0),
        |af AS (SELECT word, j, a0 FROM alpha),
        |bf AS (SELECT word, i, b0 FROM beta),
        |zt AS (SELECT word, a0 AS z FROM alpha WHERE j = len(word)),
        |occ AS (
        |  SELECT ws.word, t.s AS s0, u.l AS l,
        |    substr(ws.word, CAST(t.s + 1 AS INT), CAST(u.l AS INT))
        |      AS piece
        |  FROM ws,
        |    LATERAL unnest(range(0, len(ws.word))) AS t(s),
        |    LATERAL unnest(range(1, 5)) AS u(l)
        |  WHERE t.s + u.l <= len(ws.word)),
        |post AS (
        |  SELECT o.word, o.piece,
        |    CAST(round(af.a0 * pr.p * bf.b0 / zt.z * 1000000.0)
        |      AS BIGINT) AS u
        |  FROM occ o
        |  JOIN prob pr ON pr.piece = o.piece
        |  JOIN af ON af.word = o.word AND af.j = o.s0
        |  JOIN bf ON bf.word = o.word AND bf.i = o.s0 + o.l
        |  JOIN zt ON zt.word = o.word
        |  WHERE zt.z > 0),
        |pw AS (SELECT word, piece, CAST(sum(u) AS BIGINT) AS u
        |  FROM post GROUP BY 1, 2),
        |usage AS (SELECT piece, CAST(sum(w.n * pw.u) AS BIGINT)
        |    AS usage_s
        |  FROM pw JOIN w USING (word) GROUP BY piece),
        |kept AS (
        |  SELECT piece, cnt FROM (
        |    SELECT v.piece,
        |      CASE WHEN len(v.piece) = 1
        |        THEN greatest(coalesce(u.usage_s, 0), 1000000)
        |        ELSE u.usage_s END AS cnt
        |    FROM vocab0 v LEFT JOIN usage u USING (piece))
        |  WHERE cnt IS NOT NULL AND cnt > 0),
        |tot2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t2 FROM kept)
        |SELECT piece, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(round(ln(CAST(cnt AS DOUBLE) / t2) * 1000000.0)
        |    AS BIGINT) AS score
        |FROM kept CROSS JOIN tot2
        |ORDER BY piece""".stripMargin),

    // the full training loop unrolled: TWO soft-EM lattices (q224's
    // α/β recursions, round 2 over round 1's renormalized survivors)
    // each followed by the prune-by-loss ranking — every posterior,
    // loss product (HUGEINT-exact), and shrink arithmetic replayed;
    // a drifted prune order or a wrong survivor set breaks the hash
    "q227_unigram_train" ->
      ("WITH RECURSIVE " + unigramVocabBody + """,
        |ws AS MATERIALIZED (SELECT DISTINCT word FROM w),
        |occ AS MATERIALIZED (
        |  SELECT ws.word, t.s AS s0, u.l AS l,
        |    substr(ws.word, CAST(t.s + 1 AS INT), CAST(u.l AS INT))
        |      AS piece
        |  FROM ws,
        |    LATERAL unnest(range(0, len(ws.word))) AS t(s),
        |    LATERAL unnest(range(1, 5)) AS u(l)
        |  WHERE t.s + u.l <= len(ws.word)),
        |""".stripMargin
        + softEmRoundSql(1, "vocab0", 20) + ",\n"
        + softEmRoundSql(2, "surv1", 20) + """,
        |totf AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM surv2)
        |SELECT piece, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(round(ln(CAST(cnt AS DOUBLE) / t) * 1000000.0)
        |    AS BIGINT) AS score
        |FROM surv2 CROSS JOIN totf
        |ORDER BY piece""".stripMargin))

  /** One full soft-EM training round for the q227 oracle, CTE names
    * suffixed by round number: the α/β lattice E-step (q224's
    * recursions verbatim, joined to this round's exact-rational
    * probabilities), the M-step floor/rescore, and the prune-by-loss
    * ranking — loss = HUGEINT(expected usage) × (score − best
    * alternative-composition score), keep
    * max(target − singles, ceil(3n/4)) multis by (loss DESC, piece).
    * The composition set comes from the SAME
    * [[graft.operators.Unigram.properCompositions]] enumeration the
    * Spark-side prune uses — one source of truth for both engines.
    * Heavily-referenced CTEs are MATERIALIZED (the closure-oracle
    * lesson: multi-referenced chained CTEs inline exponentially). */
  private def softEmRoundSql(it: Int, vocabCte: String,
      targetVocab: Int, maxPieceLen: Int = 4): String = {
    val compBranches = (2 to maxPieceLen).flatMap { n =>
      graft.operators.Unigram.properCompositions(n).map { parts =>
        val joins = parts.zipWithIndex.map { case (l, k) =>
          val off = parts.take(k).sum
          s"  JOIN sc$it s${k + 1} ON s${k + 1}.piece = " +
            s"substr(k.piece, ${off + 1}, $l)"
        }.mkString("\n")
        val sumExpr = parts.indices.map(k => s"s${k + 1}.score")
          .mkString(" + ")
        s"  SELECT k.piece, $sumExpr AS cs\n  FROM sc$it k\n" +
          s"$joins\n  WHERE len(k.piece) = $n"
      }
    }.mkString("\n  UNION ALL\n")
    s"""tt$it AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM $vocabCte),
      |prob$it AS MATERIALIZED (SELECT piece, CAST(cnt AS DOUBLE) / t
      |    AS p
      |  FROM $vocabCte CROSS JOIN tt$it),
      |alpha$it AS (
      |  SELECT word, CAST(0 AS BIGINT) AS j,
      |    CAST(1.0 AS DOUBLE) AS a0, CAST(0.0 AS DOUBLE) AS a1,
      |    CAST(0.0 AS DOUBLE) AS a2, CAST(0.0 AS DOUBLE) AS a3
      |  FROM ws
      |  UNION ALL
      |  SELECT r.word, r.j + 1,
      |    r.a0 * coalesce(p1.p, 0.0) + r.a1 * coalesce(p2.p, 0.0)
      |      + r.a2 * coalesce(p3.p, 0.0) + r.a3 * coalesce(p4.p, 0.0),
      |    r.a0, r.a1, r.a2
      |  FROM alpha$it r
      |  LEFT JOIN prob$it p1
      |    ON p1.piece = substr(r.word, CAST(r.j + 1 AS INT), 1)
      |  LEFT JOIN prob$it p2 ON r.j >= 1
      |    AND p2.piece = substr(r.word, CAST(r.j AS INT), 2)
      |  LEFT JOIN prob$it p3 ON r.j >= 2
      |    AND p3.piece = substr(r.word, CAST(r.j - 1 AS INT), 3)
      |  LEFT JOIN prob$it p4 ON r.j >= 3
      |    AND p4.piece = substr(r.word, CAST(r.j - 2 AS INT), 4)
      |  WHERE r.j < len(r.word)),
      |beta$it AS (
      |  SELECT word, CAST(len(word) AS BIGINT) AS i,
      |    CAST(1.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1,
      |    CAST(0.0 AS DOUBLE) AS b2, CAST(0.0 AS DOUBLE) AS b3
      |  FROM ws
      |  UNION ALL
      |  SELECT r.word, r.i - 1,
      |    coalesce(p1.p, 0.0) * r.b0 + coalesce(p2.p, 0.0) * r.b1
      |      + coalesce(p3.p, 0.0) * r.b2 + coalesce(p4.p, 0.0) * r.b3,
      |    r.b0, r.b1, r.b2
      |  FROM beta$it r
      |  LEFT JOIN prob$it p1
      |    ON p1.piece = substr(r.word, CAST(r.i AS INT), 1)
      |  LEFT JOIN prob$it p2 ON r.i + 1 <= len(r.word)
      |    AND p2.piece = substr(r.word, CAST(r.i AS INT), 2)
      |  LEFT JOIN prob$it p3 ON r.i + 2 <= len(r.word)
      |    AND p3.piece = substr(r.word, CAST(r.i AS INT), 3)
      |  LEFT JOIN prob$it p4 ON r.i + 3 <= len(r.word)
      |    AND p4.piece = substr(r.word, CAST(r.i AS INT), 4)
      |  WHERE r.i > 0),
      |af$it AS MATERIALIZED (SELECT word, j, a0 FROM alpha$it),
      |bf$it AS MATERIALIZED (SELECT word, i, b0 FROM beta$it),
      |zt$it AS MATERIALIZED (SELECT word, a0 AS z FROM alpha$it
      |  WHERE j = len(word)),
      |post$it AS (
      |  SELECT o.word, o.piece,
      |    CAST(round(a.a0 * pr.p * b.b0 / z.z * 1000000.0)
      |      AS BIGINT) AS u
      |  FROM occ o
      |  JOIN prob$it pr ON pr.piece = o.piece
      |  JOIN af$it a ON a.word = o.word AND a.j = o.s0
      |  JOIN bf$it b ON b.word = o.word AND b.i = o.s0 + o.l
      |  JOIN zt$it z ON z.word = o.word
      |  WHERE z.z > 0),
      |pw$it AS (SELECT word, piece, CAST(sum(u) AS BIGINT) AS u
      |  FROM post$it GROUP BY 1, 2),
      |usage$it AS MATERIALIZED (SELECT piece,
      |    CAST(sum(w.n * pw$it.u) AS BIGINT) AS usage_s
      |  FROM pw$it JOIN w USING (word) GROUP BY piece),
      |kept$it AS MATERIALIZED (
      |  SELECT piece, cnt FROM (
      |    SELECT v.piece,
      |      CASE WHEN len(v.piece) = 1
      |        THEN greatest(coalesce(u.usage_s, 0), 1000000)
      |        ELSE u.usage_s END AS cnt
      |    FROM $vocabCte v LEFT JOIN usage$it u USING (piece))
      |  WHERE cnt IS NOT NULL AND cnt > 0),
      |tot$it AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM kept$it),
      |sc$it AS MATERIALIZED (SELECT piece, CAST(cnt AS BIGINT) AS cnt,
      |    CAST(round(ln(CAST(cnt AS DOUBLE) / t) * 1000000.0)
      |      AS BIGINT) AS score
      |  FROM kept$it CROSS JOIN tot$it),
      |comp$it AS (
      |$compBranches),
      |alt$it AS MATERIALIZED (SELECT piece, max(cs) AS alt
      |  FROM comp$it GROUP BY piece),
      |cntm$it AS (SELECT
      |    count(*) FILTER (WHERE len(piece) > 1) AS nm,
      |    count(*) FILTER (WHERE len(piece) = 1) AS ns
      |  FROM sc$it),
      |rank$it AS (SELECT m.piece, m.cnt, row_number() OVER (
      |    ORDER BY (a.alt IS NULL) DESC,
      |      CAST(m.cnt AS HUGEINT)
      |        * CAST(m.score - a.alt AS HUGEINT) DESC,
      |      m.piece) AS rn
      |  FROM sc$it m LEFT JOIN alt$it a USING (piece)
      |  WHERE len(m.piece) > 1),
      |surv$it AS MATERIALIZED (
      |  SELECT piece, cnt FROM sc$it WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT r.piece, r.cnt FROM rank$it r, cntm$it c
      |  WHERE r.rn <= least(c.nm,
      |    greatest(greatest(0, $targetVocab - c.ns),
      |      (3 * c.nm + 3) // 4)))""".stripMargin
  }

  /** Unrolled full-batch logistic-GD oracle replicating
    * [[graft.operators.QualityClassifier.scoreDF]] (lr = 0.5, zero
    * init): per-doc residuals are 6-dp-rounded, scaled to BIGINT and
    * integer-summed (order-free — the same determinism contract as the
    * Spark side), weights re-rounded to 6 dp each iteration. */
  private def lrGdOracle(iters: Int): String = {
    val stopList = sqlStringList(
      graft.functions.TextFunctions.EnglishStopwords)
    val z = "wa + wb*f1 + wc*f2 + wd*f3"
    val header = s"""WITH f AS (
      |  SELECT doc_id, (source = 'src0') AS y,
      |    round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0), 6)
      |      AS f1,
      |    round(sqrt(CAST(len(list_distinct(toks)) AS DOUBLE)
      |      / greatest(CAST(len(toks) AS DOUBLE), 1.0)), 6) AS f2,
      |    round(CAST(len(list_filter(toks,
      |        t -> list_contains($stopList, t))) AS DOUBLE)
      |      / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS f3
      |  FROM (SELECT doc_id, source, text,
      |      CASE WHEN trim(text) = '' THEN []
      |      ELSE string_split_regex(trim(lower(text)), '\\s+') END
      |      AS toks FROM documents)),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS nv FROM f),
      |w0 AS (SELECT 0.0 AS wa, 0.0 AS wb, 0.0 AS wc, 0.0 AS wd)"""
    val iterCtes = (0 until iters).map { i =>
      s""",
      |g${i + 1} AS (
      |  SELECT sum(CAST(round(rs * 1000000.0, 0) AS BIGINT)) AS s0,
      |    sum(CAST(round(rs * f1 * 1000000.0, 0) AS BIGINT)) AS s1,
      |    sum(CAST(round(rs * f2 * 1000000.0, 0) AS BIGINT)) AS s2,
      |    sum(CAST(round(rs * f3 * 1000000.0, 0) AS BIGINT)) AS s3
      |  FROM (SELECT f1, f2, f3,
      |      (CASE WHEN y THEN 1.0 ELSE 0.0 END)
      |        - round(1.0 / (1.0 + exp(-($z))), 6) AS rs
      |    FROM f CROSS JOIN w$i)),
      |w${i + 1} AS (
      |  SELECT round(wa + 0.5 * s0 / (1000000.0 * nv), 6) AS wa,
      |    round(wb + 0.5 * s1 / (1000000.0 * nv), 6) AS wb,
      |    round(wc + 0.5 * s2 / (1000000.0 * nv), 6) AS wc,
      |    round(wd + 0.5 * s3 / (1000000.0 * nv), 6) AS wd
      |  FROM w$i CROSS JOIN g${i + 1} CROSS JOIN n)"""
    }.mkString
    val tail = s"""
      |SELECT doc_id, y AS label,
      |  round(1.0 / (1.0 + exp(-($z))), 4) + 0 AS score,
      |  (round(1.0 / (1.0 + exp(-($z))), 4) + 0) >= 0.5 AS pred
      |FROM f CROSS JOIN w$iters
      |ORDER BY doc_id"""
    (header + iterCtes + tail).stripMargin
  }

  /** q150: the q120 training chain (same CTEs up to w`iters`), then
    * decile-bucketed calibration — bucket score sums as ×10⁴ integers,
    * positive counts as longs, gap from the two ROUNDED values. */
  private def lrCalibrationOracle(iters: Int, buckets: Int): String = {
    val trained = lrGdOracle(iters)
    val base = trained.substring(0, trained.indexOf("\nSELECT doc_id,"))
    val z = "wa + wb*f1 + wc*f2 + wd*f3"
    base + s""",
      |sc AS (SELECT doc_id, y,
      |  round(1.0 / (1.0 + exp(-($z))), 4) + 0 AS score
      |  FROM f CROSS JOIN w$iters),
      |b AS (
      |  SELECT least(CAST(floor(score * $buckets) AS INT),
      |      ${buckets - 1}) AS bucket,
      |    CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(round(score * 10000.0, 0) AS BIGINT)) AS ss,
      |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS np
      |  FROM sc GROUP BY 1),
      |c AS (
      |  SELECT bucket, n,
      |    round(CAST(ss AS DOUBLE) / (10000.0 * n), 6) + 0
      |      AS mean_score,
      |    round(CAST(np AS DOUBLE) / n, 6) + 0 AS pos_rate
      |  FROM b)
      |SELECT bucket, n, mean_score, pos_rate,
      |  round(abs(mean_score - pos_rate), 6) + 0 AS gap
      |FROM c ORDER BY bucket""".stripMargin
  }

  /** Shared CTE stack for the IVF-PQ oracles (q117/q118): trained
    * coarse codebook (lloyd2cb16) + PQ chains + codes/assignment/
    * probes/ADC/shortlist/re-rank, ending at `rr(query_id,
    * neighbor_id, cs)`. */
  /** Shared CTE prefix replicating
    * [[graft.operators.HashingVectorizer]]: q52's TF-IDF base, term →
    * md5-bucket (dim 64), TF-IDF scaled to integers (×10⁴) so the
    * bucket sums `ws` and squared norms `n2` are exact. Ends at
    * `bb` (doc_id, bucket, ws) and `norms` (doc_id, n2). */
  /** Shared near-dup/closure machinery for the q59/q113/q131 family,
    * scale-safe at sf0.1 (where the previous all-pairs + recursive-CTE
    * form ground for hours):
    *
    *  - candidate pairs come from an INVERTED-INDEX join (docs sharing
    *    ≥ 1 shingle) — LOSSLESS for any jaccard threshold > 0, since
    *    jaccard ≥ t > 0 implies a shared shingle — instead of the
    *    all-pairs N² frame;
    *  - the transitive closure is UNROLLED min-label propagation with
    *    pointer jumping (new label = min of label-of-label and
    *    neighbors' labels; monotone nonincreasing, O(log n) rounds to
    *    the component min), with a fail-loud fixpoint guard: if
    *    `rounds` did not reach the fixpoint, `lab` is emptied and the
    *    compare fails RED rather than silently under-merging.
    *
    * Emits CTEs: sh (doc shingle sets), shu, cand, edges, sym,
    * l0..lN, conv, lab(doc_id, cluster_id). Callers append their
    * consumers of `lab`. */
  private def closureCtes(rounds: Int = 8): String = {
    val head =
      """WITH sh AS MATERIALIZED (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3
        |      THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      END) AS s
        |  FROM (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END
        |      AS toks FROM documents)),
        |shu AS MATERIALIZED (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |  FROM shu a JOIN shu b ON a.g = b.g AND a.doc_id < b.doc_id),
        |edges AS MATERIALIZED (
        |  SELECT c.src, c.dst FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.src
        |  JOIN sh sb ON sb.doc_id = c.dst
        |  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
        |    >= 0.95),
        |sym AS MATERIALIZED (SELECT src, dst FROM edges
        |  UNION SELECT dst AS src, src AS dst FROM edges),
        |l0 AS MATERIALIZED (
        |  SELECT d.doc_id,
        |    least(d.doc_id, coalesce(m.mn, d.doc_id)) AS lab
        |  FROM documents d LEFT JOIN (
        |    SELECT src AS doc_id, min(dst) AS mn FROM sym
        |    GROUP BY src) m USING (doc_id))""".stripMargin
    val steps = (1 to rounds).map { k =>
      s""",
         |l$k AS MATERIALIZED (
         |  SELECT t.doc_id, min(t.v) AS lab FROM (
         |    SELECT cur.doc_id, ptr.lab AS v
         |    FROM l${k - 1} cur JOIN l${k - 1} ptr
         |      ON ptr.doc_id = cur.lab
         |    UNION ALL
         |    SELECT s.src AS doc_id, x.lab AS v
         |    FROM sym s JOIN l${k - 1} x ON x.doc_id = s.dst) t
         |  GROUP BY t.doc_id)""".stripMargin
    }.mkString
    val guard =
      s""",
         |conv AS (
         |  SELECT count(*) AS n FROM l${rounds - 1} a
         |  JOIN l$rounds b ON a.doc_id = b.doc_id
         |  WHERE a.lab <> b.lab),
         |lab AS (
         |  SELECT doc_id, lab AS cluster_id FROM l$rounds
         |  WHERE (SELECT n FROM conv) = 0)""".stripMargin
    head + steps + guard
  }

  private lazy val hashedVectorCtes: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
      |    ELSE string_split_regex(trim(lower(text)), '\s+') END)
      |    AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf
      |  FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, token, tf,
      |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4)
      |      AS tfidf
      |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
      |bucketed AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 64
      |      AS bucket,
      |    CAST(round(tfidf * 10000.0, 0) AS BIGINT) AS w
      |  FROM scored),
      |bb AS (SELECT doc_id, bucket, sum(w) AS ws
      |  FROM bucketed GROUP BY 1, 2),
      |norms AS (SELECT doc_id, sum(ws * ws) AS n2 FROM bb GROUP BY 1)
      |""".stripMargin

  private lazy val ivfPqCtes: String =
    (lloyd2cb16 + ",\n" +
      pqChainsBody(m = 4, sub = 16, cells = 16) + """,
        |codes AS (
        |  SELECT f0.vec_id, code_0, code_1, code_2, code_3
        |  FROM f0 JOIN f1 USING (vec_id) JOIN f2 USING (vec_id)
        |    JOIN f3 USING (vec_id)),
        |asn AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, cb2.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb2) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT v.vec_id AS query_id, cb2.cell, row_number() OVER (
        |      PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(vv, cv) DESC, cell) AS rn
        |    FROM v CROSS JOIN cb2 WHERE v.vec_id < 10) WHERE rn <= 4),
        |adc AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 17),
        |      i -> (qv.vv[i]-b0.cv[i])*(qv.vv[i]-b0.cv[i])))
        |    + list_sum(list_transform(range(1, 17),
        |      i -> (qv.vv[16+i]-b1.cv[i])*(qv.vv[16+i]-b1.cv[i])))
        |    + list_sum(list_transform(range(1, 17),
        |      i -> (qv.vv[32+i]-b2.cv[i])*(qv.vv[32+i]-b2.cv[i])))
        |    + list_sum(list_transform(range(1, 17),
        |      i -> (qv.vv[48+i]-b3.cv[i])*(qv.vv[48+i]-b3.cv[i])))
        |      AS ad
        |  FROM probes p JOIN asn a ON p.cell = a.cell
        |  JOIN codes cd ON cd.vec_id = a.vec_id
        |  JOIN c0_1 b0 ON b0.cell = cd.code_0
        |  JOIN c1_1 b1 ON b1.cell = cd.code_1
        |  JOIN c2_1 b2 ON b2.cell = cd.code_2
        |  JOIN c3_1 b3 ON b3.cell = cd.code_3
        |  JOIN v qv ON qv.vec_id = p.query_id
        |  WHERE a.vec_id <> p.query_id),
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY ad, neighbor_id) AS rn
        |    FROM adc) WHERE rn <= 100),
        |rr AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    list_cosine_similarity(qv.vv, nv.vv) AS cs
        |  FROM short s
        |  JOIN v qv ON qv.vec_id = s.query_id
        |  JOIN v nv ON nv.vec_id = s.neighbor_id)""".stripMargin)
}
