"""Shared DuckDB oracle SQL builders for the text-pipeline operator
families that have BOTH catalog (driver) rows and pytest coverage:
substring dedup via content-defined chunks, winnowing fingerprints, and
the Gopher repetition rules.

Single-sourced on purpose: through round 6 these oracles lived only in
the test files, so promoting an operator into the driver's correctness
window meant copying SQL — two copies that could drift.  The catalog
entries (plans/extension.py) and the tests now import the same builder;
rule bounds and n-gram orders come from functions/text.py's tables, so
Spark code, driver oracle and pytest oracle can never disagree on a
constant.

Tokenization in every builder is the shared round-7 convention (split
the lowercased text on ``\\s+``, drop empty tokens — see
functions/text.tokens)."""

from __future__ import annotations

from excelstream_spark.functions import text as TXT


def _toks(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '\\s+'), "
        "x -> x <> '')"
    )


def cdc_dedup_oracle(
    avg_tokens: int,
    min_df: int,
    min_chunk: int,
    max_tokens: int | None = None,
    src: str = "documents",
) -> str:
    """DuckDB replay of operators/dedup.dedup_token_chunks_cdc:
    md5-derived content boundaries, the forced ``max_tokens`` boundary
    anchored to the last content boundary, exclusive-prefix-sum chunk
    numbering, hot-set keeper logic, touched-only rebuild (untouched
    docs keep text byte-for-byte incl. NULL)."""
    if max_tokens is None:
        max_tokens = 8 * avg_tokens
    return f"""
        WITH d AS (SELECT doc_id, text, coalesce(text, '') AS t
                   FROM {src}),
        tkn AS (SELECT doc_id, {_toks('t')} AS tk FROM d),
        tok AS (SELECT doc_id, i AS pos, tk[i] AS tok
                FROM (SELECT doc_id, tk,
                             unnest(generate_series(1, len(tk))) AS i
                      FROM tkn)),
        flagged AS (SELECT doc_id, pos, tok,
                           CASE WHEN ('0x' || substr(md5(tok), 1, 8))::bigint
                                     % {avg_tokens} = 0
                                THEN 1 ELSE 0 END AS bnd
                    FROM tok),
        anch AS (SELECT doc_id, pos, tok, bnd,
                        coalesce(max(CASE WHEN bnd = 1 THEN pos END) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS lbc
                 FROM flagged),
        eff AS (SELECT doc_id, pos, tok,
                       CASE WHEN bnd = 1
                              OR ((pos - lbc) % {max_tokens} = 0
                                  AND pos - lbc > 0)
                            THEN 1 ELSE 0 END AS bnd
                FROM anch),
        numbered AS (SELECT doc_id, pos, tok,
                            coalesce(sum(bnd) OVER (
                              PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS chunk_idx
                     FROM eff),
        chunks AS MATERIALIZED (SELECT doc_id, chunk_idx,
                          string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
                          count(*) AS n_tokens
                   FROM numbered GROUP BY doc_id, chunk_idx),
        hot AS (SELECT chunk_text, min(doc_id) AS keeper
                FROM chunks WHERE n_tokens >= {min_chunk}
                GROUP BY chunk_text
                HAVING count(DISTINCT doc_id) >= {min_df}),
        lost AS (SELECT DISTINCT c.doc_id
                 FROM chunks c JOIN hot h USING (chunk_text)
                 WHERE c.doc_id <> h.keeper),
        kept AS (SELECT c.doc_id, c.chunk_idx, c.chunk_text
                 FROM chunks c LEFT JOIN hot h USING (chunk_text)
                 WHERE h.keeper IS NULL OR c.doc_id = h.keeper),
        r AS (SELECT doc_id,
                     string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS txt
              FROM kept JOIN lost USING (doc_id) GROUP BY doc_id)
        SELECT d.doc_id,
               CASE WHEN l.doc_id IS NOT NULL THEN coalesce(r.txt, '')
                    ELSE d.text END AS text
        FROM d LEFT JOIN lost l USING (doc_id) LEFT JOIN r USING (doc_id)
    """


def winnow_fps_ctes(k: int, w: int) -> str:
    """CTE block ending in ``fps(doc_id, pos, fp)`` — the winnowing
    fingerprint selection (window join + rightmost-min; md5-derived
    hashes bit-identical to the Spark/numpy extraction)."""
    return f"""
        d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
        tkn AS (SELECT doc_id, {_toks('t')} AS tk FROM d),
        g AS (SELECT doc_id, j,
                     ('0x' || substr(md5(
                        array_to_string(tk[j : j + {k - 1}], ' ')
                      ), 1, 8))::bigint AS h,
                     len(tk) - {k} + 1 AS ng
              FROM (SELECT doc_id, tk,
                           unnest(generate_series(1, len(tk) - {k} + 1)) AS j
                    FROM tkn)),
        win AS (SELECT g.doc_id, i.i, g.j, g.h
                FROM (SELECT doc_id,
                             unnest(generate_series(
                               1, greatest(1, ng - {w} + 1))) AS i
                      FROM (SELECT DISTINCT doc_id, ng FROM g)) i
                JOIN g ON g.doc_id = i.doc_id
                WHERE g.j >= i.i AND g.j < i.i + {w}),
        sel AS (SELECT doc_id, i, min(h) AS m
                FROM win GROUP BY doc_id, i),
        fps AS (SELECT DISTINCT doc_id, jj - 1 AS pos, m AS fp
                FROM (SELECT w2.doc_id, w2.i, s.m, max(w2.j) AS jj
                      FROM win w2
                      JOIN sel s ON w2.doc_id = s.doc_id AND w2.i = s.i
                                 AND w2.h = s.m
                      GROUP BY w2.doc_id, w2.i, s.m))
    """


def winnow_pairs_oracle(
    k: int, w: int, threshold: float, max_fp_df: int
) -> str:
    """DuckDB replay of operators/fingerprint.dedup_winnowing_pairs:
    distinct fp sets, pre-cut set sizes, the hot-fp cut, inverted-index
    self-join, overlap coefficient >= ``threshold``."""
    return (
        "WITH " + winnow_fps_ctes(k, w) + f""",
        df2 AS (SELECT DISTINCT doc_id, fp FROM fps),
        sizes AS (SELECT doc_id, count(*) AS n FROM df2 GROUP BY doc_id),
        kept AS (SELECT * FROM df2 WHERE fp NOT IN (
                   SELECT fp FROM df2 GROUP BY fp
                   HAVING count(*) > {max_fp_df})),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS shared
              FROM kept a JOIN kept b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
        SELECT doc_a, doc_b, shared,
               round(shared * 1.0 / least(sa.n, sb.n), 6) AS overlap
        FROM p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        WHERE shared * 1.0 / least(sa.n, sb.n) >= {threshold}
    """
    )


def repetition_sql(src: str = "documents") -> str:
    """Line/paragraph repetition metrics — a full SELECT of
    (doc_id, dup_line_frac, dup_line_char_frac, dup_para_frac,
    dup_para_char_frac); group-by formulation of the Spark side's
    sorted-run aggregate (values must match, algorithm differs)."""
    return f"""
    WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM {src}),
    seg AS (
      SELECT doc_id, 'line' AS g, unnest(string_split(t, chr(10))) AS s FROM d
      UNION ALL
      SELECT doc_id, 'para' AS g,
             unnest(string_split(t, chr(10) || chr(10))) AS s FROM d
    ),
    cnt AS (
      SELECT doc_id, g, s, count(*) AS c, length(s) AS len
      FROM seg GROUP BY doc_id, g, s
    ),
    agg AS (
      SELECT doc_id, g,
             CASE WHEN sum(c) > 0
                  THEN 1.0 - count(*) * 1.0 / sum(c) END AS dup_frac,
             CASE WHEN sum(len * c) > 0
                  THEN sum(CASE WHEN c > 1 THEN len * (c - 1) ELSE 0 END) * 1.0
                       / sum(len * c) END AS dup_char_frac
      FROM cnt GROUP BY doc_id, g
    )
    SELECT l.doc_id,
           l.dup_frac AS dup_line_frac,
           l.dup_char_frac AS dup_line_char_frac,
           p.dup_frac AS dup_para_frac,
           p.dup_char_frac AS dup_para_char_frac
    FROM agg l JOIN agg p ON l.doc_id = p.doc_id
    WHERE l.g = 'line' AND p.g = 'para'
"""


#: back-compat alias over the default source table
SQL_REPETITION = repetition_sql()


def ngram_repetition_oracle(src: str = "documents") -> str:
    """DuckDB replay of the nine Gopher n-gram repetition metrics
    (operators/quality.ngram_repetition_flags): per-n gram tables, the
    single MOST FREQUENT n-gram (count >= 2 required; ties broken by
    earliest first occurrence — Counter.most_common's stable order),
    duplicated-gram start positions and the exact interval-union token
    coverage."""
    norm = "trim(regexp_replace(lower(t), '\\s+', ' ', 'g'))"
    ctes = [
        f"d AS (SELECT doc_id, coalesce(text, '') AS t FROM {src})",
        f"""tkn AS (SELECT doc_id, {_toks('t')} AS tk,
                length({norm}) AS total_chars
            FROM d)""",
    ]
    joins, cols = [], []
    for n in TXT.NGRAM_TOP_NS + TXT.NGRAM_DUP_NS:
        ctes.append(f"""g{n} AS (
            SELECT doc_id, j,
                   array_to_string(tk[j : j + {n - 1}], ' ') AS gram
            FROM (SELECT doc_id, tk,
                         unnest(generate_series(1, len(tk) - {n} + 1)) AS j
                  FROM tkn))""")
    for n in TXT.NGRAM_TOP_NS:
        ctes.append(f"""top{n} AS (
            SELECT doc_id, cnt * length(gram) AS chars
            FROM (SELECT doc_id, gram, count(*) AS cnt,
                         row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY count(*) DESC, min(j) ASC) AS rk
                  FROM g{n} GROUP BY doc_id, gram)
            WHERE rk = 1 AND cnt >= 2)""")
        joins.append(f"LEFT JOIN top{n} USING (doc_id)")
        cols.append(
            f"CASE WHEN len(tk) >= {n} AND total_chars > 0 "
            f"THEN coalesce(top{n}.chars, 0) * 1.0 / total_chars "
            f"ELSE 0.0 END AS top_{n}_gram_char_frac"
        )
    for n in TXT.NGRAM_DUP_NS:
        ctes.append(f"""dup{n} AS (
            SELECT doc_id, j - 1 AS p FROM (
              SELECT doc_id, j,
                     count(*) OVER (PARTITION BY doc_id, gram) AS c
              FROM g{n})
            WHERE c >= 2)""")
        ctes.append(f"""cov{n} AS (
            SELECT doc_id,
                   sum(greatest(0, p + {n}
                       - greatest(p, coalesce(last_end, -1)))) AS covered
            FROM (SELECT doc_id, p,
                         max(p + {n}) OVER (
                           PARTITION BY doc_id ORDER BY p
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS last_end
                  FROM dup{n})
            GROUP BY doc_id)""")
        joins.append(f"LEFT JOIN cov{n} USING (doc_id)")
        cols.append(
            f"CASE WHEN len(tk) >= {n} "
            f"THEN coalesce(cov{n}.covered, 0) * 1.0 / len(tk) "
            f"ELSE 0.0 END AS dup_{n}_gram_token_frac"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT doc_id, " + ", ".join(cols)
        + "\nFROM tkn " + " ".join(joins)
    )


def repetition_gate_oracle(src: str = "documents") -> str:
    """The COMPLETE Gopher repetition gate as an audit row per document:
    all 13 metrics (4 line/paragraph + 9 n-gram) plus the composed keep
    flag.  Bounds come from the same rule tables the Spark side reads
    (functions/text.REPETITION_RULES / NGRAM_REPETITION_RULES); NULL
    line/para metrics (empty docs) fail their rule, exactly like the
    Spark ``coalesce(flag, false)``."""
    rep_rules = " AND ".join(
        f"coalesce(rep.{name} <= {bound}, false)"
        for name, bound in TXT.REPETITION_RULES
    )
    ng_rules = " AND ".join(
        f"ng.{name} <= {bound}"
        for name, bound in TXT.NGRAM_REPETITION_RULES
    )
    rep_cols = ", ".join(f"rep.{name}" for name, _ in TXT.REPETITION_RULES)
    ng_cols = ", ".join(f"ng.{name}" for name, _ in TXT.NGRAM_REPETITION_RULES)
    return f"""
        WITH rep AS ({repetition_sql(src)}),
        ng AS ({ngram_repetition_oracle(src)})
        SELECT rep.doc_id, {rep_cols}, {ng_cols},
               ({rep_rules} AND {ng_rules}) AS keep
        FROM rep JOIN ng ON rep.doc_id = ng.doc_id
    """


def gopher_metrics_sql(src: str = "documents") -> str:
    """The seven Gopher quality measurements per document (functions/
    text.gopher_metrics) as a full SELECT — divisions yield NULL on 0
    tokens exactly like the Spark side's try_divide."""
    stoplist = "[" + ",".join(f"'{w}'" for w in TXT.GOPHER_STOPWORDS) + "]"
    return f"""
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t FROM {src}
    ),
    m AS (
      SELECT doc_id, {_toks('t')} AS toks,
             string_split(t, chr(10)) AS lines,
             t
      FROM d
    )
    SELECT doc_id,
           len(toks) AS n_words,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / len(toks) AS mean_word_len,
           CAST(len(regexp_extract_all(t, '#|\\.\\.\\.|…')) AS DOUBLE)
             / len(toks) AS symbol_ratio,
           CAST(len(list_filter(lines,
                 x -> regexp_matches(x, '^\\s*[-*•‣▪]'))) AS DOUBLE)
             / len(lines) AS bullet_line_frac,
           CAST(len(list_filter(lines,
                 x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE)
             / len(lines) AS ellipsis_line_frac,
           CAST(len(list_filter(toks,
                 x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
             / len(toks) AS alpha_word_frac,
           len(list_intersect(
                 list_distinct(list_transform(toks,
                   x -> regexp_replace(x, '[^a-z]', '', 'g'))),
                 {stoplist}))
             AS n_gopher_stopwords
    FROM m
    """


def training_pipeline_v2_oracle() -> str:
    """DuckDB replay of the composed round-5/6 training pipeline
    (plans/extension.training_corpus_pipeline_v2): Gopher quality
    subset -> the complete 13-rule repetition gate -> PII redaction ->
    CDC substring dedup -> brute-force jaccard >= 0.8 standing in for
    minhash-LSH (recall ~1 at 0.8, the dedup_minhash_lsh argument) ->
    recursive-CTE connected components -> min-id representative per
    cluster.  Every stage constant comes from the same tables the
    Spark side reads."""
    from excelstream_spark.functions.text import PII_REPLACEMENTS

    gop_rules = " AND ".join(
        (
            f"g.{name} >= {lo}" if hi is None
            else f"g.{name} <= {hi}" if lo is None
            else f"g.{name} BETWEEN {lo} AND {hi}"
        )
        for name, lo, hi in TXT.GOPHER_RULES
        if name != "n_gopher_stopwords"
    )
    redacted = "d.text"
    for _, pat, repl in PII_REPLACEMENTS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    # DuckDB requires RECURSIVE on the top-level WITH; the nested
    # builders contribute parenthesized sub-WITH bodies
    return f"""
        WITH RECURSIVE
        g AS ({gopher_metrics_sql()}),
        gate1 AS (SELECT doc_id FROM g g WHERE {gop_rules}),
        gate2 AS (SELECT doc_id FROM ({repetition_gate_oracle()})
                  WHERE keep),
        src AS MATERIALIZED (SELECT d.doc_id, d.lang, {redacted} AS text
                FROM documents d
                JOIN gate1 USING (doc_id) JOIN gate2 USING (doc_id)),
        cdc AS ({cdc_dedup_oracle(16, 2, 4, src='src')}),
        base AS MATERIALIZED (SELECT c.doc_id, s.lang, c.text
                 FROM cdc c JOIN src s USING (doc_id)),
        tk AS (SELECT doc_id, {_toks('text')} AS t FROM base),
        sets_ AS (SELECT doc_id,
                         list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
                  FROM tk),
        ex AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM sets_
               WHERE len(sh) > 0),
        pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      count(*) AS inter,
                      any_value(a.n) na, any_value(b.n) nb
               FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        sp AS (SELECT id_a, id_b FROM pr
               WHERE inter * 1.0 / (na + nb - inter) >= 0.8),
        nodes AS (SELECT id_a AS n FROM sp UNION SELECT id_b FROM sp),
        edges AS (SELECT id_a AS u, id_b AS v FROM sp
                  UNION SELECT id_b, id_a FROM sp),
        cc(node, lbl) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.node
          WHERE cc.lbl < e.v
        ),
        comp AS (SELECT node, min(lbl) AS component FROM cc GROUP BY node),
        removed AS (SELECT node FROM comp WHERE node != component)
        SELECT b.doc_id, b.lang,
               CAST(len({_toks('b.text')}) AS BIGINT) AS n_tokens,
               md5(trim(regexp_replace(lower(b.text), '\\s+', ' ', 'g')))
                 AS fp
        FROM base b
        WHERE b.doc_id NOT IN (SELECT node FROM removed)
    """


def decontamination_oracle(
    n: int = 13, bench_mod: int = 17, src: str = "documents"
) -> str:
    """DuckDB replay of operators/quality.contamination_flags with the
    catalog entry's deterministic benchmark split (``doc_id %
    bench_mod == 0`` plays the eval set): distinct per-doc n-gram
    hashes vs distinct benchmark gram hashes, inner-join count, flag.
    The 60-bit md5-derived gram hash matches the Spark side
    bit-for-bit."""
    gh = "('0x' || substr(md5(g), 1, 15))::bigint"
    return f"""
        WITH tkx AS (SELECT doc_id,
                            {_toks("lower(coalesce(text, ''))")} AS tk
                     FROM {src}),
        bg AS (SELECT DISTINCT {gh} AS gh
               FROM (SELECT array_to_string(tk[j : j + {n - 1}], ' ') AS g
                     FROM (SELECT tk, unnest(generate_series(
                               1, len(tk) - {n} + 1)) AS j
                           FROM tkx WHERE doc_id % {bench_mod} = 0))),
        cg AS (SELECT DISTINCT doc_id, {gh} AS gh
               FROM (SELECT doc_id,
                            array_to_string(tk[j : j + {n - 1}], ' ') AS g
                     FROM (SELECT doc_id, tk, unnest(generate_series(
                               1, len(tk) - {n} + 1)) AS j
                           FROM tkx WHERE doc_id % {bench_mod} <> 0))),
        hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nh
                 FROM cg JOIN bg USING (gh) GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(nh, 0) AS n_contaminated_grams,
               coalesce(nh, 0) > 0 AS contaminated
        FROM {src} d LEFT JOIN hits USING (doc_id)
        WHERE d.doc_id % {bench_mod} <> 0
    """


def _dsir_weight_ctes(
    n_buckets: int,
    seed: int,
    alpha: float,
    target_pred: str,
    src: str,
) -> str:
    """Shared CTE chain for the DSIR oracles: hashed unigram+bigram
    buckets (md5-derived — bit-identical to the Spark side), the
    Laplace-smoothed target/raw bucket models, and per-doc log
    importance weights in a final ``w(doc_id, log_w)`` CTE."""
    bkt = f"('0x' || substr(md5('{seed}:' || gram), 1, 8))::bigint % {n_buckets}"
    a_b = float(alpha) * n_buckets
    return f"""
        d AS (SELECT doc_id, coalesce(text, '') AS t,
                     ({target_pred}) AS is_tgt
              FROM {src} WHERE doc_id IS NOT NULL),
        tkn AS (SELECT doc_id, is_tgt, {_toks('t')} AS tk FROM d),
        grams AS (
            SELECT doc_id, is_tgt, unnest(tk) AS gram FROM tkn
            UNION ALL
            SELECT doc_id, is_tgt,
                   array_to_string(tk[j : j + 1], ' ') AS gram
            FROM (SELECT doc_id, is_tgt, tk,
                         unnest(generate_series(1, len(tk) - 1)) AS j
                  FROM tkn)),
        rb AS (SELECT doc_id, {bkt} AS b FROM grams),
        rc AS (SELECT b, count(*) AS cnt FROM rb GROUP BY b),
        tc AS (SELECT b, count(*) AS cnt
               FROM (SELECT {bkt} AS b FROM grams
                     WHERE coalesce(is_tgt, FALSE))
               GROUP BY b),
        tot AS (SELECT (SELECT coalesce(sum(cnt), 0) FROM tc) AS tt,
                       (SELECT coalesce(sum(cnt), 0) FROM rc) AS rt),
        lam AS (SELECT rc.b,
                       ln((coalesce(tc.cnt, 0) + {float(alpha)})
                          / (tt + {a_b}))
                       - ln((rc.cnt + {float(alpha)}) / (rt + {a_b}))
                         AS lam
                FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot),
        w AS (SELECT rb.doc_id, sum(lam.lam) AS log_w
              FROM rb JOIN lam USING (b) GROUP BY rb.doc_id)
    """


def dsir_select_oracle(
    k: int = 100,
    n_buckets: int = 10_000,
    seed: int = 0,
    alpha: float = 1.0,
    gumbel_seed: int = 1,
    target_pred: str = "lang = 'en'",
    src: str = "documents",
) -> str:
    """DuckDB replay of operators/selection.dsir_select: the shared
    weight CTEs plus the deterministic md5 Gumbel draw and Gumbel-top-k
    selection."""
    ctes = _dsir_weight_ctes(n_buckets, seed, alpha, target_pred, src)
    return f"""
        WITH {ctes},
        scored AS (SELECT d.doc_id,
                          coalesce(w.log_w, 0.0) AS log_w,
                          coalesce(w.log_w, 0.0) + (-ln(-ln(
                            (('0x' || substr(md5('gumbel:{gumbel_seed}:'
                                || d.doc_id), 1, 8))::bigint + 0.5)
                            / 4294967296.0))) AS score
                   FROM d LEFT JOIN w USING (doc_id))
        SELECT doc_id, round(log_w, 6) AS log_w_r,
               round(score, 6) AS score_r
        FROM scored ORDER BY score DESC LIMIT {k}
    """


def dsir_gate_oracle(
    n_buckets: int = 10_000,
    seed: int = 0,
    alpha: float = 1.0,
    target_pred: str = "lang = 'en'",
    copies: int = 2,
    src: str = "documents",
) -> str:
    """DuckDB replay of the STREAMING DSIR gate entry: per-doc log
    weight under the batch-fit model, with the replayed-delivery
    bookkeeping constants (every doc delivered ``copies`` times, every
    delivery scored identically because the gate is stateless)."""
    ctes = _dsir_weight_ctes(n_buckets, seed, alpha, target_pred, src)
    return f"""
        WITH {ctes}
        SELECT d.doc_id,
               CAST({copies} AS BIGINT) AS n_deliveries,
               CAST(1 AS BIGINT) AS n_distinct_scores,
               round(coalesce(w.log_w, 0.0), 6) AS log_w_r
        FROM d LEFT JOIN w USING (doc_id)
    """


#: The distillation label the classifier driver row trains against:
#: the Gopher minimum/maximum-length rule (the one quality rule the
#: synthetic fixture actually varies on — see the catalog entry doc).
CLASSIFIER_LABEL_SQL = (
    "len(list_filter(regexp_split_to_array(lower(coalesce(text, '')),"
    " '\\s+'), x -> x <> '')) BETWEEN 50 AND 100000"
)


def _classifier_scored_ctes(
    steps: int,
    n_buckets: int,
    seed: int,
    lr: float,
    target_pred: str,
    src: str,
) -> str:
    """The classifier oracles' shared WITH-chain: unrolled full-batch
    GD (one margin/error/gradient/weights/bias block per step) ending
    in a ``scored(doc_id, score_r)`` CTE.

    Replays bit-stably because both engines (a) hash features through
    md5, (b) do every cross-row sum as an exact DECIMAL(38,15) sum of
    identical IEEE per-row doubles, and (c) quantize the sigmoid and
    the weights to 9 decimals at each step boundary, so a last-ulp
    libm ``exp`` difference cannot compound (see the operator module
    docstring).  The multi-referenced CTEs are MATERIALIZED — without
    it DuckDB inlines the weight chain and the plan doubles per step
    (2^steps blowup, observed as a 10-minute hang at 12 steps)."""
    bkt = f"('0x' || substr(md5('{seed}:' || gram), 1, 8))::bigint % {n_buckets}"
    head = f"""
        d AS MATERIALIZED (SELECT doc_id, coalesce(text, '') AS t,
                     CAST(({target_pred}) AS DOUBLE) AS y
              FROM {src} WHERE doc_id IS NOT NULL),
        tkn AS (SELECT doc_id, {_toks('t')} AS tk FROM d),
        grams AS (
            SELECT doc_id, unnest(tk) AS gram FROM tkn
            UNION ALL
            SELECT doc_id, array_to_string(tk[j : j + 1], ' ') AS gram
            FROM (SELECT doc_id, tk,
                         unnest(generate_series(1, len(tk) - 1)) AS j
                  FROM tkn)),
        fc AS (SELECT doc_id, {bkt} AS b, count(*) AS cnt
               FROM grams GROUP BY doc_id, b),
        fx AS MATERIALIZED (SELECT doc_id, b,
                      1.0 / sqrt(count(*) OVER (PARTITION BY doc_id)) AS x
               FROM fc),
        nn AS (SELECT count(*) AS n FROM d),
        w0 AS MATERIALIZED (SELECT unnest(generate_series(0,
                      {n_buckets - 1})) AS b, 0.0 AS w),
        bs0 AS MATERIALIZED (SELECT 0.0 AS bias)
    """
    step_blocks = []
    for i in range(1, steps + 1):
        j = i - 1
        step_blocks.append(f"""
        mg{i} AS (SELECT f.doc_id,
                         CAST(sum(CAST(w.w * f.x AS DECIMAL(38,15)))
                              AS DOUBLE) AS s
                  FROM fx f JOIN w{j} w USING (b) GROUP BY f.doc_id),
        e{i} AS MATERIALIZED (SELECT d.doc_id,
                        round(1.0 / (1.0 + exp(-(bs.bias
                              + coalesce(mg.s, 0.0)))), 9) - d.y AS err
                 FROM d CROSS JOIN bs{j} bs
                 LEFT JOIN mg{i} mg USING (doc_id)),
        g{i} AS (SELECT f.b,
                        CAST(sum(CAST(e.err * f.x AS DECIMAL(38,15)))
                             AS DOUBLE) / (SELECT n FROM nn) AS g
                 FROM fx f JOIN e{i} e USING (doc_id) GROUP BY f.b),
        w{i} AS MATERIALIZED (SELECT w.b,
                        round(w.w - {lr} * coalesce(g.g, 0.0), 9) AS w
                 FROM w{j} w LEFT JOIN g{i} g USING (b)),
        bs{i} AS MATERIALIZED (SELECT round(bs.bias - {lr} *
                        (SELECT CAST(sum(CAST(err AS DECIMAL(38,15)))
                                     AS DOUBLE) / (SELECT n FROM nn)
                         FROM e{i}), 9) AS bias
                  FROM bs{j} bs)
    """)
    return f"""
        WITH {head},
        {','.join(step_blocks)},
        scored AS MATERIALIZED (SELECT d.doc_id,
                          round(round(1.0 / (1.0 + exp(-(bs.bias
                                + coalesce(mg.s, 0.0)))), 9), 6) AS score_r
                   FROM d CROSS JOIN bs{steps} bs
                   LEFT JOIN (SELECT f.doc_id,
                                     CAST(sum(CAST(w.w * f.x
                                          AS DECIMAL(38,15)))
                                          AS DOUBLE) AS s
                              FROM fx f JOIN w{steps} w USING (b)
                              GROUP BY f.doc_id) mg USING (doc_id))
    """


def quality_classifier_oracle(
    steps: int = 4,
    n_buckets: int = 1024,
    seed: int = 0,
    lr: float = 8.0,
    target_pred: str = CLASSIFIER_LABEL_SQL,
    keep_frac: float = 0.5,
    src: str = "documents",
) -> str:
    """DuckDB replay of operators/classifier: the unrolled fixed-step
    GD chain (:func:`_classifier_scored_ctes`) followed by the ranked
    keep-``keep_frac`` cut (keep every doc scoring at least the k-th
    largest score; ties all kept)."""
    trained = _classifier_scored_ctes(
        steps, n_buckets, seed, lr, target_pred, src
    )
    return f"""
        {trained},
        kk AS (SELECT CAST(floor(count(*) * {keep_frac}) AS BIGINT) AS k
               FROM scored),
        ranked AS (SELECT score_r,
                          row_number() OVER (ORDER BY score_r DESC) AS rn
                   FROM scored),
        thr AS (SELECT min(score_r) AS t FROM ranked
                WHERE rn <= (SELECT k FROM kk))
        SELECT doc_id, score_r,
               coalesce(score_r >= (SELECT t FROM thr), FALSE) AS keep
        FROM scored
    """


def classifier_gate_oracle(
    steps: int = 4,
    n_buckets: int = 1024,
    seed: int = 0,
    lr: float = 8.0,
    target_pred: str = CLASSIFIER_LABEL_SQL,
    src: str = "documents",
) -> str:
    """Streaming classifier gate replay: the same unrolled GD training
    chain as :func:`quality_classifier_oracle` (the batch-fit model),
    with the stream facts per document — ``n_deliveries`` 2 (the
    fixture replays the table twice), ``n_distinct_scores`` 1 (bit-
    identical rescoring across redeliveries), and the batch-parity
    ``score_r``.  The mapside scorer reproduces the batch margin's
    exact decimal sum (operators/classifier.classifier_score_mapside
    docstring), so one `scored` CTE serves both paths."""
    trained = _classifier_scored_ctes(
        steps, n_buckets, seed, lr, target_pred, src
    )
    return f"""
        {trained}
        SELECT doc_id,
               CAST(2 AS BIGINT) AS n_deliveries,
               CAST(1 AS BIGINT) AS n_distinct_scores,
               score_r
        FROM scored
    """


def lm_ppl_oracle(
    ref_pred: str = "doc_id % 2 = 0",
    src: str = "documents",
) -> str:
    """DuckDB replay of operators/lm: bigram stupid-backoff scoring
    (Brants et al. 2007 — bigram conditional if seen, else 0.4x the
    0.5-smoothed unigram; first token scored by the unigram model) and
    the CCNet head/middle/tail perplexity terciles.

    Bit-stable by the classifier convention: integer count models, one
    or two IEEE divisions per token written with the same association
    as the Spark side, per-token -log10 rounded to 9 immediately,
    exact DECIMAL(38,15) per-doc sums, tercile thresholds taken as
    ranked VALUES of the 6-rounded nll."""
    return f"""
        WITH d AS MATERIALIZED (SELECT doc_id, coalesce(text, '') AS t
              FROM {src} WHERE doc_id IS NOT NULL),
        tkn AS MATERIALIZED (SELECT doc_id, {_toks('t')} AS tk FROM d),
        ref AS (SELECT tk FROM tkn WHERE {ref_pred}),
        uni AS MATERIALIZED (SELECT tok, count(*) AS cnt
               FROM (SELECT unnest(tk) AS tok FROM ref) GROUP BY tok),
        tot AS (SELECT CAST(coalesce(sum(cnt), 0) AS DOUBLE) AS n FROM uni),
        bi AS (SELECT bg, count(*) AS cnt2
               FROM (SELECT array_to_string(tk[j : j + 1], ' ') AS bg
                     FROM (SELECT tk,
                                  unnest(generate_series(1, len(tk) - 1)) AS j
                           FROM ref))
               GROUP BY bg),
        bip AS MATERIALIZED (SELECT bg,
                        CAST(cnt2 AS DOUBLE) / CAST(u.cnt AS DOUBLE) AS p
                 FROM bi JOIN uni u ON split_part(bg, ' ', 1) = u.tok),
        firsts AS (SELECT doc_id, tk[1] AS cur FROM tkn WHERE len(tk) >= 1),
        pairs AS (SELECT doc_id, array_to_string(tk[j : j + 1], ' ') AS bg,
                         tk[j + 1] AS cur
                  FROM (SELECT doc_id, tk,
                               unnest(generate_series(1, len(tk) - 1)) AS j
                        FROM tkn)),
        tok_scores AS (
            SELECT doc_id,
                   round(-log10(coalesce(CAST(u.cnt AS DOUBLE), 0.5)
                                / (SELECT n FROM tot)), 9) AS t
            FROM firsts f LEFT JOIN uni u ON f.cur = u.tok
            UNION ALL
            SELECT doc_id,
                   round(-log10(coalesce(bp.p,
                         0.4 * (coalesce(CAST(u.cnt AS DOUBLE), 0.5)
                                / (SELECT n FROM tot)))), 9) AS t
            FROM pairs p LEFT JOIN bip bp USING (bg)
            LEFT JOIN uni u ON p.cur = u.tok),
        sc AS MATERIALIZED (SELECT doc_id, count(*) AS n_toks,
                       round(CAST(sum(CAST(t AS DECIMAL(38,15))) AS DOUBLE)
                             / count(*), 6) AS nll_r
                FROM tok_scores GROUP BY doc_id),
        nn AS (SELECT count(*) AS c FROM sc),
        rk AS (SELECT nll_r, row_number() OVER (ORDER BY nll_r ASC) AS rn
               FROM sc),
        th1 AS (SELECT max(nll_r) AS v FROM rk
                WHERE rn <= (SELECT c // 3 FROM nn)),
        th2 AS (SELECT max(nll_r) AS v FROM rk
                WHERE rn <= (SELECT 2 * c // 3 FROM nn))
        SELECT d.doc_id,
               coalesce(sc.n_toks, 0) AS n_toks,
               sc.nll_r,
               CASE WHEN sc.nll_r IS NULL THEN 'tail'
                    WHEN sc.nll_r <= (SELECT v FROM th1) THEN 'head'
                    WHEN sc.nll_r <= (SELECT v FROM th2) THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM d LEFT JOIN sc USING (doc_id)
    """


def bm25_oracle(
    queries: dict[str, str],
    k: int = 10,
    src: str = "documents",
) -> str:
    """DuckDB replay of operators/retrieval.bm25_topk: Lucene-form BM25
    (k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5)), query terms a
    SET) with the classifier convention's bit-stability — exact integer
    tf/df/dl/N, one exact division for avgdl, round-9 at every libm
    site, exact DECIMAL(38,15) per-(query, doc) sums rounded to 6, and
    the (score_r DESC, doc_id ASC) tie-break on the rounded score."""
    from excelstream_spark.functions.text import tokens_py

    vals = ", ".join(
        f"('{qid}', '{tok}')"
        for qid, qtext in sorted(queries.items())
        for tok in sorted(set(tokens_py(qtext)))
    )
    return f"""
        WITH d AS (SELECT doc_id, coalesce(text, '') AS t
              FROM {src} WHERE doc_id IS NOT NULL),
        tkn AS MATERIALIZED (SELECT doc_id, {_toks('t')} AS tk FROM d),
        stats AS (SELECT count(*) AS n_docs,
                         CAST(coalesce(sum(len(tk)), 0) AS DOUBLE)
                         / count(*) AS ad
                  FROM tkn),
        qt AS (SELECT * FROM (VALUES {vals}) AS v(query_id, tok)),
        ex AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS tok FROM tkn),
        hits AS MATERIALIZED (
            SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
            FROM ex WHERE tok IN (SELECT DISTINCT tok FROM qt)
            GROUP BY doc_id, tok),
        idf AS (SELECT tok,
                       round(ln(1.0 + (CAST(n_docs AS DOUBLE)
                                       - CAST(df AS DOUBLE) + 0.5)
                                      / (CAST(df AS DOUBLE) + 0.5)), 9)
                           AS idf,
                       ad
                FROM (SELECT tok, count(*) AS df FROM hits GROUP BY tok)
                CROSS JOIN stats),
        contrib AS (
            SELECT q.query_id, h.doc_id,
                   round(i.idf * (CAST(h.tf AS DOUBLE)
                         / (CAST(h.tf AS DOUBLE)
                            + 1.2 * (0.25 + 0.75 * (CAST(h.dl AS DOUBLE)
                                                    / i.ad)))), 9) AS c
            FROM hits h JOIN idf i USING (tok) JOIN qt q USING (tok)),
        scored AS (
            SELECT query_id, doc_id,
                   round(CAST(sum(CAST(c AS DECIMAL(38,15))) AS DOUBLE), 6)
                       AS score_r
            FROM contrib GROUP BY query_id, doc_id)
        SELECT query_id, doc_id, score_r, rank FROM (
            SELECT query_id, doc_id, score_r,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score_r DESC, doc_id ASC)
                       AS rank
            FROM scored)
        WHERE rank <= {int(k)}
    """


# ---------------------------------------------------------------------------
# Bloom-filter incremental gate (operators/bloom.py)

#: The incremental fixture split shared by the catalog entry and
#: tests/test_bloom.py: even doc_ids are the standing corpus, odd ones
#: plus re-deliveries of early corpus texts are the increment.
BLOOM_CORPUS_SQL = "SELECT * FROM documents WHERE doc_id % 2 = 0"
BLOOM_NEW_SQL = (
    "SELECT * FROM documents WHERE doc_id % 2 = 1 UNION ALL "
    "SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars "
    "FROM documents WHERE doc_id % 2 = 0 AND doc_id < 20"
)

_FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


def bloom_flag_ctes(n_bits: int, n_hashes: int) -> str:
    """DuckDB CTEs replaying operators/bloom.py bit-for-bit — the
    filter build (salted-md5 positions, 32-bit words bit_or'd into
    int64) and the probe: ``flags(doc_id, fp, maybe_dup)`` over the
    increment.  Every step is md5 + integer arithmetic, so the replay
    is exact (parity pinned in tests/test_bloom.py)."""
    return f"""
    corpus AS ({BLOOM_CORPUS_SQL}),
    newdocs AS ({BLOOM_NEW_SQL}),
    cfp AS (SELECT DISTINCT {_FP_SQL} AS fp FROM corpus
            WHERE text IS NOT NULL),
    cpos AS (
        SELECT ('0x' || substr(md5(concat(i, ':', fp)), 1, 15))::BIGINT
               % {int(n_bits)} AS p
        FROM cfp, range({int(n_hashes)}) t(i)
    ),
    words AS (
        SELECT p >> 5 AS word, bit_or(1::BIGINT << (p % 32)) AS bits
        FROM cpos GROUP BY 1
    ),
    ifp AS (SELECT doc_id, {_FP_SQL} AS fp FROM newdocs),
    ipos AS (
        SELECT doc_id, fp,
               ('0x' || substr(md5(concat(i, ':', fp)), 1, 15))::BIGINT
               % {int(n_bits)} AS p
        FROM ifp, range({int(n_hashes)}) t(i)
        WHERE fp IS NOT NULL
    ),
    probe AS (
        SELECT doc_id,
               bool_and(w.bits IS NOT NULL
                        AND (w.bits & (1::BIGINT << (p % 32))) != 0)
                   AS maybe
        FROM ipos LEFT JOIN words w ON (p >> 5) = w.word
        GROUP BY doc_id
    ),
    flags AS (
        SELECT i.doc_id, i.fp, coalesce(pr.maybe, FALSE) AS maybe_dup
        FROM ifp i LEFT JOIN probe pr USING (doc_id)
    )
    """


def bloom_gate_oracle(n_bits: int, n_hashes: int) -> str:
    """(doc_id, maybe_dup, kept) per increment document: the Bloom
    flag plus the VERIFIED keep decision (maybe-set probed against the
    true fingerprint set — exactly dedup_increment_exact's semantics,
    NULL fingerprints always kept)."""
    return f"""
        WITH {bloom_flag_ctes(n_bits, n_hashes)}
        SELECT f.doc_id, f.maybe_dup,
               (NOT f.maybe_dup)
               OR NOT EXISTS (SELECT 1 FROM cfp c WHERE c.fp = f.fp)
                   AS kept
        FROM flags f
    """


#: Deterministic line-structure augmentation for the C4 driver row: the
#: fixture documents are single-line unpunctuated token soup, on which
#: every C4 rule fires identically (all pages fail, zero
#: discrimination).  These lines graft a newline/punctuation structure
#: that exercises EVERY rule — kept long line, short line, unpunctuated
#: line, javascript line (doc_id%7), sentence-floor failures (%5),
#: lorem ipsum (%11), curly brace (%13) — with the SAME expression on
#: both engines (the corpus_governance aug precedent).
C4_AUG_LINES_SQL = """concat_ws(chr(10),
    coalesce(text, '') || '.',
    'short line.',
    'this line has no terminal punctuation at all',
    CASE WHEN doc_id % 7 = 0
         THEN 'Please enable javascript to view this page.'
         ELSE 'Another good sentence with enough words here.' END,
    CASE WHEN doc_id % 5 = 0
         THEN 'unterminated filler line number five for this document'
         WHEN doc_id % 11 = 0
         THEN 'Lorem ipsum dolor sit amet consectetur adipiscing elit.'
         ELSE 'A perfectly fine closing sentence appears right here.' END,
    CASE WHEN doc_id % 5 = 0
         THEN 'unterminated filler line number six for this document'
         WHEN doc_id % 13 = 0
         THEN 'var x = { key: 1 };'
         ELSE 'More text follows in this final line today.' END)"""


def c4_oracle(src: str = "documents", aug: bool = False) -> str:
    """DuckDB replay of operators/quality.c4_quality_flags (Raffel et
    al. 2020 §2.2): per-line terminal-punctuation + min-words +
    policy-phrase filter, newline-rejoined retained text, terminal-mark
    sentence proxy, lorem-ipsum / curly-brace page triggers, composed
    page decision.  Constants single-sourced from functions/text.py.
    ``aug=True`` applies :data:`C4_AUG_LINES_SQL` first (the driver
    row's fixture augmentation)."""
    # outer lambda parameter is `ln`: _toks() nests its own `x ->`
    # lambda, and shadowing the outer variable NULLs the whole filter.
    # "javascript" is token-level (r7 advice #4 — the paper's "any line
    # with the WORD Javascript"), the multi-word phrases stay substring.
    phrase_clauses = " AND ".join(
        [f"NOT contains(lower(ln), '{p}')" for p in TXT.C4_POLICY_PHRASES]
        + [f"NOT list_contains({_toks('ln')}, 'javascript')"]
    )
    # Java-regex \s == RE2 \s; DuckDB string literals are not
    # escape-processed, so the patterns embed verbatim
    end_re = TXT.C4_END_MARK_PATTERN
    sent_re = TXT.C4_SENTENCE_MARK_PATTERN
    t_expr = C4_AUG_LINES_SQL if aug else "coalesce(text, '')"
    return f"""
        WITH d AS (SELECT doc_id, {t_expr} AS t FROM {src}),
        split AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines
                  FROM d),
        kept AS (SELECT doc_id, t, lines,
                        list_filter(lines, ln ->
                            regexp_matches(ln, '{end_re}')
                            AND len({_toks('ln')})
                                >= {TXT.C4_MIN_WORDS_PER_LINE}
                            AND {phrase_clauses}) AS kl
                 FROM split),
        m AS (SELECT doc_id,
                     len(lines)::BIGINT AS n_lines,
                     len(kl)::BIGINT AS n_kept_lines,
                     -- DuckDB array_to_string([]) is NULL; Spark
                     -- array_join([]) is '' — coalesce to Spark's
                     coalesce(array_to_string(kl, chr(10)), '')
                         AS c4_text,
                     len(regexp_extract_all(
                         coalesce(array_to_string(kl, chr(10)), ''),
                         '{sent_re}'
                     ))::BIGINT AS n_sentences,
                     contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
                     contains(t, '{{') AS has_curly_brace
              FROM kept)
        SELECT doc_id, n_lines, n_kept_lines, c4_text, n_sentences,
               has_lorem_ipsum, has_curly_brace,
               (n_sentences >= {TXT.C4_MIN_SENTENCES}
                AND NOT has_lorem_ipsum
                AND NOT has_curly_brace) AS c4_pass
        FROM m
    """


def kmeans_oracle(
    k: int = 8, n_iter: int = 2, src: str = "embeddings"
) -> str:
    """DuckDB replay of operators/clustering.kmeans_assign_exact:
    md5-seeded init, ``n_iter`` unrolled Lloyd iterations (exact
    DECIMAL(38,15) distances, argmin on the decimal total with cid
    tie-break, round-9 decimal-mean updates), final assignment against
    the last centroids.  ``dims`` is MATERIALIZED — it feeds every
    iteration and DuckDB re-inlines multi-referenced CTEs."""
    ctes = [
        f"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM {src} WHERE vec_id IS NOT NULL),
        dims AS MATERIALIZED (
            SELECT vec_id AS id, i - 1 AS dim, v[i] AS x
            FROM (SELECT vec_id, v,
                         unnest(generate_series(1, len(v))) AS i
                  FROM emb)),
        seeds AS (SELECT id, row_number() OVER (ORDER BY h, id) - 1 AS cid
                  FROM (SELECT vec_id AS id,
                               md5(cast(vec_id AS VARCHAR)) AS h
                        FROM emb ORDER BY h, id LIMIT {k})),
        c0 AS (SELECT s.cid, d.dim, d.x AS c
               FROM seeds s JOIN dims d USING (id))"""
    ]
    for i in range(1, n_iter + 2):
        is_final = i == n_iter + 1
        ctes.append(f"""
        d{i} AS (SELECT d.id, c.cid,
                        sum(CAST((d.x - c.c) * (d.x - c.c)
                            AS DECIMAL(38,15))) AS dist
                 FROM dims d JOIN c{i - 1} c USING (dim)
                 GROUP BY d.id, c.cid),
        a{i} AS (SELECT id, cid, dist FROM (
                    SELECT id, cid, dist,
                           row_number() OVER (PARTITION BY id
                               ORDER BY dist, cid) AS rn
                    FROM d{i}) WHERE rn = 1)""")
        if not is_final:
            ctes.append(f"""
        c{i} AS (SELECT a.cid, d.dim,
                        round(CAST(sum(CAST(d.x AS DECIMAL(38,15)))
                                   AS DOUBLE) / count(*), 9) AS c
                 FROM dims d JOIN a{i} a USING (id)
                 GROUP BY a.cid, d.dim)""")
    final = n_iter + 1
    return f"""
        WITH {','.join(ctes)}
        SELECT id AS vec_id, cid,
               round(CAST(dist AS DOUBLE), 6) AS dist_r
        FROM a{final}
    """


def shard_manifest_oracle(
    n_shards: int = 16, seed: int = 0, src: str = "documents"
) -> str:
    """DuckDB replay of operators/curation.shard_manifest: md5 shard
    assignment, token counts under the shared convention, bit_xor of
    per-doc 60-bit text hashes."""
    return f"""
        WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM {src}
                   WHERE doc_id IS NOT NULL)
        SELECT ('0x' || substr(md5('{seed}:' || cast(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % {n_shards} AS shard,
               count(*)::BIGINT AS n_docs,
               sum(len({_toks('t')}))::BIGINT AS n_tokens,
               bit_xor(('0x' || substr(md5(t), 1, 15))::BIGINT)
                   AS content_hash
        FROM d GROUP BY shard
    """


def kmv_tokens_oracle(
    k: int = 256, group_col: str = "lang", src: str = "documents"
) -> str:
    """DuckDB replay of operators/sketches.kmv_distinct_tokens_by_group:
    60-bit md5 token hashes, per-group rank cut at k, the KMV
    estimator with the exact-below-k short-circuit."""
    space = float(1 << 60)
    return f"""
        WITH d AS (SELECT {group_col} AS grp, coalesce(text, '') AS t
                   FROM {src}),
        tok AS (SELECT grp, unnest({_toks('t')}) AS tok FROM d),
        h AS (SELECT DISTINCT grp,
                     ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
              FROM tok),
        r AS (SELECT grp, h,
                     row_number() OVER (PARTITION BY grp ORDER BY h)
                         AS rank
              FROM h),
        cut AS (SELECT grp, h, rank FROM r WHERE rank <= {k}),
        agg AS (SELECT grp, count(*) AS n_seen,
                       max(CASE WHEN rank = {k} THEN h END) AS hk
                FROM cut GROUP BY grp)
        SELECT grp AS {group_col}, n_seen::BIGINT AS n_seen,
               CASE WHEN n_seen < {k} THEN n_seen::DOUBLE
                    ELSE floor({(k - 1)} * {space} / hk::DOUBLE)::DOUBLE
               END AS est_distinct_tokens
        FROM agg
    """


def c4_gate_oracle(copies: int = 2, src: str = "documents") -> str:
    """DuckDB replay of the STREAMING C4 gate entry: per-doc line-filter
    facts under the same aug expression the batch row uses, with the
    replayed-delivery bookkeeping constants (every doc delivered
    ``copies`` times; every delivery decides identically because the
    gate is stateless scan work)."""
    return f"""
        SELECT doc_id,
               CAST({copies} AS BIGINT) AS n_deliveries,
               CAST(1 AS BIGINT) AS n_distinct_decisions,
               n_kept_lines, c4_pass
        FROM ({c4_oracle(src=src, aug=True)})
    """


def epoch_order_oracle(
    epoch: int = 0,
    n_shards: int = 16,
    seed: int = 0,
    src: str = "documents",
) -> str:
    """DuckDB replay of operators/curation.epoch_order (projected to
    doc_id/shard/position for the catalog row)."""
    return f"""
        WITH d AS (SELECT doc_id FROM {src} WHERE doc_id IS NOT NULL),
        drawn AS (SELECT doc_id,
                         ('0x' || substr(md5('{seed}:' ||
                             cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                             % {n_shards} AS shard,
                         ('0x' || substr(md5('epoch:{seed}:{epoch}:' ||
                             cast(doc_id AS VARCHAR)), 1, 15))::BIGINT
                             AS draw
                  FROM d)
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY draw, doc_id)::BIGINT
                   AS position
        FROM drawn
    """


#: Deterministic combining-sequence augmentation for the NFC driver
#: row: the fixture text is pure ASCII (NFC is the identity on it), so
#: the entry appends a decomposed suffix that NFC actually composes —
#: ' cafe' + COMBINING ACUTE (U+0301) + doc-id-dependent tail.  Same
#: expression on both engines.
NFC_AUG_SQL = (
    # the combining acute is a LITERAL inside the SQL string: Spark's
    # chr() is mod-256 byte semantics (chr(769) = \x01) while DuckDB's
    # is the Unicode codepoint — a literal parses identically on both
    "coalesce(text, '') || ' cafe\u0301 n' || "
    "cast(doc_id % 7 AS STRING)"
)


def nfc_oracle(src: str = "documents") -> str:
    """DuckDB replay of the NFC normalization entry: utf8proc
    nfc_normalize over the same augmented text, with before/after
    character lengths (the composed sequence is 1 char shorter)."""
    return f"""
        WITH d AS (SELECT doc_id, {NFC_AUG_SQL} AS t FROM {src}
                   WHERE doc_id IS NOT NULL)
        SELECT doc_id,
               length(t)::BIGINT AS len_before,
               length(nfc_normalize(t))::BIGINT AS len_after,
               nfc_normalize(t) AS text_nfc
        FROM d
    """


#: Aug for the composed cleaning chain: the C4 line structure plus a
#: seventh KEPT line carrying an email (PII stage) and a DECOMPOSED
#: e+U+0301 (NFC stage) — so every stage in the chain provably changes
#: the bytes it is responsible for.  The combining acute is a literal
#: (Spark chr() is mod-256; see NFC_AUG_SQL).
CLEANING_V3_AUG_SQL = (
    f"concat_ws(chr(10), {C4_AUG_LINES_SQL}, "
    "'Contact ops@example.com for café pricing today.')"
)


def cleaning_pipeline_oracle(src: str = "documents") -> str:
    """DuckDB replay of the composed NFC -> C4 -> PII cleaning chain:
    nfc_normalize over the aug text feeds the C4 line/page rules as the
    source relation; surviving pages are PII-redacted (the
    PII_REPLACEMENTS chain order) and fingerprinted — the final md5
    hash-gates every stage's rewrite."""
    nfc_src = (
        f"(SELECT doc_id, nfc_normalize({CLEANING_V3_AUG_SQL}) AS text "
        f"FROM {src} WHERE doc_id IS NOT NULL) base"
    )
    redacted = "c4_text"
    for _, pat, repl in TXT.PII_REPLACEMENTS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    return f"""
        SELECT doc_id, n_kept_lines,
               CAST(len(regexp_extract_all(
                   c4_text, '{TXT.PII_EMAIL_PATTERN}')) AS BIGINT)
                   AS n_emails,
               md5(trim(regexp_replace(lower({redacted}),
                                       '\\s+', ' ', 'g'))) AS fp
        FROM ({c4_oracle(src=nfc_src)}) c
        WHERE c4_pass
    """


def bpe_train_oracle(
    num_merges: int = 12,
    min_pair_count: int = 2,
    src: str = "documents",
) -> str:
    """DuckDB replay of operators/tokenizer.bpe_train — the iterative
    merge loop unrolled as one CTE chain per merge round (the
    quality_classifier unrolled-GD precedent; r7 verdict #1: this was
    the lone rows-only catalog entry).

    Per round ``i`` (state ``w{i-1}``: one row per distinct word with
    its count and current symbol array):

    - ``b{i}``: adjacent-pair counts (explode positions, groupBy pair,
      sum word counts) -> arg-max with the engine-shared tie-break
      (count DESC, left ASC, right ASC — binary UTF-8 = code-point
      order on both engines).
    - greedy left-to-right non-overlapping application WITHOUT a fold:
      matches at consecutive positions overlap (they share the middle
      symbol) and that is the ONLY way matches overlap, so within each
      maximal run of consecutive match positions the greedy scan
      applies exactly the even offsets — gaps-and-islands (``grp`` =
      pos − rank among matches) + offset parity, then drop the
      position after each applied match and rebuild the array.
    - the early-stop (``min_pair_count``) replays as a cumulative cut:
      the first round whose best pair is missing or under the floor
      truncates every later round's row (Spark breaks out of the loop
      there, so later merges don't exist).

    ``b{i}``/``w{i}`` are multi-referenced -> MATERIALIZED (without it
    DuckDB re-inlines the chain and the plan doubles per round — the
    GD-chain lesson).  Char init: ``regexp_split_to_array(word, '')``
    splits per code point, = Spark's UTF-16 split positions for BMP
    text (the tokenizer module documents the astral caveat; the
    fixtures are ASCII).  Runs in ~0.4s on the sf0.01 vocabulary."""
    ctes = [f"""d AS (SELECT coalesce(text, '') AS t FROM {src}),
        wc AS (SELECT word AS wid, count(*) AS cnt
               FROM (SELECT unnest({_toks('t')}) AS word FROM d)
               GROUP BY 1),
        w0 AS MATERIALIZED (SELECT wid, cnt,
                regexp_split_to_array(wid, '') AS syms FROM wc)"""]
    for i in range(1, num_merges + 1):
        j = i - 1
        ctes.append(f"""
        b{i} AS MATERIALIZED (
            SELECT l, r, n FROM (
                SELECT w.syms[u.k] AS l, w.syms[u.k + 1] AS r,
                       sum(w.cnt) AS n
                FROM w{j} w,
                     unnest(generate_series(1, len(w.syms) - 1)) AS u(k)
                GROUP BY 1, 2)
            ORDER BY n DESC, l, r LIMIT 1),
        x{i} AS (SELECT w.wid, w.cnt, u.k AS pos, w.syms[u.k] AS s
                 FROM w{j} w,
                      unnest(generate_series(1, len(w.syms))) AS u(k)),
        m{i} AS (SELECT x.wid, x.cnt, x.pos, x.s, b.l || b.r AS ms,
                        coalesce(x.s = b.l AND lead(x.s) OVER
                            (PARTITION BY x.wid ORDER BY x.pos) = b.r,
                            FALSE) AS mt
                 FROM x{i} x CROSS JOIN b{i} b),
        g{i} AS (SELECT *, CASE WHEN mt THEN pos - row_number() OVER
                        (PARTITION BY wid, mt ORDER BY pos) END AS grp
                 FROM m{i}),
        a{i} AS (SELECT *, mt AND ((pos - min(pos) OVER
                        (PARTITION BY wid, grp)) % 2 = 0) AS app
                 FROM g{i}),
        w{i} AS MATERIALIZED (
            SELECT wid, any_value(cnt) AS cnt,
                   list(CASE WHEN app THEN ms ELSE s END ORDER BY pos)
                       AS syms
            FROM (SELECT *, coalesce(lag(app) OVER
                          (PARTITION BY wid ORDER BY pos), FALSE) AS cons
                  FROM a{i})
            WHERE NOT cons GROUP BY wid)""")
    allb = " UNION ALL ".join(
        f"SELECT {i - 1} AS rnk, l, r, n FROM b{i}"
        for i in range(1, num_merges + 1)
    )
    return f"""
        WITH {','.join(ctes)},
        allb AS ({allb}),
        gs AS (SELECT unnest(generate_series(0, {num_merges - 1})) AS rnk),
        bad AS (SELECT min(g.rnk) AS c FROM gs g
                LEFT JOIN allb a USING (rnk)
                WHERE a.rnk IS NULL OR a.n < {min_pair_count})
        SELECT CAST(a.rnk AS INTEGER) AS rank, a.l AS "left",
               a.r AS "right", CAST(a.n AS BIGINT) AS pair_count
        FROM allb a
        WHERE a.rnk < coalesce((SELECT c FROM bad), {num_merges})
    """


#: Signed-int64 wrap of a HUGEINT bit accumulation (the engines pack
#: 64 fingerprint bits; bit 63 overflows BIGINT unless wrapped).
_WRAP64 = (
    "CAST({x} - CASE WHEN {x} >= 9223372036854775808::HUGEINT "
    "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"
)


def png_fp_ctes(src: str = "documents") -> str:
    """CTE block ending in ``pngh(doc_id, modality, fp_a, fp_b)`` — the
    PNG aHash/dHash replay arithmetic (floor-NN resample + integer
    threshold/gradient + HUGEINT bit pack + signed wrap) shared by
    :func:`multimodal_fingerprints_oracle` and
    :func:`training_pipeline_v5_oracle` (single-sourced per the r9
    verdict's oracle-hygiene rule)."""
    a = _WRAP64.format(x="a.ub")
    dh = _WRAP64.format(x="d9.ub")
    return f"""png AS (SELECT doc_id, CAST(2 + 2 * (doc_id % 2) AS INT) AS w,
                            2 AS h
                     FROM {src}
                     WHERE doc_id IS NOT NULL AND doc_id % 4 = 0),
        cells AS (
          SELECT doc_id, w, h, t1.ty, t2.tx,
                 (doc_id * 31
                  + (((t1.ty * h) // 8) * w + ((t2.tx * w) // 8)) * 7
                 ) % 256 AS g
          FROM png,
               unnest(generate_series(0, 7)) AS t1(ty),
               unnest(generate_series(0, 7)) AS t2(tx)),
        tot AS (SELECT doc_id, sum(g) AS total FROM cells GROUP BY doc_id),
        abits AS (
          SELECT c.doc_id,
                 coalesce(sum(CASE WHEN c.g * 64 > t.total
                              THEN (1::HUGEINT << (c.ty * 8 + c.tx))
                              END), 0::HUGEINT) AS ub
          FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id),
        cells9 AS (
          SELECT doc_id, t1.ty, t2.tx,
                 (doc_id * 31
                  + (((t1.ty * h) // 8) * w + ((t2.tx * w) // 9)) * 7
                 ) % 256 AS g
          FROM png,
               unnest(generate_series(0, 7)) AS t1(ty),
               unnest(generate_series(0, 8)) AS t2(tx)),
        dbits AS (
          SELECT l.doc_id,
                 coalesce(sum(CASE WHEN r.g > l.g
                              THEN (1::HUGEINT << (l.ty * 8 + l.tx))
                              END), 0::HUGEINT) AS ub
          FROM cells9 l JOIN cells9 r
            ON l.doc_id = r.doc_id AND l.ty = r.ty AND r.tx = l.tx + 1
          WHERE l.tx < 8
          GROUP BY l.doc_id),
        pngh AS (SELECT p.doc_id, 'image/png' AS modality,
                        {a} AS fp_a, {dh} AS fp_b
                 FROM png p JOIN abits a USING (doc_id)
                 JOIN dbits d9 USING (doc_id))"""


def multimodal_fingerprints_oracle(src: str = "documents") -> str:
    """DuckDB replay of operators/image_hash.multimodal_fingerprints
    over the synthesized payload fixture (multimodal.
    synthesize_payloads): payload content is pure doc_id arithmetic,
    so every fingerprint recomputes as integer SQL.

    - PNG rows (doc_id%4=0, w x 2, pixel i = (d*31 + i*7) % 256):
      aHash = floor-NN 8x8 resample + ``cell*64 > total`` threshold;
      dHash = floor-NN 9x8 resample + ``cell[ty][tx+1] > cell[ty][tx]``.
    - Baseline-JPEG rows (doc_id%4=2) decode to a SOLID gray image
      (DC-only, exact round-trip): constant pixels threshold every
      aHash/dHash bit false -> both fingerprints 0 by construction.
    - WAV rows (doc_id%4=1, n = 4 + d%5 alternating-sign samples of
      amplitude (d%32)*1024): the sign-of-delta fingerprint over the
      floor-NN 65-point resample, ``sample[j+1] > sample[j]``.

    The HUGEINT bit sums wrap to the signed int64 the engines pack."""
    wv = _WRAP64.format(x="wb.ub")
    return f"""
        WITH {png_fp_ctes(src)},
        jpgh AS (SELECT doc_id, 'image/jpeg' AS modality,
                        CAST(0 AS BIGINT) AS fp_a, CAST(0 AS BIGINT) AS fp_b
                 FROM {src}
                 WHERE doc_id IS NOT NULL AND doc_id % 4 = 2),
        wavp AS (SELECT doc_id, 4 + doc_id % 5 AS n,
                        (doc_id % 32) * 1024 AS amp
                 FROM {src}
                 WHERE doc_id IS NOT NULL AND doc_id % 4 = 1),
        wsmp AS (SELECT doc_id, t.k,
                        amp * (1 - 2 * (((t.k * n) // 65) % 2)) AS v
                 FROM wavp, unnest(generate_series(0, 64)) AS t(k)),
        wbits AS (
          SELECT l.doc_id,
                 coalesce(sum(CASE WHEN r.v > l.v
                              THEN (1::HUGEINT << l.k) END),
                          0::HUGEINT) AS ub
          FROM wsmp l JOIN wsmp r
            ON l.doc_id = r.doc_id AND r.k = l.k + 1
          WHERE l.k < 64
          GROUP BY l.doc_id),
        wavh AS (SELECT w.doc_id, 'audio/wav' AS modality,
                        {wv} AS fp_a, CAST(NULL AS BIGINT) AS fp_b
                 FROM wavp w JOIN wbits wb USING (doc_id))
        SELECT doc_id, modality, fp_a, fp_b FROM pngh
        UNION ALL SELECT doc_id, modality, fp_a, fp_b FROM jpgh
        UNION ALL SELECT doc_id, modality, fp_a, fp_b FROM wavh
    """


#: v4 label threshold: the cleaned-text token-count median is ~79 on
#: every fixture sf (measured 79-81), so BETWEEN 80 AND 100000 splits
#: the corpus near 50/50 — the classifier stage has real signal.
V4_LABEL_SQL = (
    "len(list_filter(regexp_split_to_array(lower(coalesce(text, '')),"
    " '\\s+'), x -> x <> '')) BETWEEN 80 AND 100000"
)

#: doc_id offset for the v4 exact-duplicate twins (far above any
#: fixture id; the twin keeps the ORIGINAL's augmented text verbatim,
#: so the aug's doc_id arithmetic is not re-derived for the new id).
V4_TWIN_OFFSET = 1_000_000


def training_pipeline_v4_oracle(
    steps: int = 4,
    n_buckets: int = 1024,
    seed: int = 0,
    lr: float = 8.0,
    keep_frac: float = 0.5,
    n_shards: int = 8,
    src: str = "documents",
) -> str:
    """DuckDB replay of the FULL composed pretraining data build
    (plans/extension.training_corpus_pipeline_v4): aug + exact-twin
    injection -> NFC -> C4 line/page rules -> PII redaction -> 4-step
    logistic-GD quality classifier (train on the cleaned text, ranked
    keep-half cut) -> exact dedup (min-id per normalized-text md5 —
    provably drops every injected twin) -> sharded-export manifest
    whose order-independent content hash gates every upstream stage's
    rewrite.  Each stage reuses its unit oracle's construction:
    :func:`c4_oracle` nests as the cleaned source,
    :func:`_classifier_scored_ctes` supplies the unrolled GD chain,
    and the manifest aggregation is :func:`shard_manifest_oracle`'s
    body inlined (inlined to avoid shadowing the classifier chain's
    ``d`` CTE)."""
    redacted = "c4_text"
    for _, pat, repl in TXT.PII_REPLACEMENTS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    inp = f"""(
        WITH aug0 AS (SELECT doc_id, {CLEANING_V3_AUG_SQL} AS text
                      FROM {src} WHERE doc_id IS NOT NULL)
        SELECT doc_id, nfc_normalize(text) AS text FROM aug0
        UNION ALL
        SELECT doc_id + {V4_TWIN_OFFSET} AS doc_id,
               nfc_normalize(text) AS text FROM aug0
    ) v4base"""
    cleaned = f"""(
        SELECT doc_id, {redacted} AS text
        FROM ({c4_oracle(src=inp)}) v4c4 WHERE c4_pass
    ) v4cleaned"""
    trained = _classifier_scored_ctes(
        steps, n_buckets, seed, lr, V4_LABEL_SQL, cleaned
    )
    return f"""
        {trained},
        kk AS (SELECT CAST(floor(count(*) * {keep_frac}) AS BIGINT) AS k
               FROM scored),
        rankedv4 AS (SELECT score_r,
                            row_number() OVER (ORDER BY score_r DESC) AS rn
                     FROM scored),
        thr AS (SELECT min(score_r) AS t FROM rankedv4
                WHERE rn <= (SELECT k FROM kk)),
        keptv4 AS (SELECT d.doc_id, d.t AS text
                   FROM d JOIN scored s USING (doc_id)
                   WHERE coalesce(s.score_r >= (SELECT t FROM thr), FALSE)),
        fpv4 AS (SELECT doc_id, text,
                        md5(trim(regexp_replace(lower(text), '\\s+', ' ',
                                                'g'))) AS fp
                 FROM keptv4),
        survv4 AS (SELECT doc_id, text FROM (
                     SELECT doc_id, text,
                            min(doc_id) OVER (PARTITION BY fp) AS keeper
                     FROM fpv4)
                   WHERE doc_id = keeper)
        SELECT ('0x' || substr(md5('{seed}:' || cast(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % {n_shards} AS shard,
               count(*)::BIGINT AS n_docs,
               sum(len({_toks('text')}))::BIGINT AS n_tokens,
               bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT)
                   AS content_hash
        FROM survv4 GROUP BY shard
    """


def ngram_pairs_ctes(src: str = "documents", max_shingle_df: int | None = None) -> str:
    """``WITH``-prefixed form of :func:`_ngram_pairs_cte_body` — the
    shape the standalone jaccard/containment oracles consume."""
    return f"WITH {_ngram_pairs_cte_body(src, max_shingle_df)}"


def _ngram_pairs_cte_body(src: str = "documents", max_shingle_df: int | None = None) -> str:
    """CTE block (no ``WITH`` prefix, so composed oracles can prepend
    their own CTEs — r13) ending in ``pairs(doc_a, doc_b, inter, na,
    nb)`` — the inverted-index 3-shingle pair pipeline shared by the
    jaccard and containment closes and the paired cross-modal matrix.
    ``max_shingle_df`` replays the hot-shingle
    prune: shingles in more than that many docs are dropped BEFORE the
    per-doc set sizes are counted, so ``inter`` and ``na``/``nb`` are
    over the same surviving shingle space (operators/dedup, r7 advice
    #3 — the pre-prune sizes made pruned containment a one-sided
    underestimate).  Replays on raw shingle STRINGS; Spark's xxhash64
    rows agree up to hash collisions (the shingle_rows argument)."""
    shingles = f"""
        SELECT doc_id,
               list_distinct(
                 list_transform(generate_series(1, len(t) - 2),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> x <> '') AS t
              FROM {src})
    """
    prune = ""
    ex_src = "ex0"
    if max_shingle_df is not None:
        prune = f"""
        hot AS (SELECT s FROM ex0 GROUP BY s
                HAVING count(*) > {max_shingle_df}),
        surv AS (SELECT e.doc_id, e.s FROM ex0 e
                 ANTI JOIN hot h USING (s)),"""
        ex_src = "surv"
    return f"""
    sets_ AS ({shingles}),
    ex0 AS (SELECT doc_id, unnest(sh) s FROM sets_ WHERE len(sh) > 0),{prune}
    ex AS (SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, s
           FROM {ex_src}),
    pairs AS (
      SELECT a.doc_id doc_a, b.doc_id doc_b,
             CAST(count(*) AS BIGINT) inter,
             any_value(a.n) na, any_value(b.n) nb
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""


def ngram_containment_oracle(
    threshold: float = 0.8,
    src: str = "documents",
    max_shingle_df: int | None = None,
) -> str:
    """DuckDB replay of operators/dedup.dedup_ngram_containment incl.
    the ``max_shingle_df`` hot-shingle prune path."""
    return f"""
        {ngram_pairs_ctes(src, max_shingle_df)}
        SELECT doc_a, doc_b,
               inter * 1.0 / na AS cont_a,
               inter * 1.0 / nb AS cont_b
        FROM pairs
        WHERE greatest(inter * 1.0 / na, inter * 1.0 / nb) >= {threshold}
    """


def ngram_jaccard_oracle(
    threshold: float = 0.5,
    src: str = "documents",
    max_shingle_df: int | None = None,
) -> str:
    """DuckDB replay of operators/dedup.dedup_ngram_jaccard incl. the
    ``max_shingle_df`` hot-shingle prune path (same surviving-space
    semantics as the containment close)."""
    return f"""
        {ngram_pairs_ctes(src, max_shingle_df)}
        SELECT doc_a, doc_b,
               inter * 1.0 / (na + nb - inter) AS jaccard
        FROM pairs
        WHERE inter * 1.0 / (na + nb - inter) >= {threshold}
    """


def pq_init_reranked_oracle(
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    train_max_id: int = 200,
    n_queries: int = 10,
    k_prime: int = 20,
    k_final: int = 5,
    src: str = "embeddings",
) -> str:
    """DuckDB replay of the FULL product-quantization serving
    composition (operators/pq.py — r9 verdict #1: the family's
    hard-signal row): codebook init -> distributed encode -> ADC
    candidate top-``k_prime`` -> exact-cosine re-rank to ``k_final``.

    The codebook is the ``pq_train(n_iter=0)`` INIT — per subspace the
    first ``k`` distinct subvectors of the md5-ordered ``vec_id <
    train_max_id`` slice — so the whole pipeline is a pure function of
    the data (the sim_ann_ivf seeded-cell convention; the slice is
    sf-independent because every fixture sf carries those ids) and the
    oracle rebuilds the codebook itself in SQL instead of embedding
    trained literals.  Lloyd refinement stays out of the oracle on
    purpose: member MEANS are cross-row float64 sums whose order no
    engine contracts (the kmeans row pays DECIMAL exactness for that;
    here the codebook-is-the-contract convention applies — pq.py
    module docstring), and the trained-codebook encode is separately
    hypothesis-pinned in tests/test_pq.py.

    Cross-engine arithmetic: the encode distance is the same
    left-associated float64 ``(v-c)*(v-c)`` chain as
    :func:`operators.pq.pq_codes_oracle_sql` with the argmin's
    ties-to-lowest-code ``row_number``; ADC sums pivot the ``m``
    per-subspace LUT terms into one left-associated chain (numpy
    accumulates subspaces in the same order); candidate selection
    compares unrounded float64 with the ascending-id tie-break
    (identical code tuples — the only realistic near-tie source —
    score EXACTLY equal on both engines); the re-ranked output rounds
    the exact cosine to 6 decimals, the sim_ann_ivf gate convention.

    Known edge (documented, not fixture-reachable): the init's
    distinctness is byte-level on the Spark side (``row.tobytes()``)
    and value-level here (``GROUP BY sv``), which differ only on
    -0.0-vs-0.0 and NaN subvector entries — the fixture embeddings
    are finite uniform floats with no negative zeros."""
    dsub = dim // m
    dist_chain = " + ".join(
        f"(m.e[c.sub*{dsub} + {j}] - c.cv[{j}])"
        f" * (m.e[c.sub*{dsub} + {j}] - c.cv[{j}])"
        for j in range(1, dsub + 1)
    )
    qnorm_chain = " + ".join(f"e[{i}]*e[{i}]" for i in range(1, dim + 1))
    lut_chain = " + ".join(
        f"c.cv[{j}] * (q.e[c.sub*{dsub} + {j}] / q.nrm)"
        for j in range(1, dsub + 1)
    )
    n2_chain = " + ".join(f"cv[{j}]*cv[{j}]" for j in range(1, dsub + 1))
    v_cols = ", ".join(
        f"max(CASE WHEN sub = {s} THEN v END) AS v{s}" for s in range(m)
    )
    n2_cols = ", ".join(
        f"max(CASE WHEN sub = {s} THEN n2 END) AS n2_{s}" for s in range(m)
    )
    v_chain = " + ".join(f"v{s}" for s in range(m))
    n2_sum_chain = " + ".join(f"n2_{s}" for s in range(m))
    return f"""
        WITH emb AS (
          SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
          FROM {src}
          WHERE embedding IS NOT NULL AND len(embedding) = {dim}
        ),
        samp AS (
          SELECT id, e,
                 row_number() OVER (
                   ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
          FROM emb WHERE id < {train_max_id}
        ),
        subv AS (
          SELECT rn, s.s AS sub,
                 e[s.s*{dsub} + 1 : s.s*{dsub} + {dsub}] AS sv
          FROM samp, unnest(generate_series(0, {m - 1})) AS s(s)
        ),
        firsts AS (
          SELECT sub, sv, min(rn) AS frn FROM subv GROUP BY sub, sv
        ),
        cb AS (
          SELECT sub, sv AS cv,
                 row_number() OVER (PARTITION BY sub ORDER BY frn) - 1
                     AS code
          FROM firsts
          QUALIFY row_number() OVER (PARTITION BY sub ORDER BY frn)
                      <= {k}
        ),
        dists AS (
          SELECT m.id, c.sub, c.code, ({dist_chain}) AS dist
          FROM emb m CROSS JOIN cb c
        ),
        codes AS (
          SELECT id, sub, code FROM (
            SELECT id, sub, code,
                   row_number() OVER (PARTITION BY id, sub
                                      ORDER BY dist, code) AS rn
            FROM dists) WHERE rn = 1
        ),
        qn AS (
          SELECT id AS qid, e,
                 CASE WHEN sqrt({qnorm_chain}) = 0 THEN 1
                      ELSE sqrt({qnorm_chain}) END AS nrm
          FROM emb WHERE id < {n_queries}
        ),
        lut AS (
          SELECT q.qid, c.sub, c.code,
                 ({lut_chain}) AS v, ({n2_chain}) AS n2
          FROM qn q CROSS JOIN cb c
        ),
        lutj AS (
          SELECT co.id, l.qid, co.sub, l.v, l.n2
          FROM codes co JOIN lut l
            ON l.sub = co.sub AND l.code = co.code
        ),
        piv AS (
          SELECT id, qid, {v_cols}, {n2_cols}
          FROM lutj GROUP BY id, qid
        ),
        adc AS (
          SELECT id, qid,
                 ({v_chain}) /
                 (CASE WHEN sqrt({n2_sum_chain}) = 0 THEN 1
                       ELSE sqrt({n2_sum_chain}) END) AS adc_score
          FROM piv WHERE id <> qid
        ),
        cand AS (
          SELECT qid, id FROM (
            SELECT qid, id,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY adc_score DESC, id) AS rn
            FROM adc) WHERE rn <= {k_prime}
        ),
        rer AS (
          SELECT c.qid, c.id,
                 list_cosine_similarity(q.e, x.e) AS cs
          FROM cand c
          JOIN emb q ON q.id = c.qid
          JOIN emb x ON x.id = c.id
        )
        SELECT qid AS query_id, id AS neighbor_id,
               CAST(rn AS INT) AS rank, round(cs, 6) AS cos_sim_r
        FROM (SELECT qid, id, cs,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cs DESC, id) AS rn
              FROM rer)
        WHERE rn <= {k_final}
    """


#: doc_id offset for the v5 image twins (distinct from V4_TWIN_OFFSET so
#: the two pipelines' twin spaces can never collide in a shared debug
#: session; the twin carries the ORIGINAL's payload verbatim — the v4
#: text-twin precedent — so its fingerprints replay from the ORIGINAL
#: doc_id's pixel arithmetic).
V5_TWIN_OFFSET = 2_000_000


def training_pipeline_v5_oracle(
    max_hamming: int = 3,
    verify_max_hamming: int = 10,
    n_shards: int = 8,
    seed: int = 0,
    src: str = "documents",
) -> str:
    """DuckDB replay of the v5 MULTIMODAL pretraining build
    (plans/extension.training_corpus_pipeline_v5): image-twin injection
    -> perceptual PNG fingerprints (the :func:`png_fp_ctes` arithmetic,
    twins inheriting the original's fps) -> the full
    ``dedup_image_ahash`` pair semantics — degenerate quarantine with
    the in-band exact-equal STAR closure, banded-Hamming pairs with
    dual-hash verify (recall exactly 1 at ``max_hamming <= 3``, so the
    replay is the plain all-pairs filter; no fixture bucket reaches
    the 10k cap) -> connected components (recursive CTE) ->
    ``dedup_keep_best``'s best-quality-survivor rule (score DESC NULLS
    LAST, ties by ascending id) -> the sharded-export manifest whose
    order-independent content hash gates every upstream decision.

    Quality score: originals carry their ``n_chars``; a twin carries
    ``n_chars + doc_id%5 - 2`` and the text ``coalesce(text,'') ||
    ' rev2'`` — so twins win some clusters and lose others (both
    keep-best directions exercised, and the winner's text is
    distinguishable in the manifest hash; a min-id rule would diverge
    wherever a twin wins, which is what makes the keep-best stage
    falsifiable rather than dedup-shaped)."""
    off = V5_TWIN_OFFSET
    return f"""
        WITH RECURSIVE {png_fp_ctes(src)},
        fp0 AS (SELECT doc_id, fp_a, fp_b FROM pngh),
        fps AS (
          SELECT doc_id, fp_a, fp_b FROM fp0
          UNION ALL
          SELECT doc_id + {off}, fp_a, fp_b FROM fp0
        ),
        nd AS (SELECT * FROM fps
               WHERE bit_count(fp_a) NOT IN (0, 64)),
        bpairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM nd a JOIN nd b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.fp_a, b.fp_a)) <= {max_hamming}
            AND bit_count(xor(a.fp_b, b.fp_b)) <= {verify_max_hamming}
        ),
        degen AS (SELECT * FROM fps
                  WHERE bit_count(fp_a) IN (0, 64)),
        hubs AS (SELECT fp_a, fp_b, min(doc_id) AS hub
                 FROM degen WHERE fp_b IS NOT NULL
                 GROUP BY fp_a, fp_b),
        spairs AS (
          SELECT h.hub AS doc_a, d.doc_id AS doc_b
          FROM degen d JOIN hubs h USING (fp_a, fp_b)
          WHERE d.doc_id <> h.hub
        ),
        pr AS (SELECT doc_a, doc_b FROM bpairs
               UNION ALL SELECT doc_a, doc_b FROM spairs),
        nodes AS (SELECT doc_a AS n FROM pr UNION SELECT doc_b FROM pr),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        cc(node, lbl) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.node
          WHERE cc.lbl < e.v
        ),
        comp AS (SELECT node AS id, min(lbl) AS component
                 FROM cc GROUP BY node),
        corp AS (
          SELECT doc_id, text, n_chars AS q
          FROM {src} WHERE doc_id IS NOT NULL
          UNION ALL
          SELECT doc_id + {off},
                 coalesce(text, '') || ' rev2',
                 n_chars + doc_id % 5 - 2
          FROM {src} WHERE doc_id IS NOT NULL AND doc_id % 4 = 0
        ),
        rankedv5 AS (
          SELECT c.id,
                 row_number() OVER (
                   PARTITION BY c.component
                   ORDER BY k.q DESC NULLS LAST, c.id) AS rn
          FROM comp c JOIN corp k ON k.doc_id = c.id
        ),
        dropv5 AS (SELECT id FROM rankedv5 WHERE rn > 1),
        survv5 AS (
          SELECT doc_id, coalesce(text, '') AS t FROM corp
          WHERE doc_id NOT IN (SELECT id FROM dropv5)
        )
        SELECT ('0x' || substr(md5('{seed}:' || cast(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % {n_shards} AS shard,
               count(*)::BIGINT AS n_docs,
               sum(len({_toks('t')}))::BIGINT AS n_tokens,
               bit_xor(('0x' || substr(md5(t), 1, 15))::BIGINT)
                   AS content_hash
        FROM survv5 GROUP BY shard
    """


def video_frame_fp_oracle(src: str = "documents") -> str:
    """DuckDB replay of operators/video.video_frame_fingerprints over
    the synthesized APNG fixture (video.synthesize_video_payloads):
    8x8 grayscale frames whose pixels are pure doc_id arithmetic
    (frame ``f`` pixel ``i`` = ``(doc_id*31 + f*101 + i*i*13 + i*7) %
    256``, 2 + doc_id%3 frames).  At 8x8 the aHash resample is the
    IDENTITY (``((ty*8)//8)*8 + ((tx*8)//8) = ty*8+tx``), so the cells
    read pixels directly; dHash samples the 9-column grid via
    ``(tx*8)//9``.  -> (doc_id, frame_idx, n_frames, fp_a, fp_b)."""
    a = _WRAP64.format(x="a.ub")
    dh = _WRAP64.format(x="d9.ub")
    px = "(doc_id * 31 + f * 101 + ({i}) * ({i}) * 13 + ({i}) * 7) % 256"
    return f"""
        WITH vids AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS nf
                      FROM {src} WHERE doc_id IS NOT NULL),
        vframes AS (SELECT doc_id, nf, t.f
                    FROM vids, unnest(generate_series(0, 4)) AS t(f)
                    WHERE t.f < nf),
        vcells AS (
          SELECT doc_id, f, t1.ty, t2.tx,
                 {px.format(i="t1.ty * 8 + t2.tx")} AS g
          FROM vframes,
               unnest(generate_series(0, 7)) AS t1(ty),
               unnest(generate_series(0, 7)) AS t2(tx)),
        vtot AS (SELECT doc_id, f, sum(g) AS total
                 FROM vcells GROUP BY doc_id, f),
        vabits AS (
          SELECT c.doc_id, c.f,
                 coalesce(sum(CASE WHEN c.g * 64 > t.total
                              THEN (1::HUGEINT << (c.ty * 8 + c.tx))
                              END), 0::HUGEINT) AS ub
          FROM vcells c JOIN vtot t USING (doc_id, f)
          GROUP BY c.doc_id, c.f),
        vcells9 AS (
          SELECT doc_id, f, t1.ty, t2.tx,
                 {px.format(i="t1.ty * 8 + (t2.tx * 8) // 9")} AS g
          FROM vframes,
               unnest(generate_series(0, 7)) AS t1(ty),
               unnest(generate_series(0, 8)) AS t2(tx)),
        vdbits AS (
          SELECT l.doc_id, l.f,
                 coalesce(sum(CASE WHEN r.g > l.g
                              THEN (1::HUGEINT << (l.ty * 8 + l.tx))
                              END), 0::HUGEINT) AS ub
          FROM vcells9 l JOIN vcells9 r
            ON l.doc_id = r.doc_id AND l.f = r.f AND l.ty = r.ty
           AND r.tx = l.tx + 1
          WHERE l.tx < 8
          GROUP BY l.doc_id, l.f)
        SELECT v.doc_id, CAST(v.f AS INT) AS frame_idx,
               v.nf AS n_frames, {a} AS fp_a, {dh} AS fp_b
        FROM vframes v
        JOIN vabits a ON a.doc_id = v.doc_id AND a.f = v.f
        JOIN vdbits d9 ON d9.doc_id = v.doc_id AND d9.f = v.f
    """


def _fp_containment_close_sql(threshold: float, max_fp_df: int) -> str:
    """The frame/window-fingerprint CONTAINMENT close — CTE text
    (s0/s/sz/p + the final SELECT) shared by the video and audio
    oracles (one definition, the _cm_cell_sql convention).  Assumes a
    CTE ``vf`` with (doc_id, fp_a): distinct per-id fp sets with
    degenerate fingerprints (popcount 0/64) quarantined and hot
    fingerprints (document frequency > ``max_fp_df``) pruned BEFORE
    set sizes are counted, inverted-index intersection, and the
    |A∩B|/min(|A|,|B|) ratio filter.

    The multi-referenced CTEs are MATERIALIZED (s0 feeds s + the DF
    subquery; s feeds sizes + both pair sides): DuckDB otherwise
    re-inlines each reference, and in the composed v6 oracle — where
    the whole close nests inside a twice-referenced candidate CTE —
    that re-evaluation measured 128s vs 0.2s materialized at sf0.001,
    with identical results."""
    return f"""
        s0 AS MATERIALIZED (
              SELECT DISTINCT doc_id AS vid, fp_a AS fp FROM vf
               WHERE bit_count(fp_a) NOT IN (0, 64)),
        s AS MATERIALIZED (
              SELECT vid, fp FROM s0
              WHERE fp NOT IN (SELECT fp FROM s0 GROUP BY fp
                               HAVING count(*) > {max_fp_df})),
        sz AS (SELECT vid, count(*) AS n FROM s GROUP BY vid),
        p AS (SELECT a.vid AS vid_a, b.vid AS vid_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM s a JOIN s b ON a.fp = b.fp AND a.vid < b.vid
              GROUP BY 1, 2)
        SELECT p.vid_a, p.vid_b, p.inter, na.n AS na, nb.n AS nb,
               p.inter * 1.0 / least(na.n, nb.n) AS containment
        FROM p
        JOIN sz na ON na.vid = p.vid_a
        JOIN sz nb ON nb.vid = p.vid_b
        WHERE p.inter * 1.0 / least(na.n, nb.n) >= {threshold}
    """


def video_containment_oracle(
    src: str = "documents",
    threshold: float = 0.8,
    max_fp_df: int = 10_000,
    vf_sql: str | None = None,
) -> str:
    """DuckDB replay of operators/video.dedup_video_containment over
    the synthesized APNG fixture — the FULL close on top of
    :func:`video_frame_fp_oracle` (see :func:`_fp_containment_close_sql`
    for the shared close).  At fixture scale the DF prune is
    numerically a no-op (the hottest fingerprint sits far below 10k
    videos) but it is stated in SQL so the oracle replays the
    operator's production default, not a simplification.  Like
    :func:`video_sequence_oracle`, ``vf_sql`` swaps in any fingerprint
    CTE body (the operator is modality-generic and so is the close)."""
    return f"""
        WITH vf AS MATERIALIZED ({vf_sql or video_frame_fp_oracle(src)}),
        {_fp_containment_close_sql(threshold, max_fp_df)}
    """


def audio_window_fp_oracle(src: str = "documents") -> str:
    """DuckDB replay of operators/audio.audio_window_fingerprints over
    the synthesized WAV fixture (audio.synthesize_audio_payloads):
    ``2 + doc_id % 3`` windows of 65 int16 samples, sample ``i`` of
    window ``w`` = ``(doc_id*37 + w*101 + i*i*11 + i*5) % 251 - 125``
    (AUDIO_FIXTURE_MOD single-sources the modulus).  At 65 samples the
    sign fingerprint's resample is the IDENTITY, so bit ``j`` is just
    ``sample[j+1] > sample[j]``.  -> (doc_id, frame_idx, n_frames,
    fp_a)."""
    from excelstream_spark.operators.audio import AUDIO_FIXTURE_MOD

    m = AUDIO_FIXTURE_MOD
    fp = _WRAP64.format(x="b.ub")
    return f"""
        WITH aids AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS nw
                      FROM {src} WHERE doc_id IS NOT NULL),
        awin AS (SELECT doc_id, nw, t.w
                 FROM aids, unnest(generate_series(0, 3)) AS t(w)
                 WHERE t.w < nw),
        sm AS (SELECT doc_id, w, t.i,
                      (doc_id * 37 + w * 101 + t.i * t.i * 11
                       + t.i * 5) % {m} - {m // 2} AS v
               FROM awin, unnest(generate_series(0, 64)) AS t(i)),
        ab AS (SELECT l.doc_id, l.w,
                      coalesce(sum(CASE WHEN r.v > l.v
                                   THEN (1::HUGEINT << l.i) END),
                               0::HUGEINT) AS ub
               FROM sm l JOIN sm r ON r.doc_id = l.doc_id
                                  AND r.w = l.w AND r.i = l.i + 1
               WHERE l.i < 64
               GROUP BY l.doc_id, l.w)
        SELECT a.doc_id, CAST(a.w AS INT) AS frame_idx,
               a.nw AS n_frames, {fp} AS fp_a
        FROM awin a JOIN ab b ON b.doc_id = a.doc_id AND b.w = a.w
    """


def audio_containment_oracle(
    src: str = "documents",
    threshold: float = 0.8,
    max_fp_df: int = 10_000,
) -> str:
    """DuckDB replay of the audio containment close — the video
    family's operator (dedup_video_containment) running UNCHANGED over
    :func:`audio_window_fp_oracle` rows, closed by the SHARED
    :func:`_fp_containment_close_sql` text: the modality-generic
    contract proven at the SQL level too."""
    return f"""
        WITH vf AS MATERIALIZED ({audio_window_fp_oracle(src)}),
        {_fp_containment_close_sql(threshold, max_fp_df)}
    """


def video_increment_oracle(
    src: str = "documents",
    threshold: float = 0.8,
    max_fp_df: int = 10_000,
) -> str:
    """DuckDB replay of operators/video.video_increment_containment —
    the video family's SERVING path: even-doc_id clips are the stored
    corpus (build-time pruned: degenerate quarantine + the corpus-DF
    hot-frame cap, sizes counted over that surviving space), odd-doc_id
    clips are the increment (quarantined but NO df cap of its own —
    the production consistency contract: serve-time decisions use
    corpus statistics computed at build time).  Cross pairs only, the
    |new ∩ corpus| / min(n_new, n_corpus) ratio filter.
    -> (new_vid, corpus_vid, inter, n_new, n_corpus, containment)."""
    return f"""
        WITH vf AS ({video_frame_fp_oracle(src)}),
        cs0 AS (SELECT DISTINCT doc_id AS vid, fp_a AS fp FROM vf
                WHERE doc_id % 2 = 0 AND bit_count(fp_a) NOT IN (0, 64)),
        cs AS (SELECT vid, fp FROM cs0
               WHERE fp NOT IN (SELECT fp FROM cs0 GROUP BY fp
                                HAVING count(*) > {max_fp_df})),
        csz AS (SELECT vid, count(*) AS n FROM cs GROUP BY vid),
        ns AS (SELECT DISTINCT doc_id AS vid, fp_a AS fp FROM vf
               WHERE doc_id % 2 = 1 AND bit_count(fp_a) NOT IN (0, 64)),
        nsz AS (SELECT vid, count(*) AS n_new FROM ns GROUP BY vid),
        p AS (SELECT n.vid AS new_vid, c.vid AS corpus_vid,
                     CAST(count(*) AS BIGINT) AS inter
              FROM ns n JOIN cs c ON n.fp = c.fp
              GROUP BY 1, 2)
        SELECT p.new_vid, p.corpus_vid, p.inter, nz.n_new,
               cz.n AS n_corpus,
               p.inter * 1.0 / least(nz.n_new, cz.n) AS containment
        FROM p
        JOIN nsz nz ON nz.vid = p.new_vid
        JOIN csz cz ON cz.vid = p.corpus_vid
        WHERE p.inter * 1.0 / least(nz.n_new, cz.n) >= {threshold}
    """


def _video_seq_shingle_ctes(
    n: int, max_sh_df: int, restrict: str | None = None
) -> str:
    """Shared CTE text (sq/sh0/shp) for the frame-SEQUENCE shingle
    stage — one definition for the standalone and verified oracles
    (the _cm_cell_sql convention), replaying operators/video.
    video_sequence_shingles: n-grams of the per-video fp_a sequence
    ordered by frame_idx (order preserved inside the shingle string),
    60-bit md5 shingle hashes, distinct per video, hot shingles
    (document frequency > max_sh_df) pruned.  ``restrict`` names a CTE
    of candidate vids to semi-restrict the stage to."""
    parts = " || ':' || ".join(
        "CAST(fp_a AS VARCHAR)"
        if i == 0
        else f"CAST(lead(fp_a, {i}) OVER w AS VARCHAR)"
        for i in range(n)
    )
    where = (
        f"WHERE doc_id IN (SELECT vid FROM {restrict})" if restrict else ""
    )
    return f"""
        sq AS (SELECT doc_id, {parts} AS shs,
                      lead(fp_a, {n - 1}) OVER w AS f_last
               FROM vf {where}
               WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
        sh0 AS MATERIALIZED (
                SELECT DISTINCT doc_id AS vid,
                       ('0x' || substr(md5(shs), 1, 15))::BIGINT AS sh
                FROM sq WHERE f_last IS NOT NULL),
        shp AS MATERIALIZED (
                SELECT vid, sh FROM sh0
                WHERE sh NOT IN (SELECT sh FROM sh0 GROUP BY sh
                                 HAVING count(*) > {max_sh_df}))
    """


def video_sequence_oracle(
    src: str = "documents",
    threshold: float = 0.8,
    n: int = 2,
    max_sh_df: int = 10_000,
    vf_sql: str | None = None,
) -> str:
    """DuckDB replay of operators/video.dedup_video_sequence: the
    ORDER-AWARE close — shingle the per-id frame-fingerprint sequence,
    inverted-index intersection, |A∩B|/min(|A|,|B|) over shingle-set
    sizes.  The operator is modality-generic over (doc_id, frame_idx,
    fp_a) rows and so is this oracle: ``vf_sql`` names the fingerprint
    CTE body (default: the synthesized APNG fixture's
    :func:`video_frame_fp_oracle`; pass
    :func:`audio_window_fp_oracle` for WAV windows)."""
    return f"""
        WITH vf AS MATERIALIZED ({vf_sql or video_frame_fp_oracle(src)}),
        {_video_seq_shingle_ctes(n, max_sh_df)},
        ssz AS (SELECT vid, count(*) AS sn FROM shp GROUP BY vid),
        sp AS (SELECT a.vid AS vid_a, b.vid AS vid_b,
                      CAST(count(*) AS BIGINT) AS inter
               FROM shp a JOIN shp b ON a.sh = b.sh AND a.vid < b.vid
               GROUP BY 1, 2)
        SELECT sp.vid_a, sp.vid_b, sp.inter, na.sn AS na, nb.sn AS nb,
               sp.inter * 1.0 / least(na.sn, nb.sn) AS seq_containment
        FROM sp
        JOIN ssz na ON na.vid = sp.vid_a
        JOIN ssz nb ON nb.vid = sp.vid_b
        WHERE sp.inter * 1.0 / least(na.sn, nb.sn) >= {threshold}
    """


def video_sequence_verified_oracle(
    src: str = "documents",
    threshold: float = 0.8,
    seq_threshold: float = 0.8,
    n: int = 2,
    max_fp_df: int = 10_000,
    max_sh_df: int = 10_000,
    vf_sql: str | None = None,
) -> str:
    """DuckDB replay of operators/video.dedup_video_containment_verified:
    the set-containment candidates (semantics unchanged —
    :func:`video_containment_oracle` verbatim as a sub-CTE) each gain
    the order-aware seq_containment verify column, computed only over
    candidate vids, with zero-shingle sides (clips shorter than n
    frames) scoring 0.0.  ``vf_sql`` swaps in any fingerprint CTE body
    (the :func:`video_sequence_oracle` convention — the composed close
    is modality-generic too)."""
    seq_c = (
        "CASE WHEN least(coalesce(sa.sn, 0), coalesce(sb.sn, 0)) > 0 "
        "THEN coalesce(sp.seq_inter, 0) * 1.0 "
        "/ least(coalesce(sa.sn, 0), coalesce(sb.sn, 0)) "
        "ELSE 0.0 END"
    )
    # the fingerprint CTE is emitted ONCE and shared (r12 self-review
    # #3): the candidate close's inner WITH references the OUTER vf —
    # previously the vf body appeared twice (inside cand and again for
    # the shingle stage), doubling the decode replay per modality in
    # the composed v6 oracle
    return f"""
        WITH vf AS MATERIALIZED ({vf_sql or video_frame_fp_oracle(src)}),
        cand AS MATERIALIZED (
            WITH {_fp_containment_close_sql(threshold, max_fp_df)}
        ),
        cvids AS (SELECT DISTINCT vid FROM (
                    SELECT vid_a AS vid FROM cand
                    UNION ALL SELECT vid_b AS vid FROM cand)),
        {_video_seq_shingle_ctes(n, max_sh_df, restrict="cvids")},
        ssz AS (SELECT vid, count(*) AS sn FROM shp GROUP BY vid),
        sp AS (SELECT a.vid AS vid_a, b.vid AS vid_b,
                      CAST(count(*) AS BIGINT) AS seq_inter
               FROM shp a JOIN shp b ON a.sh = b.sh AND a.vid < b.vid
               GROUP BY 1, 2)
        SELECT c.vid_a, c.vid_b, c.inter, c.na, c.nb, c.containment,
               coalesce(sp.seq_inter, 0) AS seq_inter,
               {seq_c} AS seq_containment,
               ({seq_c}) >= {seq_threshold} AS seq_verified
        FROM cand c
        LEFT JOIN sp ON sp.vid_a = c.vid_a AND sp.vid_b = c.vid_b
        LEFT JOIN ssz sa ON sa.vid = c.vid_a
        LEFT JOIN ssz sb ON sb.vid = c.vid_b
    """


def _cm_cell_sql(expr: str, width: int) -> str:
    """The Count-Min cell hash in SQL — must match
    operators/sketches._cm_cell exactly (one definition for both the
    sketch and the estimate oracles, the _toks convention)."""
    return (
        "('0x' || substr(md5(CAST(j.r AS VARCHAR) || ':' || "
        f"{expr}), 1, 15))::BIGINT % {width}"
    )


def cm_sketch_oracle(
    depth: int = 4, width: int = 1024, src: str = "documents"
) -> str:
    """DuckDB replay of operators/sketches.cm_sketch_tokens: every
    Count-Min cell hash (md5-60-bit of ``"{row}:" || tok`` mod width,
    one per depth row) and every exact integer count.  -> (row, col,
    cnt)."""
    return f"""
        WITH t AS (SELECT unnest({_toks("coalesce(text, '')")}) AS tok
                   FROM {src}),
        c AS (SELECT j.r AS row, {_cm_cell_sql("tok", width)} AS col
              FROM t, unnest(generate_series(0, {depth - 1})) AS j(r))
        SELECT CAST(row AS INT) AS row, col, count(*)::BIGINT AS cnt
        FROM c GROUP BY row, col
    """


def cm_estimate_oracle(
    depth: int = 4, width: int = 1024, src: str = "documents"
) -> str:
    """DuckDB replay of operators/sketches.cm_estimate over every
    distinct corpus token: min over the depth counters, absent cells
    counting 0.  -> (q, est)."""
    return f"""
        WITH sk AS ({cm_sketch_oracle(depth, width, src)}),
        t AS (SELECT DISTINCT unnest({_toks("coalesce(text, '')")}) AS q
              FROM {src}),
        qc AS (SELECT q, j.r AS row, {_cm_cell_sql("q", width)} AS col
               FROM t, unnest(generate_series(0, {depth - 1})) AS j(r))
        SELECT qc.q, min(coalesce(sk.cnt, 0))::BIGINT AS est
        FROM qc LEFT JOIN sk ON sk.row = qc.row AND sk.col = qc.col
        GROUP BY qc.q
    """


def kmv_jaccard_oracle(
    k: int = 256,
    pred_a: str = "doc_id % 2 = 0",
    pred_b: str = "doc_id % 2 = 1",
    src: str = "documents",
) -> str:
    """DuckDB replay of operators/sketches.kmv_jaccard over the two
    token sets selected by ``pred_a``/``pred_b``: per-side KMV sketch
    (k smallest distinct md5-60-bit token hashes), k-cut union,
    both-membership count, and the Beyer-et-al estimates — all
    arithmetic, so the whole set-overlap pipeline hash-gates.
    -> (n_union_seen, jaccard_est, union_est, inter_est)."""
    kh = repr((k - 1) * float(1 << 60))
    side = (
        "SELECT DISTINCT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h"
        " FROM (SELECT unnest({toks}) AS tok FROM {src} WHERE {pred})"
        " ORDER BY h LIMIT {k}"
    )
    t = _toks("coalesce(text, '')")
    sa = side.format(toks=t, src=src, pred=pred_a, k=k)
    sb = side.format(toks=t, src=src, pred=pred_b, k=k)
    return f"""
        WITH a AS ({sa}), b AS ({sb}),
        u AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
              ORDER BY h LIMIT {k}),
        r AS (SELECT h, row_number() OVER (ORDER BY h) AS rank FROM u),
        m AS (SELECT r.h, r.rank,
                     (r.h IN (SELECT h FROM a)
                      AND r.h IN (SELECT h FROM b)) AS in_both
              FROM r),
        agg AS (SELECT count(*) AS n_union_seen,
                       sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS n_both,
                       max(CASE WHEN rank = {k} THEN h END) AS hk
                FROM m)
        SELECT CAST(n_union_seen AS BIGINT) AS n_union_seen,
               CASE WHEN n_union_seen = 0 THEN 0.0
                    ELSE CAST(n_both AS DOUBLE)
                         / CAST(n_union_seen AS DOUBLE) END
                   AS jaccard_est,
               CASE WHEN n_union_seen < {k}
                    THEN CAST(n_union_seen AS DOUBLE)
                    ELSE floor({kh} / CAST(hk AS DOUBLE)) END AS union_est,
               (CASE WHEN n_union_seen = 0 THEN 0.0
                     ELSE CAST(n_both AS DOUBLE)
                          / CAST(n_union_seen AS DOUBLE) END)
               * (CASE WHEN n_union_seen < {k}
                       THEN CAST(n_union_seen AS DOUBLE)
                       ELSE floor({kh} / CAST(hk AS DOUBLE)) END)
                   AS inter_est
        FROM agg
    """


def _langid_gram_cte(src_cte: str, key: str, ns: tuple[int, ...]) -> str:
    """Shared n-gram-hash CTE body for the langid oracle: one row per
    character n-gram occurrence of lower(text) for every n in ``ns``,
    the gram reduced to the house 60-bit md5 hash — replays
    operators/langid.char_ngram_hashes.  ``src_cte`` must expose
    (``key``, t)."""
    n_list = ", ".join(str(int(n)) for n in ns)
    return f"""
        SELECT {key},
               ('0x' || substr(md5(substr(t, ix.i, nn.n)), 1, 15))::BIGINT
                   AS gram_h
        FROM {src_cte}
        CROSS JOIN (SELECT unnest([{n_list}]) AS n) nn,
        unnest(generate_series(1, length(t) - nn.n + 1)) AS ix(i)
    """


def langid_oracle(
    src: str = "documents",
    ns: tuple[int, ...] = (2, 3),
    top_k: int = 300,
    train_mod: int = 2,
) -> str:
    """DuckDB replay of operators/langid — train Cavnar-Trenkle rank
    profiles on the ``doc_id % train_mod == 0`` labeled slice, classify
    the rest: per-language and per-document n-gram ranks over
    (count DESC, gram_h ASC), integer out-of-place distance with the
    ``top_k`` absent-gram penalty, arg-min language (ties to the
    smallest code).  Documents with no grams are absent — inner-group
    semantics on both engines.  -> (doc_id, lang_pred, distance)."""
    k = int(top_k)
    tg = _langid_gram_cte("tr", "lang", ns)
    dg = _langid_gram_cte("sc", "doc_id", ns)
    return f"""
        WITH tr AS (SELECT lang, lower(coalesce(text, '')) AS t
                    FROM {src}
                    WHERE doc_id IS NOT NULL AND lang IS NOT NULL
                      AND doc_id % {train_mod} = 0),
        tg AS ({tg}),
        tc AS (SELECT lang, gram_h, count(*) AS cnt
               FROM tg GROUP BY 1, 2),
        lp AS (SELECT lang, gram_h,
                      row_number() OVER (PARTITION BY lang
                          ORDER BY cnt DESC, gram_h ASC) AS rank
               FROM tc
               QUALIFY rank <= {k}),
        sc AS (SELECT doc_id, lower(coalesce(text, '')) AS t
               FROM {src}
               WHERE doc_id IS NOT NULL AND doc_id % {train_mod} <> 0),
        dg AS ({dg}),
        dc AS (SELECT doc_id, gram_h, count(*) AS cnt
               FROM dg GROUP BY 1, 2),
        dp AS (SELECT doc_id, gram_h,
                      row_number() OVER (PARTITION BY doc_id
                          ORDER BY cnt DESC, gram_h ASC) AS drank
               FROM dc
               QUALIFY drank <= {k}),
        langs AS (SELECT DISTINCT lang FROM lp),
        scored AS (SELECT d.doc_id, l.lang,
                          sum(CASE WHEN p.rank IS NULL THEN {k}
                                   ELSE abs(d.drank - p.rank) END)
                              AS distance
                   FROM dp d
                   CROSS JOIN langs l
                   LEFT JOIN lp p ON p.lang = l.lang
                                 AND p.gram_h = d.gram_h
                   GROUP BY 1, 2)
        SELECT doc_id, lang AS lang_pred, CAST(distance AS BIGINT) AS distance
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY distance ASC, lang ASC) AS _rn
              FROM scored)
        WHERE _rn = 1
    """


def langid_gate_oracle(
    src: str = "documents",
    ns: tuple[int, ...] = (2, 3),
    top_k: int = 300,
    train_mod: int = 2,
) -> str:
    """Streaming language-ID gate replay: the batch
    :func:`langid_oracle` chain VERBATIM (profiles trained on the
    even-id labeled slice, odd docs classified by the integer
    out-of-place distance), with the stream facts per document —
    ``n_deliveries`` 2 (the fixture replays the table twice),
    ``n_distinct_calls`` 1 (bit-identical re-calls across
    redeliveries: the mapside scorer is integer-exact, so a
    nondeterministic model pull or cross-batch state breaks this), and
    the batch-parity (lang_pred, distance) pair — the
    classifier_gate_oracle convention applied to the rank-profile
    classifier."""
    lid = langid_oracle(src=src, ns=ns, top_k=top_k, train_mod=train_mod)
    return f"""
        WITH lid AS ({lid})
        SELECT doc_id,
               CAST(2 AS BIGINT) AS n_deliveries,
               CAST(1 AS BIGINT) AS n_distinct_calls,
               lang_pred, distance
        FROM lid
    """


def url_fixture_sql(src: str = "documents") -> str:
    """CTE body ``u(doc_id, url)`` — the deterministic URL-provenance
    fixture: page key ``pk = doc_id % 100`` (re-crawls of the same
    page land on the same pk), variant ``(doc_id // 100) % 5`` walks
    the five crawl-noise classes the canonicalizer must merge (plain /
    http+www / upper-host+utm / REAL-query — must NOT merge / trailing
    slash+fragment).  Pure doc_id arithmetic, the synthesize
    convention."""
    pk = "CAST(doc_id % 100 % 7 AS VARCHAR) || '.com/a/' || CAST(doc_id % 100 AS VARCHAR)"
    return f"""u AS (
        SELECT doc_id,
               CASE (doc_id // 100) % 5
                 WHEN 0 THEN 'https://example' || {pk}
                 WHEN 1 THEN 'http://www.example' || {pk}
                 WHEN 2 THEN 'https://EXAMPLE' || {pk} || '?utm_source=x'
                 WHEN 3 THEN 'https://example' || {pk} || '?b=2&a=1'
                 ELSE 'https://example' || {pk} || '/#frag'
               END AS url
        FROM {src} WHERE doc_id IS NOT NULL)"""


def url_dedup_oracle(src: str = "documents") -> str:
    """DuckDB replay of operators/provenance.dedup_url_canonical over
    the :func:`url_fixture_sql` fixture: fragment/scheme/www strip,
    host lowercase, trailing-slash strip, utm_* drop + query sort —
    then the min-id keeper per canonical string.  The REAL-query
    variant (?b=2&a=1 -> ?a=1&b=2) stays a distinct group: a
    canonicalizer that dropped ALL queries would over-merge it, which
    the hash gate falsifies."""
    return f"""
        WITH {url_fixture_sql(src)},
        n1 AS (SELECT doc_id,
                      regexp_replace(
                        regexp_replace(url, '#.*$', ''),
                        '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS r
               FROM u),
        sp AS (SELECT doc_id,
                      CASE WHEN instr(r, '?') > 0
                           THEN substr(r, 1, instr(r, '?') - 1)
                           ELSE r END AS hostpath,
                      CASE WHEN instr(r, '?') > 0
                           THEN substr(r, instr(r, '?') + 1)
                           ELSE '' END AS q
               FROM n1),
        cn AS (SELECT doc_id,
                      regexp_replace(lower(split_part(hostpath, '/', 1)),
                                     '^www\\.', '')
                      || regexp_replace(
                           substr(hostpath,
                                  length(split_part(hostpath, '/', 1)) + 1),
                           '/$', '')
                      || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                          AS url_canon
               FROM (SELECT doc_id, hostpath,
                            array_to_string(
                              list_sort(
                                list_filter(string_split(q, '&'),
                                  x -> x <> ''
                                       AND NOT starts_with(x, 'utm_'))),
                              '&') AS qs
                     FROM sp)),
        g AS (SELECT url_canon, min(doc_id) AS keeper,
                     CAST(count(*) AS BIGINT) AS n_same
              FROM cn GROUP BY url_canon)
        SELECT c.doc_id, c.url_canon,
               ('0x' || substr(md5(c.url_canon), 1, 15))::BIGINT
                   AS canon_key,
               g.keeper, g.n_same,
               (c.doc_id = g.keeper) AS kept
        FROM cn c JOIN g USING (url_canon)
    """


#: paired-fixture twin offsets (the v4/v5/v6 convention at new,
#: disjoint offsets) — one twin per LAION-rule quadrant so the matrix
#: row is self-falsifying: DUP (same image key, same caption — the
#: only quadrant that may collapse), RECAP (same image key, unrelated
#: 2-token caption — an image-only dedup would wrongly flag it),
#: REIMG (shifted image key, same caption — a caption-only dedup
#: would wrongly flag it)
PAIRED_DUP_OFFSET = 5_000_000
PAIRED_RECAP_OFFSET = 6_000_000
PAIRED_REIMG_OFFSET = 7_000_000


def paired_src_sql(
    src: str = "documents", n_classes: int = 50, twin_mod: int = 10
) -> str:
    """CTE body for ``psrc(doc_id, img_k, text)`` — the paired
    (image-key, caption) fixture: every document is a pair whose image
    key is ``doc_id % n_classes`` and whose caption is its text;
    every ``doc_id % twin_mod == 0`` document additionally spawns the
    three quadrant twins (module constants above).  The Spark catalog
    row derives the identical frame (plans/extension.
    dedup_paired_crossmodal)."""
    k = int(n_classes)
    base = f"FROM {src} WHERE doc_id IS NOT NULL"
    twin = f"{base} AND doc_id % {int(twin_mod)} = 0"
    return f"""psrc AS MATERIALIZED (
        SELECT doc_id, doc_id % {k} AS img_k,
               coalesce(text, '') AS text {base}
        UNION ALL
        SELECT doc_id + {PAIRED_DUP_OFFSET}, doc_id % {k},
               coalesce(text, '') {twin}
        UNION ALL
        SELECT doc_id + {PAIRED_RECAP_OFFSET}, doc_id % {k},
               'recap ' || CAST(doc_id AS VARCHAR) {twin}
        UNION ALL
        SELECT doc_id + {PAIRED_REIMG_OFFSET}, (doc_id + 1) % {k},
               coalesce(text, '') {twin})"""


def paired_crossmodal_oracle(
    src: str = "documents",
    n_classes: int = 50,
    twin_mod: int = 10,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> str:
    """DuckDB replay of operators/paired.paired_crossmodal_matrix over
    the quadrant-twin fixture (:func:`paired_src_sql`): the image side
    re-derives each pair's aHash from its image key through the
    ESTABLISHED :func:`video_frame_fp_oracle` arithmetic (the fixture
    image is frame 0 of the 8x8 APNG keyed on ``img_k`` — genuinely
    key-varied hash patterns, unlike the 2x2 PNG fixture's ~16-value
    hash space); the caption side is the
    shared inverted-index shingle body (:func:`_ngram_pairs_cte_body`)
    on raw shingle strings; candidates come from either side and every
    candidate carries both integer-exact criteria plus the LAION-rule
    ``is_dup`` verdict.  A pair of empty-caption docs never
    caption-matches (``cap_union > 0`` — a match needs evidence)."""
    num, den = int(threshold_num), int(threshold_den)
    keys = "(SELECT DISTINCT img_k AS doc_id FROM psrc) pk"
    return f"""
        WITH {paired_src_sql(src, n_classes, twin_mod)},
        {_ngram_pairs_cte_body("psrc")},
        psizes AS MATERIALIZED (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n
            FROM ex0 GROUP BY doc_id),
        ppairs AS MATERIALIZED (
            SELECT doc_a, doc_b, inter FROM pairs),
        kfp AS MATERIALIZED (
            SELECT doc_id AS ik, fp_a
            FROM ({video_frame_fp_oracle(keys)})
            WHERE frame_idx = 0),
        ifp AS MATERIALIZED (
            SELECT p.doc_id, h.fp_a
            FROM psrc p JOIN kfp h ON h.ik = p.img_k),
        cand_img AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ifp a JOIN ifp b
              ON a.fp_a = b.fp_a AND a.doc_id < b.doc_id),
        cand_cap AS (
            SELECT p.doc_a, p.doc_b FROM ppairs p
            JOIN psizes xa ON xa.doc_id = p.doc_a
            JOIN psizes xb ON xb.doc_id = p.doc_b
            WHERE p.inter * {den} >= (xa.n + xb.n - p.inter) * {num}),
        cand AS (SELECT doc_a, doc_b FROM cand_img
                 UNION SELECT doc_a, doc_b FROM cand_cap),
        mx AS (
            SELECT c.doc_a, c.doc_b,
                   (fa.fp_a = fb.fp_a) AS same_image,
                   CAST(coalesce(p.inter, 0) AS BIGINT) AS cap_inter,
                   CAST(coalesce(xa.n, 0) + coalesce(xb.n, 0)
                        - coalesce(p.inter, 0) AS BIGINT) AS cap_union
            FROM cand c
            JOIN ifp fa ON fa.doc_id = c.doc_a
            JOIN ifp fb ON fb.doc_id = c.doc_b
            LEFT JOIN ppairs p
              ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
            LEFT JOIN psizes xa ON xa.doc_id = c.doc_a
            LEFT JOIN psizes xb ON xb.doc_id = c.doc_b)
        SELECT doc_a, doc_b, same_image, cap_inter, cap_union,
               (cap_union > 0 AND cap_inter * {den} >= cap_union * {num})
                   AS cap_match,
               (same_image AND cap_union > 0
                AND cap_inter * {den} >= cap_union * {num}) AS is_dup
        FROM mx
    """


#: v6 twin doc_id offsets (the V4/V5 convention at new, disjoint
#: offsets): DUP = a verbatim copy of the clip/track (same frames,
#: same order — must collapse), REORDER = the same frames REVERSED
#: (same fingerprint SET, different sequence — must SURVIVE: the
#: order-aware verify is what refuses to call it a duplicate)
V6_DUP_OFFSET = 3_000_000
V6_REORDER_OFFSET = 4_000_000


def _v6_twin_vf(base_sql: str) -> str:
    """(doc_id, frame_idx, n_frames, fp_a) for the v6 fixture: a
    modality's decoded base frames plus the verbatim DUP twin and the
    REORDERED twin (frame_idx reversed) — twins are frame-level
    derivations of the SAME decoded clip (the v5 payload-twin
    convention one level up, at the modality-generic frame
    contract)."""
    return f"""
        WITH v6base AS ({base_sql})
        SELECT doc_id, frame_idx, n_frames, fp_a FROM v6base
        UNION ALL
        SELECT doc_id + {V6_DUP_OFFSET} AS doc_id, frame_idx,
               n_frames, fp_a
        FROM v6base
        UNION ALL
        SELECT doc_id + {V6_REORDER_OFFSET} AS doc_id,
               n_frames - 1 - frame_idx AS frame_idx, n_frames, fp_a
        FROM v6base
    """


def training_pipeline_v6_oracle(
    threshold: float = 0.8,
    seq_threshold: float = 0.8,
    n: int = 2,
    n_shards: int = 8,
    seed: int = 0,
    src: str = "documents",
) -> str:
    """DuckDB replay of the v6 CROSS-MODAL pretraining build
    (plans/extension.training_corpus_pipeline_v6): video clips
    (doc_id%4==1, real APNG decode arithmetic) and audio tracks
    (doc_id%4==2, real WAV window arithmetic) each gain a DUP twin and
    a REORDERED twin at the frame level; each modality closes with the
    FULL order-aware composition — set-containment candidates + the
    sequence-shingle verify (:func:`video_sequence_verified_oracle`
    verbatim, per-modality ``vf_sql``); only seq_verified pairs become
    dedup edges; connected components (recursive CTE) ->
    ``dedup_keep_best`` (score DESC NULLS LAST, ties ascending id) ->
    the sharded-export manifest whose order-independent content hash
    gates every upstream decision — including the ORDER decisions: a
    set-only dedup would drop the reorder twins and move shard counts,
    so the order-aware machinery is load-bearing under this hash."""
    vsrc = f"(SELECT * FROM {src} WHERE doc_id % 4 = 1) v6v"
    asrc = f"(SELECT * FROM {src} WHERE doc_id % 4 = 2) v6a"
    vver = video_sequence_verified_oracle(
        threshold=threshold,
        seq_threshold=seq_threshold,
        n=n,
        vf_sql=_v6_twin_vf(video_frame_fp_oracle(vsrc)),
    )
    aver = video_sequence_verified_oracle(
        threshold=threshold,
        seq_threshold=seq_threshold,
        n=n,
        vf_sql=_v6_twin_vf(audio_window_fp_oracle(asrc)),
    )
    return f"""
        WITH RECURSIVE
        vp AS ({vver}),
        ap AS ({aver}),
        pr AS (SELECT vid_a AS doc_a, vid_b AS doc_b FROM vp
               WHERE seq_verified
               UNION ALL
               SELECT vid_a AS doc_a, vid_b AS doc_b FROM ap
               WHERE seq_verified),
        nodes AS (SELECT doc_a AS n FROM pr UNION SELECT doc_b FROM pr),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        cc(node, lbl) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.node
          WHERE cc.lbl < e.v
        ),
        comp AS (SELECT node AS id, min(lbl) AS component
                 FROM cc GROUP BY node),
        media AS (SELECT doc_id, text, n_chars FROM {src}
                  WHERE doc_id IS NOT NULL AND doc_id % 4 IN (1, 2)),
        corp AS (
          SELECT doc_id, text, n_chars AS q FROM media
          UNION ALL
          SELECT doc_id + {V6_DUP_OFFSET},
                 coalesce(text, '') || ' dup6',
                 n_chars + doc_id % 5 - 2
          FROM media
          UNION ALL
          SELECT doc_id + {V6_REORDER_OFFSET},
                 coalesce(text, '') || ' re6',
                 n_chars - 1
          FROM media
        ),
        rankedv6 AS (
          SELECT c.id,
                 row_number() OVER (
                   PARTITION BY c.component
                   ORDER BY k.q DESC NULLS LAST, c.id) AS rn
          FROM comp c JOIN corp k ON k.doc_id = c.id
        ),
        dropv6 AS (SELECT id FROM rankedv6 WHERE rn > 1),
        survv6 AS (
          SELECT doc_id, coalesce(text, '') AS t FROM corp
          WHERE doc_id NOT IN (SELECT id FROM dropv6)
        )
        SELECT ('0x' || substr(md5('{seed}:' || cast(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % {n_shards} AS shard,
               count(*)::BIGINT AS n_docs,
               sum(len({_toks('t')}))::BIGINT AS n_tokens,
               bit_xor(('0x' || substr(md5(t), 1, 15))::BIGINT)
                   AS content_hash
        FROM survv6 GROUP BY shard
    """


#: Deterministic crawl-page fixture for the HTML extraction row
#: (functions/html.py): ONE SQL text both engines evaluate (the
#: CLEANING_V3_AUG_SQL convention), wrapping each document's text in a
#: page whose hostile parts are labeled — SCRIPTLEAK (a fake HTML
#: fragment inside a JS string), STYLELEAK, COMMENTLEAK — so any
#: extractor that lets them through hash-fails AND greps red in the
#: pytest falsifiers; the inline-tag join (mid<b>dle</b>word ->
#: middleword), the entity set incl. the double-escape
#: (&amp;lt;keep&gt; -> &lt;keep&gt;) and an UPPERCASE <SCRIPT> are
#: all exercised.
HTML_FIXTURE_SQL = (
    "concat('<html><head><title>d', cast(doc_id AS string), '</title>', "
    "'<style type=\"text/css\">p { color: red; } /* STYLELEAK */</style>', "
    "'</head><body>', "
    "'<SCRIPT>var a = 1; /* SCRIPTLEAK */</SCRIPT>', "
    "'<script type=\"text/javascript\">var leak', cast(doc_id AS string), "
    "' = \"<p>SCRIPTLEAK</p>\";</script>', "
    "'<h1 class=\"t\">Doc &amp; ', cast(doc_id AS string), '</h1>', "
    "'<!-- crawl ', cast(doc_id AS string), ' COMMENTLEAK -->', "
    "'<p>mid<b>dle</b>word A&nbsp;B &lt;raw&gt; &quot;q&quot; ', "
    "'&#39;s&#39; &amp;lt;keep&gt;</p>', "
    "'<p id=\"c\">', coalesce(text, ''), '</p></body></html>')"
)


def html_extract_oracle(src: str = "documents") -> str:
    """DuckDB replay of the HTML extraction row: build the page with
    the SHARED fixture SQL, run the SHARED regex/entity chain
    (functions/html.extract_text_sql — identical pattern strings in
    identical order), and emit the extracted text with its length.
    The hash gate therefore falsifies ANY divergence between the two
    regex engines over the chain, not just gross leaks."""
    from excelstream_spark.functions.html import extract_text_sql

    return f"""
        SELECT doc_id,
               {extract_text_sql(HTML_FIXTURE_SQL)} AS text,
               length({extract_text_sql(HTML_FIXTURE_SQL)})::BIGINT
                   AS n_chars
        FROM {src}
        WHERE doc_id IS NOT NULL
    """
