"""LLM-data-pipeline extension operators (SURVEY.md §2.9, north star).

The reference stops at landing CDC rows; a training-data pipeline at
100 TB additionally needs deduplication, similarity search, text analysis,
and multimodal handling as first-class operators. Each one is registered
here with a DuckDB oracle where the semantics are SQL-expressible; the
genuinely probabilistic/Python-side ones (LSH ANN, SimHash, stubbed media
decode) get rows-only checks plus dedicated pytest semantics tests.

Scale patterns used (and deliberately NOT used):

* dedup/near-dup candidate generation is always bucketed (groupBy on a
  key / band-hash equi-join) — never an unbounded cross join;
* the only broadcast hints are on provably tiny sides (probe/query sets);
* per-row text/vector math is JVM-side higher-order functions, Python only
  in the Arrow-batched media-decode stub where a codec would live.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    LANG_PROFILES,
    STOPWORDS,
    alpha_ratio,
    fingerprint,
    lang_scores,
    lang_guess,
    rolling_hash,
    tokens,
    word_shingles,
)
from ..operators.dedup import exact_dedup, latest_by_key, near_dup_pairs, simhash_table
from ..operators.multimodal import extract_features, media_frame
from ..operators.similarity import (
    near_dup_within_label,
    topk_bruteforce,
    topk_ivf,
    topk_lsh,
)
from ..session import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# SQL fragment shared by every document-token oracle: mirrors
# functions.text.tokens() (lower → split on non-alnum → drop empties).
_SQL_TOKENS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"

# Mirrors functions.text.word_shingles(tokens, 3): distinct 3-word shingles.
_SQL_SHINGLES3 = (
    "CASE WHEN len(tok) >= 3 THEN "
    "list_distinct([array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok) - 1)]) "
    "ELSE [] END"
)


# --------------------------------------------------------------------------
# x01 — EXACT DEDUP, union-tagged (round 13: former w06_stream_dedup
# consolidated as the 'stream' branch — the x02/w10 precedent: batch
# dedup and the streaming dedup-under-redelivery are the same exactness
# claim, so one oracle proves both and the freed slot oracle-promoted
# w12. x01 timing now includes the full checkpointed streaming replay —
# not comparable to rounds <= 12 on either name; w06 stays an
# unregistered function in plans/streaming_queries.py).
#   'batch' : exact dedup with deterministic survivor (min doc_id per
#             text), one shuffle on the dedup key; key := doc_id,
#             s1 := lang, s2 := source, n1 := n_chars, n2 := n_copies.
#   'stream': every event replayed TWICE across micro-batches,
#             dropDuplicatesWithinWatermark must restore the original
#             corpus — key := event_type, n1 := n_events,
#             n2 := n_distinct event ids, v := sum(value).
# --------------------------------------------------------------------------
@register(
    "x01_exact_dedup_docs",
    oracle="""
    SELECT 'batch' AS branch, CAST(doc_id AS VARCHAR) AS key,
           lang AS s1, source AS s2,
           n_chars AS n1, n_copies AS n2, CAST(NULL AS DOUBLE) AS v
    FROM (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
             count(*)    OVER (PARTITION BY text)                  AS n_copies
      FROM documents)
    WHERE rn = 1
    UNION ALL
    SELECT 'stream', event_type, NULL, NULL,
           count(*), count(DISTINCT event_id), round(sum(value), 2)
    FROM events
    GROUP BY event_type
    ORDER BY branch, key
    """,
    doc="exact dedup, union-tagged: deterministic-survivor batch dedup "
    "('batch') and streaming dedup under duplicated replay ('stream' — "
    "former w06: dropDuplicatesWithinWatermark == original corpus "
    "aggregate)",
)
def x01_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming_queries import w06_stream_dedup

    d = _t(spark, sf_dir, "documents")
    nul_s = F.lit(None).cast("string")
    batch = exact_dedup(d, ["text"], [F.asc("doc_id")]).select(
        F.lit("batch").alias("branch"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("lang").alias("s1"),
        F.col("source").alias("s2"),
        F.col("n_chars").alias("n1"),
        F.col("n_copies").alias("n2"),
        F.lit(None).cast("double").alias("v"),
    )
    stream = w06_stream_dedup(spark, sf_dir).select(
        F.lit("stream").alias("branch"),
        F.col("event_type").alias("key"),
        nul_s.alias("s1"),
        nul_s.alias("s2"),
        F.col("n_events").alias("n1"),
        F.col("n_distinct").alias("n2"),
        F.col("sum_value").alias("v"),
    )
    return batch.unionByName(stream).orderBy("branch", "key")


# --------------------------------------------------------------------------
# x02 — CDC latest-version dedup: newest event per user (the reference's
# SRC_KEY_VAL / SRC_COMMIT_DT_UTC compaction, on the events fixture).
# Round 11: union-tagged 'batch'/'stream' — the former w10 (streaming CDC
# upsert continuously maintaining the bucket-partitioned current-state
# table) folded in as the 'stream' branch, since its answer is
# DEFINITIONALLY the same latest-per-user state: one oracle query now
# proves window-dedup == the whole maintenance loop (micro-batch merge,
# bucket overwrite, marker) == DuckDB. The freed slot oracle-promoted
# w14. w10_cdc_current_state stays an unregistered function in
# plans/streaming_queries.py (bench imports it via this branch).
# --------------------------------------------------------------------------
@register(
    "x02_cdc_latest_event",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_id, event_type,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
             round(value, 2) AS value
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1)
    SELECT 'batch' AS branch, * FROM latest
    UNION ALL
    SELECT 'stream' AS branch, * FROM latest
    ORDER BY branch, user_id
    """,
    doc="CDC latest-row dedup, union-tagged: 'batch' = window + row_number "
    "over (key, ts desc); 'stream' = the maintained current-state table "
    "after a full micro-batch replay (former w10) — both must equal the "
    "same latest-per-user oracle",
)
def x02_cdc_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming_queries import w10_cdc_current_state

    e = _t(spark, sf_dir, "events")
    batch = latest_by_key(e, ["user_id"], "ts", "event_id").select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.round("value", 2).alias("value"),
    )
    stream = w10_cdc_current_state(spark, sf_dir)
    return (
        batch.select(F.lit("batch").alias("branch"), "*")
        .unionByName(stream.select(F.lit("stream").alias("branch"), "*"))
        .orderBy("branch", "user_id")
    )


# --------------------------------------------------------------------------
# x03 — corpus token statistics: global top-50 tokens. explode + one
# groupBy(token) shuffle with map-side partial counts.
# --------------------------------------------------------------------------
@register(
    "x03_token_stats",
    oracle=f"""
    WITH uni AS (
      SELECT token AS gram, count(*) AS n,
             count(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
      GROUP BY token
      ORDER BY n DESC, gram
      LIMIT 50
    ),
    tok AS (SELECT {_SQL_TOKENS} AS tok FROM documents),
    bi AS (
      SELECT gram, count(*) AS n FROM (
        SELECT unnest([tok[i] || ' ' || tok[i + 1] for i in range(1, len(tok))]) AS gram
        FROM tok WHERE len(tok) >= 2)
      GROUP BY gram
      ORDER BY n DESC, gram
      LIMIT 20
    )
    SELECT 'unigram' AS branch,
           row_number() OVER (ORDER BY n DESC, gram) AS rank,
           gram, n, n_docs
    FROM uni
    UNION ALL
    SELECT 'bigram',
           row_number() OVER (ORDER BY n DESC, gram),
           gram, n, CAST(NULL AS BIGINT)
    FROM bi
    UNION ALL
    SELECT 'cms',
           row_number() OVER (ORDER BY exact DESC, gram),
           gram, est, exact
    FROM (
      WITH ctok AS (SELECT unnest({_SQL_TOKENS}) AS t FROM documents),
      cexact AS (SELECT t, CAST(count(*) AS BIGINT) AS exact
                 FROM ctok GROUP BY t
                 ORDER BY exact DESC, t LIMIT 20),
      rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
      sketch AS (
        SELECT r,
               CAST(('0x' || substr(md5(t || chr(31) || CAST(r AS VARCHAR)
                                      || chr(31) || '42'), 1, 8))::UBIGINT
                    % 2048 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM ctok, rows_ GROUP BY 1, 2),
      probes AS (
        SELECT e.t, r.r,
               CAST(('0x' || substr(md5(e.t || chr(31) || CAST(r.r AS VARCHAR)
                                      || chr(31) || '42'), 1, 8))::UBIGINT
                    % 2048 AS BIGINT) AS bucket
        FROM cexact e, rows_ r),
      est AS (
        SELECT p.t, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
        FROM probes p LEFT JOIN sketch s
          ON s.r = p.r AND s.bucket = p.bucket
        GROUP BY p.t)
      SELECT e.t AS gram, est, exact
      FROM cexact e JOIN est ON est.t = e.t)
    ORDER BY branch, rank
    """,
    doc="corpus n-gram census, union-tagged (round 9: former "
    "x33_heavy_hitters folds in as the 'bigram' branch; round 11: "
    "former x52_countmin_sketch folds in as the 'cms' branch — n := "
    "count-min estimate, n_docs := exact count, the DuckDB twin still "
    "rebuilds the md5 sketch counter-for-counter; the est>=exact "
    "property stays pinned in pytest): top-50 unigrams with document "
    "frequencies + top-20 bigram heavy hitters + the count-min probe "
    "of the exact top-20",
)
def x03_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.retrieval import heavy_hitters

    d = _t(spark, sf_dir, "documents")
    # Two-level aggregation instead of countDistinct: the first groupBy
    # reduces to distinct (token, doc) pairs with map-side combine, which
    # spreads a skewed hot token across its documents before the final
    # per-token shuffle — the standard distinct-under-skew shape.
    uni = (
        d.select("doc_id", F.explode(tokens("text")).alias("gram"))
        .groupBy("gram", "doc_id")
        .agg(F.count("*").alias("c"))
        .groupBy("gram")
        .agg(F.sum("c").cast("bigint").alias("n"), F.count("*").alias("n_docs"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(50)
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("n"), F.asc("gram"))).cast("bigint"),
        )
        .select(F.lit("unigram").alias("branch"), "rank", "gram", "n", "n_docs")
    )
    bi = heavy_hitters(d, n=2, k=20).select(
        F.lit("bigram").alias("branch"),
        F.col("rank").cast("bigint").alias("rank"),
        "gram",
        F.col("freq").cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("n_docs"),
    )
    # round 11: former x52_countmin_sketch as the 'cms' branch — the
    # sublinear sketch probed at the exact top-20 (n := estimate,
    # n_docs := exact); est >= exact stays pinned in pytest
    from ..operators.retrieval import countmin_estimate, countmin_table

    toks = d.select(F.explode(tokens(F.col("text"))).alias("t"))
    sketch = countmin_table(toks, "t", depth=4, width=2048).localCheckpoint()
    exact = (
        toks.groupBy("t")
        .agg(F.count("*").alias("exact"))
        .orderBy(F.desc("exact"), F.asc("t"))
        .limit(20)
    )
    est = countmin_estimate(sketch, exact, "t", depth=4, width=2048)
    cms = (
        exact.join(est, exact["t"] == est["key"])
        .select(F.col("t").alias("gram"), "est", "exact")
        .withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.desc("exact"), F.asc("gram")))
            .cast("bigint"),
        )
        .select(
            F.lit("cms").alias("branch"),
            "rank",
            "gram",
            F.col("est").alias("n"),
            F.col("exact").alias("n_docs"),
        )
    )
    return uni.unionByName(bi).unionByName(cms).orderBy("branch", "rank")


# --------------------------------------------------------------------------
# x04 — per-document quality + language profile in ONE narrow pass:
# length/stopword/alpha/distinct ratios, Gopher-style duplicate-n-gram
# repetition fractions, LLM token budgets (whitespace + BPE-style
# estimate, consolidating former x23_token_budget), and the stopword-
# profile language-ID argmax + per-language hit counts (consolidating
# former x05_language_id in round 6 — same per-document narrow-scan
# shape, freeing a driver-window slot for x36). Pure per-row
# expressions, no shuffle at all — at 100 TB this is the cheapest
# possible shape: every quality/budget/language signal computed in the
# same scan.
# --------------------------------------------------------------------------
def _x04_oracle() -> str:
    hits = {
        lang: f"len(list_filter(tok, t -> list_contains({list(words)!r}, t)))"
        for lang, words in LANG_PROFILES.items()
    }
    best = "greatest({})".format(", ".join(hits.values()))
    whens = " ".join(
        f"WHEN {hits[lang]} > 0 AND {hits[lang]} = best THEN '{lang}'"
        for lang in LANG_PROFILES
    )
    lang_cols = ",\n           ".join(
        f"CAST({expr} AS BIGINT) AS {lang}_hits" for lang, expr in hits.items()
    )
    return rf"""
    SELECT doc_id,
           CAST(len(tok) AS BIGINT)                              AS n_tokens,
           round(CASE WHEN len(tok) > 0
                 THEN len(list_filter(tok, t -> list_contains({list(STOPWORDS)!r}, t)))::DOUBLE
                      / len(tok) ELSE 0 END, 6)                  AS stopword_ratio,
           round(CASE WHEN length(lower(text)) > 0
                 THEN length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                      / length(lower(text)) ELSE 0 END, 6)       AS alpha_ratio,
           round(CASE WHEN len(tok) > 0
                 THEN len(list_distinct(tok))::DOUBLE / len(tok) ELSE 0 END, 6)
                                                                 AS distinct_ratio,
           round(CASE WHEN len(g2) > 0
                 THEN (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2)
                 ELSE 0 END, 6)                                  AS dup_2gram_frac,
           round(CASE WHEN len(g3) > 0
                 THEN (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3)
                 ELSE 0 END, 6)                                  AS dup_3gram_frac,
           CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w != ''))
                AS BIGINT)                                       AS n_ws_tokens,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                + coalesce(list_sum(list_transform(
                    list_filter(list_transform(
                      string_split_regex(text, '\s+'),
                      w -> regexp_replace(w, '[^a-zA-Z0-9]', '', 'g')),
                      w -> w != ''),
                    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
                AS BIGINT)                                       AS est_bpe_tokens,
           CASE {whens} ELSE 'und' END                           AS lang_guess,
           {lang_cols}
    FROM (SELECT doc_id, text, tok, g2, g3, {best} AS best
          FROM (SELECT doc_id, text, tok,
                       [array_to_string(tok[i:i+1], ' ') for i in range(1, len(tok))]     AS g2,
                       [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok) - 1)] AS g3
                FROM (SELECT doc_id, text, {_SQL_TOKENS} AS tok FROM documents)))
    ORDER BY doc_id
    """


@register(
    "x04_text_quality",
    oracle=_x04_oracle(),
    doc="quality + language profile: stopword/alpha/distinct + dup-n-gram "
        "repetition + whitespace/BPE token budgets + language-ID argmax "
        "with per-language hit counts, one narrow scan",
)
def x04_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import bpe_token_estimate, dup_ngram_frac, whitespace_tokens

    d = _t(spark, sf_dir, "documents")
    tok = tokens("text")
    n_tok = F.size(tok)
    stop_n = F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS)))
    uniq_n = F.size(F.array_distinct(tok))
    ratio = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))  # noqa: E731
    scores = lang_scores(tok)
    return d.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(ratio(stop_n, n_tok), 6).alias("stopword_ratio"),
        F.round(alpha_ratio("text"), 6).alias("alpha_ratio"),
        F.round(ratio(uniq_n, n_tok), 6).alias("distinct_ratio"),
        F.round(dup_ngram_frac(tok, 2), 6).alias("dup_2gram_frac"),
        F.round(dup_ngram_frac(tok, 3), 6).alias("dup_3gram_frac"),
        F.size(whitespace_tokens("text")).cast("bigint").alias("n_ws_tokens"),
        bpe_token_estimate("text").alias("est_bpe_tokens"),
        lang_guess(tok).alias("lang_guess"),
        *[scores[lang].cast("bigint").alias(f"{lang}_hits") for lang in LANG_PROFILES],
    )


# --------------------------------------------------------------------------
# x06 — document fingerprinting, all three algorithms union-tagged
# (consolidates former x15_rolling_fingerprint and, since round 8, former
# x08_simhash — SimHash IS a fingerprint; folding it here freed the
# driver-window slot x51 now holds): md5 of normalized text (near-exact
# dup detection via normalization), the Rabin-Karp polynomial rolling
# hash — a char fold any engine reproduces, proven by the DuckDB twin
# computing the identical fold — and the Charikar SimHash in its
# portable-hash variant (30 usable bits over the same Rabin-Karp token
# hash, so the oracle rebuilds the construction bit-for-bit; production
# default stays 64-bit xxhash64, pinned in pytest). Each branch is one
# narrow scan + one groupBy shuffle; the union is append-only.
# --------------------------------------------------------------------------
_SIMHASH_BITS = 30

#: Per-token Rabin-Karp hash, identical to functions.text.rolling_hash.
_SQL_TOKEN_RK = (
    "list_reduce([CAST(0 AS BIGINT)] || "
    "list_transform(list_filter(regexp_split_to_array(t, ''), c -> c <> ''), "
    "c -> CAST(ascii(c) AS BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007)"
)


def _sql_simhash(bits: int) -> str:
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    sig = " + ".join(f"CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END" for j in range(bits))
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS t FROM documents),
    h AS (SELECT doc_id, {_SQL_TOKEN_RK} AS h FROM tok),
    votes AS (SELECT doc_id,
           {votes}
           FROM h GROUP BY doc_id)
    SELECT doc_id, {sig} AS simhash
    FROM votes
    """


# (UNREGISTERED since round 11 — consolidated into x07's union-tagged
# fingerprint branches, freeing its oracle slot for x55_dsir_select.
# The function stays: x07's registered form and the pytest fingerprint
# tests call it, the x22/w10 precedent.)
def x06_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")

    def groups(fps: DataFrame, algo: str) -> DataFrame:
        return (
            fps.groupBy("fp")
            .agg(
                F.count("*").alias("n_docs"),
                F.min("doc_id").alias("first_doc"),
                F.max("doc_id").alias("last_doc"),
            )
            .select(F.lit(algo).alias("algo"), "fp", "n_docs", "first_doc", "last_doc")
        )

    per_row = lambda fp_col: d.select(  # noqa: E731
        fp_col.cast("string").alias("fp"), "doc_id"
    )
    sim = simhash_table(d, bits=_SIMHASH_BITS, token_hash=rolling_hash).select(
        F.col("simhash").cast("string").alias("fp"), "doc_id"
    )
    return (
        groups(per_row(fingerprint("text")), "md5_norm")
        .unionByName(groups(per_row(rolling_hash("text")), "rabin_karp"))
        .unionByName(groups(sim, "simhash"))
    )


# --------------------------------------------------------------------------
# x07 — near-dup dedup family, union-tagged since round 11 (absorbs former
# x06_fingerprints, freeing its oracle slot for x55_dsir_select):
# 'pairs' = MinHash-LSH candidates + exact-Jaccard verify (the oracle
# computes exact Jaccard over pairs sharing >= 1 shingle — feasible at
# sf0.01 oracle scale; results agree because verification filters both
# down to true >= threshold pairs), and the three fingerprint branches
# (md5_norm / rabin_karp / simhash) grouped as dup classes. Shared
# schema: branch, fp (NULL on pairs), a/b = (doc_a, doc_b) or
# (first_doc, last_doc), v = jaccard or n_docs.
# --------------------------------------------------------------------------
@register(
    "x07_minhash_neardup",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS tok FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES3} AS sh FROM tok),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id)
    SELECT 'pairs' AS branch, CAST(NULL AS VARCHAR) AS fp,
           doc_a AS a, doc_b AS b,
           round(len(list_intersect(x.sh, y.sh))::DOUBLE
                 / len(list_distinct(x.sh || y.sh)), 6) AS v
    FROM cand
    JOIN sh x ON x.doc_id = doc_a
    JOIN sh y ON y.doc_id = doc_b
    WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE
          / len(list_distinct(x.sh || y.sh)), 6) >= 0.8
    UNION ALL
    SELECT 'md5_norm' AS branch,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS a, max(doc_id) AS b, CAST(count(*) AS DOUBLE) AS v
    FROM documents
    GROUP BY 2
    UNION ALL
    SELECT 'rabin_karp' AS branch, CAST(fp AS VARCHAR) AS fp,
           min(doc_id) AS a, max(doc_id) AS b, CAST(count(*) AS DOUBLE) AS v
    FROM (
      SELECT doc_id,
             list_reduce(
               [CAST(0 AS BIGINT)] ||
               list_transform(list_filter(regexp_split_to_array(text, ''),
                                          c -> c <> ''),
                              c -> CAST(ascii(c) AS BIGINT)),
               (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
      FROM documents)
    GROUP BY 2
    UNION ALL
    SELECT 'simhash' AS branch, CAST(simhash AS VARCHAR) AS fp,
           min(doc_id) AS a, max(doc_id) AS b, CAST(count(*) AS DOUBLE) AS v
    FROM ({_sql_simhash(_SIMHASH_BITS)})
    GROUP BY 2
    ORDER BY branch, fp, a, b
    """,
    doc="near-dup dedup family, union-tagged: MinHash-LSH banded candidates "
    "+ exact-Jaccard verify ('pairs') and md5-norm/Rabin-Karp/SimHash "
    "fingerprint dup classes (former x06, folded round 11)",
)
def x07_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    pairs = near_dup_pairs(d, threshold=0.8).select(
        F.lit("pairs").alias("branch"),
        F.lit(None).cast("string").alias("fp"),
        F.col("doc_a").alias("a"),
        F.col("doc_b").alias("b"),
        F.col("jaccard").alias("v"),
    )
    fps = x06_fingerprints(spark, sf_dir).select(
        F.col("algo").alias("branch"),
        "fp",
        F.col("first_doc").alias("a"),
        F.col("last_doc").alias("b"),
        F.col("n_docs").cast("double").alias("v"),
    )
    return pairs.unionByName(fps)


# (x08_simhash was consolidated into x06_fingerprints' union-tagged
# 'simhash' branch in round 8 — same operator call, same portable-hash
# oracle construction, now grouped like the other fingerprint algos.
# The 64-bit xxhash64 production variant stays pinned in pytest. The
# former x09_ngram_jaccard_probe's exact-Jaccard kernel is exercised
# (and oracle-checked) as x07's verification stage. Freed a driver-
# window slot for x51_duplicated_spans.)


# --------------------------------------------------------------------------
# x10 — exact embedding similarity, union-tagged (round 11: former
# x12_embedding_neardup_blocked consolidated into the 'neardup' branch to
# free its oracle slot for x49 — x10 timing not comparable to rounds
# <= 10):
#   'topk'   : brute-force cosine top-k baseline — corpus scanned once
#              against a broadcast probe set, per-query top-k window;
#              key = query_id, id_a = candidate id, rank populated.
#   'neardup': embedding near-dup pairs blocked by the label column (the
#              IVF-cell / blocking pattern: pairs only within a bucket);
#              key = label, (id_a, id_b) = the pair, rank NULL.
#              Threshold 0.35: the fixture embeddings are isotropic
#              gaussians, so a production-style 0.5+ cut yields ZERO
#              pairs at sf0.01 and the driver check proves nothing about
#              the GEMM kernel; 0.35 sits ~4 sigma above the null cosine
#              spread (sd ~ 1/sqrt(dim)) and produces a small,
#              discriminating pair set that exercises scoring, rounding,
#              and the threshold boundary.
#   'int8'   : former x53_int8_topk, folded round 14 to free its oracle
#              slot for w09 — the int8-quantized serving path over the
#              SAME two-level top-k plan and tie rule (key = query_id,
#              id_a = candidate id, rank populated, id_b NULL); the
#              oracle replays quantization, integer dot, and rescale
#              (see the x53 block below for the arithmetic notes).
# --------------------------------------------------------------------------
@register(
    "x10_embedding_topk",
    oracle="""
    WITH s AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) AS score
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
    q8 AS (
      SELECT vec_id AS id, scale,
             CASE WHEN scale = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x -> CAST(round(x / scale) AS BIGINT))
             END AS q
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
                   list_max(list_transform(embedding::DOUBLE[],
                                           x -> abs(x))) / 127.0 AS scale
            FROM embeddings
            WHERE embedding IS NOT NULL)),
    n8 AS (
      SELECT id, scale, q,
             CASE WHEN sqrt(list_sum(list_transform(
                      q, x -> (x * scale) * (x * scale)))) = 0
                  THEN 1.0
                  ELSE sqrt(list_sum(list_transform(
                      q, x -> (x * scale) * (x * scale))))
             END AS nrm
      FROM q8),
    s8 AS (
      SELECT p.id AS query_id, c.id AS cand_id,
             round((list_dot_product(c.q, p.q) * (c.scale / c.nrm))
                   * (p.scale / p.nrm), 6) AS score
      FROM n8 p JOIN n8 c ON p.id < 5 AND c.id <> p.id)
    SELECT 'topk' AS branch, query_id AS key, cand_id AS id_a,
           CAST(NULL AS BIGINT) AS id_b, score, rank
    FROM (SELECT *, CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score DESC, cand_id) AS BIGINT) AS rank
          FROM s)
    WHERE rank <= 10
    UNION ALL
    SELECT 'neardup' AS branch, CAST(a.label AS BIGINT) AS key,
           a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS score,
           CAST(NULL AS BIGINT) AS rank
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.35
    UNION ALL
    SELECT 'int8' AS branch, query_id AS key, cand_id AS id_a,
           CAST(NULL AS BIGINT) AS id_b, score, rank
    FROM (SELECT *, CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score DESC, cand_id) AS BIGINT) AS rank
          FROM s8)
    WHERE rank <= 10
    ORDER BY branch, key, rank, id_a, id_b
    """,
    doc="exact embedding similarity, union-tagged: brute-force cosine "
    "top-k over a broadcast probe set ('topk') + label-blocked cosine "
    "near-dup pair generation ('neardup') + int8-quantized top-k "
    "('int8', former x53, folded round 14)",
)
def x10_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import quantize_embeddings, topk_bruteforce_int8

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    topk = topk_bruteforce(e, queries, k=10).select(
        F.lit("topk").alias("branch"),
        F.col("query_id").alias("key"),
        F.col("cand_id").alias("id_a"),
        F.lit(None).cast("bigint").alias("id_b"),
        "score",
        "rank",
    )
    nd = near_dup_within_label(e, threshold=0.35).select(
        F.lit("neardup").alias("branch"),
        F.col("label").cast("bigint").alias("key"),
        "id_a",
        "id_b",
        F.col("cos_sim").alias("score"),
        F.lit(None).cast("bigint").alias("rank"),
    )
    q8 = quantize_embeddings(e).localCheckpoint()
    int8 = topk_bruteforce_int8(q8, q8.filter(F.col("id") < 5), k=10).select(
        F.lit("int8").alias("branch"),
        F.col("query_id").alias("key"),
        F.col("cand_id").alias("id_a"),
        F.lit(None).cast("bigint").alias("id_b"),
        "score",
        "rank",
    )
    return topk.unionByName(nd).unionByName(int8)


# --------------------------------------------------------------------------
# x11 — approximate ANN top-k via hyperplane LSH bucketing + exact rerank.
# Approximate recall => no SQL oracle; rows-only here, recall floor pinned
# in tests/test_extensions.py against x10.
# --------------------------------------------------------------------------
@register(
    "x11_ann_lsh_topk",
    oracle=None,
    doc="LSH-bucketed approximate top-k (rows-only; recall pytest vs x10)",
)
def x11_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return topk_lsh(e, queries, k=10)


# --------------------------------------------------------------------------
# x16 — IVF ANN: k-means inverted file + nprobe search + exact rerank
# (the second canonical ANN scale path next to x11's LSH). Approximate
# recall => rows-only; recall floor pinned in tests/test_extensions.py.
# --------------------------------------------------------------------------
@register(
    "x16_ann_ivf_topk",
    oracle=None,
    doc="IVF (k-means cells, nprobe probe) approximate top-k (rows-only; recall pytest)",
)
def x16_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return topk_ivf(e, queries, k=10)


# (x12_embedding_neardup_blocked was consolidated into x10's union-tagged
# 'neardup' branch in round 11 — same near_dup_within_label call, same
# list_cosine_similarity oracle construction. The standalone function
# stays for stress.py's scale rows; the freed driver-window slot
# oracle-checks x49_semantic_decontaminate.)
def x12_embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return near_dup_within_label(e, threshold=0.35).select("label", "id_a", "id_b", "cos_sim")


# --------------------------------------------------------------------------
# x13 — multimodal media frame, union-tagged (round 9: former
# x17_frame_sample consolidated into the 'frames' branch to free its
# oracle slot for x50 — x13 timing not comparable to rounds <= 8):
#   'stats' : binary payload + typed metadata grouped stats proving
#             checksum/byte plumbing end-to-end, plus (former
#             x18_media_resize) the stubbed resize stage through the
#             real Arrow mapInPandas path with its size invariants
#             (fixed 16x16-byte output, kept-byte totals); key =
#             media_type.
#   'frames': video frame-sampling fan-out (1 row -> N 256-byte frame
#             chunks inside mapInPandas); key = media_id as string, and
#             the generic columns remap: n_items := n_frames,
#             total_bytes := total frame bytes, min_bytes := last (tail)
#             frame bytes; the resize/checksum columns are NULL.
#   'features' (round 13 — former x14_media_features folded in, making
#             the Arrow decode-stub stage oracle-checked; x14 stays an
#             unregistered function): per-media-type census of the REAL
#             mapInPandas feature stage — n_distinct_payloads :=
#             distinct feat_head (first 4 payload bytes, big-endian),
#             min/max_bytes := min/max feat_head, kept_bytes := the
#             summed PAYLOAD BYTE VALUES, reconstructed exactly from the
#             stage's 6-dp feat_mean (|round(mean,6)*len − sum| ≤
#             5e-7·len < 0.5 — an exact integer round-trip). DuckDB
#             rebuilds both from hex(encode(text)) strpos arithmetic,
#             the x46 construction.
# --------------------------------------------------------------------------
_HEXB = (
    "(strpos('0123456789ABCDEF', substr(h, 2*{j} + 1, 1)) - 1) * 16 + "
    "(strpos('0123456789ABCDEF', substr(h, 2*{j} + 2, 1)) - 1)"
)

@register(
    "x13_media_stats",
    oracle=f"""
    WITH m AS (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END       AS media_type,
             doc_id,
             octet_length(encode(text))::BIGINT     AS n_bytes,
             sha256(text)                           AS checksum,
             upper(hex(encode(text)))               AS h
      FROM documents)
    SELECT 'stats' AS branch, media_type AS key,
           count(*)                     AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           count(DISTINCT checksum)     AS n_distinct_payloads,
           min(n_bytes)                 AS min_bytes,
           max(n_bytes)                 AS max_bytes,
           CAST(min(256) AS BIGINT)     AS min_resized,
           CAST(max(256) AS BIGINT)     AS max_resized,
           CAST(sum(least(n_bytes, 256)) AS BIGINT) AS kept_bytes
    FROM m
    GROUP BY media_type
    UNION ALL
    SELECT 'frames', CAST(doc_id AS VARCHAR),
           CAST(ceil(n_bytes / 256.0) AS BIGINT),
           n_bytes,
           CAST(NULL AS BIGINT),
           CAST(n_bytes - 256 * (ceil(n_bytes / 256.0) - 1) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM m
    WHERE doc_id % 3 = 2 AND n_bytes > 0
    UNION ALL
    SELECT 'features', media_type,
           count(*),
           CAST(sum(n_bytes) AS BIGINT),
           count(DISTINCT feat_head),
           min(feat_head),
           max(feat_head),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(sum(byte_sum) AS BIGINT)
    FROM (
      SELECT media_type,
             n_bytes,
             CASE WHEN n_bytes >= 4 THEN
               ({_HEXB.format(j=0)}) * 16777216 + ({_HEXB.format(j=1)}) * 65536
               + ({_HEXB.format(j=2)}) * 256 + ({_HEXB.format(j=3)})
             ELSE 0 END AS feat_head,
             CASE WHEN n_bytes = 0 THEN 0 ELSE
               list_sum(list_transform(range(0, n_bytes),
                 j -> (strpos('0123456789ABCDEF', substr(h, 2*j + 1, 1)) - 1)
                      * 16
                      + (strpos('0123456789ABCDEF', substr(h, 2*j + 2, 1)) - 1)
               ))
             END AS byte_sum
      FROM m)
    GROUP BY media_type
    ORDER BY branch, key
    """,
    doc="multimodal, union-tagged: payload/checksum metadata stats + "
    "resize-stub size invariants through the Arrow batch path ('stats'), "
    "the 256B frame-sampling fan-out census ('frames'), and the Arrow "
    "decode-stub feature census ('features' — former x14, byte sums and "
    "head ints replayed from hex arithmetic)",
)
def x13_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_media, sample_frames

    m = media_frame(_t(spark, sf_dir, "documents"))
    # kept_bytes depends only on the media frame, so it rides the stats
    # aggregate; the resize output carries media_type itself — no join
    # back to the payload-bearing frame needed.
    stats = m.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("checksum").alias("n_distinct_payloads"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.sum(F.least(F.col("n_bytes"), F.lit(256))).alias("kept_bytes"),
    )
    resized = (
        resize_media(m, width=16, height=16)
        .groupBy("media_type")
        .agg(
            F.min("n_bytes_out").alias("min_resized"),
            F.max("n_bytes_out").alias("max_resized"),
        )
    )
    nul = F.lit(None).cast("long")
    stats_rows = stats.join(resized, "media_type").select(
        F.lit("stats").alias("branch"),
        F.col("media_type").alias("key"),
        "n_items",
        "total_bytes",
        "n_distinct_payloads",
        "min_bytes",
        "max_bytes",
        "min_resized",
        "max_resized",
        "kept_bytes",
    )
    frame_rows = (
        sample_frames(m.filter(F.col("media_type") == "video"), frame_size=256)
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("frame_bytes").alias("total_bytes"),
            F.min("frame_bytes").alias("min_bytes"),
        )
        .select(
            F.lit("frames").alias("branch"),
            F.col("media_id").cast("string").alias("key"),
            "n_items",
            "total_bytes",
            nul.alias("n_distinct_payloads"),
            "min_bytes",
            nul.alias("max_bytes"),
            nul.alias("min_resized"),
            nul.alias("max_resized"),
            nul.alias("kept_bytes"),
        )
    )
    # 'features' (former x14): the REAL mapInPandas stub stage runs;
    # the per-row byte SUM reconstructs exactly from its 6-dp mean
    # (error ≤ 5e-7·len < 0.5 — see the oracle note)
    from ..operators.multimodal import extract_features

    feature_rows = (
        extract_features(m)
        .withColumn(
            "byte_sum",
            F.round(F.col("feat_mean") * F.col("n_bytes")).cast("long"),
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("feat_head").alias("n_distinct_payloads"),
            F.min("feat_head").alias("min_bytes"),
            F.max("feat_head").alias("max_bytes"),
            F.sum("byte_sum").alias("kept_bytes"),
        )
        .select(
            F.lit("features").alias("branch"),
            F.col("media_type").alias("key"),
            "n_items",
            "total_bytes",
            "n_distinct_payloads",
            "min_bytes",
            "max_bytes",
            nul.alias("min_resized"),
            nul.alias("max_resized"),
            "kept_bytes",
        )
    )
    return (
        stats_rows.unionByName(frame_rows)
        .unionByName(feature_rows)
        .orderBy("branch", "key")
    )


# --------------------------------------------------------------------------
# x14 — Arrow-batched media feature extraction (the stubbed decode stage).
# Round 13: CONSOLIDATED into x13's 'features' branch (byte-sum/head-int
# census oracle-replayed from hex arithmetic) — the per-row stage is now
# oracle-checked through x13; this function stays UNREGISTERED for the
# exact-value pytest twins.
# --------------------------------------------------------------------------
def x14_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_frame(_t(spark, sf_dir, "documents"))
    return extract_features(m)

# --------------------------------------------------------------------------
# x19 — TEMPORAL JOINS, union-tagged (round 9: former x20_interval_join
# consolidated here to free its oracle slot for x34 — the established
# window protocol; timings not comparable to rounds <= 8).
#   'asof'    : each purchase gets the user's most recent view at-or-
#               before it (point-in-time lookup) — Spark is the union-
#               window asof operator (one shuffle, no range explosion),
#               the oracle is DuckDB's native ASOF LEFT JOIN: two
#               independent formulations of the semantics.
#   'interval': clicks within 10 minutes AFTER each purchase, per user —
#               Spark is the bucketed equi-join operator (time buckets as
#               join key, exact integer-microsecond filter on the ~2x
#               candidate set), the oracle a plain inequality join.
# Shared shape: generic value columns per branch (k1/k2 bigint, t1/t2
# string, v double) — the per-branch meaning is documented inline.
# --------------------------------------------------------------------------
@register(
    "x19_temporal_joins",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view')
      WHERE rn = 1),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT 'asof' AS branch, p.event_id,
           p.user_id                              AS k1,
           v.event_id                             AS k2,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS t1,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS t2,
           round(v.value, 2)                      AS v
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    UNION ALL
    SELECT 'interval' AS branch, p.event_id,
           count(c.event_id)                                    AS k1,
           CAST(min(epoch_us(c.ts) - epoch_us(p.ts)) AS BIGINT) AS k2,
           NULL AS t1, NULL AS t2, NULL AS v
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTES
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    UNION ALL
    SELECT 'resample_' || m.mode AS branch,
           rf.bucket   AS event_id,
           rf.n_rows   AS k1,
           CASE WHEN rf.n_rows = 0 THEN 1 ELSE 0 END AS k2,
           rf.event_type AS t1,
           NULL AS t2,
           round(CASE WHEN m.mode = 'locf' THEN rf.pv
                      WHEN rf.val IS NOT NULL THEN rf.val
                      WHEN rf.pv IS NOT NULL AND rf.nv IS NOT NULL
                      THEN rf.pv + (rf.nv - rf.pv)
                           * (rf.bucket - rf.pb) / (rf.nb - rf.pb)
                 END, 6) AS v
    FROM (
      WITH rs AS (SELECT event_type,
                         CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                           AS bucket,
                         value
                  FROM events WHERE event_id % 97 = 0),
      ra AS (SELECT event_type, bucket, count(*) AS n_rows, avg(value) AS val
             FROM rs GROUP BY 1, 2),
      rspan AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
                FROM ra GROUP BY 1),
      rgrid AS (SELECT event_type,
                       unnest(generate_series(lo, hi, 21600)) AS bucket
                FROM rspan),
      rg AS (SELECT g.event_type, g.bucket,
                    coalesce(a.n_rows, 0) AS n_rows, a.val
             FROM rgrid g LEFT JOIN ra a USING (event_type, bucket))
      SELECT *,
             last_value(val IGNORE NULLS) OVER w AS pv,
             last_value(CASE WHEN val IS NOT NULL THEN bucket END
                        IGNORE NULLS) OVER w AS pb,
             first_value(val IGNORE NULLS) OVER w2 AS nv,
             first_value(CASE WHEN val IS NOT NULL THEN bucket END
                         IGNORE NULLS) OVER w2 AS nb
      FROM rg
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ) rf
    CROSS JOIN (SELECT unnest(['locf', 'linear']) AS mode) m
    UNION ALL
    SELECT 'funnel' AS branch, f.step AS event_id, f.n AS k1,
           CAST(f.p90 AS BIGINT) AS k2,
           f.nm AS t1, NULL AS t2, f.med AS v
    FROM (
      WITH fev AS (SELECT user_id, epoch_us(ts) AS us, event_type AS t
                   FROM events
                   WHERE event_type IN ('view', 'click', 'purchase')
                     AND user_id IS NOT NULL AND ts IS NOT NULL),
      f1 AS (SELECT user_id, min(us) AS t1 FROM fev WHERE t = 'view'
             GROUP BY 1),
      f2 AS (SELECT e.user_id, min(e.us) AS t2 FROM fev e
             JOIN f1 USING (user_id)
             WHERE e.t = 'click' AND e.us > f1.t1
               AND e.us - f1.t1 <= 3600000000 GROUP BY 1),
      f3 AS (SELECT e.user_id, min(e.us) AS t3 FROM fev e
             JOIN f2 USING (user_id)
             WHERE e.t = 'purchase' AND e.us > f2.t2
               AND e.us - f2.t2 <= 3600000000 GROUP BY 1),
      -- integer-micro order statistics (no interpolation, no decimal
      -- rounding): median = mean of the two middle elements (dyadic),
      -- p90 = the ceil(0.9*N)-th smallest (quantile_disc definition)
      d2 AS (SELECT (f2.t2 - f1.t1) AS dt,
                    row_number() OVER (ORDER BY (f2.t2 - f1.t1)) AS rn,
                    count(*) OVER () AS n
             FROM f2 JOIN f1 USING (user_id)),
      d3 AS (SELECT (f3.t3 - f2.t2) AS dt,
                    row_number() OVER (ORDER BY (f3.t3 - f2.t2)) AS rn,
                    count(*) OVER () AS n
             FROM f3 JOIN f2 USING (user_id))
      SELECT 1 AS step, 'view' AS nm, (SELECT count(*) FROM f1) AS n,
             NULL AS med, NULL AS p90
      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM f2),
        (SELECT (sum(CASE WHEN rn = (n + 1) // 2 THEN dt END)
                 + sum(CASE WHEN rn = n // 2 + 1 THEN dt END)) / 2.0
         FROM d2),
        (SELECT sum(CASE WHEN rn = (9 * n + 9) // 10 THEN dt END) FROM d2)
      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM f3),
        (SELECT (sum(CASE WHEN rn = (n + 1) // 2 THEN dt END)
                 + sum(CASE WHEN rn = n // 2 + 1 THEN dt END)) / 2.0
         FROM d3),
        (SELECT sum(CASE WHEN rn = (9 * n + 9) // 10 THEN dt END) FROM d3)
    ) f
    UNION ALL
    SELECT 'retention' AS branch, r.cohort_p AS event_id, r.n AS k1,
           r.off AS k2, NULL AS t1, NULL AS t2, NULL AS v
    FROM (
      WITH ract AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 604800000000 AS p
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      rc AS (SELECT user_id, min(p) AS cohort_p FROM ract GROUP BY 1)
      SELECT rc.cohort_p, ract.p - rc.cohort_p AS off, count(*) AS n
      FROM ract JOIN rc USING (user_id) GROUP BY 1, 2
    ) r
    ORDER BY branch, event_id
    """,
    doc="temporal operators, union-tagged: as-of (union-window "
    "single-shuffle vs native ASOF JOIN) + 10-min interval join "
    "(bucketed equi-join vs theta join) + hypertable resample/gap-fill "
    "(6 h grid over a sparse event slice, locf AND linear branches — "
    "round 11) + first-conversion funnel (view->click->purchase within "
    "1 h, one-shuffle Catalyst fold vs sequential-min SQL recurrence) + "
    "weekly cohort retention matrix (two key-shuffles, epoch-aligned "
    "periods)",
)
def x19_temporal_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.asof import asof_join
    from ..operators.ranges import interval_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )

    # --- 'asof' branch: k1=user_id, k2=asof_event_id, t1/t2 formatted
    # purchase/view instants, v=matched view's value
    dedup_w = W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    joined = asof_join(
        purchases, views, key="user_id", left_time="ts", right_time="ts",
        right_cols=["ts", "event_id", "value"],
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    asof = joined.select(
        F.lit("asof").alias("branch"),
        "event_id",
        F.col("user_id").alias("k1"),
        F.col("asof_event_id").alias("k2"),
        F.date_format("ts", fmt).alias("t1"),
        F.date_format("asof_ts", fmt).alias("t2"),
        F.round("asof_value", 2).alias("v"),
    )

    # --- 'interval' branch: k1=n follow-up clicks, k2=min gap (µs)
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    pairs = interval_join(
        purchases, clicks, key="user_id", left_time="ts", right_time="ts",
        min_delta_us=0, max_delta_us=600_000_000,
    )
    per_purchase = pairs.groupBy("event_id").agg(
        F.count("*").alias("n_clicks"), F.min("gap_us").alias("min_gap_us")
    )
    interval = purchases.join(per_purchase, "event_id", "left").select(
        F.lit("interval").alias("branch"),
        "event_id",
        F.coalesce("n_clicks", F.lit(0)).alias("k1"),
        F.col("min_gap_us").alias("k2"),
        F.lit(None).cast("string").alias("t1"),
        F.lit(None).cast("string").alias("t2"),
        F.lit(None).cast("double").alias("v"),
    )

    # --- 'resample_*' branches (round 11): hypertable gap-fill — a
    # sparse slice (event_id % 97) resampled onto a 6 h grid per
    # event_type, once with locf and once with linear interpolation.
    # event_id := bucket epoch seconds, k1 := observations in bucket,
    # k2 := gap-filled flag, t1 := the series key, v := filled value.
    from ..operators.timeseries import resample

    src = e.filter(F.col("event_id") % 97 == 0).select(
        "event_type", "ts", "value"
    )
    branches = [asof, interval]
    for mode in ("locf", "linear"):
        r = resample(
            src, "ts", 21600, "value", ["event_type"], agg="avg", fill=mode
        )
        branches.append(
            r.select(
                F.lit(f"resample_{mode}").alias("branch"),
                F.col("bucket").alias("event_id"),
                F.col("n_rows").cast("long").alias("k1"),
                F.col("filled").cast("long").alias("k2"),
                F.col("event_type").alias("t1"),
                F.lit(None).cast("string").alias("t2"),
                # 6 dp, NOT the family's usual 2: bucket averages of
                # 2-decimal values land EXACTLY on .xx5 half the time
                # (sum of two 2-decimal values / 2), and the engines'
                # double-rounding algorithms disagree precisely on those
                # boundary values — at 6 dp the boundary is no longer
                # structural (the x49/x53 convention)
                F.round("value", 6).alias("v"),
            )
        )
    # --- 'funnel' branch (round 11): first-conversion funnel
    # view -> click -> purchase, each step within 1 h of the previous —
    # one shuffle + a Catalyst aggregate() fold per user; the oracle
    # restates it as the sequential-min SQL recurrence.
    from ..operators.funnel import funnel_counts

    fc = funnel_counts(
        e, ["view", "click", "purchase"], within_s=3600
    )
    branches.append(
        # round 12: time-to-convert rides the same fold — v := exact
        # median MICROS since the previous step (order statistics, a
        # dyadic double), k2 := the discrete p90 in integer micros
        # (both NULL on step 1, which has no previous step)
        fc.select(
            F.lit("funnel").alias("branch"),
            F.col("step").cast("long").alias("event_id"),
            F.col("n_users").alias("k1"),
            F.col("p90_us").cast("long").alias("k2"),
            F.col("step_name").alias("t1"),
            F.lit(None).cast("string").alias("t2"),
            F.col("median_us").alias("v"),
        )
    )
    # --- 'retention' branch (round 11): weekly cohort retention matrix
    # (users grouped by first-seen period, activity counted per offset)
    from ..operators.retention import cohort_retention

    rt = cohort_retention(e, "user_id", "ts", period_s=7 * 86400)
    branches.append(
        rt.select(
            F.lit("retention").alias("branch"),
            F.col("cohort_period").alias("event_id"),
            F.col("n_users").alias("k1"),
            F.col("offset").alias("k2"),
            F.lit(None).cast("string").alias("t1"),
            F.lit(None).cast("string").alias("t2"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("branch", "event_id")


# --------------------------------------------------------------------------
# x21 — deterministic train/val/test split by content hash: reproducible
# on any cluster/partitioning, duplicate texts can never straddle splits.
# Spark and DuckDB compute the md5 bucket independently; matching split
# populations prove bucket-for-bucket agreement.
# --------------------------------------------------------------------------
@register(
    "x21_split_and_pack",
    oracle=r"""
    WITH t AS (SELECT doc_id, text,
                      CAST(len(list_filter(string_split_regex(text, '\s+'),
                                           w -> w != '')) AS BIGINT) AS tok
               FROM documents)
    SELECT 'split' AS src,
           split   AS bucket,
           CAST(count(*) AS BIGINT)          AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_units,
           min(doc_id)                       AS min_doc,
           max(doc_id)                       AS max_doc
    FROM (
      SELECT doc_id, text,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, text,
                   ('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 AS b
            FROM documents))
    GROUP BY split
    UNION ALL
    SELECT 'pack' AS src,
           lpad(CAST(pack_id AS VARCHAR), 6, '0') AS bucket,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(tok) AS BIGINT)  AS total_units,
           min(doc_id)               AS min_doc,
           max(doc_id)               AS max_doc
    FROM (SELECT doc_id, tok,
                 CAST(floor((sum(tok) OVER (ORDER BY doc_id) - tok) / 2048.0)
                      AS BIGINT) AS pack_id
          FROM t)
    GROUP BY pack_id
    UNION ALL
    SELECT 'chunk' AS src, chunks_md5 AS bucket, n_chunks AS n_docs,
           total_chunk_tokens AS total_units, n_doc_tokens AS min_doc,
           doc_id AS max_doc
    FROM (
      WITH ctok AS (SELECT doc_id,
                           list_filter(regexp_split_to_array(lower(text),
                                       '[^a-z0-9]+'), t -> t <> '') AS tok
                    FROM documents),
      nz AS (SELECT doc_id, tok FROM ctok WHERE len(tok) > 0),
      st AS (SELECT doc_id, len(tok) AS n_doc_tokens, tok,
                    unnest(range(0, len(tok), 12)) AS s
             FROM nz),
      ch AS (SELECT doc_id, n_doc_tokens,
                    CAST(s // 12 AS BIGINT)        AS chunk_id,
                    list_slice(tok, s + 1, s + 16) AS ctoks
             FROM st)
      SELECT doc_id,
             CAST(count(*) AS BIGINT)          AS n_chunks,
             max(n_doc_tokens)                 AS n_doc_tokens,
             CAST(sum(len(ctoks)) AS BIGINT)   AS total_chunk_tokens,
             md5(string_agg(array_to_string(ctoks, ' '), '|' ORDER BY chunk_id))
                                               AS chunks_md5
      FROM ch GROUP BY doc_id)
    ORDER BY src, bucket
    """,
    doc="corpus organization, union-tagged: md5-bucket train/val/test split "
    "(former x21_hash_split) + fixed-2048-token sequence packing via the "
    "two-level distributed prefix sum (operators/packing.py) — the oracle "
    "recomputes packs with a plain global window, proving the scalable scan "
    "exactly matches the single-task formulation — + (round 11, former "
    "x38_doc_chunking) the sliding token-window chunk census: one row per "
    "doc, exact chunk boundaries pinned by the ordered md5 riding `bucket` "
    "(n_docs := n_chunks, total_units := chunk tokens, min_doc := doc "
    "tokens, max_doc := doc_id)",
)
def x21_split_and_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.splits import assign_split
    from ..functions.text import whitespace_tokens
    from ..operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    splits = (
        d.withColumn("split", assign_split("text"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_units"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .select(
            F.lit("split").alias("src"),
            F.col("split").alias("bucket"),
            "n_docs",
            "total_units",
            "min_doc",
            "max_doc",
        )
    )
    toks = d.select(
        "doc_id", F.size(whitespace_tokens("text")).cast("bigint").alias("tok")
    )
    packs = (
        pack_sequences(toks, "doc_id", "tok", pack_len=2048, bucket_size=100)
        .groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("total_units"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .select(
            F.lit("pack").alias("src"),
            F.lpad(F.col("pack_id").cast("string"), 6, "0").alias("bucket"),
            "n_docs",
            "total_units",
            "min_doc",
            "max_doc",
        )
    )
    from ..operators.chunking import chunk_documents

    ordered = F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text")))
    chunks = (
        chunk_documents(d, chunk_tokens=16, overlap=4)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chunk_tokens").alias("total_units"),
            F.max("n_doc_tokens").alias("min_doc"),
            F.md5(
                F.concat_ws("|", F.transform(ordered, lambda r: r.chunk_text))
            ).alias("bucket"),
        )
        .select(
            F.lit("chunk").alias("src"),
            "bucket",
            "n_docs",
            "total_units",
            "min_doc",
            F.col("doc_id").alias("max_doc"),
        )
    )
    return (
        splits.unionByName(packs).unionByName(chunks).orderBy("src", "bucket")
    )


# --------------------------------------------------------------------------
# x22 — materialized rollup (continuous aggregate): raw events fold into
# an hourly rollup table on disk; DAILY answers re-aggregate the rollup,
# never the raw data. UNREGISTERED since round 10: w08 carries this code
# path as its union-tagged 'batch' branch (same oracle — direct
# aggregation of raw events), freeing the oracle slot for w11. The
# function stays callable for stress.py's scale-slope row and any local
# use; the mergeable-aggregate equality is still driver-checked through
# w08 every round.
# --------------------------------------------------------------------------
def x22_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.rollup import materialize_hourly, reaggregate

    e = _t(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="x22_") + "/rollup"
    materialize_hourly(e, path)
    daily = reaggregate(spark.read.parquet(path), "day")
    return (
        daily.select(
            F.date_format("bucket", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
            "min_value",
            "max_value",
            F.expr(
                "CAST(round(round(sum_value, 2) * 100) AS BIGINT) * 100"
                " div n_events"
            ).alias("avg_1e4"),
        )
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# x24 — near-dup CLUSTERS: pairs alone can't dedup a corpus (A~B, B~C
# must collapse to one cluster even when A,C were never compared).
# Spark side: x07's LSH-verified pairs -> iterative min-label-propagation
# connected components. Oracle: the same exact pair set + a RECURSIVE CTE
# computing min reachable id — two independent CC algorithms.
# --------------------------------------------------------------------------
@register(
    "x24_dup_clusters",
    oracle=f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, {_SQL_TOKENS} AS tok FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES3} AS sh FROM tok),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id),
    pairs AS (
      SELECT doc_a, doc_b FROM cand
      JOIN sh x ON x.doc_id = doc_a
      JOIN sh y ON y.doc_id = doc_b
      WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE
            / len(list_distinct(x.sh || y.sh)), 6) >= 0.8),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst),
    comp AS (SELECT node AS doc_id, min(label) AS component
             FROM reach GROUP BY node)
    SELECT component,
           count(*)      AS n_members,
           min(doc_id)   AS min_doc,
           max(doc_id)   AS max_doc
    FROM comp
    GROUP BY component
    ORDER BY component
    """,
    doc="near-dup clusters: LSH pairs -> label-propagation CC vs recursive-CTE oracle",
)
def x24_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = near_dup_pairs(d, threshold=0.8).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.min("node").alias("min_doc"),
            F.max("node").alias("max_doc"),
        )
        .orderBy("component")
    )


# --------------------------------------------------------------------------
# x25 — benchmark decontamination: which TRAIN-split docs share word
# n-grams with any TEST-split doc? (Exact dupes can't straddle the
# content-hash split, but near-dupes can — exactly the leak this catches.)
# Shape: explode shingles on both sides, equi-join on the shingle — a
# key-partitioned shuffle join, never corpus × corpus. At 100 TB the same
# plan holds with longer n-grams (13 is customary, making grams
# near-unique) plus a document-frequency cap that drops stop-phrases
# before the join (skew + noise control).
# --------------------------------------------------------------------------
@register(
    "x25_decontaminate",
    oracle=f"""
    WITH tok AS (SELECT doc_id,
                        {_SQL_TOKENS} AS tok,
                        ('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 AS b
                 FROM documents),
    sh0 AS (SELECT doc_id,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   unnest({_SQL_SHINGLES3}) AS shingle
            FROM tok),
    keep AS (SELECT shingle FROM sh0 GROUP BY shingle
             HAVING count(DISTINCT doc_id) <= {{cap}}),
    sh AS (SELECT sh0.* FROM sh0 SEMI JOIN keep ON sh0.shingle = keep.shingle)
    SELECT t.doc_id                     AS train_doc,
           count(DISTINCT t.shingle)    AS n_shared_shingles,
           count(DISTINCT te.doc_id)    AS n_test_docs
    FROM (SELECT * FROM sh WHERE split = 'train') t
    JOIN (SELECT * FROM sh WHERE split = 'test') te
      ON t.shingle = te.shingle
    GROUP BY t.doc_id
    ORDER BY train_doc
    """.replace("{cap}", "60"),
    doc="n-gram decontamination with the stop-phrase df cap: train docs "
    "sharing (non-stop-phrase) shingles with the test split",
)
def x25_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.splits import assign_split
    from ..operators.dedup import cross_split_overlap

    # CAPPED since round 6 — the registered call is the one a user copies,
    # so it carries the measured quadratic-blowup guard (uncapped: 3.2x
    # wall at 10x replicated data; capped: ~1.1x — stress.py). The oracle
    # recomputes the identical df-census cap in DuckDB. df_cap=60 keeps
    # every fixture shingle (max df ~= 5 at sf0.01) while dropping
    # stop-phrases under content replication.
    return cross_split_overlap(
        _t(spark, sf_dir, "documents"), assign_split("text"), max_shingle_df=60
    )


# (x26_boilerplate_lines was consolidated into x28_curation_chain's
# union-tagged 'boilerplate' branch in round 6 — its per-doc line census
# + byte-exact cleaned_md5 oracle now rides the chain query, whose
# recursive-CTE oracle already contained the identical seg/boiler CTEs.
# Freed a driver-window slot for x43.)


# --------------------------------------------------------------------------
# x27 — PII scrubbing: typed redaction (email/phone/IPv4 -> placeholder
# tokens) + per-kind counts. The word-soup fixture contains no PII, so the
# query first injects deterministic synthetic PII derived from doc_id
# (email on even ids, phone on ids % 3, an IP always) and then runs the
# real scrub; the oracle rebuilds the identical corpus and applies the
# IDENTICAL pattern text (PII_PATTERNS is written in the Java-regex/RE2
# shared dialect). redacted_md5 proves byte-exact replacement. Chained
# regexp_replace is per-row and codegen'd — at 100 TB the scrub rides the
# same scan as every other per-document signal, zero extra shuffles.
# --------------------------------------------------------------------------
def _x27_oracle() -> str:
    from ..functions.text import PII_PATTERNS

    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    return f"""
    WITH pii AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 2 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 3 = 0
                     THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                          || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END
             || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
             || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
             || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{pats["email"]}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{pats["phone"]}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{pats["ipv4"]}')) AS BIGINT)  AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{pats["email"]}', '<EMAIL>', 'g'),
               '{pats["phone"]}', '<PHONE>', 'g'),
               '{pats["ipv4"]}', '<IP>', 'g'))                           AS redacted_md5
    FROM pii
    ORDER BY doc_id
    """


@register(
    "x27_pii_redact",
    oracle=_x27_oracle(),
    doc="typed PII redaction (email/phone/IP) + counts, byte-exact vs oracle",
)
def x27_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import pii_counts, redact_pii

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(
            did % 2 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(""),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.lit(" from 10."),
        (did % 256).cast("string"),
        F.lit("."),
        ((did * 7) % 256).cast("string"),
        F.lit("."),
        ((did * 13) % 256).cast("string"),
    )
    c = pii_counts(F.col("t"))
    return (
        d.select("doc_id", t.alias("t"))
        .select(
            "doc_id",
            c["email"].cast("bigint").alias("n_emails"),
            c["phone"].cast("bigint").alias("n_phones"),
            c["ipv4"].cast("bigint").alias("n_ips"),
            F.md5(redact_pii(F.col("t"))).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# x28 — the END-TO-END corpus curation chain (operators/curate.py), driver-
# checked: boilerplate line removal FIRST (so banners can't distort quality
# scores or MinHash signatures), then the quality gate, then MinHash-LSH
# near-dup dedup (pairs -> connected components -> min-id survivor), then
# deterministic split assignment + token budgets — each stage is
# individually green (x04, x07/x24, x25/x21), and this query proves
# the COMPOSITION and the stage ORDER: the oracle recomputes the whole
# chain (recursive-CTE components included) over the same derived
# multi-line corpus, and the chain branch's md5 pins the bytes each stage
# saw. Round 6 consolidates former x26_boilerplate_lines in as the
# union-tagged 'boilerplate' branch — the standalone CCNet line-dedup
# census (n_lines/n_removed/byte-exact cleaned_md5 per doc), recomputed
# by the oracle from the same seg/boiler CTEs the chain already carried.
# At 100 TB the chain is exactly the sum of its verified parts: narrow
# per-row gates ride the scan, and the shuffles are boilerplate's line
# census, the banded LSH equi-joins, and one left-anti survivor join.
# Branch column mapping: chain rows carry (split, n1=n_ws_tokens,
# n2=est_bpe_tokens, md5=text_md5); boilerplate rows carry (split=NULL,
# n1=n_lines, n2=n_removed, md5=cleaned_md5).
# --------------------------------------------------------------------------
@register(
    "x28_curation_chain",
    oracle=rf"""
    WITH RECURSIVE
    seg0 AS (SELECT doc_id,
                    string_split(regexp_replace(
                        array_to_string({_SQL_TOKENS}, ' '),
                        '(\S+ \S+ \S+) ', '\1' || chr(10), 'g'),
                        chr(10)) AS ls
             FROM documents),
    seg AS (SELECT doc_id,
                   unnest(ls)                          AS line,
                   unnest(generate_series(1, len(ls))) AS pos
            FROM seg0),
    boiler AS (SELECT line FROM seg WHERE trim(line) <> '' GROUP BY line
               HAVING count(DISTINCT doc_id) >= 3),
    cleaned AS (SELECT s.doc_id,
                       coalesce(string_agg(s.line, chr(10) ORDER BY s.pos)
                                FILTER (WHERE b.line IS NULL), '') AS text
                FROM seg s LEFT JOIN boiler b ON s.line = b.line
                GROUP BY s.doc_id),
    gated AS (SELECT doc_id, text, tok FROM
                (SELECT doc_id, text, {_SQL_TOKENS} AS tok FROM cleaned)
              WHERE len(tok) >= 5
                AND (CASE WHEN length(lower(text)) > 0
                     THEN length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                          / length(lower(text)) ELSE 0 END) >= 0.5),
    sh AS (SELECT doc_id, {_SQL_SHINGLES3} AS sh FROM gated),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id),
    pairs AS (SELECT doc_a, doc_b FROM cand
              JOIN sh x ON x.doc_id = doc_a
              JOIN sh y ON y.doc_id = doc_b
              WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE
                    / len(list_distinct(x.sh || y.sh)), 6) >= 0.8),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst),
    comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
    survivors AS (SELECT g.doc_id, g.text,
                         ('0x' || substr(md5(g.text), 1, 8))::UBIGINT % 100 AS b
                  FROM gated g LEFT JOIN comp ON g.doc_id = comp.node
                  WHERE comp.node IS NULL OR comp.component = g.doc_id)
    SELECT 'chain' AS src,
           doc_id,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END                                   AS split,
           CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w != ''))
                AS BIGINT)                                        AS n1,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                + coalesce(list_sum(list_transform(
                    list_filter(list_transform(
                      string_split_regex(text, '\s+'),
                      w -> regexp_replace(w, '[^a-zA-Z0-9]', '', 'g')),
                      w -> w != ''),
                    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
                AS BIGINT)                                        AS n2,
           md5(text)                                              AS md5
    FROM survivors
    UNION ALL
    SELECT 'boilerplate' AS src,
           s.doc_id,
           CAST(NULL AS VARCHAR)                                  AS split,
           CAST(count(*) AS BIGINT)                               AS n1,
           CAST(count(*) FILTER (WHERE b.line IS NOT NULL) AS BIGINT) AS n2,
           md5(coalesce(string_agg(s.line, chr(10) ORDER BY s.pos)
                        FILTER (WHERE b.line IS NULL), ''))       AS md5
    FROM seg s LEFT JOIN boiler b ON s.line = b.line
    GROUP BY s.doc_id
    UNION ALL
    SELECT 'gate_drop' AS src, doc_id,
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
    FROM cleaned WHERE doc_id NOT IN (SELECT doc_id FROM gated)
    UNION ALL
    SELECT 'dup_drop' AS src, g.doc_id,
           CAST(NULL AS VARCHAR),
           comp.component AS n1,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
    FROM gated g JOIN comp ON g.doc_id = comp.node
    WHERE comp.component <> g.doc_id
    ORDER BY src, doc_id
    """,
    doc="end-to-end curation chain with AUDIT TRAIL: boilerplate removal "
    "-> quality gate -> near-dup dedup -> split + token budgets, "
    "whole-pipeline oracle; union-tagged with the standalone boilerplate "
    "line-dedup census (former x26) and, since round 9, the per-document "
    "drop ledger (gate_drop rows; dup_drop rows carry the surviving "
    "exemplar's id in n1) — nothing exits the chain unaccounted",
)
def x28_curation_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curate import curate_with_audit
    from ..operators.dedup import remove_boilerplate_lines

    d = _t(spark, sf_dir, "documents")
    # Derived multi-line corpus (the parquet fixture is single-line word
    # soup; a newline after every 3rd token gives the line-dedup stage
    # real lines to work on).
    doc2 = d.select(
        "doc_id",
        F.regexp_replace(
            F.array_join(tokens("text"), " "), r"(\S+ \S+ \S+) ", "$1\n"
        ).alias("text"),
    )
    # r14 perf: the boilerplate pass (two corpus-wide line shuffles) was
    # computed TWICE — once inside curate_with_audit and once for the
    # 'boilerplate' census branch below. Compute it once, checkpoint it,
    # and share it with both consumers (guide §1.2: don't compute things
    # twice). Same rows by construction (boilerplate_table contract is
    # test-pinned in tests/test_extensions.py).
    bp = remove_boilerplate_lines(doc2, min_docs=3).localCheckpoint()
    # one evaluation: the census filters the audited frame three ways,
    # and each filter would otherwise re-run the whole chain
    audited = curate_with_audit(
        doc2,
        min_tokens=5,
        min_alpha_ratio=0.5,
        dedup_threshold=0.8,
        drop_boilerplate_in=3,
        boilerplate_table=bp,
    ).localCheckpoint()
    nul_s = F.lit(None).cast("string")
    nul_l = F.lit(None).cast("bigint")
    chain = audited.filter(F.col("status") == "kept").select(
        F.lit("chain").alias("src"),
        "doc_id",
        "split",
        F.col("n_ws_tokens").alias("n1"),
        F.col("est_bpe_tokens").alias("n2"),
        F.md5("text").alias("md5"),
    )
    gate_drop = audited.filter(F.col("status") == "dropped:quality_gate").select(
        F.lit("gate_drop").alias("src"),
        "doc_id",
        nul_s.alias("split"),
        nul_l.alias("n1"),
        nul_l.alias("n2"),
        nul_s.alias("md5"),
    )
    dup_drop = audited.filter(F.col("status") == "dropped:near_dup").select(
        F.lit("dup_drop").alias("src"),
        "doc_id",
        nul_s.alias("split"),
        F.col("exemplar").alias("n1"),
        nul_l.alias("n2"),
        nul_s.alias("md5"),
    )
    boiler = bp.select(
        F.lit("boilerplate").alias("src"),
        "doc_id",
        F.lit(None).cast("string").alias("split"),
        F.col("n_lines").alias("n1"),
        F.col("n_removed").alias("n2"),
        F.md5("cleaned").alias("md5"),
    )
    return (
        chain.unionByName(boiler)
        .unionByName(gate_drop)
        .unionByName(dup_drop)
        .orderBy("src", "doc_id")
    )


# --------------------------------------------------------------------------
# x29 — the sketch operators the 100 TB plans actually use, quantified
# against their exact twins in one query: q21 documents approx_percentile
# (t-digest-style, mergeable, map-side combinable) as the scale path for
# exact `percentile`, and x22 stores HLL sketches for mergeable distincts;
# this query computes BOTH exact and approx per group and returns the
# relative errors, so the accuracy contract is measured, not asserted in
# prose. Rows-only (a sketch's value is engine-specific; DuckDB's
# approx_quantile uses a different sketch) — the error BOUNDS are pinned
# in tests/test_extensions.py. Exact branches exist only for the
# comparison; at 100 TB only the approx branch runs: one pass, bounded
# memory per group, partial aggregation map-side.
# --------------------------------------------------------------------------
@register(
    "x29_sketch_accuracy",
    oracle=None,
    doc="approx_percentile + approx_count_distinct vs exact twins: "
    "per-group relative errors (bounds pinned in pytest)",
)
def x29_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    exact = l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_exact"),
        F.countDistinct("l_orderkey").alias("nd_exact"),
    )
    approx = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10_000)).alias("p50_approx"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("nd_approx"),
    )
    rel = lambda a, b: F.round(F.abs(a - b) / b, 6)  # noqa: E731
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            F.round("p50_exact", 2).alias("p50_exact"),
            F.round("p50_approx", 2).alias("p50_approx"),
            rel(F.col("p50_approx"), F.col("p50_exact")).alias("p50_rel_err"),
            "nd_exact",
            "nd_approx",
            rel(F.col("nd_approx").cast("double"), F.col("nd_exact").cast("double")).alias(
                "nd_rel_err"
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# x30 — deterministic corpus mixing (quality/language-tiered stratified
# sampling): keep 100% of en, half of de/fr, a quarter of es, drop zh —
# the reproducible "data recipe" step every training-mix pipeline ends
# with. Row verdicts are content-hash thresholds (md5 buckets), so the
# same row gets the same verdict on any cluster/partitioning — unlike
# df.sample. Oracle-checked since round 5 (a consolidation freed the
# window slot): the oracle recomputes the identical md5 hash-threshold
# arithmetic in DuckDB, pinning exact per-stratum kept counts; the
# partitioning-invariance property is pinned separately in pytest. Narrow
# per-row filter: rides the scan, no shuffle before the count aggregation.
# --------------------------------------------------------------------------
X30_RATES = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25}

_X30_THRESH = " ".join(
    f"WHEN lang = '{s}' THEN {int(r * 10_000)}" for s, r in X30_RATES.items()
)


# Round 8 adds the TEMPERATURE branch (union-tagged 'mix' column): the
# standard multilingual rebalancing q_s ∝ p_s^α (α=0.5, target half the
# corpus). Rates derive from corpus counts at runtime, and the oracle
# recomputes them BIT-IDENTICALLY: α=0.5 makes the power sqrt (IEEE-
# correctly-rounded in every libm, unlike pow), the arithmetic order
# ((sqrt(n)/S)·T)/n is mirrored token-for-token, and S sums in sorted-
# lang order on both sides (list_sum(list(... ORDER BY lang)) vs a
# sorted-key python loop) — verified equal thresholds on the fixtures.
@register(
    "x30_stratified_mix",
    oracle=rf"""
    WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    s AS (SELECT list_sum(list(sqrt(n) ORDER BY lang)) AS S,
                 sum(n) * 0.5 AS T
          FROM cnt),
    tthr AS (SELECT lang,
                    CAST(floor(least(1.0, ((sqrt(n) / S) * T) / n) * 10000)
                         AS INT) AS thr
             FROM cnt, s),
    wdoc AS (SELECT lang, doc_id, text,
                    CAST(len(list_filter(string_split_regex(text, '\s+'),
                                         w -> w != '')) AS BIGINT) AS w
             FROM documents),
    wcnt AS (SELECT lang, CAST(sum(w) AS DOUBLE) AS n FROM wdoc GROUP BY lang),
    ws AS (SELECT list_sum(list(sqrt(n) ORDER BY lang)) AS S,
                  sum(n) * 0.5 AS T
           FROM wcnt),
    wthr AS (SELECT lang,
                    CAST(floor(least(1.0, ((sqrt(n) / S) * T) / n) * 10000)
                         AS INT) AS thr
             FROM wcnt, ws)
    SELECT 'stratified' AS mix, lang,
           count(*)    AS n_kept,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM documents
    WHERE ('0x' || substr(md5(text), 1, 8))::UBIGINT % 10000
          < (CASE {_X30_THRESH} ELSE 0 END)
    GROUP BY lang
    UNION ALL
    SELECT 'temperature' AS mix, lang,
           count(*)    AS n_kept,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM documents JOIN tthr USING (lang)
    WHERE ('0x' || substr(md5(text), 1, 8))::UBIGINT % 10000 < thr
    GROUP BY lang
    UNION ALL
    SELECT 'temperature_tokens' AS mix, lang,
           count(*)    AS n_kept,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM wdoc JOIN wthr USING (lang)
    WHERE ('0x' || substr(md5(text), 1, 8))::UBIGINT % 10000 < thr
    GROUP BY lang
    ORDER BY mix, lang
    """,
    doc="deterministic corpus mix, union-tagged: per-language stratified "
    "rates + temperature-scaled (alpha=0.5) rebalancing to half the "
    "corpus by DOCUMENT count AND (round 9) by TOKEN budget "
    "(weight_col); oracle recomputes the exact md5 AND rate arithmetic "
    "for all three branches",
)
def x30_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.splits import stratified_sample, temperature_mix
    from ..functions.text import whitespace_tokens

    d = _t(spark, sf_dir, "documents")

    def census(kept: DataFrame, mix: str) -> DataFrame:
        return (
            kept.groupBy("lang")
            .agg(
                F.count("*").alias("n_kept"),
                F.min("doc_id").alias("first_doc"),
                F.max("doc_id").alias("last_doc"),
            )
            .select(F.lit(mix).alias("mix"), "*")
        )

    strat = stratified_sample(d, "lang", X30_RATES, key_col="text")
    n_total = d.count()
    temp, _rates = temperature_mix(
        d, "lang", alpha=0.5, target_total=n_total * 0.5, key_col="text"
    )
    # token-budget branch: strata sized by whitespace-token sums (integer
    # weights — the per-stratum sums are order-independent, keeping the
    # rate arithmetic bit-identical to the DuckDB twin)
    dw = d.withColumn("w", F.size(whitespace_tokens("text")).cast("bigint"))
    w_total = dw.agg(F.sum("w")).first()[0]
    tempw, _wr = temperature_mix(
        dw, "lang", alpha=0.5, target_total=w_total * 0.5, key_col="text",
        weight_col="w",
    )
    return (
        census(strat, "stratified")
        .unionByName(census(temp, "temperature"))
        .unionByName(census(tempw, "temperature_tokens"))
        .orderBy("mix", "lang")
    )


# --------------------------------------------------------------------------
# x31 — SemDeDup-style semantic deduplication (Abbas et al. 2023,
# arXiv:2303.09540): blocking cells + within-cell greedy cosine pruning.
# Threshold 0.35 reuses x12's calibration (≈4σ above the isotropic-
# gaussian null spread), pruning a real ~15% of the fixture corpus.
# ORACLE-CHECKED since round 7 (the q21→q16 consolidation freed the
# slot): the registered form blocks on DETERMINISTIC hyperplane cells
# (sign bits of 4 fixed Gaussian planes — SQL-expressible, unlike MLlib
# centroids; the greedy rule is blocking-key agnostic, the x49
# property), and the DuckDB twin replays the ENTIRE pipeline: same
# plane literals for the cell bits, then the sequential greedy scan as
# a recursive CTE that carries each cell's kept-vector list and admits
# a row iff its max cosine against that list is < τ — the x24
# recursive-CTE precedent applied to an ordered greedy instead of a
# fixpoint. The k-means-blocked variant (semantic_dedup's default)
# stays exactly verified in pytest by the numpy greedy replay.
# --------------------------------------------------------------------------
_X31_PLANES = None


def _x31_planes():
    global _X31_PLANES
    if _X31_PLANES is None:
        from ..operators.similarity import random_hyperplanes

        _X31_PLANES = random_hyperplanes(4, 64, seed=7)
    return _X31_PLANES


def _x31_oracle() -> str:
    def lit(p):
        return "[" + ", ".join(repr(float(v)) for v in p) + "]"

    cell_expr = "\n           + ".join(
        f"(CASE WHEN list_inner_product(e, {lit(p)}) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(_x31_planes())
    )
    return f"""
    WITH RECURSIVE
    emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    normed AS (
      SELECT vec_id, e,
             sqrt(list_aggregate(list_transform(e, x -> x*x), 'sum')) AS nrm
      FROM emb
    ),
    uv AS (
      SELECT vec_id,
             list_transform(e, x -> x / nrm) AS v,
             ({cell_expr}) AS cell
      FROM normed WHERE nrm <> 0
    ),
    ranked AS (
      SELECT cell, vec_id, v,
             row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn
      FROM uv
    ),
    g(cell, rn, id, kept, kept_vecs) AS (
      SELECT cell, 0, CAST(-1 AS BIGINT), TRUE, CAST([] AS DOUBLE[][])
      FROM (SELECT DISTINCT cell FROM ranked)
      UNION ALL
      SELECT r.cell, CAST(r.rn AS INTEGER), r.vec_id,
             coalesce(list_max(list_transform(g.kept_vecs,
                      kv -> list_inner_product(kv, r.v))), -2.0) < 0.35,
             CASE WHEN coalesce(list_max(list_transform(g.kept_vecs,
                      kv -> list_inner_product(kv, r.v))), -2.0) < 0.35
                  THEN list_append(g.kept_vecs, r.v) ELSE g.kept_vecs END
      FROM g JOIN ranked r ON r.cell = g.cell AND r.rn = g.rn + 1
    )
    SELECT cell, count(*) AS n_vecs,
           sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM g WHERE rn > 0
    GROUP BY cell ORDER BY cell
    """


@register(
    "x31_semantic_dedup",
    oracle=_x31_oracle(),
    doc="SemDeDup: deterministic hyperplane cells + greedy within-cell "
    "cosine pruning; per-cell kept/dropped census vs a recursive-CTE "
    "DuckDB replay of the full pipeline (k-means variant pytest-pinned)",
)
def x31_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import hyperplane_signature, to_double, unit
    from ..operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            F.col("vec_id").alias("id"),
            unit(to_double("embedding")).alias("_uvec"),
            hyperplane_signature(to_double("embedding"), _x31_planes())
            .cast("int")
            .alias("cell"),
        )
        .filter(F.col("_uvec").isNotNull())
    )
    flags = semantic_dedup(emb, threshold=0.35, cells=cells)
    return (
        flags.groupBy("cell")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
        .orderBy("cell")
    )


# --------------------------------------------------------------------------
# x32 — BM25 keyword retrieval. Oracle-checked since the round-5
# q19->q04 consolidation freed a window slot: the DuckDB twin recomputes
# the identical tokenizer (shared _SQL_TOKENS contract) and Robertson
# idf/tf math, so ranks/doc ids/scores pin exactly (scores share the
# 6-decimal round; the sum is over <= 4 idf terms, well inside double
# exactness for the hash to agree).
# --------------------------------------------------------------------------
X32_QUERY_TERMS = ["query", "window", "merge", "vector"]

_X32_TERMS_SQL = ", ".join(f"'{t}'" for t in X32_QUERY_TERMS)

# The full BM25 top-10 recomputation over `documents` for the fixed term
# bag — shared verbatim by x32 (the in-memory bm25_topk) and w15 (the
# same math served from the STREAM-MAINTAINED postings index): BM25 has
# no frozen structures, so the maintained index's answer must equal the
# from-scratch recomputation bit-for-bit, whatever the append history.
X32_BM25_SQL = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN ({_X32_TERMS_SQL}) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
    SELECT row_number() OVER (ORDER BY sum(contrib) DESC, doc_id) AS rank,
           doc_id,
           round(sum(contrib), 6) AS score,
           count(*) AS n_terms_hit
    FROM (
        SELECT tf.doc_id, ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               AS contrib
        FROM tf JOIN df USING (term) CROSS JOIN stats JOIN dl USING (doc_id)
    )
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 10
    """


# x32 — consolidated into x42 round 12 (its 'bm25' branch carries the
# exact top-10 with scores, same ranking prefix x42's lexical leg
# already computes; the math also stays oracle-checked via w15, which
# runs X32_BM25_SQL verbatim against the stream-maintained index). The
# function stays for bench/stress/tests; the freed slot oracle-promoted
# x46_image_pipeline.
def x32_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), X32_QUERY_TERMS, k=10)


# --------------------------------------------------------------------------
# x34 — data layout vs scan cost: the write-side half of performance.
# ORACLE-CHECKED since round 9 (slot freed by x20→x19): the registered
# form is the DETERMINISTIC zone-map skip census — assign every event to
# one of 16 "files" under three layouts (hash-scattered baseline;
# range-clustered on ts; Z-ORDERED on the Morton interleave of a
# 1024-slot time bucket × a 1024-slot hashed-user bucket), collect each
# file's min of the probe dimension, and count the files a zone-map
# reader would have to touch for a time-range probe and a user-set probe
# (touch ⇔ file min < probe bound). File assignment replays in ANSI SQL:
# ntile(16) over the layout's sort key mirrors repartitionByRange's
# equal-split contract (portable md5 arithmetic for the hash dimensions,
# integer µs DIV for the time bucket — no float epochs), so DuckDB
# recomputes the census value-for-value. The point the numbers make:
# range clustering only skips on its leading column; the Morton layout
# gives every file a rectangle of (time, user) space, so BOTH probes
# skip. The PHYSICAL half — real parquet writes via write_clustered /
# interleave_bits and input_file_name() scan counts with the strict
# skipping inequalities — stays pinned in tests/test_sink.py (file
# counts there are environmental, not SQL-expressible).
# NOTE the global-order ntile is the census's determinism device, not
# the production write path: write_clustered's repartitionByRange is the
# scale form (sampled range split, no single-task sort).
# --------------------------------------------------------------------------

#: Morton interleave of two 10-bit bucket columns, as portable SQL text.
_X34_ZEXPR = " | ".join(
    f"(((tb >> {i}) & 1) << {2 * i}) | (((ub >> {i}) & 1) << {2 * i + 1})"
    for i in range(10)
)


@register(
    "x34_clustered_layout",
    oracle=f"""
    WITH e AS (
      SELECT event_id, ts,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT
                  % 1024 AS BIGINT) AS ub
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    bounds AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM e),
    b AS (SELECT event_id, ts, ub,
                 ((epoch_us(ts) - lo) * 1024) // (hi - lo + 1) AS tb
          FROM e, bounds),
    z AS (SELECT *, {_X34_ZEXPR} AS zkey FROM b),
    f AS (SELECT tb, ub,
                 CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT
                      % 16 AS BIGINT)                   AS f_scattered,
                 ntile(16) OVER (ORDER BY ts, event_id)   AS f_range_ts,
                 ntile(16) OVER (ORDER BY zkey, event_id) AS f_zorder
          FROM z),
    census AS (
      SELECT 'scattered' AS layout, f_scattered AS fid,
             min(tb) AS min_tb, min(ub) AS min_ub,
             sum(CASE WHEN tb < 256 THEN 1 ELSE 0 END) AS r_ts,
             sum(CASE WHEN ub < 256 THEN 1 ELSE 0 END) AS r_ub
      FROM f GROUP BY f_scattered
      UNION ALL
      SELECT 'range_ts', f_range_ts, min(tb), min(ub),
             sum(CASE WHEN tb < 256 THEN 1 ELSE 0 END),
             sum(CASE WHEN ub < 256 THEN 1 ELSE 0 END)
      FROM f GROUP BY f_range_ts
      UNION ALL
      SELECT 'zorder', f_zorder, min(tb), min(ub),
             sum(CASE WHEN tb < 256 THEN 1 ELSE 0 END),
             sum(CASE WHEN ub < 256 THEN 1 ELSE 0 END)
      FROM f GROUP BY f_zorder)
    SELECT layout, probe, total_files, files_touched, n_rows FROM (
      SELECT layout, 'ts_quarter' AS probe,
             count(*)                    AS total_files,
             CAST(sum(CASE WHEN min_tb < 256 THEN 1 ELSE 0 END) AS BIGINT)
                                         AS files_touched,
             CAST(sum(r_ts) AS BIGINT)   AS n_rows
      FROM census GROUP BY layout
      UNION ALL
      SELECT layout, 'user_quarter',
             count(*),
             CAST(sum(CASE WHEN min_ub < 256 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(r_ub) AS BIGINT)
      FROM census GROUP BY layout)
    ORDER BY layout, probe
    """,
    doc="deterministic zone-map skip census over scattered vs "
    "range-clustered vs Z-ordered 16-file layouts: files a min/max "
    "reader touches for time-range and user-set probes; oracle replays "
    "the md5/ntile/Morton assignment exactly",
)
def x34_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.splits import hash_bucket
    from ..operators.sink import interleave_bits

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_id",
            "ts",
            hash_bucket(F.col("user_id").cast("string"), 1024).alias("ub"),
            # TIMESTAMP_NTZ lacks unix_micros; timestampdiff from the NTZ
            # epoch is the same integer (== DuckDB's epoch_us)
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("us"),
        )
    )
    lo, hi = e.select(F.min("us"), F.max("us")).first()
    # integer µs DIV — no float epoch arithmetic to drift cross-engine
    b = e.withColumn("tb", F.expr(f"((us - {lo}) * 1024) DIV ({hi} - {lo} + 1)"))
    z = b.withColumn("zkey", interleave_bits("tb", "ub", bits=10))
    f = z.select(
        "tb",
        "ub",
        hash_bucket(F.col("event_id").cast("string"), 16).alias("f_scattered"),
        F.ntile(16).over(W.orderBy("ts", "event_id")).alias("f_range_ts"),
        F.ntile(16).over(W.orderBy("zkey", "event_id")).alias("f_zorder"),
    )

    def census(fid: str, layout: str) -> DataFrame:
        per_file = f.groupBy(F.col(fid).alias("fid")).agg(
            F.min("tb").alias("min_tb"),
            F.min("ub").alias("min_ub"),
            F.sum((F.col("tb") < 256).cast("long")).alias("r_ts"),
            F.sum((F.col("ub") < 256).cast("long")).alias("r_ub"),
        )
        ts_row = per_file.agg(
            F.count("*").alias("total_files"),
            F.sum((F.col("min_tb") < 256).cast("long")).alias("files_touched"),
            F.sum("r_ts").alias("n_rows"),
        ).select(
            F.lit(layout).alias("layout"), F.lit("ts_quarter").alias("probe"), "*"
        )
        ub_row = per_file.agg(
            F.count("*").alias("total_files"),
            F.sum((F.col("min_ub") < 256).cast("long")).alias("files_touched"),
            F.sum("r_ub").alias("n_rows"),
        ).select(
            F.lit(layout).alias("layout"), F.lit("user_quarter").alias("probe"), "*"
        )
        return ts_row.unionByName(ub_row)

    out = (
        census("f_scattered", "scattered")
        .unionByName(census("f_range_ts", "range_ts"))
        .unionByName(census("f_zorder", "zorder"))
    )
    return out.orderBy("layout", "probe")


# --------------------------------------------------------------------------
# x35 — deterministic global shuffle (training-data ordering).
# Oracle-checked since the round-5 w02->w01 consolidation freed a window
# slot: the oracle recomputes the identical salted-md5 ordering (text ||
# chr(31) || seed) in DuckDB; partition-count invariance and seed
# independence stay pinned in pytest.
# --------------------------------------------------------------------------
@register(
    "x35_deterministic_shuffle",
    oracle="""
    SELECT doc_id, md5(coalesce(text, '') || chr(31) || '0') AS _shuffle_key
    FROM documents
    ORDER BY _shuffle_key, doc_id
    LIMIT 20
    """,
    doc="seeded content-hash global shuffle: first 20 docs of the epoch-0 "
    "order; oracle recomputes the salted md5 ordering in DuckDB",
)
def x35_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.splits import deterministic_shuffle

    d = _t(spark, sf_dir, "documents")
    shuffled = deterministic_shuffle(d, key_col="text", seed=0, n_partitions=8)
    return (
        shuffled.select("doc_id", "_shuffle_key")
        .orderBy("_shuffle_key", "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# x36 — one-pass data profile of the events table, ORACLE-CHECKED since
# round 6 on its exact statistics (rows/nulls/min/max/mean per column,
# all computed in the same single aggregate pass): the registered query
# profiles a comparability-prepared projection (ts pre-formatted to the
# fixed microsecond format, value pre-rounded — the same cross-engine
# rendering discipline x02/x22 use) and drops the approx_distinct
# column, because an HLL sketch's VALUE is engine-specific (DuckDB's
# approx sketch differs); the full operator including the HLL column
# and its rsd bound stays pinned in tests/test_extensions.py.
# --------------------------------------------------------------------------
def _x36_oracle() -> str:
    cols = {
        "event_id": True,
        "user_id": True,
        "event_type": False,
        "ts_str": False,
        "value": True,
        "props": False,
    }
    branches = []
    for c, numeric in cols.items():
        mean = f"round(avg({c}), 6)" if numeric else "CAST(NULL AS DOUBLE)"
        branches.append(
            f"""
    SELECT '{c}' AS "column",
           count(*)              AS n_rows,
           count(*) - count({c}) AS n_nulls,
           CAST(min({c}) AS VARCHAR) AS min_str,
           CAST(max({c}) AS VARCHAR) AS max_str,
           {mean} AS mean
    FROM ev"""
        )
    return (
        """
    WITH ev AS (SELECT event_id, user_id, event_type,
                       strftime(CAST(ts AS TIMESTAMP),
                                '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
                       round(value, 2) AS value, props
                FROM events)"""
        + " UNION ALL ".join(branches)
        + '\n    ORDER BY "column"'
    )


@register(
    "x36_data_profile",
    oracle=_x36_oracle(),
    doc="per-column profile (rows/nulls/min/max/mean) in ONE aggregate "
    "pass, oracle-checked; the HLL approx-distinct column is pinned to "
    "its rsd bound in pytest (sketch values are engine-specific)",
)
def x36_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.round("value", 2).alias("value"),
        "props",
    )
    return profile(ev).drop("approx_distinct").orderBy("column")


# --------------------------------------------------------------------------
# x37 — model-based quality filter: the classifier-filtering stage of
# the public large-corpus recipes (trusted-corpus weak positives vs
# junk negatives, linear probe over engine text signals, score
# everything). Positives are the real documents; negatives are
# deterministic degradations of the same documents — looping-template
# corruption (first words repeated) and symbol-noise corruption — the
# two junk shapes the Gopher/CCNet heuristics target. The probe must
# rediscover the boundary from the signals (repetition fraction, alpha
# ratio, ...) alone. Rows-only (L-BFGS coefficients are engine-specific
# floats); the AUC floor, score sanity, and cohort separation are
# pinned in tests/test_extensions.py.
# --------------------------------------------------------------------------
@register(
    "x37_quality_model",
    oracle=None,
    doc="MLlib linear quality probe: real docs vs deterministic junk "
    "degradations; distributed train + narrow scoring; per-cohort mean "
    "score + train AUC",
)
def x37_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_model import (
        quality_features,
        score_quality,
        train_quality_model,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    first_words = F.slice(F.split(F.col("text"), " "), 1, 4)
    looped = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.flatten(F.array_repeat(first_words, 25))
        ).alias("text"),
    )
    noisy = docs.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), "[aeiou]", "#").alias("text"),
    )
    cohort = (
        F.when(F.col("doc_id") >= 2_000_000, "junk_noise")
        .when(F.col("doc_id") >= 1_000_000, "junk_loop")
        .otherwise("reference")
    )
    # One materialized feature pass feeds training AND scoring — the
    # signal expressions (ngram HOFs over 3x the corpus) are the
    # expensive stage and would otherwise run once per consumer.
    labeled = (
        quality_features(docs.unionByName(looped).unionByName(noisy))
        .withColumn("cohort", cohort)
        .withColumn("label", (F.col("cohort") == "reference").cast("double"))
        .localCheckpoint()
    )
    model, auc = train_quality_model(labeled)
    scored = score_quality(labeled, model)
    return (
        scored.groupBy("cohort")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality_prob"), 4).alias("mean_prob"),
        )
        .withColumn("train_auc", F.round(F.lit(auc), 4))
        .orderBy("cohort")
    )


# --------------------------------------------------------------------------
# x38 — token-window document chunking with overlap (chunk=16, stride=12):
# the inverse of x21's packing, and the standard prep for context-bounded
# training / retrieval indexing. Pure codegen'd in-row expressions
# (sequence → transform/slice → posexplode), zero shuffles before the
# per-doc census. Oracle rebuilds every window with DuckDB list_slice and
# pins the exact chunk boundaries via an order-aware md5 over the chunk
# texts.
# --------------------------------------------------------------------------
# (x38_doc_chunking was consolidated into x21's union-tagged 'chunk'
# branch in round 11 — same chunk_documents call, same ordered-md5
# boundary pinning, the hash riding x21's `bucket` column. The
# standalone function stays for local use; the freed driver-window
# slot oracle-checks w13_span_scrub_stream.)
def x38_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_documents

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=16, overlap=4
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("chunk_id", "chunk_text"))
    )
    return (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("n_doc_tokens").alias("n_doc_tokens"),
            F.sum("n_chunk_tokens").alias("total_chunk_tokens"),
            F.md5(
                F.concat_ws("|", F.transform(ordered, lambda r: r.chunk_text))
            ).alias("chunks_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# x39 — URL blocklist + per-domain cap (RefinedWeb/C4-style domain
# balancing). The documents fixture has no URL column, so both engines
# derive the same deterministic URL from (source, lang, doc_id) — the
# machinery under test is host extraction (JVM parse_url vs regexp),
# the broadcast ANTI join against the blocklist, and the one-shuffle
# windowed cap (WindowGroupLimit keeps the shuffle at O(domains x cap)).
# --------------------------------------------------------------------------
@register(
    "x39_domain_cap",
    oracle="""
    WITH u AS (SELECT doc_id, lang, source, n_chars,
                      'https://' || source || '.corpus.net/' || lang || '/'
                        || doc_id AS url
               FROM documents),
    h AS (SELECT *, regexp_extract(url, '^https?://([^/]+)', 1) AS host FROM u),
    allowed AS (SELECT * FROM h
                WHERE host NOT IN ('src2.corpus.net', 'src15.corpus.net')),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY host
                             ORDER BY n_chars DESC, doc_id) AS rn
               FROM allowed),
    cum AS (SELECT *, sum(n_chars) OVER (PARTITION BY host ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS running
            FROM allowed)
    SELECT 'doc_cap' AS branch, host,
           CAST(count(*) AS BIGINT)                        AS n_total,
           CAST(sum(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn > 15 THEN 1 ELSE 0 END) AS BIGINT)  AS n_dropped,
           round(avg(n_chars) FILTER (rn <= 15), 2)        AS avg_kept_chars,
           min(doc_id) FILTER (rn <= 15)                   AS min_kept_doc,
           max(doc_id) FILTER (rn <= 15)                   AS max_kept_doc
    FROM ranked GROUP BY host
    UNION ALL
    SELECT 'token_quota' AS branch, host,
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN running <= 8000 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN running > 8000 THEN 1 ELSE 0 END) AS BIGINT),
           round(avg(n_chars) FILTER (running <= 8000), 2),
           min(doc_id) FILTER (running <= 8000),
           max(doc_id) FILTER (running <= 8000)
    FROM cum GROUP BY host
    ORDER BY branch, host
    """,
    doc="URL host extraction + broadcast blocklist anti-join + per-domain "
    "caps, union-tagged: 15-best-docs window cap ('doc_cap') and the "
    "8000-char token-budget cumsum quota ('token_quota', round 9 — the "
    "weight-denominated form whose streaming twin is w14)",
)
def x39_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.webfilter import (
        cap_domain_tokens,
        cap_per_domain,
        filter_blocklist,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"), "source", F.lit(".corpus.net/"), "lang",
            F.lit("/"), F.col("doc_id").cast("string"),
        ),
    )
    blocklist = spark.createDataFrame(
        [("src2.corpus.net",), ("src15.corpus.net",)], "host string"
    )
    allowed = filter_blocklist(d, blocklist)
    totals = allowed.groupBy("host").agg(F.count("*").alias("n_total"))

    def census(kept: DataFrame, branch: str) -> DataFrame:
        agg = kept.groupBy("host").agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg("n_chars"), 2).alias("avg_kept_chars"),
            F.min("doc_id").alias("min_kept_doc"),
            F.max("doc_id").alias("max_kept_doc"),
        )
        return totals.join(agg, "host", "left").select(
            F.lit(branch).alias("branch"),
            "host",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
            "avg_kept_chars",
            "min_kept_doc",
            "max_kept_doc",
        )

    capped = cap_per_domain(
        allowed, domain_col="host", max_per_domain=15,
        order_by=[F.col("n_chars").desc()],
    )
    quota = cap_domain_tokens(
        allowed, domain_col="host", weight_col="n_chars", budget=8_000
    )
    return (
        census(capped, "doc_cap")
        .unionByName(census(quota, "token_quota"))
        .orderBy("branch", "host")
    )


# --------------------------------------------------------------------------
# x40 — unigram-LM cross-entropy scoring (CCNet/Gopher perplexity-filter
# shape with exactly-reproducible arithmetic): build Laplace-smoothed
# token statistics on the TRAIN split (same md5 split arithmetic as
# x21/x30), broadcast them, score every document in one pass, census per
# (lang, split). ln/avg agree across engines at round-6 because both run
# the identical smoothing formula over integer counts.
# --------------------------------------------------------------------------
@register(
    "x40_lm_perplexity",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, text, {_SQL_TOKENS} AS tok FROM documents),
    sp AS (SELECT *, CASE
             WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 < 80 THEN 'train'
             WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
           FROM tok),
    lm AS (SELECT token, count(*) AS c
           FROM (SELECT unnest(tok) AS token FROM sp WHERE split = 'train')
           GROUP BY token),
    tot AS (SELECT sum(c)::DOUBLE + count(*)::DOUBLE AS denom FROM lm),
    dt AS (SELECT doc_id, lang, split, unnest(tok) AS token FROM sp),
    sc AS (SELECT dt.doc_id, dt.lang, dt.split,
                  CASE WHEN lm.c IS NULL THEN 1 ELSE 0 END AS oov,
                  -ln((coalesce(lm.c, 0) + 1) / tot.denom)  AS nll
           FROM dt LEFT JOIN lm USING (token), tot),
    doc AS (SELECT doc_id, lang, split,
                   count(*) AS n_tokens,
                   sum(oov) AS n_oov,
                   sum(nll) / count(*) AS ce
            FROM sc GROUP BY doc_id, lang, split)
    SELECT lang, split,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(n_oov) AS BIGINT) AS total_oov,
           round(avg(ce), 6)         AS avg_ce,
           round(min(ce), 6)         AS min_ce,
           round(max(ce), 6)         AS max_ce
    FROM doc GROUP BY lang, split ORDER BY lang, split
    """,
    doc="Laplace-smoothed unigram LM built on the train split, "
    "broadcast-scored cross-entropy per doc, census per (lang, split)",
)
def x40_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.splits import assign_split
    from ..operators.lm import cross_entropy_score, unigram_counts

    d = _t(spark, sf_dir, "documents").withColumn("split", assign_split("text"))
    lm = unigram_counts(d.filter(F.col("split") == "train"))
    scored = cross_entropy_score(d, lm)
    return (
        scored.join(d.select("doc_id", "lang", "split"), "doc_id")
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_oov").alias("total_oov"),
            F.round(F.avg("ce"), 6).alias("avg_ce"),
            F.round(F.min("ce"), 6).alias("min_ce"),
            F.round(F.max("ce"), 6).alias("max_ce"),
        )
        .orderBy("lang", "split")
    )


# --------------------------------------------------------------------------
# x41 — product-quantization ANN (FAISS-style ADC): driver-trained
# sub-codebooks on a bounded sample, one narrow encode pass (16 B of
# codes per 256 B vector — the 16x memory path to billion-vector
# serving), lookup-table scoring with the same two-level exact merge as
# x10, exact rerank of the shortlist. Approximate recall => rows-only;
# floors pinned in tests/test_extensions.py vs x10 (0.96 rerank / 0.52
# raw ADC measured at sf0.001) and the encode step is pinned by an
# independent numpy argmin replay.
# --------------------------------------------------------------------------
@register(
    "x41_pq_ann",
    oracle=None,
    doc="PQ ANN, union-tagged: flat ADC + exact shortlist rerank ('pq') "
    "and the IVF-PQ composition ('ivfpq', round 9 — probed cells bound "
    "WHICH vectors a query touches, codes bound the bytes; the 100 TB "
    "serving shape). Rows-only; recall floors + the nprobe==n_cells "
    "degradation equality are pinned in pytest",
)
def x41_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import (
        pq_encode,
        topk_ivfpq,
        topk_pq_adc,
        train_pq_codebooks,
    )

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    books = train_pq_codebooks(e)
    # Pin the encoded corpus: BOTH branches consume it (flat ADC scans
    # it, ivfpq joins it to cell assignments) — without the pin the
    # narrow encode pass re-runs once per branch in the same action
    # (r14, guide §1.2: measured 8.2 -> 7.0 s warm at sf0.1, rows
    # verified identical). r15 (VERDICT #2 re-measure, interleaved
    # 3-round A/B/C at sf0.1): the r14 localCheckpoint pin IS real
    # (no-pin reads 8.02 warm min vs ckpt 6.75) but its EAGER
    # materialize-write-rescan sits on the cold critical path (first
    # run 18.0 s vs 7.6) — a lazy persist() gives the same single
    # evaluation via InMemoryRelation without the synchronous
    # materialize: warm min 6.27, rows identical in every variant.
    # The codes frame is m bytes/vector — 16x compressed, and
    # MEMORY_AND_DISK spills instead of OOMing at scale (same executor-
    # local residency class as localCheckpoint's blocks).
    from pyspark.storagelevel import StorageLevel

    codes = pq_encode(e, books).persist(StorageLevel.MEMORY_AND_DISK)
    flat = topk_pq_adc(codes, queries, books, corpus=e, k=10, shortlist=50)
    # Share the already-trained codebooks and encoded corpus with the
    # ivfpq branch (same seed/params => identical structures): the round-9
    # form retrained + re-encoded inside topk_ivfpq, doubling the query.
    ivfpq = topk_ivfpq(
        e, queries, k=10, n_cells=16, nprobe=6, shortlist=50,
        codebooks=books, codes=codes,
    )
    return flat.select(F.lit("pq").alias("branch"), "*").unionByName(
        ivfpq.select(F.lit("ivfpq").alias("branch"), "*")
    ).orderBy("branch", "query_id", "rank")


# --------------------------------------------------------------------------
# x42 — hybrid retrieval: BM25 (lexical) + dense (embedding) rankings
# fused with reciprocal-rank fusion. The dense query vector comes from
# pseudo-relevance feedback (Rocchio-style): the centroid of the BM25
# top-3 documents' embeddings — fully deterministic, no external query
# embedding needed, and exactly how a hybrid stack bootstraps dense
# retrieval from a keyword query. Rank-based RRF needs no score
# calibration between the two modalities. Rows-only (the BM25 half is
# already oracle-checked as x32, the dense half as x10; the RRF
# arithmetic is pinned by hand-computed pytest twins).
# --------------------------------------------------------------------------
@register(
    "x42_hybrid_rrf",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN ({_X32_TERMS_SQL}) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm AS (
      SELECT row_number() OVER (ORDER BY sum(contrib) DESC, doc_id) AS rank,
             doc_id,
             round(sum(contrib), 6) AS score,
             CAST(count(*) AS BIGINT) AS n_hit
      FROM (
          SELECT tf.doc_id, ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                 AS contrib
          FROM tf JOIN df USING (term) CROSS JOIN stats JOIN dl USING (doc_id)
      )
      GROUP BY doc_id
      ORDER BY sum(contrib) DESC, doc_id
      LIMIT 20),
    seeds AS (
      SELECT e.embedding::DOUBLE[] AS v
      FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id
      ORDER BY bm.rank LIMIT 3),
    cent AS (
      SELECT list(m ORDER BY i) AS c FROM (
        SELECT i, avg(x) AS m FROM (
          SELECT unnest(v) AS x, generate_subscripts(v, 1) AS i FROM seeds)
        GROUP BY i)),
    dense AS (
      SELECT cand_id, rank FROM (
        SELECT cand_id, CAST(row_number() OVER (
                 ORDER BY score DESC, cand_id) AS BIGINT) AS rank
        FROM (SELECT c2.vec_id AS cand_id,
                     round(list_cosine_similarity(cent.c,
                           c2.embedding::DOUBLE[]), 6) AS score
              FROM embeddings c2, cent))
      WHERE rank <= 20)
    SELECT 'bm25' AS branch, CAST(rank AS BIGINT) AS rank, doc_id,
           score AS v, n_hit AS n_lists
    FROM bm WHERE rank <= 10
    UNION ALL
    SELECT 'rrf', rank, doc_id, rrf_score, n_lists FROM (
      SELECT CAST(row_number() OVER (
               ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank,
             doc_id, rrf_score, n_lists
      FROM (
        SELECT doc_id, round(sum(1.0 / (60 + rank)), 6) AS rrf_score,
               CAST(count(*) AS BIGINT) AS n_lists
        FROM (SELECT doc_id, rank FROM bm
              UNION ALL SELECT cand_id, rank FROM dense)
        GROUP BY doc_id))
    WHERE rank <= 10
    ORDER BY branch, rank
    """,
    doc="hybrid retrieval, union-tagged (round 12: former x32 folded in "
    "as the 'bm25' branch — exact top-10 with scores from the same "
    "lexical leg): BM25 top-20 + PRF-centroid (mean of the best 3 "
    "embedding-covered lexical hits) dense top-20, fused via "
    "reciprocal-rank fusion; DuckDB replays the whole chain — BM25 "
    "math, seed selection, per-dimension centroid mean, cosine ranks, "
    "and the RRF sum (1-2 terms per doc: float addition is exact under "
    "commutation, and the centroid's avg-vs-numpy-mean difference is "
    "~1e-16, invisible at the 6-decimal rounding both sides apply)",
)
def x42_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import to_double
    from ..operators.retrieval import bm25_topk, rrf_fuse
    from ..operators.similarity import topk_bruteforce

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lexical = bm25_topk(docs, X32_QUERY_TERMS, k=20)

    # PRF: centroid of the best-ranked 3 lexical hits THAT HAVE an
    # embedding row (at sf0.1 the embeddings fixture covers only part of
    # the doc id space — an uncovered seed must degrade to the next
    # covered hit, not silently shrink or NaN the centroid). Tiny
    # driver-side collect (<= 3 vectors) by construction.
    seed_vecs = (
        lexical.join(emb, lexical.doc_id == emb.vec_id)
        .orderBy("rank")
        .limit(3)
        .select(to_double("embedding").alias("_v"))
        .collect()
    )
    if not seed_vecs:
        raise ValueError(
            "hybrid RRF: no BM25 hit has an embedding row — dense PRF "
            "leg impossible for this query/corpus"
        )
    import numpy as np

    centroid = np.mean([np.asarray(r["_v"], dtype=float) for r in seed_vecs], axis=0)
    qdf = spark.createDataFrame(
        [(-1, [float(x) for x in centroid])], "vec_id long, embedding array<double>"
    )
    dense = topk_bruteforce(emb, qdf, k=20).withColumnRenamed("cand_id", "doc_id")

    fused = rrf_fuse(
        [lexical.select("doc_id", "rank"), dense.select("doc_id", "rank")],
        top_k=10,
    )
    # 'bm25' branch (former x32, folded round 12): the exact top-10 WITH
    # scores is a rank<=10 prefix of the lexical leg already computed —
    # zero extra work, and the BM25 math stays oracle-checked here
    bm_rows = lexical.filter(F.col("rank") <= 10).select(
        F.lit("bm25").alias("branch"),
        F.col("rank").cast("bigint").alias("rank"),
        "doc_id",
        F.col("score").alias("v"),
        F.col("n_terms_hit").cast("bigint").alias("n_lists"),
    )
    rrf_rows = fused.select(
        F.lit("rrf").alias("branch"),
        "rank",
        "doc_id",
        F.col("rrf_score").alias("v"),
        "n_lists",
    )
    return bm_rows.unionByName(rrf_rows).orderBy("branch", "rank")


# --------------------------------------------------------------------------
# x43 — data-quality constraint report over the landed tables (the
# Deequ/Great-Expectations validation stage): row-level checks fused
# into one pass per table, uniqueness via one keyed shuffle, referential
# integrity via broadcast anti-join, plus the skew report that feeds the
# salted-join decision. ORACLE-CHECKED since round 6: every violation
# count, rows_checked, and passed flag recomputed independently by
# DuckDB (the skew branch mirrors suggested_salts = greatest(1,
# ceil(share * P)) with P pinned to 32 so the result is session-conf-
# independent). Every check must PASS on the fixture tables except the
# deliberately-tight discount range, which reports its violation count.
# --------------------------------------------------------------------------
_X43_SKEW_P = 32  # pinned shuffle-partition count for the skew branch

_X43_ORACLE = f"""
    SELECT "check", violations, rows_checked, violations = 0 AS passed FROM (
      SELECT 'not_null(l_orderkey)' AS "check",
             CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
             count(*) AS rows_checked FROM lineitem
      UNION ALL
      SELECT 'not_null(l_shipdate)',
             CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(*) FROM lineitem
      UNION ALL
      SELECT 'not_null(l_extendedprice)',
             CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(*) FROM lineitem
      UNION ALL
      SELECT 'range(l_discount,[0.0,0.1])',
             CAST(sum(CASE WHEN l_discount IS NOT NULL
                            AND NOT (l_discount BETWEEN 0.0 AND 0.1)
                           THEN 1 ELSE 0 END) AS BIGINT),
             count(*) FROM lineitem
      UNION ALL
      SELECT 'range(l_tax,[0.0,0.08])',
             CAST(sum(CASE WHEN l_tax IS NOT NULL
                            AND NOT (l_tax BETWEEN 0.0 AND 0.08)
                           THEN 1 ELSE 0 END) AS BIGINT),
             count(*) FROM lineitem
      UNION ALL
      SELECT 'accepted(l_returnflag)',
             CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                            AND l_returnflag NOT IN ('A', 'N', 'R')
                           THEN 1 ELSE 0 END) AS BIGINT),
             count(*) FROM lineitem
      UNION ALL
      SELECT 'unique(o_orderkey)',
             CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 END), 0) AS BIGINT),
             CAST(coalesce(sum(n), 0) AS BIGINT)
      FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'ref(o_custkey->c_custkey)',
             CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(*)
      FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
      LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'ref(l_orderkey->o_orderkey)',
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(*)
      FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
      LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        ON l.l_orderkey = o.o_orderkey
    )
    UNION ALL
    SELECT 'skew(source=' || CAST(source AS VARCHAR) || ')' AS "check",
           salts - 1   AS violations,
           n_rows      AS rows_checked,
           salts = 1   AS passed
    FROM (
      SELECT source, n_rows,
             CAST(greatest(1, ceil((CAST(n_rows AS DOUBLE) / total)
                                   * {_X43_SKEW_P})) AS BIGINT) AS salts
      FROM (SELECT source, count(*) AS n_rows,
                   CAST(sum(count(*)) OVER () AS DOUBLE) AS total
            FROM documents GROUP BY source
            ORDER BY n_rows DESC, CAST(source AS VARCHAR) ASC LIMIT 3))
    ORDER BY "check"
    """


@register(
    "x43_data_quality",
    oracle=_X43_ORACLE,
    doc="constraint validation report: fused row checks + uniqueness + "
    "referential integrity + skew diagnosis, oracle-checked",
)
def x43_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_checks import check_referential, check_unique, run_checks
    from ..operators.skew import skew_report

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    row_checks = run_checks(
        l,
        not_null=["l_orderkey", "l_shipdate", "l_extendedprice"],
        ranges={"l_discount": (0.0, 0.1), "l_tax": (0.0, 0.08)},
        accepted={"l_returnflag": ["A", "N", "R"]},
    )
    report = (
        row_checks.unionByName(check_unique(o, ["o_orderkey"]))
        .unionByName(check_referential(o, c, "o_custkey", "c_custkey"))
        .unionByName(check_referential(l, o, "l_orderkey", "o_orderkey",
                                       broadcast_parent=False))
    )
    # violations = EXTRA salts demanded beyond 1 so the whole report
    # keeps the `passed == (violations == 0)` contract a gating consumer
    # alerts on — an unskewed key reports (0, passed). P is pinned (not
    # read from the session) so the report — and its oracle — mean the
    # same thing under any session conf.
    skew = skew_report(
        _t(spark, sf_dir, "documents"), "source", top_n=3,
        shuffle_partitions=_X43_SKEW_P,
    ).select(
        F.concat(F.lit("skew(source="), "key_value", F.lit(")")).alias("check"),
        (F.col("suggested_salts") - 1).alias("violations"),
        F.col("n_rows").alias("rows_checked"),
        (F.col("suggested_salts") == 1).alias("passed"),
    )
    return report.unionByName(skew).orderBy("check")


# --------------------------------------------------------------------------
# x44 — snapshot-committed table: append → dynamic-partition overwrite →
# read latest + time-travel the pre-overwrite version + rollback, all
# through the manifest/atomic-pointer protocol (operators/snapshots.py).
# ORACLE-CHECKED since round 11 (slot freed by q24→q26): every census
# row is a pure function of the events table + the protocol contract —
# DuckDB rebuilds each version's state arithmetically (v1 = the
# first-half dates, v2 = everything, v3 = lo-date values patched ×2,
# rollback = v2 again), re-derives the incremental delta, and counts
# the COMMIT×PARTITION DIRECTORIES each scan must touch (immutable-dir
# protocol: one dir per partition per commit; dir counts are
# deterministic where physical part-FILE counts depend on writer task
# parallelism — the old rows-only census counted files). The skipped
# scan's dir census proves zone-map pruning physically: the extra
# commit's shifted event_id range is disjoint, so a [10M, 99.99M]
# skip_where must prune every dir of the first two commits. The
# atomicity crash window, overwrite-never-races-readers, and physical
# file-skipping equalities stay pinned in tests/test_snapshots.py.
# --------------------------------------------------------------------------
@register(
    "x44_snapshot_table",
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type, CAST(ts AS DATE) AS d, value FROM events),
    m AS (SELECT min(d) AS lo,
                 min(d) + CAST((max(d) - min(d)) // 2 AS INTEGER) AS mid
          FROM ev),
    -- post-MoR effective state pieces (shared by the branch rows):
    -- surviving originals after cond-merge edits + MoR key delete,
    -- the first merge's negative-key inserts, and the branch's WAP
    -- append batch
    s3 AS (SELECT count(*) AS na,
                  sum(CASE WHEN event_id % 2 = 0 AND event_id >= 10
                                AND event_id < 40 THEN round(value * 5, 6)
                           WHEN event_id < 50 THEN round(value * 3, 6)
                           ELSE value END) AS a
           FROM ev
           WHERE NOT (event_id < 10 AND event_id % 2 = 0)
             AND NOT (event_id >= 40 AND event_id < 60)),
    ins AS (SELECT count(*) AS ni, sum(value) AS b FROM ev
            WHERE event_id < 20),
    wap AS (SELECT count(*) AS nw, sum(round(value * 7, 6)) AS c FROM ev
            WHERE event_id < 25)
    SELECT 'latest' AS label, count(*) AS n,
           round(sum(CASE WHEN d = (SELECT lo FROM m)
                          THEN round(value * 2, 6) ELSE value END), 2) AS sum_value
    FROM ev
    UNION ALL
    SELECT 'pre_patch', count(*), round(sum(value), 2) FROM ev
    UNION ALL
    SELECT 'v1', count(*), round(sum(value), 2)
    FROM ev WHERE d <= (SELECT mid FROM m)
    UNION ALL
    SELECT 'rolled_back', count(*), round(sum(value), 2) FROM ev
    UNION ALL
    SELECT 'n_snapshots', 4, 0.0
    UNION ALL
    SELECT 'zonemap_dirs_full',
           (SELECT count(DISTINCT d) FROM ev)
           + (SELECT count(DISTINCT d) FROM ev WHERE event_id < 100),
           0.0
    UNION ALL
    SELECT 'zonemap_dirs_skipped',
           (SELECT count(DISTINCT d) FROM ev WHERE event_id < 100), 0.0
    UNION ALL
    SELECT 'zonemap_rows',
           (SELECT count(*) FROM ev WHERE event_id < 100), 0.0
    UNION ALL
    SELECT 'changes_v1_v2', count(*), round(sum(value), 2)
    FROM ev WHERE d > (SELECT mid FROM m)
    UNION ALL
    SELECT 'diff_v1_v2_added',
           (SELECT count(DISTINCT d) FROM ev WHERE d > (SELECT mid FROM m)),
           0.0
    UNION ALL
    SELECT 'delete_n_after', count(*), round(sum(value), 2) FROM ev
    UNION ALL
    SELECT 'delete_dirs_after', (SELECT count(DISTINCT d) FROM ev), 0.0
    UNION ALL
    SELECT 'delete_images',
           (SELECT count(*) FROM ev WHERE event_id < 100), 0.0
    UNION ALL
    SELECT 'merge_n_after',
           count(*) + (SELECT count(*) FROM ev WHERE event_id < 20),
           round(sum(CASE WHEN event_id < 50
                          THEN round(value * 3, 6) ELSE value END)
                 + (SELECT sum(value) FROM ev WHERE event_id < 20), 2)
    FROM ev
    UNION ALL
    SELECT 'merge_images',
           (SELECT count(*) FROM ev WHERE event_id < 20)
           + 2 * (SELECT count(*) FROM ev WHERE event_id < 50
                  AND round(value * 3, 6) IS DISTINCT FROM value),
           0.0
    UNION ALL
    SELECT 'cond_merge_n_after',
           (SELECT count(*) FROM ev)
           - (SELECT count(*) FROM ev
              WHERE event_id < 10 AND event_id % 2 = 0)
           + (SELECT count(*) FROM ev WHERE event_id < 20),
           round(
             (SELECT sum(CASE
                 WHEN event_id % 2 = 0 AND event_id >= 10
                      AND event_id < 40 THEN round(value * 5, 6)
                 WHEN event_id < 50 THEN round(value * 3, 6)
                 ELSE value END)
              FROM ev WHERE NOT (event_id < 10 AND event_id % 2 = 0))
             + (SELECT sum(value) FROM ev WHERE event_id < 20), 2)
    UNION ALL
    SELECT 'cond_merge_images',
           (SELECT count(*) FROM ev
            WHERE event_id < 10 AND event_id % 2 = 0)
           + 2 * (SELECT count(*) FROM ev
                  WHERE event_id % 2 = 0 AND event_id >= 10
                        AND event_id < 40),
           0.0
    UNION ALL
    SELECT 'evolve_n_after',
           (SELECT count(*) FROM ev)
           - (SELECT count(*) FROM ev
              WHERE event_id < 10 AND event_id % 2 = 0)
           + (SELECT count(*) FROM ev WHERE event_id < 20),
           round(
             (SELECT sum(CASE
                 WHEN event_id % 2 = 0 AND event_id >= 10
                      AND event_id < 40 THEN round(value * 5, 6)
                 WHEN event_id < 50 THEN round(value * 3, 6)
                 ELSE value END)
              FROM ev WHERE NOT (event_id < 10 AND event_id % 2 = 0))
             + (SELECT sum(value) FROM ev WHERE event_id < 20), 2)
    UNION ALL
    SELECT 'evolve_n_cols', 3, 0.0
    UNION ALL
    SELECT 'mor_delete_n_after',
           (SELECT count(*) FROM ev)
           - (SELECT count(*) FROM ev
              WHERE event_id < 10 AND event_id % 2 = 0)
           + (SELECT count(*) FROM ev WHERE event_id < 20)
           - (SELECT count(*) FROM ev
              WHERE event_id >= 40 AND event_id < 60),
           round(
             (SELECT sum(CASE
                 WHEN event_id % 2 = 0 AND event_id >= 10
                      AND event_id < 40 THEN round(value * 5, 6)
                 WHEN event_id < 50 THEN round(value * 3, 6)
                 ELSE value END)
              FROM ev WHERE NOT (event_id < 10 AND event_id % 2 = 0)
                AND NOT (event_id >= 40 AND event_id < 60))
             + (SELECT sum(value) FROM ev WHERE event_id < 20), 2)
    UNION ALL
    SELECT 'mor_delete_images',
           (SELECT count(*) FROM ev
            WHERE event_id >= 40 AND event_id < 60), 0.0
    UNION ALL
    SELECT 'branch_main_n',
           (SELECT na FROM s3) + (SELECT ni FROM ins),
           round((SELECT a FROM s3) + (SELECT b FROM ins), 2)
    UNION ALL
    SELECT 'branch_n_after',
           (SELECT na FROM s3) + (SELECT ni FROM ins) + (SELECT nw FROM wap),
           round((SELECT a FROM s3) + (SELECT b FROM ins)
                 + (SELECT c FROM wap), 2)
    UNION ALL
    SELECT 'branch_published',
           (SELECT na FROM s3) + (SELECT ni FROM ins) + (SELECT nw FROM wap),
           round((SELECT a FROM s3) + (SELECT b FROM ins)
                 + (SELECT c FROM wap), 2)
    ORDER BY label
    """,
    doc="snapshot commits: append/overwrite/time-travel/rollback census + "
    "zone-map dir pruning + incremental delta + MERGE INTO upsert images "
    "+ the merge-on-read key-delete branch + (round 14) the BRANCH "
    "write-audit-publish stage (branch commit invisible to main, "
    "fast-forward publish), oracle-rebuilt from events (protocol "
    "crash/race semantics pinned in test_snapshots.py)",
)
def x44_snapshot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.snapshots import (
        snapshot_append,
        snapshot_changes,
        snapshot_diff,
        snapshot_history,
        snapshot_overwrite_partitions,
        snapshot_read,
        snapshot_rollback,
    )

    base = tempfile.mkdtemp(prefix="x44_")
    try:
        t = f"{base}/tbl"
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "event_type", F.to_date("ts").alias("d"), "value"
        )
        lo, hi = ev.agg(F.min("d"), F.max("d")).first()
        # the midpoint is computed driver-side so the oracle can restate
        # it arithmetically: mid = lo + floor((hi - lo) / 2) days
        mid = lo + (hi - lo) // 2
        half = ev.filter(F.col("d") <= F.lit(mid))
        snapshot_append(spark, t, half, ["d"], stats_cols=["event_id"])
        # r14 perf: the complement filter IS exceptAll(half) here — every
        # row satisfies exactly one of d<=mid / d>mid (d := to_date(ts),
        # ts never NULL in the fixture; isNull kept for exactness) — and
        # skips exceptAll's two-sided shuffle (guide §2.4).
        snapshot_append(
            spark, t,
            ev.filter((F.col("d") > F.lit(mid)) | F.col("d").isNull()),
            ["d"], stats_cols=["event_id"],
        )
        patched = ev.filter(F.col("d") == lo).withColumn(
            "value", F.round(F.col("value") * 2, 6)
        )
        snapshot_overwrite_partitions(
            spark, t, patched, ["d"], stats_cols=["event_id"]
        )
        rows = []
        # r14 perf (guide §2.6): the three version censuses are
        # independent read-only jobs over immutable snapshots — run them
        # concurrently so the later jobs back-fill the first one's tail.
        from concurrent.futures import ThreadPoolExecutor

        def _version_census(version):
            agg = (
                snapshot_read(spark, t, version)
                .agg(
                    F.count("*").alias("n"),
                    F.round(F.sum("value"), 2).alias("sv"),
                )
                .first()
            )
            return agg["n"], float(agg["sv"])

        with ThreadPoolExecutor(3) as pool:
            censuses = list(pool.map(_version_census, (None, 2, 1)))
        for (label, _v), (n, sv) in zip(
            (("latest", None), ("pre_patch", 2), ("v1", 1)), censuses
        ):
            rows.append((label, n, sv))
        snapshot_rollback(spark, t, 2)
        agg = (
            snapshot_read(spark, t)
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
            .first()
        )
        rows.append(("rolled_back", agg["n"], float(agg["sv"])))
        rows.append(("n_snapshots", len(snapshot_history(spark, t)), 0.0))
        # round 8 (dir-census form since round 11): zone-map branch — a
        # stats-carrying commit with a disjoint event_id range, then a
        # skip_where read. The census counts the DISTINCT COMMIT×PARTITION
        # DIRECTORIES each scan touches (deterministic under the
        # immutable-dir protocol; part-file counts within a dir depend on
        # writer task parallelism and belong to pytest, not an oracle).
        extra = ev.filter(F.col("event_id") < 100).withColumn(
            "event_id", F.col("event_id") + 10_000_000
        )
        snapshot_append(spark, t, extra, ["d"], stats_cols=["event_id"])
        dir_of = F.regexp_replace(F.input_file_name(), "/[^/]+$", "")
        full_dirs = (
            snapshot_read(spark, t).select(dir_of).distinct().count()
        )
        zm = snapshot_read(
            spark, t, skip_where=[("event_id", 10_000_000, 99_999_999)]
        )
        # r14 perf: one scan computes both the skipped-read dir census
        # and the matching-row count (countDistinct == distinct().count();
        # the nondeterministic input_file_name is projected first, which
        # Aggregate accepts) — guide §2.4, one job instead of two.
        zagg = (
            zm.select(dir_of.alias("_dir"), "event_id")
            .agg(
                F.countDistinct("_dir").alias("nd"),
                F.count(
                    F.when(F.col("event_id") >= 10_000_000, True)
                ).alias("nr"),
            )
            .first()
        )
        rows.append(("zonemap_dirs_full", full_dirs, 0.0))
        rows.append(("zonemap_dirs_skipped", zagg["nd"], 0.0))
        rows.append(("zonemap_rows", zagg["nr"], 0.0))
        # round 9: incremental-consumption branch — snapshot_changes over
        # the append-only prefix reads ONLY the delta dirs (the Iceberg
        # incremental-read shape); the census reports the delta's rows +
        # value sum (equality with the appended batch and the replacement
        # fail-stop are pinned in test_snapshots.py)
        delta = snapshot_changes(spark, t, 1, to_version=2)
        dagg = delta.agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv")
        ).first()
        rows.append(("changes_v1_v2", dagg["n"], float(dagg["sv"])))
        rows.append(
            ("diff_v1_v2_added",
             len(snapshot_diff(spark, t, 1, 2)["added"]), 0.0)
        )
        # round 11: predicate-DELETE branch — snapshot_delete_where
        # removes the shifted extras with a prune bound, which drops the
        # extra commit's dirs wholesale (no survivors) while every other
        # dir is carried by reference; the census pins the post-delete
        # state (back to the rolled-back content), the dir count, and
        # the exact delete images the change feed emits across the
        # delete commit (the retraction path IVM consumes).
        from ..operators.snapshots import (
            current_version,
            snapshot_delete_where,
            snapshot_row_changes,
        )

        v_pre = current_version(spark, t)
        v_post = snapshot_delete_where(
            spark, t, "event_id >= 10000000",
            prune=[("event_id", 10_000_000, 10**15)],
        )
        post = snapshot_read(spark, t)
        # r14 perf: state census + dir census fused into one scan (same
        # projected-_dir shape as the zone-map census above)
        pagg = (
            post.select("value", dir_of.alias("_dir"))
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("sv"),
                F.countDistinct("_dir").alias("nd"),
            )
            .first()
        )
        rows.append(("delete_n_after", pagg["n"], float(pagg["sv"])))
        rows.append(("delete_dirs_after", pagg["nd"], 0.0))
        images = snapshot_row_changes(
            spark, t, ["event_id"], v_pre, to_version=v_post
        )
        rows.append(
            ("delete_images",
             images.filter(F.col("_change_type") == "delete").count(), 0.0)
        )
        # round 11 (this session): MERGE-INTO branch — the last DML verb.
        # Matched source rows (event_id < 50, all inside the FIRST date
        # dir because event ids are monotone with ts) update value to
        # round(value*3, 6); not-matched rows (the same first-20 events
        # shifted to negative keys) insert. The source key range
        # [-100, 49] auto-prunes the rewrite to the one intersecting dir
        # (zone-map stats recorded at append time) — pruning is physical
        # here and plan/manifest-asserted in test_snapshots.py; the
        # oracle pins the post-merge census and the exact change-feed
        # image count (inserts + 2 per value-changing update, null-safe).
        from ..operators.snapshots import snapshot_merge_into

        upd_src = ev.filter(F.col("event_id") < 50).withColumn(
            "value", F.round(F.col("value") * 3, 6)
        )
        ins_src = ev.filter(F.col("event_id") < 20).withColumn(
            "event_id", F.col("event_id") - 100
        )
        v_m_pre = current_version(spark, t)
        v_m = snapshot_merge_into(
            spark, t, upd_src.unionByName(ins_src), ["event_id"],
            stats_cols=["event_id"],
        )
        magg = (
            snapshot_read(spark, t)
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
            .first()
        )
        rows.append(("merge_n_after", magg["n"], float(magg["sv"])))
        imgs = snapshot_row_changes(
            spark, t, ["event_id"], v_m_pre, to_version=v_m
        )
        rows.append(("merge_images", imgs.count(), 0.0))
        # round 12: CONDITIONAL-merge branch — the out-of-order-CDC
        # guard as a first-match-wins clause list over s./t. images.
        # Source: events < 40 with value*5 and the DATE shifted +1 day
        # on even ids (newer) / -1 day on odd ids (stale). Clauses:
        # delete where "s.event_id < 10 AND s.d > t.d", else update
        # where "s.d > t.d" — so even ids < 10 delete, even ids 10..39
        # update (MOVING partitions: d is the partition column), odd
        # ids are stale and survive untouched (the guard's whole
        # point). The census pins the post-state and the image count
        # (1 per delete + 2 per update: the moved d always differs).
        cond_src = ev.filter(F.col("event_id") < 40).select(
            "event_id",
            "event_type",
            F.when(
                F.col("event_id") % 2 == 0, F.date_add("d", 1)
            ).otherwise(F.date_sub("d", 1)).alias("d"),
            F.round(F.col("value") * 5, 6).alias("value"),
        )
        v_c_pre = current_version(spark, t)
        v_c = snapshot_merge_into(
            spark, t, cond_src, ["event_id"],
            when_matched=[
                ("delete", "s.event_id < 10 AND s.d > t.d"),
                ("update", "s.d > t.d"),
            ],
            when_not_matched=None,
            stats_cols=["event_id"],
        )
        cagg = (
            snapshot_read(spark, t)
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
            .first()
        )
        rows.append(("cond_merge_n_after", cagg["n"], float(cagg["sv"])))
        cimgs = snapshot_row_changes(
            spark, t, ["event_id"], v_c_pre, to_version=v_c
        )
        rows.append(("cond_merge_images", cimgs.count(), 0.0))
        # round 12: SCHEMA-EVOLUTION branch — rename + drop are
        # METADATA-ONLY commits; the census re-reads the same content
        # under the new name (value->val, event_type dropped) and pins
        # the surviving column count. A corrupted map/drop would flip
        # the sums or the width driver-red.
        from ..operators.snapshots import (
            snapshot_drop_column,
            snapshot_rename_column,
        )

        snapshot_rename_column(spark, t, "value", "val")
        snapshot_drop_column(spark, t, "event_type")
        post_evolve = snapshot_read(spark, t)
        eagg = post_evolve.agg(
            F.count("*").alias("n"), F.round(F.sum("val"), 2).alias("sv")
        ).first()
        rows.append(("evolve_n_after", eagg["n"], float(eagg["sv"])))
        rows.append(("evolve_n_cols", len(post_evolve.columns), 0.0))
        # round 13: MERGE-ON-READ key-delete branch — delete event_ids
        # 40..59 via a key file + manifest entry, NO data dir rewritten;
        # the census pins the post-state (runs through the read-side
        # anti-join) and the exact delete images the change feed emits
        # across the MoR commit (the retraction path).
        from ..operators.snapshots import snapshot_delete_keys

        v_k_pre = current_version(spark, t)
        v_k = snapshot_delete_keys(
            spark, t, list(range(40, 60)), on=["event_id"]
        )
        kagg = (
            snapshot_read(spark, t)
            .agg(F.count("*").alias("n"), F.round(F.sum("val"), 2).alias("sv"))
            .first()
        )
        rows.append(("mor_delete_n_after", kagg["n"], float(kagg["sv"])))
        kimgs = snapshot_row_changes(
            spark, t, ["event_id"], v_k_pre, to_version=v_k
        )
        rows.append(
            ("mor_delete_images",
             kimgs.filter(F.col("_change_type") == "delete").count(), 0.0)
        )
        # round 14: BRANCH (write-audit-publish) stage — commits land on
        # an audit branch (invisible to main: the main census must still
        # read the post-MoR state), the branch census sees them, and
        # fast-forward publishes the branch lineage to main (post-publish
        # census == branch census). A branch commit leaking to main, a
        # lost branch commit, or a wrong fast-forward all flip a row.
        from ..operators.snapshots import (
            snapshot_branch,
            snapshot_drop_branch,
            snapshot_fast_forward,
        )

        wap = ev.filter(F.col("event_id") < 25).select(
            (F.col("event_id") + 20_000_000).alias("event_id"),
            "d",
            F.round(F.col("value") * 7, 6).alias("val"),
        )
        snapshot_branch(spark, t, "wap")
        snapshot_append(spark, t, wap, ["d"], branch="wap")

        def _census(df, val_col="val"):
            a = df.agg(
                F.count("*").alias("n"), F.round(F.sum(val_col), 2).alias("sv")
            ).first()
            return a["n"], float(a["sv"])

        # r14 perf: main and branch censuses are independent reads of
        # immutable states — overlap them (guide §2.6)
        with ThreadPoolExecutor(2) as pool:
            f_main = pool.submit(lambda: _census(snapshot_read(spark, t)))
            f_br = pool.submit(
                lambda: _census(snapshot_read(spark, t, branch="wap"))
            )
            mn, msv = f_main.result()
            bn, bsv = f_br.result()
        rows.append(("branch_main_n", mn, msv))
        rows.append(("branch_n_after", bn, bsv))
        snapshot_fast_forward(spark, t, "wap")
        snapshot_drop_branch(spark, t, "wap")
        pn, psv = _census(snapshot_read(spark, t))
        rows.append(("branch_published", pn, psv))
        # rows are already driver-local python tuples: the frame never
        # references the scratch table deleted in finally
        return spark.createDataFrame(rows, "label string, n long, sum_value double")
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# x45 — BPE vocabulary induction (tokenizer learning): the corpus is
# reduced to its (word, count) table in one pass; each merge round is a
# pair-count combine-shuffle over that vocab-sized table + a driver
# argmax. Iterative (non-SQL) => rows-only; exact merge sequence pinned
# against an independent pure-python BPE in pytest. Output: the learned
# merge table + the segmentation census it induces over the vocabulary.
# --------------------------------------------------------------------------
@register(
    "x45_bpe_vocab",
    oracle=None,
    doc="BPE merge learning over the corpus vocab + induced segmentation "
    "census (rows-only; exact python-reference twin in pytest)",
)
def x45_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import learn_bpe_local, segment_vocab, word_counts

    docs = _t(spark, sf_dir, "documents")
    # one corpus-sized counting pass, shared by learning and the census;
    # the merge loop runs driver-side (learn_bpe_local == learn_bpe
    # exactly, test-pinned) — the distributed loop stays as the oracle
    # twin, but a registered query should use the production learner
    vocab = word_counts(docs).localCheckpoint()
    merges = learn_bpe_local(docs, n_merges=15, word_counts_df=vocab)
    seg = segment_vocab(vocab.select("word"), merges)
    census = (
        vocab.join(seg, "word")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.avg(F.size("pieces")), 4).alias("avg_pieces_per_word"),
            F.sum(F.size("pieces") * F.col("wc")).alias("total_corpus_pieces"),
        )
        .select(
            F.lit(-1).cast("long").alias("rank"),
            F.lit("__census__").alias("a"),
            F.concat_ws(
                "|", "n_words", "avg_pieces_per_word", "total_corpus_pieces"
            ).alias("b"),
            F.lit(None).cast("long").alias("pair_count"),
        )
    )
    merge_rows = spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank long, a string, b string, pair_count long",
    )
    return merge_rows.unionByName(census).orderBy("rank")


# --------------------------------------------------------------------------
# x46 — REAL image pipeline end to end: manufacture spec-conformant binary
# PPM payloads from the documents bytes (encode), nearest-neighbor resize
# to a 4x4 thumbnail (decode+re-encode), then feature-extract the
# THUMBNAIL (decode again) — proving decode(resize(encode(x))) through
# three chained Arrow stages of the real netpbm codec, no stubs. Python
# codec boundary => no SQL oracle; a numpy twin pins exact channel means
# in tests/test_extensions.py.
# --------------------------------------------------------------------------
@register(
    "x46_image_pipeline",
    # ORACLE-CHECKED since round 12 (slot freed by x32->x42): the whole
    # codec chain replays in DuckDB because every stage is deterministic
    # byte arithmetic — synthesized 8x8 pixels are the doc's utf-8 bytes
    # CYCLED (byte idx mod L), the container transcode is lossless, the
    # 4x4 nearest-neighbor thumbnail samples source pixel (2r+1, 2c+1),
    # and channel means over 16 pixels divide by a power of two (exact
    # in binary). DuckDB extracts each sampled byte from hex(encode(
    # text)) via strpos arithmetic — a codec/resize regression flips
    # this driver-red with no image library anywhere.
    oracle="""
    WITH img AS (
      SELECT doc_id, upper(hex(encode(text))) AS h,
             octet_length(encode(text)) AS L
      FROM documents WHERE doc_id % 3 = 0),
    pos AS (SELECT k.k AS k,
                   ((2*r.r+1)*8 + (2*c.c+1))*3 + k.k AS idx
            FROM (SELECT unnest(generate_series(0,3)) AS r) r,
                 (SELECT unnest(generate_series(0,3)) AS c) c,
                 (SELECT unnest(generate_series(0,2)) AS k) k),
    vals AS (
      SELECT i.doc_id, p.k,
             CASE WHEN i.L = 0 THEN 0
                  ELSE (strpos('0123456789ABCDEF',
                               substr(i.h, 2*(p.idx % i.L) + 1, 1)) - 1)
                       * 16
                       + (strpos('0123456789ABCDEF',
                                 substr(i.h, 2*(p.idx % i.L) + 2, 1)) - 1)
             END AS v
      FROM img i CROSS JOIN pos p),
    m AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN k = 0 THEN v END) AS BIGINT) AS sr,
             CAST(sum(CASE WHEN k = 1 THEN v END) AS BIGINT) AS sg,
             CAST(sum(CASE WHEN k = 2 THEN v END) AS BIGINT) AS sb
      FROM vals GROUP BY doc_id)
    SELECT doc_id AS media_id,
           CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
           sr / 16.0 AS mean_r, sg / 16.0 AS mean_g, sb / 16.0 AS mean_b,
           (299 * sr + 587 * sg + 114 * sb) / 16000.0 AS mean_luma
    FROM m ORDER BY media_id
    """,
    doc="real image codec pipeline, oracle-checked: synthesize 8x8 "
    "payloads from doc bytes -> transcode across PPM/BMP/PNG -> 4x4 "
    "nearest-neighbor thumbnail -> pixel features; DuckDB replays the "
    "sampled bytes from hex(encode(text)) arithmetic",
)
def x46_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        extract_image_features,
        resize_images,
        synthesize_ppm_payloads,
        transcode_images,
    )

    m = media_frame(_t(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "image"
    )
    # round 12: the synthesized PPMs are transcoded to media_id%3-cycled
    # PPM/BMP/PNG containers before the resize, so all FOUR offline
    # codecs (incl. the new stdlib-zlib PNG) run distributed in the
    # registered pipeline; features are container-invariant, so the
    # output values are identical to the all-PPM form (test-pinned)
    ppm = transcode_images(
        synthesize_ppm_payloads(m, width=8, height=8), fmt="mixed"
    )
    thumbs = resize_images(ppm, width=4, height=4).select(
        "media_id",
        F.lit("image").alias("media_type"),
        F.col("resized").alias("payload"),
    )
    # mean_luma is re-derived as the EXACT integer ratio
    # (299*sum_r + 587*sum_g + 114*sum_b) / 16000: channel means are
    # exact sixteenths, so mean*16 reconstructs the integer channel sum
    # losslessly and both engines produce the identical double with NO
    # decimal rounding anywhere — the rounded form lands exactly on
    # .xx5 boundaries half the time (means are 1/16-multiples) and
    # python/DuckDB disagree exactly there (the established 2dp trap at
    # 6dp). decode_real_features keeps its documented rounded luma for
    # feature consumers; the oracle-checked census uses the exact form.
    feats = extract_image_features(thumbs)
    luma = (
        F.col("mean_r") * 16 * 299
        + F.col("mean_g") * 16 * 587
        + F.col("mean_b") * 16 * 114
    ) / F.lit(16000.0)
    return (
        feats.select(
            "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
            luma.alias("mean_luma"),
        )
        .orderBy("media_id")
    )


# --------------------------------------------------------------------------
# x47 — BPE corpus ENCODING: the other half of the tokenizer (x45 learns
# the vocabulary, this applies it), turning every document into the
# integer id sequence a training pipeline consumes. Merges run once per
# vocab word; the corpus pays exactly two natural-key shuffles (word
# join, per-doc reassembly). Python-free, but the id assignment depends
# on the learned merges => no SQL oracle; an exact python-tokenizer twin
# pins full id sequences in tests/test_extensions.py.
# --------------------------------------------------------------------------
@register(
    "x47_bpe_tokenize",
    oracle=None,
    doc="BPE corpus encoding with the learned vocab: per-doc token-id "
    "sequences + UNK counts (rows-only; exact python twin in pytest)",
)
def x47_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import encode_corpus, learn_bpe_local, word_counts

    docs = _t(spark, sf_dir, "documents")
    vocab = word_counts(docs).localCheckpoint()  # one corpus counting pass
    merges = learn_bpe_local(
        docs, n_merges=12, word_counts_df=vocab, merges_per_round=4
    )
    return (
        encode_corpus(docs, merges, word_counts_df=vocab)
        .select(
            "doc_id",
            "n_tokens",
            "n_unk",
            F.slice("token_ids", 1, 8).alias("head_ids"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# x48 — the tokenizer-to-trainer chain: learn the BPE vocab (x45's
# machinery), encode every document (x47's), then materialize packed
# fixed-length training rows with doc-boundary spans — the artifact a
# pretraining loader actually reads. Every window's ids must equal the
# sequential concat-then-chunk of the corpus in doc_id order; the
# python twin in tests pins that window-for-window (pack_token_ids
# test), and sum(n_filled) == sum of x47's n_tokens by construction.
# --------------------------------------------------------------------------
@register(
    "x48_pack_training_rows",
    oracle=None,
    doc="learn BPE -> encode corpus -> pack fixed 512-token training rows "
    "with doc-span masks (rows-only; concat-chunk twin in pytest)",
)
def x48_pack_training_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import encode_corpus, learn_bpe_local, word_counts
    from ..operators.packing import pack_token_ids

    docs = _t(spark, sf_dir, "documents")
    vocab = word_counts(docs).localCheckpoint()
    merges = learn_bpe_local(
        docs, n_merges=12, word_counts_df=vocab, merges_per_round=4
    )
    enc = encode_corpus(docs, merges, word_counts_df=vocab)
    return (
        pack_token_ids(enc, seq_len=512)
        .select(
            "seq_id",
            "n_docs",
            "n_filled",
            F.slice("token_ids", 1, 6).alias("head_ids"),
            F.element_at("doc_spans", 1)["doc_id"].alias("first_doc"),
            F.element_at("doc_spans", -1)["doc_id"].alias("last_doc"),
        )
        .orderBy("seq_id")
    )


# --------------------------------------------------------------------------
# x49 — SEMANTIC decontamination: the embedding-space twin of x25 (n-gram
# decontamination) — train-split vectors too close in cosine to any
# test-split vector, blocked by the embeddings' cluster id exactly like
# x10's 'neardup' branch. ORACLE-CHECKED since round 11 (slot freed by
# x12→x10): every stage is deterministic — the split assignment is the
# md5 hash bucket DuckDB already replays bit-exactly for x30
# (('0x' || substr(md5(id),1,8))::UBIGINT % 100; <80 train, <90 val,
# else test), the blocked TRAIN×TEST GEMM rounds to 6 dp exactly like
# x10/x12's proven list_cosine_similarity twin, and the argmax
# tie-break (best test neighbor, ties to the smallest test id over the
# ROUNDED sims) is row_number() ORDER BY cos_sim DESC, test_id. The
# threshold filters the BEST pair only — rn = 1 before >= 0.35, exactly
# the Spark kernel's keep = best_sim >= threshold. The independent
# numpy replay stays in pytest.
# --------------------------------------------------------------------------
@register(
    "x49_semantic_decontaminate",
    oracle="""
    WITH s AS (
      SELECT label, vec_id, embedding,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT *, ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                      ::UBIGINT % 100 AS b
            FROM embeddings)),
    pairs AS (
      SELECT tr.label AS block, tr.vec_id AS train_id, te.vec_id AS test_id,
             round(list_cosine_similarity(tr.embedding::DOUBLE[],
                                          te.embedding::DOUBLE[]), 6) AS cos_sim
      FROM s tr
      JOIN s te ON tr.label = te.label
       AND tr.split = 'train' AND te.split = 'test')
    SELECT block, train_id, test_id, cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY train_id
                                       ORDER BY cos_sim DESC, test_id) AS rn
          FROM pairs)
    WHERE rn = 1 AND cos_sim >= 0.35
    ORDER BY train_id
    """,
    doc="semantic cross-split decontamination: train vectors with a "
    "cosine >= 0.35 test neighbor in their block, argmax neighbor "
    "attribution (oracle replays split hash + blocked cosine + "
    "tie-break; exact numpy twin in pytest)",
)
def x49_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.splits import assign_split
    from ..operators.similarity import cross_split_semantic_overlap

    e = _t(spark, sf_dir, "embeddings")
    return cross_split_semantic_overlap(
        e,
        assign_split(F.col("vec_id").cast("string")),
        threshold=0.35,
    ).orderBy("train_id")


# --------------------------------------------------------------------------
# x50 — persisted index artifacts, end-to-end: build each index family
# member (PQ codes, IVF cells, BM25 postings) into scratch over HALF the
# corpus, APPEND the other half, run the indexed search, and CHECK it
# against the from-scratch path. ORACLE-CHECKED since round 9 (slot
# freed by x17→x13): the 'bm25' rows are the indexed top-10 FROM THE
# HALF-BUILT-PLUS-APPENDED STORE, and the oracle recomputes them from
# `documents` with x32's full BM25 SQL — a genuinely independent
# recomputation that fails if the append protocol loses/duplicates any
# posting, doc length, or corpus stat (df/avgdl/n_docs shift). The
# 'pq'/'ivf' rows carry the indexed-vs-in-memory equality the engine
# computes over its persisted artifacts; DuckDB cannot reach those
# artifacts (kmeans/codebook floats aren't SQL-expressible), so the
# oracle pins the CONTRACT values those rows must equal (n_results=40:
# 4 probes x k=10; eq=true) — a regression flips the Spark side and the
# driver goes red. Byte-equality twins stay in pytest.
# --------------------------------------------------------------------------
@register(
    "x50_persisted_indexes",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN ({_X32_TERMS_SQL}) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm AS (
      SELECT row_number() OVER (ORDER BY sum(contrib) DESC, doc_id) AS rank,
             doc_id,
             round(sum(contrib), 6) AS score,
             count(*) AS n_terms_hit
      FROM (
          SELECT tf.doc_id, ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                 AS contrib
          FROM tf JOIN df USING (term) CROSS JOIN stats JOIN dl USING (doc_id)
      )
      GROUP BY doc_id
      ORDER BY score DESC, doc_id
      LIMIT 10)
    SELECT 'bm25' AS family, rank, doc_id, score, n_terms_hit,
           CAST(NULL AS BIGINT) AS n_results,
           CAST(NULL AS BIGINT) AS eq_in_memory
    FROM bm
    UNION ALL
    SELECT 'ivf', NULL, NULL, NULL, NULL, 40, 1
    UNION ALL
    SELECT 'ivfpq', NULL, NULL, NULL, NULL, 40, 1
    UNION ALL
    SELECT 'pq', NULL, NULL, NULL, NULL, 40, 1
    ORDER BY family, rank
    """,
    doc="persisted PQ/IVF/BM25 index artifacts incl. incremental appends: "
    "build over half the corpus, append the rest; bm25 rows = indexed "
    "top-10 from the appended store, independently recomputed by the "
    "oracle from documents; pq/ivf rows = indexed-vs-in-memory equality "
    "against the pinned contract values (byte-equality also in pytest)",
)
def x50_persisted_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each family builds over HALF the corpus and APPENDS the other half
    (``append_to_index`` / ``append_to_bm25_index`` — snapshot-semantics
    maintenance, meta-last), so one equality row certifies both the
    persisted-read path and the append path: the twin uses the SAME
    frozen structures (codebooks/centroids trained on the first half; bm25
    freezes nothing) over the full corpus."""
    import shutil
    import tempfile

    import numpy as np

    from ..operators.retrieval import (
        append_to_bm25_index,
        bm25_topk_indexed,
        build_bm25_index,
    )
    from ..operators.similarity import (
        _kmeans_cells,
        pq_encode,
        topk_ivf,
        topk_ivfpq,
        topk_pq_adc,
        train_pq_codebooks,
    )
    from ..operators.vector_index import (
        append_to_index,
        assign_cells,
        build_ivf_index,
        build_ivfpq_index,
        build_pq_index,
        topk_ivf_indexed,
        topk_ivfpq_indexed,
        topk_pq_indexed,
    )
    from ..functions.vectors import to_double, unit
    from .extensions import X32_QUERY_TERMS

    base = tempfile.mkdtemp(prefix="x50_")
    try:
        emb = _t(spark, sf_dir, "embeddings")
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        queries = emb.filter(F.col("vec_id") < 4)
        e_first = emb.filter(F.col("vec_id") % 2 == 0)
        e_rest = emb.filter(F.col("vec_id") % 2 == 1)

        build_pq_index(spark, e_first, f"{base}/pq")
        append_to_index(spark, f"{base}/pq", e_rest)
        books = train_pq_codebooks(e_first)
        mem_pq = sorted(map(tuple, topk_pq_adc(
            pq_encode(emb, books), queries, books, corpus=emb, k=10).collect()))
        idx_pq = sorted(map(tuple, topk_pq_indexed(
            spark, f"{base}/pq", queries, corpus=emb, k=10).collect()))

        build_ivf_index(spark, e_first, f"{base}/ivf", n_cells=16)
        append_to_index(spark, f"{base}/ivf", e_rest)

        ivfpq_meta = build_ivfpq_index(spark, e_first, f"{base}/ivfpq", n_cells=16)
        append_to_index(spark, f"{base}/ivfpq", e_rest)
        assigned_first, centroids = _kmeans_cells(e_first, 16)
        urest = e_rest.select(
            F.col("vec_id").alias("id"), unit(to_double("embedding")).alias("_uvec")
        ).filter(F.col("_uvec").isNotNull())
        assigned_union = assigned_first.unionByName(assign_cells(urest, centroids))
        mem_ivf = sorted(map(tuple, topk_ivf(
            None, queries, k=10, n_cells=16, nprobe=6,
            _index=(assigned_union, centroids)).collect()))
        idx_ivf = sorted(map(tuple, topk_ivf_indexed(
            spark, f"{base}/ivf", queries, k=10, nprobe=6).collect()))

        d_first = docs.filter(F.col("doc_id") % 2 == 0)
        d_rest = docs.filter(F.col("doc_id") % 2 == 1)
        build_bm25_index(spark, d_first, f"{base}/bm25", n_buckets=64)
        append_to_bm25_index(spark, d_rest, f"{base}/bm25")
        # the bm25 branch rows ARE the indexed results from the appended
        # store — the oracle recomputes them from `documents` directly,
        # so a lost/duplicated posting or drifted corpus stat goes red
        idx_bm_rows = bm25_topk_indexed(
            spark, f"{base}/bm25", X32_QUERY_TERMS, k=10
        ).collect()

        # eq flags ride as 0/1 bigints (a NULL boolean canonicalizes
        # differently across the two pandas bridges; NULL bigints agree)
        # ivfpq twin: same frozen structures (codebooks + first-half
        # centroids) through the in-memory kernel over the full corpus
        books_np = np.asarray(ivfpq_meta["codebooks"])
        codes_cells = pq_encode(emb, books_np).join(
            assigned_union.select("id", "cell"), "id"
        )
        mem_ivfpq = sorted(map(tuple, topk_ivfpq(
            corpus=emb, queries=queries, k=10, nprobe=6,
            _index=(codes_cells, centroids, books_np)).collect()))
        idx_ivfpq = sorted(map(tuple, topk_ivfpq_indexed(
            spark, f"{base}/ivfpq", queries, corpus=emb, k=10, nprobe=6
        ).collect()))

        summary = [
            ("pq", None, None, None, None, len(idx_pq), int(idx_pq == mem_pq)),
            ("ivf", None, None, None, None, len(idx_ivf), int(idx_ivf == mem_ivf)),
            ("ivfpq", None, None, None, None, len(idx_ivfpq),
             int(idx_ivfpq == mem_ivfpq)),
        ]
        bm = [
            ("bm25", r["rank"], r["doc_id"], r["score"], r["n_terms_hit"],
             None, None)
            for r in idx_bm_rows
        ]
        return spark.createDataFrame(
            bm + summary,
            "family string, rank long, doc_id long, score double, "
            "n_terms_hit long, n_results long, eq_in_memory long",
        ).orderBy("family", "rank")
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# x51 — exact duplicated-span detection: maximal token spans whose every
# k-gram appears in >= 2 distinct documents (the substring-granular dedup
# member — catches verbatim-repeated passages that survive document-level
# dedup because the containing documents differ). Registered with the
# same stop-phrase df cap convention as x25; the oracle replays the
# identical positioned-gram census + island merge in SQL (zipped unnests
# for (gram, pos), lag/running-sum islands). Spark registers the
# PRODUCTION default — census keyed on xxhash64(gram), 8 bytes through
# both shuffles instead of a 5-token string (measured 2.6 vs 6.5 s at
# sf0.1) — while the oracle keys on the gram string: final spans agree
# unless a 64-bit collision merges two grams' counts (odds ~ n²/2⁶⁴,
# deterministic either way; the string-key variant is equality-pinned
# against this one in pytest).
# --------------------------------------------------------------------------
_X51_K = 5
_X51_CAP = 60


@register(
    "x51_duplicated_spans",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS tok FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(
                     range(1, greatest(len(tok) - {_X51_K} + 1, 0) + 1),
                     i -> array_to_string(list_slice(tok, i, i + {_X51_K - 1}), ' '))) AS gram,
                 unnest(range(0, greatest(len(tok) - {_X51_K} + 1, 0))) AS pos
          FROM tok),
    census AS (SELECT gram FROM g GROUP BY gram
               HAVING count(DISTINCT doc_id) >= 2
                  AND count(DISTINCT doc_id) <= {_X51_CAP}),
    hits AS (SELECT doc_id, pos FROM g SEMI JOIN census USING (gram)),
    isl AS (SELECT doc_id, pos,
                   sum(CASE WHEN prev IS NULL OR pos - prev > {_X51_K}
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM (SELECT doc_id, pos,
                         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                  FROM hits))
    SELECT doc_id,
           min(pos)                                  AS span_start,
           max(pos) + {_X51_K - 1}                   AS span_end,
           max(pos) + {_X51_K} - min(pos)            AS n_tokens,
           count(*)                                  AS n_grams
    FROM isl
    GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
    doc="exact duplicated-span dedup: maximal cross-doc-repeated k-token "
    "spans (positioned-gram census + island merge), stop-phrase df-capped",
)
def x51_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicated_spans

    return duplicated_spans(
        _t(spark, sf_dir, "documents"),
        k=_X51_K,
        min_docs=2,
        max_gram_df=_X51_CAP,
    )


# --------------------------------------------------------------------------
# (x52_countmin_sketch was consolidated into x03's union-tagged 'cms'
# branch in round 11 — same sketch build, same portable md5 oracle
# arithmetic, n := estimate / n_docs := exact. No standalone function
# remains: the countmin_table/countmin_estimate operators keep their
# direct exact-twin + overestimate/error-envelope tests in
# tests/test_retrieval.py, and the driver checks the fold through x03
# every round. Freed the window slot that oracle-checks x53_int8_topk.)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# x53 — int8-quantized embedding top-k: the storage/IO point between the
# exact float baseline (x10) and 16-byte PQ codes (x41) — 1 byte/dim +
# one float scale (4x smaller scans than float32 embeddings) with
# near-exact recall; the integer GEMM accumulates in int32 and the
# scale/norm rescale restores cosine up to ~1/254-per-component
# quantization error. Oracle-checked under its own name rounds 11-13;
# round 14 CONSOLIDATED it into x10's union-tagged 'int8' branch (same
# two-level top-k plan and tie rule — the oracle construction carried
# over verbatim) to free the slot that oracle-promoted w09. UNREGISTERED
# function since then (x10's branch and the recall pytest call it
# directly, the x22/w10 precedent). The oracle arithmetic notes:
# every stage is deterministic arithmetic DuckDB can replay —
# quantization is round(x / (max|x|/127)) (both engines round halves
# away from zero for doubles), the int8×int8 dot is EXACT in doubles
# (|dot| ≤ 64·127² ≪ 2⁵³), and the rescale association mirrors the
# kernel exactly: (dot · (c_scale/c_norm)) · (q_scale/q_norm), rounded
# to 6 dp before ranking with the same ties-to-smaller-id cut. Known
# tie-boundary caveat (x51's 2^-64-class disclaimer): the kernel's
# SCORE rounding is np.round (half-to-even) while DuckDB rounds half
# away, and numpy's pairwise-summed norms can differ from list_sum by
# ulps — a score landing within an ulp of an exact x.xxxxx5 boundary
# could round apart. Measure-zero on real data (verified green at
# sf0.01 AND sf0.1); the quantization stage itself has no such gap
# (Spark F.round is HALF_UP, matching DuckDB exactly). Recall floor vs
# x10 and the numpy quantization twin stay in pytest.
# --------------------------------------------------------------------------
def x53_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import quantize_embeddings, topk_bruteforce_int8

    q = quantize_embeddings(_t(spark, sf_dir, "embeddings")).localCheckpoint()
    return topk_bruteforce_int8(q, q.filter(F.col("id") < 5), k=10)


# --------------------------------------------------------------------------
# x54 — snapshot CHANGE-FEED surface (round 10): (a) the row-level keyed
# diff between two versions of a maintained CDC table ACROSS a
# compaction commit — exactly the range where file-level incremental
# reads (snapshot_changes) fail-stop by design — (b) the
# exactly-once incremental consumer whose high-water mark rides the
# sink manifest, and (c) since round 11 the INCREMENTAL VIEW branch:
# an aggregate view bootstrapped at v1 and refreshed ONCE by applying
# the change feed with signed multiplicity (operators/ivm.py) across
# the compaction — it must land exactly on the direct aggregate of the
# final state (the oracle re-aggregates s2; cross-group moves exercise
# retraction from the old group's row). ORACLE-CHECKED: the diff branch is a pure
# function of the events table — state@v = latest-per-user over the
# batches merged so far, so DuckDB rebuilds both states with window
# functions and re-derives the Delta-CDF census (update fires iff the
# winning event changed, which for unique event_ids is iff the ids
# differ); the consume branch's landed rows are exactly the union of
# the two appended filters. The census uses only EXACT aggregates
# (counts + BIGINT event_id sums — no float sums) so the value-hash is
# engine-stable. Exact change images, crash/restart exactly-once, and
# fail-stop contracts stay value-pinned in tests/test_snapshots.py
# (test_snapshot_row_changes_across_replacements,
# test_snapshot_consume_changes_exactly_once).
# --------------------------------------------------------------------------
@register(
    "x54_change_feed",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type, ts, value FROM events),
    b1 AS (SELECT * FROM ev WHERE event_id % 2 = 0 AND user_id % 10 != 0),
    u  AS (SELECT * FROM b1 UNION ALL
           SELECT * FROM ev WHERE event_id % 2 = 1),
    s1 AS (SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
             FROM b1) WHERE rn = 1),
    s2 AS (SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
             FROM u) WHERE rn = 1),
    ins AS (SELECT 'insert' AS tag, n.user_id, n.event_id
            FROM s2 n LEFT JOIN s1 o ON n.user_id = o.user_id
            WHERE o.user_id IS NULL),
    upd AS (SELECT o.user_id AS user_id, o.event_id AS old_id,
                   n.event_id AS new_id
            FROM s1 o JOIN s2 n ON o.user_id = n.user_id
            WHERE o.event_id <> n.event_id),
    chg AS (SELECT tag, user_id, event_id FROM ins
            UNION ALL
            SELECT 'update_preimage' AS tag, user_id, old_id AS event_id
            FROM upd
            UNION ALL
            SELECT 'update_postimage' AS tag, user_id, new_id AS event_id
            FROM upd)
    SELECT 'diff' AS branch, tag, count(*) AS n_rows,
           count(DISTINCT user_id) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM chg GROUP BY tag
    UNION ALL
    SELECT 'consume' AS branch, event_type AS tag, count(*) AS n_rows,
           count(DISTINCT user_id) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM ev WHERE event_id % 3 IN (0, 1) GROUP BY event_type
    UNION ALL
    -- 'view': the maintained aggregate view AFTER applying the change
    -- feed (bootstrap at state v1, one delta refresh across the
    -- compaction + second merge) must equal a direct aggregate of the
    -- FINAL state — one state row per user, so n_rows doubles as the
    -- distinct-user count
    SELECT 'view' AS branch, event_type AS tag, count(*) AS n_rows,
           count(*) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM s2 GROUP BY event_type
    ORDER BY branch, tag
    """,
    doc="snapshot change-data surface, union-tagged: 'diff' = row-level "
    "keyed diff across a compaction (Delta-CDF shape: insert/delete/"
    "update pre+post images; oracle rebuilds both states via window "
    "functions); 'consume' = exactly-once incremental consumer census "
    "(HWM rides the sink manifest; oracle = union of the appended "
    "filters); 'view' = incremental view maintenance — bootstrap + one "
    "retraction-applied refresh across the compaction must equal the "
    "direct aggregate of the final state (oracle re-aggregates s2). "
    "Exact image/crash twins in pytest",
)
def x54_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.cdc import merge_cdc_batch
    from ..operators.snapshots import (
        current_version,
        snapshot_append,
        snapshot_consume_changes,
        snapshot_read,
        snapshot_rewrite,
        snapshot_row_changes,
    )

    from ..operators.ivm import incremental_view_refresh, read_view

    base = tempfile.mkdtemp(prefix="x54_")
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )

    # r15 perf (guide §2.6): the 'diff'+'view' sub-protocol (tables
    # state/view) and the 'consume' sub-protocol (tables src/snk) are
    # fully independent single-writer pipelines over DISJOINT scratch
    # tables — x44's overlap treatment applied to the change-feed
    # protocol. Each branch stays sequential internally (real data
    # dependencies: merge -> refresh -> rewrite -> merge -> refresh,
    # append -> poll -> append -> poll), but running the two branches on
    # two driver threads lets each branch's many small jobs back-fill
    # the other's commit/listing tails. Same rows by construction: no
    # shared table, no shared high-water mark, thread-local job state.
    def _diff_view_branch():
        # --- 'diff': maintained CDC table, upsert -> compact -> upsert
        # (users ≡ 0 mod 10 are withheld from the first batch so the
        # diff exercises 'insert' rows alongside the update pre/post
        # images; 'delete' needs a purge and stays pinned in pytest)
        state = f"{base}/state"
        merge_cdc_batch(
            spark,
            ev.filter(
                (F.col("event_id") % 2 == 0) & (F.col("user_id") % 10 != 0)
            ),
            state,
            ["user_id"], "ts", "event_id", commit_protocol="snapshot",
        )
        v1 = current_version(spark, state)
        # --- 'view' bootstrap: aggregate view over state@v1, then ONE
        # retraction-applied refresh after the compaction + second
        # merge — the maintained view must land on the direct aggregate
        # of the final state (cross-group moves retract from the old
        # event_type's row)
        vw = f"{base}/view"
        incremental_view_refresh(
            spark, state, vw, ["user_id"], ["event_type"], ["event_id"]
        )
        snapshot_rewrite(spark, state, ["bucket"])  # replacement commit
        merge_cdc_batch(
            spark, ev.filter(F.col("event_id") % 2 == 1), state,
            ["user_id"], "ts", "event_id", commit_protocol="snapshot",
        )
        incremental_view_refresh(
            spark, state, vw, ["user_id"], ["event_type"], ["event_id"]
        )
        view = read_view(spark, vw).select(
            F.col("event_type").alias("tag"),
            F.col("n_rows"),
            F.col("n_rows").alias("n_keys"),  # state keys unique per user
            F.col("sum_event_id").alias("id_sum"),
        )
        chg = snapshot_row_changes(spark, state, ["user_id"], v1)
        diff = chg.groupBy(F.col("_change_type").alias("tag")).agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_keys"),
            F.sum("event_id").alias("id_sum"),
        )
        return diff, view

    def _consume_branch():
        # --- 'consume': two appends, two exactly-once polls
        src, snk = f"{base}/src", f"{base}/snk"
        snapshot_append(spark, src, ev.filter(F.col("event_id") % 3 == 0))
        snapshot_consume_changes(spark, src, snk)
        snapshot_append(spark, src, ev.filter(F.col("event_id") % 3 == 1))
        snapshot_consume_changes(spark, src, snk)
        landed = snapshot_read(spark, snk)
        return landed.groupBy(F.col("event_type").alias("tag")).agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_keys"),
            F.sum("event_id").alias("id_sum"),
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        f_dv = pool.submit(_diff_view_branch)
        f_c = pool.submit(_consume_branch)
        diff, view = f_dv.result()
        consume = f_c.result()
    return (
        diff.select(F.lit("diff").alias("branch"), "*")
        .unionByName(consume.select(F.lit("consume").alias("branch"), "*"))
        .unionByName(view.select(F.lit("view").alias("branch"), "*"))
        .orderBy("branch", "tag")
    )


# --------------------------------------------------------------------------
# x55 — DSIR data selection (Xie et al. 2023): select training documents
# by IMPORTANCE RESAMPLING toward a target distribution — the published
# method behind "make the web corpus look like Wikipedia". Per-doc log
# importance weight Σ[ln p_tgt − ln p_raw] with raw-side Laplace and
# target-side DIRICHLET-prior smoothing over the raw model (Zhai &
# Lafferty 2001; naive two-sided Laplace makes never-seen junk WIN when
# the target is small — see importance_weights' docstring); selection
# is Gumbel-top-k (key = logw − ln(−ln u), u from 48 md5 bits of
# (id, seed)) — a true without-replacement sample ∝ exp(logw), not a
# mode-seeking hard threshold, yet a pure function of (row, seed) any
# md5-capable engine replays. The oracle rebuilds the split, both LMs,
# the Dirichlet log-ratio sums, the Gumbel keys (6 dp rounded, the
# x49/x53 boundary convention), the top-150 cut with id tie-break, and
# the per-lang census of the SELECTED set — membership itself is the
# check. Registered on the slot freed by x06→x07 (fingerprints ride
# x07's union since round 11). Scale shape: one vocab-sized full-outer
# LM merge (broadcast), one explode + broadcast join + doc-id shuffle,
# one distributed top-k (TakeOrderedAndProject) — no global sort, no
# second corpus pass.
# --------------------------------------------------------------------------
@register(
    "x55_dsir_select",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, text, {_SQL_TOKENS} AS tok FROM documents),
    sp AS (SELECT *, CASE
             WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 < 80 THEN 'train'
             WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
           FROM tok),
    tlm AS (SELECT token, count(*) AS c
            FROM (SELECT unnest(tok) AS token FROM sp WHERE split = 'val')
            GROUP BY token),
    rlm AS (SELECT token, count(*) AS c
            FROM (SELECT unnest(tok) AS token FROM sp WHERE split = 'train')
            GROUP BY token),
    tden AS (SELECT sum(c)::DOUBLE + 1000.0 AS d FROM tlm),
    rden AS (SELECT sum(c)::DOUBLE + count(*)::DOUBLE AS d FROM rlm),
    dt AS (SELECT doc_id, lang, unnest(tok) AS token FROM sp
           WHERE split = 'train'),
    sc AS (SELECT dt.doc_id, dt.lang,
                  ln((coalesce(t.c, 0)
                      + 1000.0 * ((coalesce(r.c, 0) + 1) / (SELECT d FROM rden)))
                     / (SELECT d FROM tden))
                  - ln((coalesce(r.c, 0) + 1) / (SELECT d FROM rden)) AS lw
           FROM dt LEFT JOIN tlm t USING (token) LEFT JOIN rlm r USING (token)),
    doc AS (SELECT doc_id, lang, count(*) AS n_tokens, sum(lw) AS logw
            FROM sc GROUP BY doc_id, lang),
    keyed AS (SELECT *,
              round(logw - ln(-ln(
                (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || '7'),
                                 1, 12))::UBIGINT + 0.5)
                / 281474976710656.0)), 6) AS key
              FROM doc),
    sel AS (SELECT * FROM keyed ORDER BY key DESC, doc_id LIMIT 150)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sel,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           round(avg(key), 6) AS avg_key,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM sel GROUP BY lang ORDER BY lang
    """,
    doc="DSIR importance resampling: target/raw unigram LMs -> per-doc "
    "log weight -> deterministic Gumbel-top-k selection; per-lang census "
    "of the selected set (membership = the check)",
)
def x55_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.splits import assign_split
    from ..operators.lm import dsir_select, unigram_counts

    d = _t(spark, sf_dir, "documents").withColumn("split", assign_split("text"))
    target_lm = unigram_counts(d.filter(F.col("split") == "val"))
    raw = d.filter(F.col("split") == "train")
    raw_lm = unigram_counts(raw)
    sel = dsir_select(raw, target_lm, raw_lm, k=150, seed=7)
    return (
        sel.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sel"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.round(F.avg("key"), 6).alias("avg_key"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )
