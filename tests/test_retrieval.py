"""BM25 retrieval + n-gram census: exact DuckDB twins (oracle in all but
registry position — the 50-slot driver window is full) and edge cases."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark.operators.retrieval import bm25_topk, heavy_hitters
from lambda_kafka_to_s3_parquet_spark.plans import all_specs
from lambda_kafka_to_s3_parquet_spark.plans.extensions import X32_QUERY_TERMS
from lambda_kafka_to_s3_parquet_spark.session import load_table

_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def test_bm25_matches_duckdb_twin(spark, sf_dir):
    """The registered x32 BM25 ranking must equal a DuckDB twin running the
    identical tokenizer and Robertson idf/tf math; ranks and doc ids are
    exact, scores agree to the shared 6-decimal rounding (1e-6 tolerance
    covers the one cross-engine float-sum-order ulp)."""
    # x32 is an unregistered function since round 12 (folded into x42's
    # 'bm25' branch); its DuckDB twin stays pinned here
    from lambda_kafka_to_s3_parquet_spark.plans.extensions import (
        x32_bm25_search,
    )

    got = x32_bm25_search(spark, sf_dir).collect()
    terms = ", ".join(f"'{t}'" for t in X32_QUERY_TERMS)
    want = duckdb.sql(f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOK}) AS term
            FROM parquet_scan('{_docs_path(sf_dir)}')
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok
            WHERE term IN ({terms}) GROUP BY doc_id, term
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
    """).fetchall()
    assert len(got) == len(want) == 10
    for g, (rank, doc_id, score, hits) in zip(got, want):
        assert (g["rank"], g["doc_id"], g["n_terms_hit"]) == (rank, doc_id, hits)
        assert abs(g["score"] - score) < 1e-6
    # non-vacuous: multi-term matches exist and scores strictly ordered
    assert any(g["n_terms_hit"] > 1 for g in got)
    scores = [g["score"] for g in got]
    assert scores == sorted(scores, reverse=True)


def test_bm25_rejects_empty_query(spark, sf_dir):
    with pytest.raises(ValueError):
        bm25_topk(load_table(spark, sf_dir, "documents"), [])


def test_bm25_unmatched_terms_are_no_hits(spark, sf_dir):
    """Terms absent from the corpus contribute nothing and produce an
    empty ranking rather than an error."""
    docs = load_table(spark, sf_dir, "documents")
    assert bm25_topk(docs, ["zzzzqqqqxxxx"], k=5).count() == 0


def test_heavy_hitters_matches_duckdb_twin(spark, sf_dir):
    # x33 consolidated into x03's 'bigram' branch (round 9); the local
    # twin keeps checking the same heavy-hitters census through it
    got = [
        (r["rank"], r["gram"], r["n"])
        for r in all_specs()["x03_token_stats"].fn(spark, sf_dir).collect()
        if r["branch"] == "bigram"
    ]
    want = duckdb.sql(f"""
        WITH tok AS (
            SELECT {_TOK} AS tok FROM parquet_scan('{_docs_path(sf_dir)}')
        ),
        grams AS (
            SELECT unnest([tok[i] || ' ' || tok[i + 1] for i in range(1, len(tok))]) AS gram
            FROM tok WHERE len(tok) >= 2
        )
        SELECT row_number() OVER (ORDER BY count(*) DESC, gram) AS rank,
               gram, count(*) AS freq
        FROM grams GROUP BY gram
        ORDER BY freq DESC, gram
        LIMIT 20
    """).fetchall()
    assert got == [tuple(w) for w in want]
    assert len(got) == 20 and got[0][2] >= got[-1][2] > 0


def test_heavy_hitters_unigrams_match_duckdb(spark, sf_dir):
    """n=1 degenerates to plain term frequency — same twin, no gram glue."""
    got = [
        (r["gram"], r["freq"])
        for r in heavy_hitters(load_table(spark, sf_dir, "documents"), n=1, k=5).collect()
    ]
    want = duckdb.sql(f"""
        SELECT term, count(*) AS freq FROM (
            SELECT unnest({_TOK}) AS term FROM parquet_scan('{_docs_path(sf_dir)}')
        ) GROUP BY term ORDER BY freq DESC, term LIMIT 5
    """).fetchall()
    assert got == [tuple(w) for w in want]


def test_heavy_hitters_rejects_bad_n(spark, sf_dir):
    with pytest.raises(ValueError):
        heavy_hitters(load_table(spark, sf_dir, "documents"), n=0)


def test_bm25_topk_plan_is_distributed_topk(spark, sf_dir):
    """The final ranking must lower to TakeOrderedAndProject (per-partition
    partial top-k), never a single-partition global sort of the scored
    set."""
    df = bm25_topk(load_table(spark, sf_dir, "documents"), X32_QUERY_TERMS, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rrf_fusion_hand_computed(spark):
    """RRF arithmetic against a hand-computed twin: two 3-doc rankings
    with one shared doc; k_rrf=60."""
    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(11, 1), (13, 2), (14, 3)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b]).collect()}
    assert out[11]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert out[11]["n_lists"] == 2
    assert out[10]["rrf_score"] == round(1 / 61, 6)
    assert out[13]["rrf_score"] == round(1 / 62, 6)
    # the doc found by BOTH lists outranks every single-list doc here
    assert out[11]["rank"] == 1


def test_rrf_fuse_empty_rankings_rejected(spark):
    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_rrf_mixes_modalities(spark, sf_dir):
    """The fused top-10 must contain contributions from BOTH rankings
    (n_lists=2 for at least the PRF seed docs), and every rank is unique."""
    from lambda_kafka_to_s3_parquet_spark.plans import all_specs

    rows = all_specs()["x42_hybrid_rrf"].fn(spark, sf_dir).collect()
    # round 12: union-tagged — 'rrf' carries the fused ranking, 'bm25'
    # the former x32 exact top-10 (same lexical leg, with scores)
    out = [r for r in rows if r["branch"] == "rrf"]
    bm = [r for r in rows if r["branch"] == "bm25"]
    assert len(out) == 10 and len(bm) == 10
    assert len({r["rank"] for r in out}) == 10
    assert any(r["n_lists"] == 2 for r in out)
    assert all(r["v"] > 0 for r in rows)
    # the bm25 branch is rank-for-rank the standalone function's top-10
    from lambda_kafka_to_s3_parquet_spark.plans.extensions import (
        x32_bm25_search,
    )

    standalone = {
        r["rank"]: (r["doc_id"], r["score"])
        for r in x32_bm25_search(spark, sf_dir).collect()
    }
    assert {r["rank"]: (r["doc_id"], r["v"]) for r in bm} == standalone


def test_bm25_index_persisted_equals_from_scratch(spark, sf_dir, tmp_path):
    """bm25_topk_indexed over the persisted postings store must return
    EXACTLY bm25_topk's rows (ranks, scores, tie-breaks) while reading
    only the query terms' buckets."""
    from pyspark.sql import functions as F

    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_index,
    )
    from lambda_kafka_to_s3_parquet_spark.plans.extensions import X32_QUERY_TERMS
    from lambda_kafka_to_s3_parquet_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    meta = build_bm25_index(spark, docs, idx, n_buckets=64)
    assert meta["n_docs"] > 0 and len(meta["buckets_present"]) > 4

    scratch = sorted(map(tuple, bm25_topk(docs, X32_QUERY_TERMS, k=10).collect()))
    indexed_df = bm25_topk_indexed(spark, idx, X32_QUERY_TERMS, k=10)
    indexed = sorted(map(tuple, indexed_df.collect()))
    assert indexed == scratch and len(indexed) == 10

    # pruning: the query touches a strict subset of the store's buckets
    tdf = spark.createDataFrame([(t,) for t in X32_QUERY_TERMS], "term string")
    wanted = {
        r["b"]
        for r in tdf.select(
            F.pmod(F.xxhash64("term"), F.lit(64)).cast("int").alias("b")
        ).collect()
    }
    assert 0 < len(wanted) < len(meta["buckets_present"])

    # guard rails shared with the vector indexes
    import pytest

    with pytest.raises(ValueError, match="already holds"):
        build_bm25_index(spark, docs, idx)
    with pytest.raises(ValueError, match="not bm25"):
        from lambda_kafka_to_s3_parquet_spark.operators.vector_index import (
            build_ivf_index,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        ivf = str(tmp_path / "ivf")
        build_ivf_index(spark, emb, ivf, n_cells=8)
        bm25_topk_indexed(spark, ivf, X32_QUERY_TERMS)


def test_bm25_index_append_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Incremental maintenance: build over half the corpus, append the
    other half — the indexed search must equal bm25_topk over the FULL
    corpus bit-for-bit (nothing in bm25 is frozen: df is query-time,
    n_docs/sum_dl update exactly), and the meta-driven freshness check
    must accept the grown corpus."""
    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_topk_indexed,
        build_bm25_index,
    )
    from lambda_kafka_to_s3_parquet_spark.operators.vector_index import (
        check_index_fresh,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "bm25")
    build_bm25_index(spark, first, idx, n_buckets=32)
    meta = append_to_bm25_index(spark, rest, idx)
    assert len(meta["appends"]) == 1

    got = sorted(map(tuple, bm25_topk_indexed(spark, idx, X32_QUERY_TERMS, k=10).collect()))
    want = sorted(map(tuple, bm25_topk(docs, X32_QUERY_TERMS, k=10).collect()))
    assert got == want and len(got) == 10

    check_index_fresh(spark, idx, docs)  # grown corpus == updated fingerprint
    with pytest.raises(ValueError, match="STALE"):
        check_index_fresh(spark, idx, first)

    # a second append composes (quarters of the odd half would re-append
    # ids — use fresh synthetic docs instead)
    extra = spark.createDataFrame(
        [(10_000_001, "spark shuffle partition skew"),
         (10_000_002, "watermark event time windows")],
        "doc_id long, text string",
    )
    append_to_bm25_index(spark, extra, idx)
    got2 = sorted(map(tuple, bm25_topk_indexed(spark, idx, X32_QUERY_TERMS, k=10).collect()))
    want2 = sorted(map(tuple, bm25_topk(docs.unionByName(extra), X32_QUERY_TERMS, k=10).collect()))
    assert got2 == want2


def test_countmin_sketch_exact_twin_and_guarantees(spark, sf_dir):
    """(a) the sketch equals an independent python replay of the same md5
    arithmetic counter-for-counter; (b) estimates NEVER undercount;
    (c) top-20 estimates sit within the epsilon*N envelope (width 2048 ->
    eps = e/2048); (d) two half-corpus sketches merged by adding counters
    equal the one-shot sketch (mergeability — the 100 TB property)."""
    import hashlib
    import math
    import re
    from collections import Counter

    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import (
        countmin_estimate,
        countmin_table,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    toks = docs.select(F.explode(
        F.split(F.lower("text"), "[^a-z0-9]+")).alias("t")).filter(F.col("t") != "")
    depth, width, seed = 3, 512, 42
    sketch = {(r["row_idx"], r["bucket"]): r["cnt"]
              for r in countmin_table(toks, "t", depth, width, seed).collect()}

    # (a) python twin
    texts = [r["text"] for r in docs.collect()]
    stream = [w for t in texts for w in re.split("[^a-z0-9]+", t.lower()) if w]
    twin = Counter()
    for w in stream:
        for i in range(depth):
            h = hashlib.md5(f"{w}\x1f{i}\x1f{seed}".encode()).hexdigest()[:8]
            twin[(i, int(h, 16) % width)] += 1
    assert sketch == dict(twin)

    # (b) + (c)
    exact = Counter(stream)
    top = spark.createDataFrame(
        [(w,) for w, _ in exact.most_common(20)], "t string"
    )
    est = {r["key"]: r["est"]
           for r in countmin_estimate(
               countmin_table(toks, "t", depth, width, seed),
               top, "t", depth, width, seed).collect()}
    n_total = len(stream)
    eps = math.e / width
    for w, e_ in est.items():
        assert e_ >= exact[w]
        assert e_ - exact[w] <= eps * n_total * 3  # slack over the w.h.p. bound

    # (d) mergeability
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    def tok(d):
        return d.select(F.explode(
            F.split(F.lower("text"), "[^a-z0-9]+")).alias("t")).filter(F.col("t") != "")

    sa = countmin_table(tok(half_a), "t", depth, width, seed)
    sb = countmin_table(tok(half_b), "t", depth, width, seed)
    merged = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in sa.unionByName(sb)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == sketch


def test_bm25_index_stream_equals_oneshot(spark, sf_dir, tmp_path):
    """Streaming index maintenance: three micro-batches (build + two
    appends) must leave an index whose search equals bm25_topk over the
    whole corpus bit-for-bit, with the batch ids recorded on the meta."""
    import os

    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
    )
    from lambda_kafka_to_s3_parquet_spark.operators.vector_index import (
        _read_index_meta,
    )
    from lambda_kafka_to_s3_parquet_spark.streaming.pipeline import (
        run_bm25_index_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tmp_path / "src"
    src.mkdir()
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(thirds):
        staged = tmp_path / f"stage{i}"
        b.coalesce(1).write.parquet(str(staged))
        part = next(f for f in os.listdir(staged) if f.startswith("part-"))
        dst = src / f"batch-{i}.parquet"
        os.rename(staged / part, dst)
        os.utime(dst, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))

    idx = str(tmp_path / "bm25")
    q = run_bm25_index_stream(
        spark, str(src), "doc_id long, text string", idx,
        str(tmp_path / "ckpt"), n_buckets=32,
    )
    q.awaitTermination(300)

    meta = _read_index_meta(spark, idx)
    assert meta["base_batch_id"] == 0
    assert [a["batch_id"] for a in meta["appends"]] == [1, 2]

    got = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    want = sorted(map(tuple, bm25_topk(docs, X32_QUERY_TERMS, k=10).collect()))
    assert got == want and len(got) == 10


def test_bm25_index_stream_crash_after_fold_replays_nothing(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill the stream AFTER an append's meta swap but BEFORE the
    checkpoint commits: the restarted stream replays the batch, the
    append recognizes its batch_id on the registry and NO-OPs — n_docs
    counts every document exactly once and search equals one-shot."""
    import os

    import pytest

    import lambda_kafka_to_s3_parquet_spark.operators.retrieval as ret_mod
    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
    )
    from lambda_kafka_to_s3_parquet_spark.operators.vector_index import (
        _read_index_meta,
    )
    from lambda_kafka_to_s3_parquet_spark.streaming.pipeline import (
        run_bm25_index_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 600
    )
    src = tmp_path / "src"
    src.mkdir()
    halves = [docs.filter(F.col("doc_id") < 300),
              docs.filter(F.col("doc_id") >= 300)]
    for i, b in enumerate(halves):
        staged = tmp_path / f"stage{i}"
        b.coalesce(1).write.parquet(str(staged))
        part = next(f for f in os.listdir(staged) if f.startswith("part-"))
        dst = src / f"batch-{i}.parquet"
        os.rename(staged / part, dst)
        os.utime(dst, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))

    real = ret_mod.append_to_bm25_index
    calls = {"n": 0}

    def crashing(*a, **k):
        out = real(*a, **k)
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("injected crash after atomic meta swap")
        return out

    monkeypatch.setattr(ret_mod, "append_to_bm25_index", crashing)

    idx, ckpt = str(tmp_path / "bm25"), str(tmp_path / "ckpt")
    q = run_bm25_index_stream(
        spark, str(src), "doc_id long, text string", idx, ckpt, n_buckets=32
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(300)
        raise RuntimeError(q.exception() or "stream did not fail")
    # the append committed atomically before the crash
    assert [a["batch_id"] for a in _read_index_meta(spark, idx)["appends"]] == [1]

    q2 = run_bm25_index_stream(
        spark, str(src), "doc_id long, text string", idx, ckpt, n_buckets=32
    )
    q2.awaitTermination(300)

    meta = _read_index_meta(spark, idx)
    # replay folded nothing: still exactly one append, exact n_docs
    assert [a["batch_id"] for a in meta["appends"]] == [1]
    from lambda_kafka_to_s3_parquet_spark.functions.text import tokens as _tok

    assert meta["n_docs"] == docs.filter(F.size(_tok(F.col("text"))) > 0).count()
    got = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    want = sorted(map(tuple, bm25_topk(docs, X32_QUERY_TERMS, k=10).collect()))
    assert got == want and len(got) == 10

def test_bm25_index_compaction(spark, sf_dir, tmp_path):
    """compact_bm25_index folds the append roots into one fresh bucketed
    base: (a) indexed search is bit-identical before/after; (b) the
    registry empties and the superseded dirs are gone; (c) a replayed
    pre-compaction micro-batch stays a NO-OP (base_batch_id is a
    high-water mark, exactly-once survives the fold); (d) a crash before
    the meta swap is invisible; (e) appends keep working afterwards."""
    from lambda_kafka_to_s3_parquet_spark.operators import vector_index as vi
    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_index,
        compact_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    idx = str(tmp_path / "bm25")
    build_bm25_index(spark, thirds[0], idx, n_buckets=32, batch_id=0)
    append_to_bm25_index(spark, thirds[1], idx, batch_id=1)
    append_to_bm25_index(spark, thirds[2], idx, batch_id=2)
    before = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    assert before == sorted(map(tuple, bm25_topk(
        docs, X32_QUERY_TERMS, k=10).collect()))

    # (d) crash before the swap: intact index, orphaned new base
    real_write = vi._write_index_meta
    import os

    def boom(spark_, path_, meta_):
        raise RuntimeError("simulated crash before meta publish")

    vi._write_index_meta = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            compact_bm25_index(spark, idx)
    finally:
        vi._write_index_meta = real_write
    crashed = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    assert crashed == before
    assert len(vi._read_index_meta(spark, idx)["appends"]) == 2

    # (a)+(b) the real compaction
    meta = compact_bm25_index(spark, idx)
    assert meta["appends"] == [] and meta["base"].startswith("base-")
    assert meta["base_batch_id"] == 2
    after = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    assert after == before
    assert not os.path.exists(f"{idx}/tf")          # legacy base cleaned
    assert not os.path.exists(f"{idx}/appends") or not os.listdir(
        f"{idx}/appends")

    # (c) replaying a folded pre-compaction batch is a no-op
    replay = append_to_bm25_index(spark, thirds[1], idx, batch_id=1)
    assert replay["appends"] == [] and replay["n_docs"] == meta["n_docs"]

    # (e) fresh appends keep working against the new base
    extra = spark.createDataFrame(
        [(20_000_001, "spark shuffle partition skew bm25")],
        "doc_id long, text string",
    )
    append_to_bm25_index(spark, extra, idx, batch_id=3)
    got = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    want = sorted(map(tuple, bm25_topk(
        docs.unionByName(extra), X32_QUERY_TERMS, k=10).collect()))
    assert got == want

    # a second compaction folds the post-compaction append too
    meta2 = compact_bm25_index(spark, idx)
    assert meta2["base"] != meta["base"] and meta2["base_batch_id"] == 3
    assert sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect())) == got


def test_vacuum_index_sweeps_orphans_only(spark, sf_dir, tmp_path):
    """vacuum_index deletes crashed-append orphans and superseded bases
    while leaving every referenced dir (and query results) untouched."""
    import os

    from lambda_kafka_to_s3_parquet_spark.operators import vector_index as vi
    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_topk_indexed,
        build_bm25_index,
        compact_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    build_bm25_index(spark, docs.filter("doc_id % 2 = 0"), idx, n_buckets=32)
    append_to_bm25_index(spark, docs.filter("doc_id % 2 = 1"), idx)

    # crashed append: data written, meta never republished -> orphan
    real_write = vi._write_index_meta
    vi._write_index_meta = lambda *a: (_ for _ in ()).throw(
        RuntimeError("crash"))
    try:
        with pytest.raises(RuntimeError):
            append_to_bm25_index(
                spark,
                spark.createDataFrame([(9_000_001, "orphan doc")],
                                      "doc_id long, text string"),
                idx,
            )
    finally:
        vi._write_index_meta = real_write
    assert len(os.listdir(f"{idx}/appends")) == 2  # 1 live + 1 orphan

    before = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    swept = vi.vacuum_index(spark, idx)
    assert swept == {"appends_deleted": 1, "bases_deleted": 0}
    assert sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect())) == before

    # superseded base left by a compaction whose cleanup "crashed":
    # simulate by compacting with clean=False, then vacuuming
    meta = compact_bm25_index(spark, idx, clean=False)
    assert os.path.exists(f"{idx}/tf")  # legacy base still on disk
    after_compact = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    swept2 = vi.vacuum_index(spark, idx)
    assert swept2["bases_deleted"] >= 1 and swept2["appends_deleted"] == 1
    assert not os.path.exists(f"{idx}/tf")
    assert os.path.exists(f"{idx}/{meta['base']}/tf")  # live base kept
    assert sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect())) == after_compact


def test_bm25_index_stream_in_stream_compaction(spark, sf_dir, tmp_path):
    """run_bm25_index_stream(compact_every=2) keeps the store bounded
    FOREVER: whenever the registry reaches 2 appends the handler folds
    them into a fresh base and vacuums superseded dirs — search still
    equals one-shot over everything streamed, the registry and on-disk
    append dirs stay under the cadence, and a full checkpoint-less
    replay after the folds changes nothing (the high-water mark rode
    through every compaction)."""
    import os
    import shutil

    from lambda_kafka_to_s3_parquet_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
    )
    from lambda_kafka_to_s3_parquet_spark.operators.vector_index import (
        _read_index_meta,
    )
    from lambda_kafka_to_s3_parquet_spark.streaming.pipeline import (
        run_bm25_index_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tmp_path / "src"
    src.mkdir()
    for i in range(6):
        staged = tmp_path / f"stage{i}"
        docs.filter(F.col("doc_id") % 6 == i).coalesce(1).write.parquet(
            str(staged))
        part = next(f for f in os.listdir(staged) if f.startswith("part-"))
        dst = src / f"batch-{i}.parquet"
        os.rename(staged / part, dst)
        os.utime(dst, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))

    idx, ckpt = str(tmp_path / "bm25"), str(tmp_path / "ckpt")
    q = run_bm25_index_stream(
        spark, str(src), "doc_id long, text string", idx, ckpt,
        n_buckets=32, compact_every=2,
    )
    assert q.awaitTermination(300)

    # batches 0..5: build at 0; appends at 1,2 -> fold; 3,4 -> fold; 5
    meta = _read_index_meta(spark, idx)
    assert [a["batch_id"] for a in meta["appends"]] == [5]
    assert meta["base_batch_id"] == 4 and meta["base"].startswith("base-")
    assert len(os.listdir(f"{idx}/appends")) == 1  # vacuum swept the rest
    bases = [d for d in os.listdir(idx) if d.startswith("base-")]
    assert len(bases) == 1 and not os.path.exists(f"{idx}/tf")

    got = sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect()))
    want = sorted(map(tuple, bm25_topk(docs, X32_QUERY_TERMS, k=10).collect()))
    assert got == want and len(got) == 10

    # checkpoint-less replay: every batch re-fires; build-batch 0 and
    # appends 1-4 are <= base_batch_id (the mark SURVIVED two folds),
    # append 5 is on the registry -- all no-ops, nothing double-counts
    shutil.rmtree(ckpt)
    q2 = run_bm25_index_stream(
        spark, str(src), "doc_id long, text string", idx, str(tmp_path / "ck2"),
        n_buckets=32, compact_every=2,
    )
    assert q2.awaitTermination(300)
    meta2 = _read_index_meta(spark, idx)
    assert meta2["n_docs"] == meta["n_docs"]
    assert [a["batch_id"] for a in meta2["appends"]] == [5]
    assert sorted(map(tuple, bm25_topk_indexed(
        spark, idx, X32_QUERY_TERMS, k=10).collect())) == got
