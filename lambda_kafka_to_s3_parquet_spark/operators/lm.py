"""Unigram language-model scoring (perplexity-style quality filtering).

CCNet/Gopher-style pipelines score every document against a reference
language model and drop the tails; the full KenLM n-gram machinery is an
external binary, but the distributed SHAPE of the stage — build token
statistics on a reference split, broadcast them, score every document in
one pass — is engine work, and a unigram model with Laplace smoothing
exercises it end-to-end with exactly reproducible arithmetic (the reason
this stage is oracle-checkable where a KenLM call would not be).

Scale shape:

* LM build: explode tokens → one hash shuffle with map-side combine
  (`groupBy(token).count()`), vocabulary-sized output;
* scoring: explode + join token→count. The join side is the vocabulary:
  broadcast when it fits (the common case — even web-scale BPE vocabs
  are ≤ a few hundred k rows), hash-shuffle join otherwise; Laplace
  smoothing (`(c+1)/(N+V)`) gives out-of-vocabulary tokens a proper
  probability, so scoring never drops rows;
* per-document reduce: one `groupBy(doc)` with map-side combine,
  carrying two doubles per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def unigram_counts(ref: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, c) counts over the reference corpus — the "model"."""
    return (
        ref.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )


def cross_entropy_score(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
) -> DataFrame:
    """(id, n_tokens, n_oov, ce) — per-document cross-entropy in nats
    under the Laplace-smoothed unigram model ``lm`` (from
    :func:`unigram_counts`).

    ``ce = mean over tokens of -ln((c(t) + 1) / (N + V))`` where N is the
    model's total token count and V its vocabulary size; unseen tokens
    score ``-ln(1/(N+V))``. Lower is more "reference-like"; a perplexity
    threshold is ``exp(ce)``.
    """
    # Materialize the LM once: the N/V totals action below would otherwise
    # run the reference-corpus explode+groupBy eagerly here AND a second
    # time when the (lazy) join side executes — the dominant build shuffle
    # twice per scoring call. The checkpoint also guarantees totals and
    # join rows come from the SAME materialization even over a
    # non-deterministic upstream.
    lm = lm.localCheckpoint()
    totals = lm.agg(
        F.sum("c").cast("double").alias("N"), F.count("*").cast("double").alias("V")
    ).first()
    denom = float(totals["N"] or 0.0) + float(totals["V"] or 0.0)
    if denom == 0.0:
        raise ValueError("empty language model: no tokens in the reference corpus")
    lm_side = F.broadcast(lm) if broadcast_lm else lm
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    scored = toks.join(lm_side, "token", "left").select(
        id_col,
        F.col("c").isNull().cast("long").alias("oov"),
        (-F.log((F.coalesce(F.col("c"), F.lit(0)) + 1) / F.lit(denom))).alias("nll"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("oov").alias("n_oov"),
        (F.sum("nll") / F.count("*")).alias("ce"),
    )


def importance_weights(
    docs: DataFrame,
    target_lm: DataFrame,
    raw_lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = 1000.0,
    broadcast_lm: bool = True,
) -> DataFrame:
    """(id, n_tokens, logw) — per-document DSIR importance log-weight
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling"): ``logw = Σ_tokens [ln p_target(t) − ln p_raw(t)]``
    over two unigram models, exactly-reproducible arithmetic (what makes
    this stage oracle-checkable where a hashed-feature KenLM-style
    scorer would not be). ``logw > 0`` means the document looks more
    like the target corpus than like the raw corpus.

    Smoothing matters here, and naive Laplace on BOTH sides is wrong in
    exactly the configuration DSIR runs in (tiny target, huge raw): a
    token unseen in both corpora would score ``ln(denom_raw /
    denom_target) > 0`` — never-seen-anywhere junk would out-weigh real
    text purely because the target corpus is smaller (measured: md5-hex
    junk beat genuine documents before this was fixed). The target side
    therefore uses DIRICHLET-PRIOR smoothing with the raw model as the
    prior (Zhai & Lafferty 2001, the standard IR formulation)::

        p_raw(t)    = (c_raw(t) + 1) / (N_raw + V)        # Laplace
        p_target(t) = (c_tgt(t) + mu * p_raw(t)) / (N_tgt + mu)

    which gives the three behaviors a selection weight needs: a token
    unseen in the target scores the strictly negative constant
    ``ln(mu / (N_tgt + mu))`` regardless of its raw frequency; a token
    at EQUAL rates in both corpora scores ~0; only genuinely
    target-enriched tokens score positive. ``mu`` is the prior strength
    in pseudo-token units (how many observed target tokens it takes to
    overrule the prior).

    Plan shape: the two vocab-sized count tables merge in ONE full-outer
    join (vocabulary-sized, broadcast by default), then scoring is a
    single explode + broadcast join + per-doc groupBy — identical to the
    cross-entropy plan, one shuffle on the doc id. Documents with ZERO
    tokens produce no rows (no evidence, never selected) — consistent
    with the oracle's unnest semantics."""
    t = target_lm.localCheckpoint()
    r = raw_lm.localCheckpoint()

    def _totals(lm: DataFrame) -> tuple[float, float]:
        tot = lm.agg(
            F.sum("c").cast("double").alias("N"),
            F.count("*").cast("double").alias("V"),
        ).first()
        return float(tot["N"] or 0.0), float(tot["V"] or 0.0)

    nt, _vt = _totals(t)
    nr, vr = _totals(r)
    if nr + vr == 0.0:
        raise ValueError("empty raw language model")
    if nt == 0.0:
        raise ValueError("empty target language model")
    merged = t.select("token", F.col("c").alias("_ct")).join(
        r.select("token", F.col("c").alias("_cr")), "token", "full_outer"
    )
    lm_side = F.broadcast(merged) if broadcast_lm else merged
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    p_raw = (F.coalesce(F.col("_cr"), F.lit(0)) + 1) / F.lit(nr + vr)
    contrib = F.log(
        (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(mu) * p_raw)
        / F.lit(nt + mu)
    ) - F.log(p_raw)
    return (
        toks.join(lm_side, "token", "left")
        .select(id_col, contrib.alias("_lw"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("_lw").alias("logw"))
    )


#: 2^48 — the Gumbel uniform draws from 48 md5 bits (exact in a double).
_GUMBEL_DENOM = float(1 << 48)


def gumbel_key(id_col, logw_col, seed: int = 0):
    """Deterministic Gumbel-perturbed selection key, rounded to 6 dp:
    ``round(logw + G, 6)`` with ``G = −ln(−ln(u))`` and ``u`` a uniform
    in (0, 1) drawn from the first 48 md5 bits of ``id ␟ seed`` (the
    :func:`hash_bucket` construction, +0.5 so u is never 0 or 1). The
    Gumbel-top-k trick makes top-k by this key a without-replacement
    sample with inclusion probability ∝ exp(logw) — importance
    RESAMPLING, not a hard threshold — while staying a pure function of
    (id, seed) that any md5-capable engine replays bit-for-bit; the 6 dp
    round pins the selection boundary against last-ulp ln() divergence
    (the x49/x53 convention)."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.col(id_col).cast("string"),
                        F.lit(str(seed)),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_GUMBEL_DENOM)
    return F.round(F.col(logw_col) + (-F.log(-F.log(u))), 6)


def dsir_select(
    docs: DataFrame,
    target_lm: DataFrame,
    raw_lm: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    mu: float = 1000.0,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Select ``k`` documents from ``docs`` by DSIR importance
    resampling: importance log-weights from the two unigram LMs
    (:func:`importance_weights`), then Gumbel-top-k — the standard
    deterministic formulation of sampling-without-replacement with
    probability ∝ the importance weight (a plain top-k by ``logw`` would
    be a mode-seeking hard filter; the Gumbel noise preserves corpus
    diversity, and seeding it from md5(id, seed) keeps the selection a
    pure function of the inputs: same k docs on any cluster, any
    partitioning, any engine).

    Returns ``(id, n_tokens, logw, key)`` for the selected rows. Plan
    shape: the scoring pass, then ONE distributed top-k
    (``TakeOrderedAndProject`` — per-partition partial top-k, never a
    global sort), ties broken by id. At 100 TB: one scan + one doc-id
    shuffle + a k-row result."""
    w = importance_weights(
        docs, target_lm, raw_lm, id_col=id_col, text_col=text_col,
        mu=mu, broadcast_lm=broadcast_lm,
    )
    keyed = w.withColumn("key", gumbel_key(id_col, "logw", seed))
    return keyed.orderBy(F.desc("key"), F.col(id_col)).limit(k)
