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
