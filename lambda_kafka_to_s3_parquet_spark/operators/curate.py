"""End-to-end training-corpus curation pipeline (SURVEY.md §2.9).

One call chaining the engine's verified stages in the order a production
data-curation run applies them:

1. **boilerplate removal** (optional) — CCNet-style inter-document line
   dedup (``remove_boilerplate_lines``), first so banners never distort
   quality scores or MinHash signatures;
2. **PII scrub** (optional) — typed email/phone/IP redaction
   (``functions/text.py::redact_pii``, narrow chained regexes);
3. **quality gate** — per-row token/alpha/stopword/repetition thresholds
   (``functions/text.py`` expressions, narrow, applied before anything
   shuffles so junk never pays dedup cost);
4. **near-duplicate dedup** — ``near_dup_dedup`` (banded MinHash-LSH
   candidates, exact-Jaccard verify, connected-components clustering,
   minimum-id survivor);
5. **deterministic split assignment** — content-hash buckets
   (``functions/splits.py``: reproducible on any cluster, duplicate
   texts can never straddle splits);
6. **token budgeting** — whitespace + BPE-style estimates per document
   for downstream sampling;
7. **sequence packing** (optional) — fixed-length training windows via
   the two-level distributed prefix sum (``operators/packing.py``).

Scale shape: stages 2-3 and 5-6 are narrow per-row expressions; the
shuffles are boilerplate's line groupBys, dedup's banded equi-joins + one
left-anti survivor join, and packing's bucketed window — exactly the
minimum the semantics require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.splits import assign_split
from ..functions.text import (
    alpha_ratio,
    bpe_token_estimate,
    dup_ngram_frac,
    redact_pii,
    token_count,
    tokens,
    whitespace_tokens,
)
from .dedup import (
    connected_components,
    near_dup_dedup,
    near_dup_pairs,
    remove_boilerplate_lines,
)
from .packing import pack_sequences


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    max_dup_3gram_frac: float = 1.0,
    dedup_threshold: float = 0.8,
    drop_boilerplate_in: int | None = None,
    scrub_pii: bool = False,
    pack_len: int | None = None,
) -> DataFrame:
    """Clean, dedup, split, budget (and optionally pack) a corpus.

    Returns the surviving documents with ``split``, ``n_ws_tokens``,
    ``est_bpe_tokens`` (and ``pack_id`` when ``pack_len`` is set)
    appended. Thresholds follow the usual corpus-cleaning defaults: very
    short documents, low-alphabetic (markup/binary-ish) text, and — when
    ``max_dup_3gram_frac`` < 1 — highly repetitive (templated/looping)
    text are dropped before dedup. ``drop_boilerplate_in`` = k removes
    lines appearing in >= k distinct documents first; ``scrub_pii``
    redacts emails/phones/IPs; ``pack_len`` assigns each survivor to its
    fixed-length training window (packs are computed over survivors in
    ``id_col`` order, so the layout is reproducible end-to-end).
    """
    if drop_boilerplate_in is not None:
        cleaned = remove_boilerplate_lines(
            docs, id_col=id_col, text_col=text_col, min_docs=drop_boilerplate_in
        ).select(id_col, F.col("cleaned").alias(text_col))
        docs = docs.drop(text_col).join(cleaned, id_col)
    if scrub_pii:
        docs = docs.withColumn(text_col, redact_pii(text_col))
    gated = docs.filter(
        (token_count(text_col) >= min_tokens)
        & (alpha_ratio(text_col) >= min_alpha_ratio)
        & (dup_ngram_frac(tokens(text_col), 3) <= max_dup_3gram_frac)
    )
    if drop_boilerplate_in is not None or scrub_pii:
        # Stage boundary: near_dup_dedup consumes `gated` from four
        # subtrees (minhash signatures, both shingle-verify sides, the
        # survivor anti-join); when the upstream is more than a scan —
        # boilerplate's two shuffles and/or the regex scrub — persist so
        # the cleaning runs once, not four times (measured ~25% off the
        # whole chain at sf0.1). The handle cannot be unpersisted here
        # (the returned plan still references it lazily), so eviction is
        # left to the LRU block manager. At 100 TB the boundary is a
        # parquet checkpoint between the cleaning job and the dedup job —
        # which also releases the cache concern entirely.
        gated = gated.persist()
    deduped = near_dup_dedup(
        gated, id_col=id_col, text_col=text_col, threshold=dedup_threshold
    )
    out = deduped.select(
        "*",
        assign_split(text_col).alias("split"),
        F.size(whitespace_tokens(text_col)).cast("bigint").alias("n_ws_tokens"),
        bpe_token_estimate(text_col).alias("est_bpe_tokens"),
    )
    if pack_len is not None:
        out = pack_sequences(out, id_col, "est_bpe_tokens", pack_len)
    return out


def curate_with_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    max_dup_3gram_frac: float = 1.0,
    dedup_threshold: float = 0.8,
    drop_boilerplate_in: int | None = None,
    scrub_pii: bool = False,
    boilerplate_table: DataFrame | None = None,
) -> DataFrame:
    """:func:`curate_corpus` with a full AUDIT TRAIL: every input
    document comes back exactly once —

    * ``status='kept'`` rows are curate_corpus's survivors, with the same
      ``split`` / ``n_ws_tokens`` / ``est_bpe_tokens`` columns;
    * ``status='dropped:quality_gate'`` rows failed the token/alpha/
      repetition thresholds (post-cleaning text retained for inspection);
    * ``status='dropped:near_dup'`` rows lost their near-dup cluster;
      ``exemplar`` carries the SURVIVING cluster member's id, so every
      drop is attributable to the document that kept its place.

    At 100 TB silent row loss is the classic curation failure mode — a
    threshold typo or a skewed dedup can delete a percent of the corpus
    with nothing in the logs. Plan shape matters here: the audit is ONE
    pass — a status CASE over the cleaned frame left-joined to the
    broadcast connected-components output — NOT a union of kept/dropped
    branches (a three-branch union re-reads the cleaned frame per branch
    and splits the lazy pipeline). In this form the audit is ~FREE:
    same-host min-of-3 at sf0.1 measured the audited census at parity
    with the unaudited one (7.2 vs 7.5 s warm-session; both ~14 s on a
    cold session — the JVM/codegen warm-up dominates the first run, not
    the audit).

    ``boilerplate_table`` (r14 perf): a caller that ALSO reports the
    boilerplate census (x28's 'boilerplate' branch) can pass its own
    :func:`remove_boilerplate_lines` output — computed once, ideally
    checkpointed — instead of letting this function recompute the same
    two line-shuffles internally. Must be the output of
    ``remove_boilerplate_lines(docs, id_col, text_col,
    min_docs=drop_boilerplate_in)`` for the SAME docs/min_docs;
    equality with the internal path is test-pinned."""
    if drop_boilerplate_in is not None:
        bp = (
            boilerplate_table
            if boilerplate_table is not None
            else remove_boilerplate_lines(
                docs, id_col=id_col, text_col=text_col,
                min_docs=drop_boilerplate_in,
            )
        )
        cleaned = bp.select(id_col, F.col("cleaned").alias(text_col))
        docs = docs.drop(text_col).join(cleaned, id_col)
    if scrub_pii:
        docs = docs.withColumn(text_col, redact_pii(text_col))
    if drop_boilerplate_in is not None or scrub_pii:
        # lazy persist is race-free HERE because connected_components'
        # eager edge checkpoint (below) materializes it before the final
        # one-pass job ever runs — sequential, not concurrent, readers
        docs = docs.persist()
    gate = (
        (token_count(text_col) >= min_tokens)
        & (alpha_ratio(text_col) >= min_alpha_ratio)
        & (dup_ngram_frac(tokens(text_col), 3) <= max_dup_3gram_frac)
    )
    gated = docs.filter(gate)
    if drop_boilerplate_in is not None or scrub_pii:
        # same stage boundary as curate_corpus: the dedup consumes gated
        # from four subtrees (the gate's n-gram HOFs are CPU-heavy enough
        # to cache past the docs cache)
        gated = gated.persist()
    pairs = near_dup_pairs(
        gated, id_col=id_col, text_col=text_col, threshold=dedup_threshold
    ).select("doc_a", "doc_b")
    # comp holds one row per CLUSTERED node — a sliver of the corpus —
    # broadcast so the relabel join never shuffles the corpus
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    flagged = docs.join(
        F.broadcast(comp), docs[id_col] == comp["node"], "left"
    ).withColumn("_gate_ok", gate)
    is_dup = (
        F.col("_gate_ok")
        & F.col("node").isNotNull()
        & (F.col("node") != F.col("component"))
    )
    is_kept = F.col("_gate_ok") & ~F.coalesce(
        F.col("node") != F.col("component"), F.lit(False)
    )
    nul_l = F.lit(None).cast("bigint")
    nul_s = F.lit(None).cast("string")
    # The exemplar is a surviving member's id: cast to the id column's OWN
    # type — a hardcoded bigint cast silently NULLs string ids, destroying
    # the drop attribution the audit exists for (round-9 advice).
    id_type = docs.schema[id_col].dataType
    nul_id = F.lit(None).cast(id_type)
    return flagged.select(
        F.col(id_col),
        F.col(text_col),
        F.when(~F.col("_gate_ok"), F.lit("dropped:quality_gate"))
        .when(is_dup, F.lit("dropped:near_dup"))
        .otherwise(F.lit("kept"))
        .alias("status"),
        F.when(is_kept, assign_split(text_col)).otherwise(nul_s).alias("split"),
        F.when(is_kept, F.size(whitespace_tokens(text_col)).cast("bigint"))
        .otherwise(nul_l)
        .alias("n_ws_tokens"),
        F.when(is_kept, bpe_token_estimate(text_col))
        .otherwise(nul_l)
        .alias("est_bpe_tokens"),
        F.when(is_dup, F.col("component").cast(id_type))
        .otherwise(nul_id)
        .alias("exemplar"),
    )
