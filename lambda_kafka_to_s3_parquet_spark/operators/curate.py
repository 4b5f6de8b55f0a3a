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
from .dedup import near_dup_dedup, remove_boilerplate_lines
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
