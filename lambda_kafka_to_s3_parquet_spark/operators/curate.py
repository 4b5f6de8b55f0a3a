"""End-to-end training-corpus curation pipeline (SURVEY.md §2.9).

One call chaining the engine's verified stages in the order a production
data-curation run applies them:

1. **quality gate** — per-row token/alpha/stopword thresholds
   (``functions/text.py`` expressions, narrow, applied before anything
   shuffles so junk never pays dedup cost);
2. **near-duplicate dedup** — ``near_dup_dedup`` (banded MinHash-LSH
   candidates, exact-Jaccard verify, connected-components clustering,
   minimum-id survivor);
3. **deterministic split assignment** — content-hash buckets
   (``functions/splits.py``: reproducible on any cluster, duplicate
   texts can never straddle splits);
4. **token budgeting** — whitespace + BPE-style estimates per document
   for downstream sampling.

Scale shape: stage 1 and 3-4 are narrow per-row expressions; the only
shuffles are dedup's banded equi-joins and one left-anti survivor join —
exactly the minimum the semantics require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.splits import assign_split
from ..functions.text import alpha_ratio, bpe_token_estimate, token_count, whitespace_tokens
from .dedup import near_dup_dedup


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    dedup_threshold: float = 0.8,
) -> DataFrame:
    """Quality-gate, near-dup-dedup, split, and token-budget a corpus.

    Returns the surviving documents with ``split``, ``n_ws_tokens`` and
    ``est_bpe_tokens`` columns appended. Thresholds follow the usual
    corpus-cleaning defaults: very short documents and low-alphabetic
    (markup/binary-ish) text are dropped before dedup.
    """
    gated = docs.filter(
        (token_count(text_col) >= min_tokens)
        & (alpha_ratio(text_col) >= min_alpha_ratio)
    )
    deduped = near_dup_dedup(
        gated, id_col=id_col, text_col=text_col, threshold=dedup_threshold
    )
    return deduped.select(
        "*",
        assign_split(text_col).alias("split"),
        F.size(whitespace_tokens(text_col)).cast("bigint").alias("n_ws_tokens"),
        bpe_token_estimate(text_col).alias("est_bpe_tokens"),
    )
