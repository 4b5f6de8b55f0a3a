"""Deterministic dataset splitting for training-data pipelines
(SURVEY.md §2.9 family).

``randomSplit`` is nondeterministic across runs/partitionings — useless
for a reproducible train/val/test split of a 100 TB corpus. The stable
alternative: hash a content (or id) column to a bucket in [0, n), then map
bucket ranges to split labels. Properties that matter at scale:

* **reproducible** — same row, same split, on any cluster size, any
  partitioning, any engine that implements md5 (the oracle cross-checks
  Spark vs DuckDB bucket-for-bucket);
* **content-keyed** — hashing the text sends byte-identical duplicates to
  the SAME split, so exact dupes can never straddle train/test (hash the
  id instead when that's not wanted);
* **narrow** — one expression per row, no shuffle, no sampling pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets): first 8 md5 hex chars mod n.

    md5 rather than xxhash64 because every engine implements it
    identically (DuckDB twin: ``('0x' || substr(md5(x),1,8))::UBIGINT %
    n``); 32 bits is plenty for split assignment.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets


def assign_split(
    col: Column | str,
    train_pct: int = 80,
    val_pct: int = 10,
    n_buckets: int = 100,
) -> Column:
    """Map a hash bucket to 'train' / 'val' / 'test' labels.

    ``train_pct`` + ``val_pct`` buckets go to train/val, the remainder to
    test. Percentages are exact bucket counts, not sampling expectations.
    """
    b = hash_bucket(col, n_buckets)
    return (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )


def stratified_sample(
    df,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "text",
    default_rate: float = 0.0,
    n_buckets: int = 10_000,
):
    """Deterministic per-stratum downsampling (quality-tiered corpus mix).

    ``df.sample`` draws differently on every run/partitioning — useless
    for a reproducible data recipe ("keep 100% of high-quality docs, 10%
    of medium, 1% of low"). This keeps a row iff its content-hash bucket
    falls under the stratum's rate threshold: same row, same verdict, on
    any cluster, any engine. Rates quantize to 1/n_buckets. Per-row
    narrow filter — no shuffle, no sampling pass, rides the scan.

    Reuses :func:`hash_bucket`, so sampling composes consistently with
    split assignment (a kept duplicate stays with its split).
    """
    b = hash_bucket(key_col, n_buckets)
    thresh = F.lit(int(default_rate * n_buckets))
    for stratum, rate in rates.items():
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * n_buckets))
        ).otherwise(thresh)
    return df.filter(b < thresh)


def deterministic_shuffle(
    df,
    key_col: str = "text",
    seed: int = 0,
    n_partitions: int | None = None,
    tiebreak_col: str = "doc_id",
):
    """Reproducible global shuffle for training-data ordering.

    Training runs need the corpus in a *random but reproducible* order —
    the epoch-0 data order is part of the experiment. ``orderBy(rand())``
    draws differently per run/partitioning; this instead sorts by a
    content hash salted with the seed, so the permutation is a pure
    function of (row content, seed): same order on any cluster size, any
    engine (the DuckDB twin recomputes the identical md5 ordering,
    ``md5(coalesce(key, '') || chr(31) || seed)``).

    ``tiebreak_col`` makes the order total: exact-duplicate texts (which
    exist by design in any pre-dedup corpus) hash to the SAME key, and
    without a deterministic tiebreak their relative order would be
    task-scheduling luck — exactly the nondeterminism this function
    exists to remove. NULL keys hash like empty strings rather than
    poisoning the sort with engine-specific NULL placement.

    Scale shape: ``repartitionByRange`` on (hash, tiebreak) + ``sort
    WithinPartitions`` — a range shuffle plus per-partition sorts, the
    same plan a global ``orderBy`` lowers to, with NO single-partition
    stage (tied keys may straddle a range boundary, so the tiebreak is
    part of the range key too). Different seeds give statistically
    independent permutations (md5 avalanche), which is how multi-epoch
    orders are drawn.

    Returns the input columns plus ``_shuffle_key`` (hex md5); downstream
    writers drop it or keep it as the provenance of the order.
    """
    key = F.md5(
        F.concat_ws(
            "\x1f", F.coalesce(F.col(key_col), F.lit("")), F.lit(str(seed))
        )
    )
    out = df.withColumn("_shuffle_key", key)
    sort_cols = ["_shuffle_key", tiebreak_col]
    if n_partitions:
        out = out.repartitionByRange(n_partitions, *sort_cols)
    else:
        out = out.repartitionByRange(*sort_cols)
    return out.sortWithinPartitions(*sort_cols)


def temperature_rates(
    counts: dict, alpha: float = 0.5, target_total: int | float | None = None
) -> dict:
    """Per-stratum keep rates for TEMPERATURE-scaled corpus mixing — the
    standard multilingual/multi-domain rebalancing (sample stratum s with
    probability ∝ p_s^α, α<1 flattening the head so low-resource strata
    keep share): q_s ∝ n_s^α renormalized, rate_s = min(1, q_s·T / n_s)
    with T the target corpus size (default: the full corpus — pure
    reweighting). Rates are KEEP-side only: a stratum whose temperature
    share exceeds its size caps at 1.0 (upsampling is epoch repetition
    downstream, not row duplication here).

    Determinism note (the x30 oracle contract): at the default α=0.5 the
    power is ``sqrt`` — IEEE-correctly-rounded in every libm, unlike
    ``pow`` — and the arithmetic order below (``((sqrt(n)/S)·T)/n``) is
    mirrored token-for-token by the DuckDB twin, so both engines compute
    bit-identical rates and identical ``floor(rate·n_buckets)``
    thresholds. S sums in SORTED-stratum order left-to-right (float
    addition isn't associative; the twin uses
    ``list_sum(list(sqrt(n) ORDER BY lang))`` for the same order), so
    even the sum is bit-identical.
    """
    import math

    if not counts:
        return {}
    if alpha == 0.5:
        powed = {s: math.sqrt(n) for s, n in counts.items()}
    else:
        powed = {s: float(n) ** alpha for s, n in counts.items()}
    S = 0.0
    for s in sorted(powed, key=lambda x: (x is None, x)):
        S += powed[s]
    T = float(target_total if target_total is not None else sum(counts.values()))
    return {s: min(1.0, ((powed[s] / S) * T) / counts[s]) for s in counts}


def temperature_mix(
    df,
    strata_col: str,
    alpha: float = 0.5,
    target_total: int | None = None,
    key_col: str = "text",
    n_buckets: int = 10_000,
    weight_col: str | None = None,
):
    """Temperature-rebalanced deterministic corpus mix: one tiny
    per-stratum count aggregate (collected — bounded by |strata|), rates
    from :func:`temperature_rates`, rows kept by the same content-hash
    threshold rule as :func:`stratified_sample` (reproducible on any
    cluster/partitioning; a kept duplicate stays with its split). Returns
    ``(kept_df, rates)`` so the recipe ships with its data.

    ``weight_col`` switches the mix to a WEIGHT budget — the production
    form targets TOKENS, not documents (a stratum of long documents
    otherwise over-contributes to training exactly the way mixing is
    meant to prevent): strata sizes become per-stratum weight sums,
    ``target_total`` is a weight budget, and the per-document keep rate
    caps each stratum's expected kept weight at its temperature share.
    Document-level hash sampling approximates the budget (exact in
    expectation; the error is one document's weight per stratum —
    negligible at corpus scale). Integer weights keep the per-stratum
    sums order-independent, so the rate arithmetic stays bit-identical
    cross-engine (the x30 oracle contract extends to this branch)."""
    agg = (
        F.sum(weight_col).cast("double")
        if weight_col is not None
        else F.count("*")
    )
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(agg.alias("n")).collect()
    }
    rates = temperature_rates(counts, alpha, target_total)
    return stratified_sample(df, strata_col, rates, key_col, 0.0, n_buckets), rates
