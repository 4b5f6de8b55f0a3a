"""Model-based quality filtering (SURVEY.md §2.9 family).

The classifier-filtering stage of the public large-corpus recipes
(GPT-3's Common-Crawl filter, LLaMA/CCNet's fastText step): take a
trusted reference corpus as weak positives, the raw crawl as negatives,
train a cheap linear model over per-document signals, keep documents the
model scores reference-like. This module expresses that stage with
MLlib so training AND scoring are distributed Spark jobs:

* features are the engine's existing JVM-side text signals
  (``functions/text.py`` — token counts, stopword fraction, alpha ratio,
  repetition, per-language profile hits) assembled into a vector; no
  Python in the hot path, no tokenizer duplication;
* the model is MLlib ``LogisticRegression`` — one distributed L-BFGS
  fit whose cost is a handful of passes over the feature frame; scoring
  is a narrow per-row transform that rides any scan;
* at 100 TB you train on a sample (the model has ~10 parameters) and
  score everything — scoring is the cheap half, exactly why the linear
  probe is the industry default for this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_PROFILES,
    alpha_ratio,
    dup_ngram_frac,
    stopword_count,
    token_count,
    tokens,
)

#: Feature column names, in assembly order (the model's coefficients are
#: reported against these names).
FEATURES = (
    "n_tokens",
    "alpha_frac",
    "mean_word_len",
    "dup2_frac",
    *(f"hits_{lang}" for lang in LANG_PROFILES),
)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document signal columns (all codegen'd JVM expressions)."""
    tok = tokens(F.col(text_col))
    # coalesce like every other signal: size(NULL) is NULL in Spark 3+,
    # and VectorAssembler's handleInvalid='error' would abort the whole
    # train/score job on one NULL-text document instead of scoring it
    out = docs.withColumn(
        "n_tokens",
        F.coalesce(token_count(F.col(text_col)).cast("double"), F.lit(0.0)),
    )
    out = out.withColumn(
        "alpha_frac", F.coalesce(alpha_ratio(F.col(text_col)), F.lit(0.0))
    )
    out = out.withColumn(
        "mean_word_len",
        F.when(
            F.size(tok) > 0,
            (F.length(F.concat_ws("", tok)) / F.size(tok)).cast("double"),
        ).otherwise(0.0),
    )
    out = out.withColumn(
        "dup2_frac", F.coalesce(dup_ngram_frac(tok, 2), F.lit(0.0))
    )
    for lang, words in LANG_PROFILES.items():
        out = out.withColumn(
            f"hits_{lang}",
            F.when(
                F.size(tok) > 0, stopword_count(tok, words) / F.size(tok)
            ).otherwise(0.0),
        )
    return out


#: Hard cap on the training-frame row count — the sampling contract that
#: bounds both the L-BFGS fit (each iteration is a full pass) and the
#: unpartitioned rank window inside :func:`_rank_auc`. The linear probe
#: has ~10 parameters; a million labeled rows is already far past its
#: sample-complexity needs, so at 100 TB you SAMPLE to train and score
#: everything — the cap turns that design assumption into an error
#: instead of a silent full-corpus fit (mirrors
#: ``similarity.train_pq_codebooks``'s bounded-sample contract).
DEFAULT_TRAIN_LIMIT = 1_000_000


def _rank_auc(scored: DataFrame, label_col: str = "label") -> float:
    """Area under the ROC curve as the tie-averaged Mann-Whitney rank
    statistic: AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg), with
    tied scores taking their average rank. Runs as one window + one
    aggregate over the training frame; the unpartitioned window is
    bounded by ``train_limit``, which :func:`train_quality_model`
    ENFORCES before fitting (not just documents)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql.window import Window

    p = F.round(vector_to_array("probability")[1], 9)
    ranked = scored.select(
        p.alias("p"), F.col(label_col).cast("double").alias("y")
    ).withColumn("rk", F.rank().over(Window.orderBy("p"))).withColumn(
        "ties", F.count("*").over(Window.partitionBy("p"))
    )
    row = ranked.agg(
        F.sum(F.when(F.col("y") == 1.0, F.col("rk") + (F.col("ties") - 1) / 2.0)).alias(
            "rpos"
        ),
        F.sum(F.col("y")).alias("npos"),
        F.count("*").alias("n"),
    ).first()
    npos, nneg = float(row["npos"]), float(row["n"] - row["npos"])
    if npos == 0 or nneg == 0:
        raise ValueError("AUC undefined: training labels are single-class")
    return float((row["rpos"] - npos * (npos + 1) / 2.0) / (npos * nneg))


def train_quality_model(
    labeled: DataFrame,
    label_col: str = "label",
    seed: int = 42,
    train_limit: int = DEFAULT_TRAIN_LIMIT,
):
    """Fit the linear quality probe; returns ``(model, train_auc)``.

    ``labeled`` must already carry the feature columns
    (:func:`quality_features`) and a 0/1 ``label_col``. Deterministic
    given the data (fixed seed, L-BFGS on a convex loss).

    RAISES when ``labeled`` exceeds ``train_limit`` rows: the probe is
    meant to be trained on a bounded sample and scored on everything —
    an unsampled 100 TB frame here would run every L-BFGS pass AND the
    AUC rank window over the full corpus. Sample first
    (``df.sample(...)`` / stratified ``sampleBy``) or raise the limit
    deliberately.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=list(FEATURES), outputCol="features")
    # Materialize the assembled training frame: L-BFGS passes over it
    # once per iteration, and without the boundary every pass
    # re-executes the full feature pipeline (token/ngram HOFs over the
    # whole corpus) — measured 16 s -> ~3 s at sf0.1. The frame is just
    # (vector, label): tiny relative to the corpus it derives from.
    # coalesce(8): every L-BFGS iteration is one job over this frame, and
    # with the corpus's own partitioning (32+ tiny partitions of a
    # <=train_limit sample) per-task scheduling dominates the actual
    # gradient math — measured 2.6 s -> 0.7 s for the 10-iteration fit at
    # sf0.1. 8 partitions keeps the reduce tree parallel while bounding
    # tasks; the frame is <= train_limit rows by contract, so per-partition
    # size stays executor-safe.
    train = (
        assembler.transform(labeled)
        .select("features", F.col(label_col).alias("label"))
        .coalesce(8)
        .localCheckpoint()
    )
    n = train.count()  # cheap: counts the checkpointed (vector,label) frame
    if n > train_limit:
        raise ValueError(
            f"quality-probe training frame has {n} rows, over the "
            f"train_limit={train_limit} sampling contract; the linear "
            "probe needs a bounded sample, not the corpus — sample the "
            "labeled frame first (or raise train_limit deliberately)"
        )
    # The loss is convex over the standardized features; measured on the
    # sf0.1 documents fit, tol=1e-6 stops L-BFGS at 10 iterations with
    # train AUC 1.0 (objectiveHistory flat to 8 decimals over the last
    # 4). Iterations are the dominant x37 cost because each is a full
    # pass (a Spark job) over the assembled frame, so maxIter sits at
    # the measured convergence point + margin, not far above it, and tol
    # is the real stop.
    lr = LogisticRegression(
        maxIter=15, tol=1e-6, regParam=0.01, standardization=True
    )
    fitted = lr.fit(train)
    # Strip the training summary by a save/load round-trip (loaded models
    # carry none; the model file is a few hundred bytes). A freshly
    # fitted Spark 4.1 model drags its summary -> its SparkSession -> the
    # session's non-serializable ObservationManager into every task
    # closure that serializes the model's scoring UDF — and once ANY
    # df.observe() has run in the session (this engine's partitioned sink
    # metrics do), every transform/summary/evaluator job on the unstripped
    # model dies with "Task not serializable" (reproduced minimally;
    # count() survives only because column pruning drops the UDF). AUC is
    # then the Mann-Whitney rank statistic over the stripped model's
    # scores, in plain DataFrame ops — no MLlib evaluator needed.
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    td = tempfile.mkdtemp(prefix="lk2sp_lr_")
    try:
        fitted.write().overwrite().save(td + "/m")
        model = LogisticRegressionModel.load(td + "/m")
    finally:
        shutil.rmtree(td, ignore_errors=True)
    auc = _rank_auc(model.transform(train))
    return model, auc


def score_quality(docs_with_features: DataFrame, model) -> DataFrame:
    """Append ``quality_prob`` (P(reference-like)) to every document —
    a narrow transform; the feature vector never leaves the JVM."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembler = VectorAssembler(inputCols=list(FEATURES), outputCol="features")
    scored = model.transform(assembler.transform(docs_with_features))
    return scored.withColumn(
        "quality_prob", F.round(vector_to_array("probability")[1], 6)
    ).drop("features", "rawPrediction", "probability", "prediction")
