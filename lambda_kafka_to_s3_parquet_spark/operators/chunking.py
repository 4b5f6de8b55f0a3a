"""Token-window document chunking with overlap (training/RAG prep).

The reference engine lands whole Kafka records as rows
(``lambda_function.py:59`` — one parquet row per decoded record); an
LLM-data pipeline additionally needs the inverse of packing: splitting
long documents into fixed-size token windows with overlap, the standard
prep for context-bounded training and retrieval indexing (HF tokenizers'
``return_overflowing_tokens`` stride semantics).

Spark-first shape: tokenize once, generate the window start offsets as an
in-row ``sequence``, slice each window with a higher-order ``transform``,
and ``posexplode`` — all codegen'd JVM expressions, zero shuffles, zero
Python. Chunk rows inherit the parent row's partitioning, so the operator
rides the scan at any scale; downstream per-chunk work (embedding,
indexing) starts from an already-distributed frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_id, n_doc_tokens, n_chunk_tokens, chunk_text) — sliding
    token windows of ``chunk_tokens`` advancing by ``chunk_tokens -
    overlap``.

    Window starts are every stride multiple below the document's token
    count, so the final window may be shorter than ``chunk_tokens`` (and,
    when ``overlap > 0``, may be fully contained in its predecessor —
    kept by design, matching tokenizer-stride chunkers, so every start
    offset is reconstructible from ``chunk_id`` alone). Zero-token
    documents produce no chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    base = docs.select(F.col(id_col), tokens(text_col).alias("tok")).filter(
        F.size("tok") > 0
    )
    starts = F.sequence(F.lit(0), F.size("tok") - 1, F.lit(stride))
    windows = F.transform(starts, lambda s: F.slice("tok", s + 1, chunk_tokens))
    return base.select(
        id_col,
        F.size("tok").alias("n_doc_tokens"),
        F.posexplode(windows).alias("chunk_id", "chunk_toks"),
    ).select(
        id_col,
        "chunk_id",
        "n_doc_tokens",
        F.size("chunk_toks").alias("n_chunk_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"),
    )
