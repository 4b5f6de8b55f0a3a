"""Multimodal column handling (SURVEY.md §2.9).

Media (image/audio/video) is carried through the engine as an opaque
``binary`` payload column plus a typed metadata struct — the same pattern
used by large-scale training-data pipelines: Spark moves/filters/joins the
bytes, and per-item decode runs as an Arrow-batched Python stage only where
genuinely needed.

The decode step itself is STUBBED: the media codec libraries are not in
this environment, so ``decode_stub_features`` computes deterministic fake
features from the raw bytes (documented, test-covered), and
``decode_real_features`` raises ``NotImplementedError`` at the exact
boundary where a codec (PIL/librosa/ffmpeg) would plug in. Everything
around that boundary — schema, batch shape, partitioning, UDF signature —
is real Spark plumbing and is tested.

Scale notes: payload rows are large, so the media frame keeps the bytes in
one column and all filter/join columns (media_type, n_bytes, checksum)
outside the blob; ``mapInPandas`` streams Arrow record batches, bounding
executor memory by batch size rather than partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of a multimodal media frame: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

#: Output schema of the (stubbed) feature-extraction stage.
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_head", LongType()),
    ]
)

_MEDIA_TYPES = ("image", "audio", "video")


def media_frame(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture.

    The text bytes stand in for an encoded media payload (the container has
    no real media fixtures); type assignment is deterministic from the id.
    Checksum/pipeline semantics are identical to what a real ingest would
    produce: sha2 over the payload, byte length outside the blob.
    """
    mt = F.element_at(
        F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
        (F.col("doc_id") % len(_MEDIA_TYPES) + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )


def decode_real_features(media_type: str, payload: bytes) -> dict:
    """Where a real codec would decode ``payload``.

    Requires PIL/librosa/ffmpeg-class libraries that are not available in
    this environment; the Spark plumbing around it is exercised through
    :func:`decode_stub_features` instead.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_stub_features for the deterministic test double"
    )


def decode_stub_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake 'decode': features derived from raw payload bytes.

    feat_mean = mean byte value, feat_head = first 4 payload bytes as a
    big-endian int — stable across runs/engines, so tests can assert exact
    values while exercising the real Arrow batch path.
    """
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": pdf["n_bytes"],
            "feat_mean": [
                round(float(sum(p)) / len(p), 6) if len(p) else 0.0 for p in payloads
            ],
            "feat_head": [
                int.from_bytes(bytes(p[:4]), "big") if len(p) >= 4 else 0 for p in payloads
            ],
        }
    )


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the media frame.

    ``mapInPandas`` so each Python worker sees a bounded record batch (the
    payload column can be MBs per row at production scale); the stub stands
    in for the codec call, the dataflow is the real one.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_stub_features(pdf)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


#: Output schema of the (stubbed) resize stage.
RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized", BinaryType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def resize_media(media: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Stubbed image/audio resize over the Arrow batch path.

    A real implementation decodes the payload with a codec and re-encodes
    at ``width``×``height`` (:func:`decode_real_features` marks that
    boundary). The stub produces a deterministic stand-in — the payload
    truncated/zero-padded to exactly ``width*height`` bytes — so the full
    Spark contract (binary in/out through mapInPandas, bounded batches,
    stable output size) is exercised and assertable.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p[:target]).ljust(target, b"\0") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "resized": resized,
                    "n_bytes_out": [len(r) for r in resized],
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


#: Output schema of the (stubbed) frame-sampling stage (row fan-out).
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 256) -> DataFrame:
    """Stubbed video frame sampling: one input row fans out to N frame rows.

    A real implementation would demux the container and decode every k-th
    frame; the stub slices the payload into ``frame_size``-byte chunks —
    deterministic, so frame counts and byte totals are oracle-checkable
    while the real plumbing (1→N row fan-out inside mapInPandas, binary
    frames, bounded Arrow batches) is what actually runs. Rows with empty
    payloads produce no frames.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for i in range(0, len(p), frame_size):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i // frame_size)
                    out["frame"].append(bytes(p[i : i + frame_size]))
            out["frame_bytes"] = [len(f) for f in out["frame"]]
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
