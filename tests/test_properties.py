"""Property-based tests (hypothesis) for the pure-Python Avro codec and
text kernels — the pieces whose correctness the golden fixture only
samples. Each property runs hundreds of generated cases per test."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
    RATECARD_FIELDS,
    AvroField,
    confluent_wrap,
    decode_avro_record,
    encode_avro_record,
)

longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
texts = st.text(max_size=64)
doubles = st.floats(allow_nan=False, allow_infinity=False, width=64)


def _value_for(f: AvroField, draw):
    base = {"long": longs, "string": texts, "double": doubles}[f.type]
    return draw(st.none() | base) if f.nullable else draw(base)


@st.composite
def ratecard_rows(draw):
    return {f.name: _value_for(f, draw) for f in RATECARD_FIELDS}


@given(ratecard_rows())
@settings(max_examples=300, deadline=None)
def test_codec_roundtrip_ratecard(row):
    body = encode_avro_record(row, RATECARD_FIELDS)
    assert decode_avro_record(body, RATECARD_FIELDS) == row


MIXED_FIELDS = (
    AvroField("a", "long", False),
    AvroField("b", "double", True),
    AvroField("c", "string", False),
    AvroField("d", "double", False),
    AvroField("e", "long", True),
)


@st.composite
def mixed_rows(draw):
    return {f.name: _value_for(f, draw) for f in MIXED_FIELDS}


@given(mixed_rows())
@settings(max_examples=300, deadline=None)
def test_codec_roundtrip_mixed_types(row):
    body = encode_avro_record(row, MIXED_FIELDS)
    assert decode_avro_record(body, MIXED_FIELDS) == row


@given(mixed_rows(), st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=100, deadline=None)
def test_confluent_envelope_roundtrip(row, schema_id):
    wire = confluent_wrap(schema_id, encode_avro_record(row, MIXED_FIELDS))
    assert wire[0] == 0
    assert int.from_bytes(wire[1:5], "big") == schema_id
    assert decode_avro_record(wire[5:], MIXED_FIELDS) == row


@given(st.binary(max_size=40))
@settings(max_examples=200, deadline=None)
def test_decoder_never_overreads_garbage(raw):
    """Garbage bytes must raise cleanly (EOF/Value), never hang or
    silently succeed with trailing data unaccounted for."""
    try:
        row = decode_avro_record(raw, RATECARD_FIELDS)
    except (EOFError, ValueError, UnicodeDecodeError):
        return
    # if it decoded, re-encoding must reproduce the input exactly
    assert encode_avro_record(row, RATECARD_FIELDS) == raw


@given(ratecard_rows())
@settings(max_examples=300, deadline=None)
def test_columnar_decoder_matches_spec_decoder(row):
    """The hot-path index-pointer decoder must agree with the readable
    BytesIO spec decoder on every encodable row."""
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import _decode_record_into

    body = encode_avro_record(row, RATECARD_FIELDS)
    cols = {f.name: [None] for f in RATECARD_FIELDS}
    _decode_record_into(body, RATECARD_FIELDS, cols, 0)
    got = {name: vals[0] for name, vals in cols.items()}
    assert got == decode_avro_record(body, RATECARD_FIELDS)


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.sampled_from([1, 17, 255, 256, 65535]),
    st.data(),
)
@settings(max_examples=150, deadline=None)
def test_ppm_codec_roundtrip_property(w, h, maxval, data):
    """encode_ppm -> decode_ppm is value-exact for any dims / sample
    width, and corrupting the payload raises ValueError, never returns
    wrong pixels (PERMISSIVE boundary contract)."""
    import numpy as np

    from lambda_kafka_to_s3_parquet_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    px = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.lists(
                        st.integers(min_value=0, max_value=maxval),
                        min_size=3, max_size=3),
                    min_size=w, max_size=w),
                min_size=h, max_size=h)
        ),
        dtype=np.int64,
    )
    payload = encode_ppm(px, w, h, maxval)
    got = decode_ppm(payload)
    assert (got["width"], got["height"], got["maxval"]) == (w, h, maxval)
    assert (got["pixels"].astype(np.int64) == px).all()
    # truncation is detected, not silently mis-shaped
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ppm(payload[:-1])


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_ppm_decoder_never_crashes_on_garbage(raw):
    """Arbitrary bytes either decode (only if they happen to be a valid
    P6) or raise ValueError — never any other exception type."""
    from lambda_kafka_to_s3_parquet_spark.operators.multimodal import decode_ppm

    try:
        decode_ppm(b"P6" + raw)
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# Gram-store bloom-delta protocol math (operators/dedup.py): the pure-numpy
# invariants the LSM store's crash/replay safety rests on, independent of
# any Spark session.
# ---------------------------------------------------------------------------

gkey_batches = st.lists(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=0, max_size=60),
    min_size=1, max_size=6,
)


@given(gkey_batches)
@settings(max_examples=200, deadline=None)
def test_bloom_delta_composition_and_incremental_popcount(batches):
    """(a) OR-ing per-batch deltas into a zero bitmap equals inserting
    every key into one bloom (delta composition == one-shot — what
    _load_bloom reconstructs on a cold start); (b) the incremental
    popcount (count 0->1 flips per batch before setting) equals the
    exact popcount at every step; (c) membership: every inserted key is
    'maybe present' (no false negatives, ever)."""
    import numpy as np

    from lambda_kafka_to_s3_parquet_spark.operators.dedup import (
        _bloom_maybe_contains,
        _bloom_positions,
        _popcount,
    )

    n_bits, n_hashes = 1 << 12, 4
    composite = np.zeros(n_bits // 8, dtype=np.uint8)
    running = 0
    all_keys: list[int] = []
    for batch in batches:
        keys = np.array(batch, dtype=np.int64)
        all_keys.extend(batch)
        if len(keys) == 0:
            continue
        pos = _bloom_positions(keys, n_bits, n_hashes)
        u = np.unique(pos.ravel())
        was = (composite[u // 8] >> (u % 8).astype(np.uint8)) & 1
        running += int((was == 0).sum())
        np.bitwise_or.at(
            composite, (pos // 8).ravel(),
            (np.uint8(1) << (pos % 8).astype(np.uint8)).ravel(),
        )
        assert running == _popcount(composite)  # (b)

    oneshot = np.zeros(n_bits // 8, dtype=np.uint8)
    if all_keys:
        pos = _bloom_positions(np.array(all_keys, dtype=np.int64), n_bits, n_hashes)
        np.bitwise_or.at(
            oneshot, (pos // 8).ravel(),
            (np.uint8(1) << (pos % 8).astype(np.uint8)).ravel(),
        )
    assert np.array_equal(composite, oneshot)  # (a)
    if all_keys:
        hits = _bloom_maybe_contains(
            composite, np.array(all_keys, dtype=np.int64), n_bits, n_hashes
        )
        assert hits.all()  # (c)
