"""Multimodal column handling (SURVEY.md §2.9).

Media (image/audio/video) is carried through the engine as an opaque
``binary`` payload column plus a typed metadata struct — the same pattern
used by large-scale training-data pipelines: Spark moves/filters/joins the
bytes, and per-item decode runs as an Arrow-batched Python stage only where
genuinely needed.

FIVE formats have REAL dependency-free codecs in this container — PCM
WAV audio (RIFF/WAVE spec incl. 24/32-bit and float32,
:func:`decode_wav`), binary PPM (netpbm P6, :func:`decode_ppm`,
including a real nearest-neighbor resize), uncompressed BMP
(8-bit-palette/24/32-bit BI_RGB, :func:`decode_bmp`), PNG (stdlib-zlib
inflate + full filter/depth/interlace matrix, :func:`decode_png`), and
GIF (real LZW, palettes, Adam-style 4-pass interlace,
:func:`decode_gif`) — so the audio- and image-feature stages decode
genuine payloads end to end. The remaining compressed formats
(jpeg/mp4) stay STUBBED: ``decode_stub_features`` computes
deterministic fake features from the raw bytes (documented,
test-covered), and ``decode_real_features`` raises
``NotImplementedError`` at the exact boundary where a
PIL/librosa/ffmpeg-class codec would plug in. Everything around that
boundary — schema, batch shape, partitioning, UDF signature — is real
Spark plumbing and is tested.

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


def encode_wav(
    samples: list[int],
    sample_rate: int = 16000,
    n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """A real RIFF/WAVE PCM file from integer samples (test-fixture
    synthesis, same role as ``encode_avro_record``): canonical 44-byte
    header + interleaved little-endian PCM data, per the public WAVE
    format spec — 8/16/24/32-bit integer PCM, or IEEE float32 when
    ``bits="f32"`` (format code 3), mirroring the round-14 decode
    matrix. ``decode_wav(encode_wav(s)) == s`` value-exactly."""
    import struct

    if bits not in (8, 16, 24, 32, "f32"):
        raise ValueError("PCM WAV fixture supports 8/16/24/32-bit or 'f32'")
    if len(samples) % n_channels:
        raise ValueError("sample count must be a multiple of n_channels")
    if bits == "f32":
        data = b"".join(struct.pack("<f", s) for s in samples)
        nbits, fmt_code = 32, 3
    elif bits == 24:
        data = b"".join(
            int(s).to_bytes(3, "little", signed=True) for s in samples
        )
        nbits, fmt_code = 24, 1
    else:
        fmt = {8: "<B", 16: "<h", 32: "<i"}[bits]
        data = b"".join(struct.pack(fmt, s) for s in samples)
        nbits, fmt_code = bits, 1
    block_align = n_channels * nbits // 8
    byte_rate = sample_rate * block_align
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        fmt_code,
        n_channels,
        sample_rate,
        byte_rate,
        block_align,
        nbits,
        b"data",
        len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> dict:
    """Dependency-free PCM WAV decode (public RIFF/WAVE spec): walk the
    chunk list, parse the ``fmt `` chunk, decode the ``data`` chunk's
    little-endian PCM samples — integer PCM (format 1) at 8/16 bits and
    (round 14) 24 bits (3-byte two's complement, no struct code exists)
    and 32 bits, plus IEEE float32 (format 3). Returns sample_rate /
    n_channels / bits / the decoded per-channel-interleaved samples
    list (ints for PCM, floats for format 3). Malformed input raises
    ValueError (the caller's corrupt-record boundary); ADPCM/µ-law stay
    the honest compressed boundary."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_info, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_format, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_format not in (1, 3):
                raise ValueError(
                    f"unsupported WAV format {audio_format} "
                    "(integer PCM=1 / IEEE float=3 only)"
                )
            if audio_format == 1 and bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported bit depth {bits}")
            if audio_format == 3 and bits != 32:
                raise ValueError(
                    f"IEEE-float WAV must be 32-bit, got {bits}"
                )
            fmt_info = (n_channels, sample_rate, bits, audio_format)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n_channels, sample_rate, bits, audio_format = fmt_info
    width = bits // 8
    if len(data) % width:
        raise ValueError(f"data length not a multiple of {width} ({bits}-bit)")
    if audio_format == 3:
        samples = list(struct.unpack(f"<{len(data) // 4}f", data))
    elif bits == 8:
        samples = list(struct.unpack(f"<{len(data)}B", data))
    elif bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    elif bits == 24:
        # 3-byte little-endian two's complement (round 14): no struct
        # code exists — combine bytes and sign-extend
        samples = [
            int.from_bytes(data[i : i + 3], "little", signed=True)
            for i in range(0, len(data), 3)
        ]
    else:  # 32-bit integer PCM
        samples = list(struct.unpack(f"<{len(data) // 4}i", data))
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "samples": samples,
    }


def encode_ppm(pixels, width: int, height: int, maxval: int = 255) -> bytes:
    """A real binary PPM (netpbm ``P6``) image from an RGB pixel array
    (test-fixture synthesis, same role as :func:`encode_wav`): canonical
    ``P6\\n<w> <h>\\n<maxval>\\n`` header + row-major RGB samples, per the
    public netpbm format spec. ``pixels`` is anything ``numpy.asarray``
    accepts with shape ``(height, width, 3)``; samples are 1 byte each for
    ``maxval<=255``, else 2 bytes big-endian (the spec's only two widths).
    ``decode_ppm(encode_ppm(px)) == px`` value-exactly."""
    import numpy as np

    if not 0 < maxval < 65536:
        raise ValueError("maxval must be in 1..65535")
    arr = np.asarray(pixels)
    if arr.shape != (height, width, 3):
        raise ValueError(f"pixels shape {arr.shape} != ({height}, {width}, 3)")
    if arr.min() < 0 or arr.max() > maxval:
        raise ValueError("sample out of 0..maxval range")
    dt = np.dtype(">u2") if maxval > 255 else np.uint8
    return f"P6\n{width} {height}\n{maxval}\n".encode("ascii") + arr.astype(
        dt
    ).tobytes()


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header per the netpbm spec (whitespace-separated tokens,
    ``#`` comments run to end-of-line, exactly one whitespace byte after
    maxval). Returns (width, height, maxval, data_offset)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, vals = 2, []
    while len(vals) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            vals.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    if pos >= len(payload) or not payload[pos : pos + 1].isspace():
        raise ValueError("missing whitespace after maxval")
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"bad PPM dimensions/maxval {vals}")
    return w, h, maxval, pos + 1


def decode_ppm(payload: bytes) -> dict:
    """Dependency-free binary PPM (P6) decode per the public netpbm spec.
    Returns width / height / maxval / ``pixels`` (a ``(h, w, 3)`` numpy
    array, uint8 or uint16 by sample width). Malformed input raises
    ValueError (the caller's corrupt-record boundary)."""
    import numpy as np

    w, h, maxval, off = _ppm_header(payload)
    dt, step = (np.dtype(">u2"), 2) if maxval > 255 else (np.uint8, 1)
    need = w * h * 3 * step
    data = payload[off : off + need]
    if len(data) != need:
        raise ValueError(f"PPM data truncated: need {need} bytes, have {len(data)}")
    px = np.frombuffer(data, dtype=dt).reshape(h, w, 3)
    return {
        "width": w,
        "height": h,
        "maxval": maxval,
        "pixels": px.astype(np.uint16) if step == 2 else px,
    }


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize: decode P6, nearest-neighbor sample to
    ``width``×``height`` (numpy integer-index gather — the standard
    center-of-cell mapping ``src = floor((i + 0.5) * src_dim / dst_dim)``),
    re-encode P6 at the same maxval. Pure array ops, no codec libs."""
    import numpy as np

    img = decode_ppm(payload)
    src = img["pixels"]
    rows = ((np.arange(height) + 0.5) * img["height"] / height).astype(int)
    cols = ((np.arange(width) + 0.5) * img["width"] / width).astype(int)
    out = src[rows][:, cols]
    return encode_ppm(out, width, height, img["maxval"])


def encode_bmp(pixels, width: int, height: int) -> bytes:
    """A real Windows BMP (BITMAPINFOHEADER, 24-bit uncompressed BI_RGB)
    from an RGB pixel array — the third offline codec next to PCM WAV
    and binary PPM, per the public BMP file-format spec: 14-byte file
    header + 40-byte info header + bottom-up rows of BGR samples, each
    row padded to a 4-byte boundary. ``decode_bmp(encode_bmp(px)) == px``
    value-exactly."""
    import struct

    import numpy as np

    arr = np.asarray(pixels)
    if arr.shape != (height, width, 3):
        raise ValueError(f"pixels shape {arr.shape} != ({height}, {width}, 3)")
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("BMP samples must be in 0..255")
    bgr = arr.astype(np.uint8)[:, :, ::-1]  # RGB -> BGR
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    rows = [
        bgr[r].tobytes() + b"\x00" * pad for r in range(height - 1, -1, -1)
    ]  # bottom-up
    data = b"".join(rows)
    off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes) -> dict:
    """Dependency-free BMP decode per the public spec: BITMAPINFOHEADER
    (or larger v4/v5 headers — read their common 40-byte prefix),
    uncompressed BI_RGB at 24-bit (BGR), 32-bit (BGRX — the padding
    byte drops; round 14), or 8-bit PALETTE (BGRA color-table lookup,
    ``biClrUsed`` honored, 0 = 256; round 14), bottom-up (positive
    height) or top-down (negative) row order, 4-byte row padding.
    Returns width / height / ``pixels`` (``(h, w, 3)`` RGB uint8 —
    palette images return their RGB expansion, matching the PNG PLTE
    convention). 1/4-bit, 16-bit masks, and RLE compression raise
    ValueError — the honest codec boundary jpeg/mp4 still hit."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (BITMAPCOREHEADER)")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp not in (8, 24, 32) or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); 8-bit-palette/24/32-bit BI_RGB "
            "is the offline codec"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    nbytes = bpp // 8
    row_bytes = w * nbytes
    stride = row_bytes + ((-row_bytes) % 4)
    need = stride * h
    data = payload[data_off : data_off + need]
    if len(data) != need:
        raise ValueError(f"BMP data truncated: need {need} bytes, have {len(data)}")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)[:, :row_bytes]
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + hdr_size
        pal = payload[pal_off : pal_off + 4 * n_colors]
        if len(pal) != 4 * n_colors:
            raise ValueError(
                f"BMP color table truncated: need {4 * n_colors} bytes, "
                f"have {len(pal)}"
            )
        # BGRA quads -> RGB triples
        pal_arr = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 4)[:, 2::-1]
        idx = rows.reshape(h, w)
        if int(idx.max()) >= n_colors:
            raise ValueError(
                f"BMP palette index {int(idx.max())} past color table "
                f"size {n_colors}"
            )
        px = pal_arr[idx]
    else:
        # BGR(X) -> RGB; the 32-bit padding/alpha byte drops
        px = rows.reshape(h, w, nbytes)[:, :, 2::-1]
    if not top_down:
        px = px[::-1]  # bottom-up storage -> top-down array
    return {"width": w, "height": h, "pixels": px.copy()}


def _lzw_decode(data: bytes, mcs: int) -> list[int]:
    """GIF-variant LZW decode: little-endian bit packing, CLEAR = 2^mcs,
    END = CLEAR+1, code width starts at mcs+1 and grows as the table
    fills, capped at 12 bits (the table then freezes until a CLEAR).
    Raises ValueError on out-of-sequence codes or a stream that ends
    without END — corrupt data fails loudly, never decodes garbage."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out: list[int] = []
    acc = nbits = pos = 0
    table: dict[int, tuple] = {}
    width = mcs + 1
    prev: tuple | None = None
    next_code = end + 1

    def reset():
        nonlocal table, width, prev, next_code
        table = {i: (i,) for i in range(clear)}
        width = mcs + 1
        prev = None
        next_code = end + 1

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"LZW code {code} out of sequence")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(indices, mcs: int) -> bytes:
    """GIF-variant LZW encode — the exact inverse of :func:`_lzw_decode`
    (round-trip test-pinned across width-growth and table-reset
    boundaries). Emits CLEAR up front, resets the table at 4096 codes,
    and grows the emit width one code later than the table add (the
    classic GIF off-by-one the decoder mirrors)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[tuple, int] = {}
    width = mcs + 1
    next_code = end + 1

    def reset_table():
        nonlocal table, width, next_code
        table = {(i,): i for i in range(clear)}
        width = mcs + 1
        next_code = end + 1

    bits.append((clear, width))
    reset_table()
    buf: tuple = ()
    for s in indices:
        s = int(s)
        if not 0 <= s < clear:
            raise ValueError(f"LZW symbol {s} out of range for mcs={mcs}")
        nb = buf + (s,)
        if nb in table:
            buf = nb
            continue
        bits.append((table[buf], width))
        if next_code < 4096:
            table[nb] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bits.append((clear, width))
            reset_table()
        buf = (s,)
    if buf:
        bits.append((table[buf], width))
    bits.append((end, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


#: GIF interlace passes: (first row, step)
_GIF_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def encode_gif(pixels, width: int, height: int, interlace: bool = False) -> bytes:
    """A real GIF89a from an RGB pixel array (the FIFTH offline codec,
    round 14): the distinct colors become the global color table
    (≤ 256 required — quantization is out of scope for a test codec),
    pixels LZW-compress per the public GIF spec, optionally
    interlaced. ``decode_gif(encode_gif(px)) == px`` value-exactly."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width, 3)
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError(
            f"GIF encode needs <= 256 distinct colors, got {colors.shape[0]}"
        )
    gct_bits = max(1, int(colors.shape[0] - 1).bit_length())
    n_entries = 1 << gct_bits
    mcs = max(2, gct_bits)
    idx = inverse.reshape(height, width)
    if interlace:
        rows = [r for first, step in _GIF_PASSES for r in range(first, height, step)]
        idx = idx[rows]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (gct_bits - 1), 0, 0)
    gct = bytearray()
    for r, g, b in colors:
        gct += bytes([r, g, b])
    gct += b"\x00" * (3 * (n_entries - colors.shape[0]))
    out += gct
    flags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, flags)
    out += bytes([mcs])
    data = _lzw_encode(idx.reshape(-1).tolist(), mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """Dependency-free GIF decode per the public spec (87a and 89a):
    logical screen descriptor, global/local color tables, extension
    blocks skipped, the FIRST image frame LZW-decoded (variable-width
    codes, CLEAR/END handling, 12-bit cap) and de-interlaced when the
    4-pass flag is set; a sub-canvas frame composes onto a background-
    color canvas. Returns width / height / ``channels``=3 / ``pixels``
    (the RGB palette expansion — the PNG-PLTE convention). Malformed
    streams (bad codes, truncated blocks, missing palette,
    out-of-range indices) raise ValueError."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF truncated in the logical screen descriptor")
    w, h, flags, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad GIF dimensions {w}x{h}")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = payload[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("GIF global color table truncated")
        pos += 3 * n
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image frame")
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF extension truncated")
                n = payload[pos]
                pos += 1 + n
                if n == 0:
                    break
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block marker 0x{marker:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF image descriptor truncated")
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = payload[pos : pos + 3 * n]
            if len(pal) != 3 * n:
                raise ValueError("GIF local color table truncated")
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has neither local nor global palette")
        if iw <= 0 or ih <= 0 or left + iw > w or top + ih > h:
            raise ValueError(
                f"bad GIF frame geometry {iw}x{ih}@({left},{top}) on {w}x{h}"
            )
        if pos >= len(payload):
            raise ValueError("GIF image data truncated")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"bad GIF LZW min code size {mcs}")
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("GIF image sub-blocks truncated")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            block = payload[pos : pos + n]
            if len(block) != n:
                raise ValueError("GIF image sub-block truncated")
            data += block
            pos += n
        indices = _lzw_decode(bytes(data), mcs)
        if len(indices) < iw * ih:
            raise ValueError(
                f"GIF frame decoded {len(indices)} pixels, needs {iw * ih}"
            )
        idx = np.array(indices[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if iflags & 0x40:  # de-interlace: invert the 4-pass row order
            order = [r for first, step in _GIF_PASSES for r in range(first, ih, step)]
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        pal_arr = np.frombuffer(bytes(pal), dtype=np.uint8).reshape(-1, 3)
        if int(idx.max()) >= pal_arr.shape[0]:
            raise ValueError(
                f"GIF index {int(idx.max())} past palette size {pal_arr.shape[0]}"
            )
        frame = pal_arr[idx]
        if iw == w and ih == h:
            px = frame
        else:
            if gct is None or bg * 3 + 3 > len(gct):
                raise ValueError("GIF sub-canvas frame without a background color")
            px = np.tile(
                np.frombuffer(bytes(gct[bg * 3 : bg * 3 + 3]), np.uint8), (h, w, 1)
            )
            px[top : top + ih, left : left + iw] = frame
        return {"width": int(w), "height": int(h), "channels": 3,
                "pixels": px.astype(np.uint8).copy()}
    raise ValueError("GIF ended without an image frame")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    pixels, width: int, height: int, filter_type: int = 0, palette=None
) -> bytes:
    """A real PNG (8-bit, non-interlaced) from a pixel array, per the
    public PNG spec with stdlib ``zlib`` only — the fourth offline
    codec next to PCM WAV / binary PPM / 24-bit BMP. ``pixels`` is
    ``(h, w, c)`` uint8-ranged with c = 1 (grayscale, color type 0),
    2 (gray+alpha, type 4), 3 (RGB, type 2) or 4 (RGBA, type 6) —
    round 13 extended the codec below RGB. With ``palette`` (an
    ``(n<=256, 3)`` RGB array), ``pixels`` is instead an ``(h, w)`` or
    ``(h, w, 1)`` INDEX plane and the output is a PALETTE PNG (color
    type 3 + PLTE chunk). ``filter_type`` applies ONE scanline filter
    (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) to every row — any
    choice round-trips value-exactly through :func:`decode_png` (the
    filters are lossless predictions; tests exercise each)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels)
    plte = None
    if palette is not None:
        plte = np.asarray(palette)
        if plte.ndim != 2 or plte.shape[1] != 3 or not 1 <= plte.shape[0] <= 256:
            raise ValueError(
                f"palette shape {plte.shape} != (n<=256, 3)"
            )
        if plte.min() < 0 or plte.max() > 255:
            raise ValueError("palette samples must be in 0..255")
        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[:, :, 0]
        if arr.ndim != 2 or arr.shape != (height, width):
            raise ValueError(
                f"palette pixels shape {arr.shape} != ({height}, {width})"
            )
        if arr.min() < 0 or arr.max() >= plte.shape[0]:
            raise ValueError("palette index out of range")
        arr = arr.reshape(height, width, 1)
    elif arr.ndim != 3 or arr.shape[:2] != (height, width) or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(
            f"pixels shape {arr.shape} != ({height}, {width}, 1|2|3|4)"
        )
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("PNG samples must be in 0..255")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    arr = arr.astype(np.uint8)
    bpp = arr.shape[2]
    color_type = 3 if plte is not None else {1: 0, 2: 4, 3: 2, 4: 6}[bpp]
    raw = arr.reshape(height, width * bpp).astype(np.int16)
    prior = np.zeros_like(raw)
    prior[1:] = raw[:-1]
    left = np.zeros_like(raw)
    left[:, bpp:] = raw[:, :-bpp]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - prior
    elif filter_type == 3:
        filt = raw - (left + prior) // 2
    else:  # Paeth
        ul = np.zeros_like(raw)
        ul[1:, bpp:] = raw[:-1, :-bpp]
        p = left + prior - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
        )
        filt = raw - pred
    filt = (filt % 256).astype(np.uint8)
    stream = b"".join(
        bytes([filter_type]) + filt[r].tobytes() for r in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    chunks = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += _png_chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return (
        chunks
        + _png_chunk(b"IDAT", zlib.compress(stream))
        + _png_chunk(b"IEND", b"")
    )


def _png_reconstruct(stream: bytes, h: int, stride: int, fbpp: int):
    """Per-scanline filter reconstruction (None/Sub/Up/Average/Paeth)
    over one filtered sub-image: ``h`` rows of ``stride`` bytes each
    prefixed by a filter-type byte; ``fbpp`` is the FILTER byte offset
    (bytes per complete pixel, min 1 — sub-byte depths filter with
    offset 1 per the spec). Returns the (h, stride) uint8 byte plane.
    Factored out of :func:`decode_png` so Adam7 passes (each its own
    independently-filtered sub-image) reuse it verbatim."""
    import numpy as np

    if len(stream) != h * (stride + 1):
        raise ValueError(
            f"PNG stream is {len(stream)} bytes, expected {h * (stride + 1)}"
        )
    rows = np.frombuffer(stream, dtype=np.uint8).reshape(h, stride + 1)
    ftypes, data = rows[:, 0], rows[:, 1:].astype(np.int16)
    recon = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ft = int(ftypes[r])
        line = data[r]
        up = recon[r - 1].astype(np.int16) if r else np.zeros(stride, np.int16)
        if ft == 0:
            out = line
        elif ft == 1:
            # Sub is a per-byte-lane prefix sum (stride fbpp) mod 256 —
            # widened to int64 first: an int16 cumsum overflows after
            # ~128 saturated pixels. Stride may not divide evenly when
            # fbpp > 1 never happens (stride = w*fbpp) but sub-byte
            # rows (fbpp=1) reshape trivially.
            out = (
                line.reshape(-1, fbpp).astype(np.int64).cumsum(axis=0).reshape(-1)
            )
        elif ft == 2:
            out = line + up
        elif ft in (3, 4):
            # Average/Paeth need the RECONSTRUCTED left neighbor —
            # inherently sequential along the row (per-byte loop; rows
            # are short and this is the cold path of a test codec)
            out = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = int(out[x - fbpp]) if x >= fbpp else 0
                b = int(up[x])
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    c = int(recon[r - 1, x - fbpp]) if (r and x >= fbpp) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                # reduce mod 256 NOW: the next byte's left neighbor is
                # read from `out` before the row-level % 256
                out[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft} on row {r}")
        recon[r] = (out % 256).astype(np.uint8)
    return recon


def _png_samples(recon, w: int, depth: int, channels: int):
    """Byte plane → (h, w, channels) uint8 samples for one sub-image:
    8-bit passes through; 16-bit keeps the HIGH byte (the standard
    16→8 reduction — the low byte is sub-percept noise for features);
    sub-byte depths (1/2/4) bit-unpack MSB-first and return RAW sample
    values — the caller scales grayscale to full range and leaves
    palette indices exact."""
    import numpy as np

    h = recon.shape[0]
    if depth == 8:
        return recon.reshape(h, w, channels)
    if depth == 16:
        return recon.reshape(h, w, channels, 2)[:, :, :, 0].copy()
    # sub-byte: one channel by construction (validated by the caller)
    bits = np.unpackbits(recon, axis=1)
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    px = (vals * weights).sum(axis=2).astype(np.uint8)[:, :w]
    return px.reshape(h, w, 1)


#: Adam7 interlace passes: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def decode_png(payload: bytes) -> dict:
    """Dependency-free PNG decode per the public spec: stdlib ``zlib``
    inflate + per-scanline filter reconstruction (None/Sub/Up/Average/
    Paeth). Round 14 completes the variant matrix: grayscale (color
    type 0) at depths 1/2/4/8/16, RGB (2) at 8/16, PALETTE (3, PLTE
    lookup) at 1/2/4/8, gray+alpha (4) and RGBA (6) at 8/16 — each in
    BOTH non-interlaced and Adam7-interlaced form (each pass is its own
    independently-filtered sub-image, scattered into place). 16-bit
    samples reduce to their high byte (the standard 16→8 reduction);
    sub-byte grayscale scales to full 8-bit range. jpeg/mp4 keep the
    honest NotImplementedError boundary. Chunk CRCs are verified (a
    corrupt stream fails loudly, never decodes garbage). Returns
    width / height / ``channels`` / ``pixels`` (``(h, w, c)`` uint8;
    palette images return their RGB expansion, channels=3)."""
    import struct
    import zlib

    import numpy as np

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        # the WHOLE chunk (len + tag + body + 4-byte CRC) must fit: a
        # payload cut inside the CRC would otherwise leak struct.error
        # past the ValueError boundary the permissive stages catch
        if pos + 12 + length > len(payload):
            raise ValueError(f"PNG chunk {tag!r} truncated")
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or not seen_iend or not idat:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    if len(ihdr) != 13:
        raise ValueError(f"PNG IHDR is {len(ihdr)} bytes, expected 13")
    w, h, depth, color_type, comp, filt_m, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    valid_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    if (
        channels is None
        or depth not in valid_depths[color_type]
        or comp
        or filt_m
        or interlace not in (0, 1)
    ):
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}, "
            f"interlace={interlace}); the offline codec covers the spec's "
            "valid depth/color matrix with interlace 0/1"
        )
    if color_type == 3:
        if plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768:
            raise ValueError(
                f"palette PNG with missing/malformed PLTE "
                f"({0 if plte is None else len(plte)} bytes)"
            )
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    bits_pp = depth * channels
    fbpp = max(1, bits_pp // 8)  # filter byte offset (>=1 per spec)
    try:
        stream = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from None

    def sub_stride(sub_w: int) -> int:
        return (sub_w * bits_pp + 7) // 8

    if interlace == 0:
        recon = _png_reconstruct(stream, h, sub_stride(w), fbpp)
        px = _png_samples(recon, w, depth, channels)
    else:
        # Adam7: seven independently-filtered sub-images, consumed in
        # order from ONE inflate stream and scattered into place
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            st = sub_stride(pw)
            need = ph * (st + 1)
            recon = _png_reconstruct(stream[off : off + need], ph, st, fbpp)
            off += need
            sub = _png_samples(recon, pw, depth, channels)
            px[y0::dy, x0::dx] = sub
        if off != len(stream):
            raise ValueError(
                f"PNG Adam7 stream is {len(stream)} bytes, expected {off}"
            )
    if color_type == 0 and depth < 8:
        # grayscale sub-byte samples scale to full 8-bit range — the
        # factors are exact (255/1, 255/3, 255/15 are integers)
        px = (px.astype(np.int32) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if color_type == 3:
        # PLTE lookup: the index plane expands to its RGB triples —
        # out-of-range indices are malformed input, not silent black
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError(
                f"palette index {int(idx.max())} past PLTE size {pal.shape[0]}"
            )
        return {
            "width": int(w),
            "height": int(h),
            "channels": 3,
            "pixels": pal[idx].copy(),
        }
    return {
        "width": int(w),
        "height": int(h),
        "channels": channels,
        "pixels": px.copy(),
    }


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Format-dispatching REAL resize: P6 payloads through
    :func:`resize_ppm`, BMP/PNG payloads through decode → the same
    center-of-cell nearest-neighbor gather → re-encode. Output stays
    in the input's own format (PNG keeps its alpha channel)."""
    import numpy as np

    if payload[:2] == b"BM":
        img = decode_bmp(payload)
        rows = ((np.arange(height) + 0.5) * img["height"] / height).astype(int)
        cols = ((np.arange(width) + 0.5) * img["width"] / width).astype(int)
        return encode_bmp(img["pixels"][rows][:, cols], width, height)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        img = decode_png(payload)
        rows = ((np.arange(height) + 0.5) * img["height"] / height).astype(int)
        cols = ((np.arange(width) + 0.5) * img["width"] / width).astype(int)
        return encode_png(img["pixels"][rows][:, cols], width, height)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # NN sampling only selects existing pixels, so the resized
        # frame's colors are a subset of the original palette — the
        # <=256-color encode precondition holds by construction
        img = decode_gif(payload)
        rows = ((np.arange(height) + 0.5) * img["height"] / height).astype(int)
        cols = ((np.arange(width) + 0.5) * img["width"] / width).astype(int)
        return encode_gif(img["pixels"][rows][:, cols], width, height)
    return resize_ppm(payload, width, height)


def decode_real_features(media_type: str, payload: bytes) -> dict:
    """The real-codec boundary. Executable offline: PCM WAV audio
    (sample-domain features: rate, channels, sample count, duration,
    peak, RMS) and PPM / 24-bit BMP / 8-bit PNG images (pixel-domain
    features: dimensions, per-channel means, Rec.601 luma — identical
    across the three image containers for the same pixels). The
    remaining compressed formats (jpeg images, mp4 video) still raise
    ``NotImplementedError`` at exactly this boundary, where a
    PIL/ffmpeg-class codec would plug in; the Spark plumbing around the
    boundary is exercised through :func:`decode_stub_features` for
    those.
    """
    if media_type == "audio" and payload[:4] == b"RIFF":
        wav = decode_wav(bytes(payload))
        s = wav["samples"]
        n = len(s)
        rms = (sum(v * v for v in s) / n) ** 0.5 if n else 0.0
        return {
            "sample_rate": wav["sample_rate"],
            "n_channels": wav["n_channels"],
            "n_samples": n // wav["n_channels"],
            "duration_sec": round(
                n / wav["n_channels"] / wav["sample_rate"], 6
            ),
            "peak_abs": max((abs(v) for v in s), default=0),
            "rms": round(rms, 6),
        }
    if media_type == "image" and (
        payload[:2] in (b"P6", b"BM")
        or payload[:6] in (b"GIF87a", b"GIF89a")
        or payload[: len(_PNG_SIG)] == bytes(_PNG_SIG)
    ):
        if payload[:2] == b"BM":
            img = {**decode_bmp(bytes(payload)), "maxval": 255}
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            # GIF expands to RGB like palette PNG — identical features
            # for the same pixels (the container-invariance rule)
            img = {**decode_gif(bytes(payload)), "maxval": 255}
        elif payload[:2] == b"P6":
            img = decode_ppm(bytes(payload))
        else:
            # PNG: features over the RGB channels (alpha, if present, is
            # not a color sample) — a PNG of the same pixels yields
            # IDENTICAL features to the BMP/PPM of those pixels (the
            # BMP==PPM precedent, test-pinned). Grayscale (1-channel)
            # and gray+alpha decode replicate the gray plane into RGB:
            # mean_r = mean_g = mean_b = the gray mean, so luma is the
            # gray mean too — the conventional gray->RGB embedding.
            img = {**decode_png(bytes(payload)), "maxval": 255}
            if img["channels"] < 3:
                import numpy as _np

                img["pixels"] = _np.repeat(
                    img["pixels"][:, :, :1], 3, axis=2
                )
            else:
                img["pixels"] = img["pixels"][:, :, :3]
        px = img["pixels"].astype("float64")
        mr, mg, mb = (round(float(px[:, :, c].mean()), 6) for c in range(3))
        return {
            "width": img["width"],
            "height": img["height"],
            "maxval": img["maxval"],
            "n_pixels": img["width"] * img["height"],
            "mean_r": mr,
            "mean_g": mg,
            "mean_b": mb,
            # Rec.601 luma weights over the channel means
            "mean_luma": round(0.299 * mr + 0.587 * mg + 0.114 * mb, 6),
        }
    raise NotImplementedError(
        f"no offline codec for media_type={media_type!r} with this payload; "
        "PCM WAV audio and PPM/BMP/PNG images are the real codecs available "
        "here (jpeg and mp4 remain the compressed boundary) — use "
        "decode_stub_features for the deterministic test double"
    )


#: Output schema of the REAL audio feature stage (PCM WAV codec).
AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_sec", DoubleType()),
        StructField("peak_abs", LongType()),
        StructField("rms", DoubleType()),
        StructField("corrupt", StringType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL feature extraction for audio rows: decode each payload as PCM
    WAV through :func:`decode_wav` inside the same Arrow-batched
    ``mapInPandas`` shape the stubbed stages use. Undecodable payloads
    yield a row with NULL features and the error in ``corrupt``
    (PERMISSIVE, mirroring the Avro decode stage) — never an exception.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields}
            for mid, mtype, p in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                out["media_id"].append(mid)
                try:
                    f = decode_real_features(str(mtype), bytes(p))
                    for k in (
                        "sample_rate",
                        "n_channels",
                        "n_samples",
                        "duration_sec",
                        "peak_abs",
                        "rms",
                    ):
                        out[k].append(f[k])
                    out["corrupt"].append(None)
                except (ValueError, NotImplementedError) as e:
                    for k in (
                        "sample_rate",
                        "n_channels",
                        "n_samples",
                        "duration_sec",
                        "peak_abs",
                        "rms",
                    ):
                        out[k].append(None)
                    out["corrupt"].append(str(e)[:200])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


#: Output schema of the REAL image feature stage (binary PPM codec).
IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("maxval", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("mean_luma", DoubleType()),
        StructField("corrupt", StringType()),
    ]
)

_IMG_FEAT_KEYS = (
    "width", "height", "maxval", "n_pixels",
    "mean_r", "mean_g", "mean_b", "mean_luma",
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL feature extraction for image rows: decode each payload as
    binary PPM through :func:`decode_ppm` inside the same Arrow-batched
    ``mapInPandas`` shape the stubbed stages use. Undecodable payloads
    (jpeg/png land here too — their codec boundary is still the honest
    ``NotImplementedError``) yield a row with NULL features and the error
    in ``corrupt`` (PERMISSIVE, mirroring the Avro decode stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in IMAGE_FEATURE_SCHEMA.fields}
            for mid, mtype, p in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                out["media_id"].append(mid)
                try:
                    f = decode_real_features(str(mtype), bytes(p))
                    for k in _IMG_FEAT_KEYS:
                        out[k].append(f[k])
                    out["corrupt"].append(None)
                except (ValueError, NotImplementedError) as e:
                    for k in _IMG_FEAT_KEYS:
                        out[k].append(None)
                    out["corrupt"].append(str(e)[:200])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """REAL image resize over the Arrow batch path: each PPM or BMP
    payload is decoded, nearest-neighbor resampled to
    ``width``×``height`` (:func:`resize_image` — format-dispatching), and
    re-encoded in its own format — same output schema as the stubbed
    :func:`resize_media`, so downstream consumers are agnostic to which
    stage produced the frame. Undecodable payloads pass through with NULL
    ``resized`` (PERMISSIVE; the byte length column makes them
    filterable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for p in pdf["payload"]:
                try:
                    resized.append(resize_image(bytes(p), width, height))
                except ValueError:
                    resized.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "resized": resized,
                    "n_bytes_out": [
                        len(r) if r is not None else 0 for r in resized
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def transcode_images(media: DataFrame, fmt: str = "mixed") -> DataFrame:
    """Container TRANSCODE over the Arrow batch path: decode each
    supported image payload (PPM/BMP/PNG/GIF) and re-encode it as
    ``fmt`` ("ppm" / "bmp" / "png" / "gif"), or — with ``fmt="mixed"``
    — as ``media_id % 4`` cycling the four containers (GIF joined the
    rotation in round 14), so one frame exercises every codec's encode
    AND decode distributed. Pixel values are preserved exactly (every
    container is lossless for these 8-bit RGB fixtures; the
    synthesized thumbnails carry far fewer than GIF's 256-color
    limit), so downstream features are container-invariant
    (test-pinned). Undecodable payloads pass through unchanged."""
    if fmt not in ("ppm", "bmp", "png", "gif", "mixed"):
        raise ValueError(f"fmt must be ppm/bmp/png/gif/mixed, got {fmt!r}")

    def _decode_any(p: bytes):
        if p[:2] == b"BM":
            i = decode_bmp(p)
            return i["pixels"], i["width"], i["height"]
        if p[: len(_PNG_SIG)] == _PNG_SIG:
            i = decode_png(p)
            return i["pixels"][:, :, :3], i["width"], i["height"]
        if p[:6] in (b"GIF87a", b"GIF89a"):
            i = decode_gif(p)
            return i["pixels"], i["width"], i["height"]
        i = decode_ppm(p)
        return i["pixels"], i["width"], i["height"]

    encoders = {"ppm": encode_ppm, "bmp": encode_bmp, "png": encode_png,
                "gif": encode_gif}
    order = ("ppm", "bmp", "png", "gif")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    px, w, h = _decode_any(bytes(p))
                    f = order[int(mid) % 4] if fmt == "mixed" else fmt
                    out.append(encoders[f](px, w, h))
                except ValueError:
                    out.append(bytes(p))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema="media_id long, media_type string, payload binary"
    )


def synthesize_ppm_payloads(
    media: DataFrame, width: int = 8, height: int = 8
) -> DataFrame:
    """Test-fixture ENCODE stage: replace each payload with a real binary
    PPM whose pixel bytes are the original payload bytes cycled to fill
    ``width*height*3`` (empty payloads become all-black). The container
    has no image fixtures, so this manufactures genuine spec-conformant
    payloads deterministically from the documents table — the downstream
    decode/resize stages then run the REAL codec, not a stub. Same
    Arrow-batched shape as every other media stage."""
    need = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                raw = bytes(p)
                filled = (
                    (raw * (need // len(raw) + 1))[:need] if raw else b"\0" * need
                )
                payloads.append(
                    encode_ppm(
                        np.frombuffer(filled, np.uint8).reshape(height, width, 3),
                        width,
                        height,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                }
            )

    return media.mapInPandas(
        run,
        schema="media_id long, media_type string, payload binary",
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
