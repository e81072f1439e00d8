"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is REAL and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures — and the decode seam now carries two
REAL pure-Python codecs exercised end-to-end (no image/audio libraries ship
in this container, but these formats need none):

  * PPM (P6) — ASCII header parse: width / height / maxval.
  * WAV (RIFF) — chunk walk: channels, sample rate, bits, sample count.

Anything else (JPEG/PNG/MP4/...) is where PIL / soundfile / pyav plug in on
a real cluster: ``strict=True`` raises NotImplementedError there; the
default falls back to the deterministic synthetic 8-byte header so the full
plumbing (schema, batching, null handling) is exercised for every kind.

  * decode_assets: mapInPandas over (asset_id, kind, data binary, meta json)
    producing typed metadata (width/height/frames/channels/sample_rate).
  * asset_stats: native-expression metadata (byte length, sha256) — the
    zero-copy path that needs no decode at all.
  * frame_sample: per-sampled-frame rows — pure sequence/explode.

Synthetic asset header (the fallback fake), 8 bytes:
  bytes 0-1  big-endian width   bytes 2-3  big-endian height
  bytes 4-7  big-endian frame count / sample count
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),  # ppm | wav | synthetic
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("frames", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def make_fake_header(width: int, height: int, frames: int) -> bytes:
    return (
        width.to_bytes(2, "big") + height.to_bytes(2, "big") + frames.to_bytes(4, "big")
    )


def make_ppm(width: int, height: int, payload: bytes = b"") -> bytes:
    """A P6 PPM: ASCII header + raw RGB payload (unvalidated length)."""
    return f"P6\n{width} {height}\n255\n".encode() + payload


def make_wav(channels: int, sample_rate: int, n_samples: int, bits: int = 16) -> bytes:
    """A minimal valid RIFF/WAVE file with a silent data chunk."""
    import struct

    data = b"\x00" * (n_samples * channels * (bits // 8))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * (bits // 8), channels * (bits // 8), bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_ppm(b: bytes) -> dict | None:
    """P6 header: 'P6' <ws> width <ws> height <ws> maxval <single ws> raw.
    Returns width/height, frames=1; None on malformed header."""
    try:
        if not b.startswith(b"P6"):
            return None
        toks, i, n = [], 2, len(b)
        while len(toks) < 3 and i < n:
            while i < n and b[i : i + 1].isspace():
                i += 1
            if b[i : i + 1] == b"#":  # comment line
                while i < n and b[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < n and not b[j : j + 1].isspace():
                j += 1
            toks.append(int(b[i:j]))
            i = j
        if len(toks) < 3:
            return None
        w, h, _maxval = toks
        return {"codec": "ppm", "width": w, "height": h, "frames": 1}
    except (ValueError, IndexError):
        return None


def _decode_wav(b: bytes) -> dict | None:
    """RIFF/WAVE chunk walk: fmt -> channels/sample_rate/bits, data -> byte
    count; frames = sample count per channel. None on malformed input."""
    import struct

    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i, n = 12, len(b)
        channels = rate = bits = None
        data_len = None
        while i + 8 <= n:
            cid = b[i : i + 4]
            (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
            if cid == b"fmt " and clen >= 16:
                _, channels, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", b[i + 8 : i + 24]
                )
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        # bits must be a whole positive byte count: a malformed fmt chunk
        # declaring bits in 1..7 would make channels*(bits//8) == 0 and turn
        # the frame division into ZeroDivisionError, failing the whole Arrow
        # batch — malformed payloads must decode to null, never throw
        if channels is None or data_len is None or not channels or not bits:
            return None
        if bits < 8 or bits % 8 != 0:
            return None
        frames = data_len // (channels * (bits // 8))
        return {
            "codec": "wav",
            "frames": frames,
            "channels": channels,
            "sample_rate": rate,
        }
    except (ValueError, struct.error, IndexError):
        return None


def _decode_synthetic(b: bytes) -> dict | None:
    if len(b) < 8:
        return None
    return {
        "codec": "synthetic",
        "width": int.from_bytes(b[0:2], "big"),
        "height": int.from_bytes(b[2:4], "big"),
        "frames": int.from_bytes(b[4:8], "big"),
    }


def asset_stats(assets: DataFrame) -> DataFrame:
    """Decode-free metadata: byte size + content hash, pure expressions."""
    return assets.select(
        "asset_id",
        "kind",
        F.octet_length(F.col("data")).alias("n_bytes"),
        F.sha2(F.col("data"), 256).alias("data_sha256"),
    )


def decode_assets(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched decode via mapInPandas.

    Real pure-Python codecs run for PPM (P6) and WAV (RIFF) payloads —
    detected by magic bytes, independent of the ``kind`` column. Other
    formats are where PIL / soundfile / pyav plug in on a real cluster:
    ``strict=True`` raises NotImplementedError for them; the default falls
    back to the deterministic synthetic 8-byte header so the plumbing is
    exercised for every kind. Nulls and malformed payloads decode to null
    metadata — they never fail the batch (log-and-skip, tail.go:109-114).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["codec", "width", "height", "frames", "channels", "sample_rate"]

        def one(b):
            if b is None:
                return {}
            b = bytes(b)
            # magic bytes pick the codec; a malformed payload of a KNOWN
            # format decodes to null metadata (log-and-skip), it does not
            # fall through to another codec or fail the batch
            if b.startswith(b"P6"):
                return _decode_ppm(b) or {}
            if b.startswith(b"RIFF"):
                return _decode_wav(b) or {}
            if strict:
                raise NotImplementedError(
                    "real codec not available in this environment; "
                    "plug PIL/ffmpeg here on a real cluster"
                )
            return _decode_synthetic(b) or {}

        for pdf in batches:
            decoded = pdf["data"].map(one)
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                }
            )
            for c in cols:
                out[c] = decoded.map(lambda d: d.get(c))
            yield out

    return assets.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index — pure
    sequence/explode (the decode of the actual frame bytes is the stubbed
    part; indices and partitioning are real)."""
    return decoded.where(F.col("frames").isNotNull()).select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
