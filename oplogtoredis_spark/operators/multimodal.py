"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is REAL and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures; only the codec calls are stubbed because
no image/audio libraries ship in this container:

  * decode_assets: mapInPandas over (asset_id, kind, data binary, meta json)
    producing typed metadata (width/height/duration/...). The decode step is
    a deterministic fake (parses a fixed synthetic header) unless
    ``strict=True``, which raises NotImplementedError where PIL/ffmpeg would
    be invoked on a real cluster.
  * asset_stats: native-expression metadata (byte length, sha256) — the
    zero-copy path that needs no decode at all.
  * frame_sample / resize: same stub pattern, documented batch contracts.

Synthetic asset header (what the fake decoder parses), 8 bytes:
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
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("frames", T.IntegerType(), True),
    ]
)


def make_fake_header(width: int, height: int, frames: int) -> bytes:
    return (
        width.to_bytes(2, "big") + height.to_bytes(2, "big") + frames.to_bytes(4, "big")
    )


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

    On a real cluster the marked line calls PIL / soundfile / pyav per batch;
    here the deterministic fake parses the synthetic 8-byte header so the
    full Spark plumbing (schema, batching, null handling) is exercised.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real codec not available in this environment; "
                    "plug PIL/ffmpeg here on a real cluster"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda b: len(b) if b is not None else None),
                }
            )

            def hdr(b, lo, hi):
                if b is None or len(b) < 8:
                    return None
                return int.from_bytes(b[lo:hi], "big")

            out["width"] = pdf["data"].map(lambda b: hdr(b, 0, 2))
            out["height"] = pdf["data"].map(lambda b: hdr(b, 2, 4))
            out["frames"] = pdf["data"].map(lambda b: hdr(b, 4, 8))
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
