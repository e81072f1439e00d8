"""Multimodal plumbing tests: binary columns, Arrow-batched decode stub."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.multimodal import (
    ASSET_SCHEMA,
    asset_stats,
    decode_assets,
    frame_sample,
    make_fake_header,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (0, "image", make_fake_header(640, 480, 1) + b"pixels", '{"src":"a"}'),
        (1, "video", make_fake_header(1920, 1080, 300) + b"frames", None),
        (2, "audio", make_fake_header(0, 0, 44100) + b"samples", None),
        (3, "image", None, None),  # missing payload
        (4, "image", b"short", None),  # truncated header
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_asset_stats_native(spark, assets):
    out = asset_stats(assets).toPandas().set_index("asset_id")
    assert out.loc[0, "n_bytes"] == 8 + len(b"pixels")
    assert out.loc[3, "n_bytes"] != out.loc[3, "n_bytes"] or out.loc[3, "n_bytes"] is None or str(out.loc[3, "n_bytes"]) == "nan"
    assert len(out.loc[0, "data_sha256"]) == 64


def test_decode_fake_headers(spark, assets):
    out = decode_assets(assets).toPandas().set_index("asset_id")
    assert (out.loc[0, "width"], out.loc[0, "height"]) == (640, 480)
    assert out.loc[1, "frames"] == 300
    assert out.loc[2, "frames"] == 44100
    # null / truncated payloads decode to nulls, never crash the batch
    import pandas as pd

    assert pd.isna(out.loc[3, "width"]) and pd.isna(out.loc[4, "width"])


def test_strict_mode_marks_missing_codec(spark, assets):
    with pytest.raises(Exception, match="NotImplementedError|real codec"):
        decode_assets(assets, strict=True).collect()


def test_frame_sample(spark, assets):
    dec = decode_assets(assets)
    frames = frame_sample(dec, every_n=100).toPandas()
    vid = frames[frames["asset_id"] == 1]
    assert list(vid["frame_idx"]) == [0, 100, 200]


def test_real_ppm_decode(spark):
    """The PPM codec is a REAL decode (ASCII header parse) — exercised
    end-to-end through the mapInPandas seam, strict mode (no fallback)."""
    from oplogtoredis_spark.operators.multimodal import make_ppm

    rows = [
        (0, "image", make_ppm(640, 480, b"\x00" * 10), None),
        (1, "image", b"P6\n# a comment\n 12\t7\n255\nrgb", None),  # ws + comment
        (2, "image", b"P6\nnot numbers\n", None),                   # malformed
    ]
    out = (
        decode_assets(spark.createDataFrame(rows, ASSET_SCHEMA))
        .toPandas().set_index("asset_id")
    )
    assert (out.loc[0, "codec"], out.loc[0, "width"], out.loc[0, "height"],
            out.loc[0, "frames"]) == ("ppm", 640, 480, 1)
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (12, 7)
    import pandas as pd
    assert pd.isna(out.loc[2, "width"])  # malformed: nulls, batch survives


def test_real_wav_decode(spark):
    """The WAV codec walks real RIFF chunks: channels, sample rate, and the
    per-channel sample count from the data chunk."""
    from oplogtoredis_spark.operators.multimodal import make_wav

    rows = [
        (0, "audio", make_wav(channels=2, sample_rate=44100, n_samples=1000), None),
        (1, "audio", make_wav(channels=1, sample_rate=16000, n_samples=320, bits=8), None),
        (2, "audio", b"RIFFxxxxWAVE", None),  # no chunks: nulls
    ]
    out = (
        decode_assets(spark.createDataFrame(rows, ASSET_SCHEMA), strict=True)
        .toPandas().set_index("asset_id")
    )
    assert (out.loc[0, "codec"], out.loc[0, "channels"],
            out.loc[0, "sample_rate"], out.loc[0, "frames"]) == ("wav", 2, 44100, 1000)
    assert (out.loc[1, "channels"], out.loc[1, "sample_rate"],
            out.loc[1, "frames"]) == (1, 16000, 320)
    import pandas as pd
    assert pd.isna(out.loc[2, "channels"])


def test_wav_sub_byte_bits_decodes_to_null_not_crash(spark):
    """ADVICE r3: a malformed fmt chunk declaring bits in 1..7 makes
    channels*(bits//8) == 0 — must yield null metadata, never fail the Arrow
    batch with ZeroDivisionError."""
    import struct

    import pandas as pd

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 4)  # bits=4
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    bad = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rows = [(0, "audio", bad, None)]
    out = (
        decode_assets(spark.createDataFrame(rows, ASSET_SCHEMA), strict=True)
        .toPandas().set_index("asset_id")
    )
    assert pd.isna(out.loc[0, "channels"]) and pd.isna(out.loc[0, "frames"])
