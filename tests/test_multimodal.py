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


def test_extract_features_real_ppm_and_wav(spark):
    """Feature extraction is REAL: mean R/G/B computed from the raw PPM
    pixel payload; RMS + duration from the WAV sample data."""
    import struct

    import pandas as pd

    from oplogtoredis_spark.operators.multimodal import extract_features, make_ppm

    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])  # 2x2 RGB
    ppm = make_ppm(2, 2, px)
    # 16-bit mono square wave at half amplitude: rms = 0.5 exactly
    sr, n = 8000, 400
    data = struct.pack(f"<{n}h", *([16384, -16384] * (n // 2)))
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rows = [
        (0, "image", ppm, None),
        (1, "audio", wav, None),
        (2, "image", b"P6\nbroken", None),  # malformed: null features
    ]
    out = (
        extract_features(spark.createDataFrame(rows, ASSET_SCHEMA), strict=True)
        .toPandas().set_index("asset_id")
    )
    assert (out.loc[0, "mean_r"], out.loc[0, "mean_g"], out.loc[0, "mean_b"]) == (
        55.0, 65.0, 75.0
    )
    assert out.loc[1, "rms"] == 0.5
    assert out.loc[1, "duration_s"] == round(n / sr, 4)
    assert pd.isna(out.loc[2, "mean_r"])


def test_resize_images_real_nearest_neighbor(spark):
    """The resize is REAL: output is a valid PPM of the target size whose
    pixels are nearest-neighbor picks from the source; chains into
    decode/extract like any asset."""
    import pandas as pd

    from oplogtoredis_spark.operators.multimodal import (
        decode_assets,
        extract_features,
        make_ppm,
        resize_images,
    )

    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])  # 2x2
    rows = [
        (0, "image", make_ppm(2, 2, px), None),
        (1, "image", make_ppm(2, 2, px[:6]), None),  # truncated: null out
        (2, "audio", b"RIFFxxxxWAVE", None),         # passes through
    ]
    small = resize_images(
        spark.createDataFrame(rows, ASSET_SCHEMA).withColumn("meta", F.lit(None).cast("string")),
        width=1, height=1,
    )
    got = small.toPandas().set_index("asset_id")
    assert bytes(got.loc[0, "data"]).endswith(bytes([10, 20, 30]))  # NN = top-left
    assert got.loc[1, "data"] is None
    assert bytes(got.loc[2, "data"]) == b"RIFFxxxxWAVE"
    # the resized asset decodes and featurizes like any other
    dec = decode_assets(small.withColumn("meta", F.lit(None).cast("string"))).toPandas().set_index("asset_id")
    assert (dec.loc[0, "width"], dec.loc[0, "height"]) == (1, 1)
    feat = extract_features(
        small.withColumn("meta", F.lit(None).cast("string"))
    ).toPandas().set_index("asset_id")
    assert (feat.loc[0, "mean_r"], feat.loc[0, "mean_b"]) == (10.0, 30.0)
    # upscale: every output pixel still sourced from the 2x2 grid
    big = resize_images(
        spark.createDataFrame(rows[:1], ASSET_SCHEMA), width=4, height=4
    ).toPandas()
    payload = bytes(big.iloc[0]["data"]).split(b"\n255\n", 1)[1]
    assert len(payload) == 4 * 4 * 3
    srcpx = {px[i:i+3] for i in range(0, 12, 3)}
    assert {payload[i:i+3] for i in range(0, len(payload), 3)} <= srcpx
