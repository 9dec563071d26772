"""Multimodal plumbing tests: real image resize, stubbed audio pipeline
with real Spark-side schema/batching, user-SQL surface gating."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.plans.sql_surface import register_views, run_user_sql
from tree_sitter_analyzer_spark.sources import codec, multimodal

from .conftest import SF_TINY


def test_resize_roundtrip_shape_and_values(spark):
    df = codec.attach_bytes(synth.tiles_df(spark, SF_TINY).limit(12))
    out = multimodal.resize_tiles(df, 8, 8).select(
        "image_id", "w", "h", "fmt", "resized_bytes", "resized_w", "resized_h"
    ).collect()
    assert len(out) == 12
    for r in out:
        small = codec.decode_px(bytes(r["resized_bytes"]))
        assert small.shape == (8, 8, 3)
        # spot-check against a local resample of the decoded original
        px = codec.decode_px(
            codec.encode_px(
                codec.synth_pixels(r["image_id"], r["w"], r["h"]), r["fmt"]
            )
        )
        yi = np.minimum((np.arange(8) * r["h"]) // 8, r["h"] - 1)
        xi = np.minimum((np.arange(8) * r["w"]) // 8, r["w"] - 1)
        assert np.array_equal(small, px[yi][:, xi])


def test_audio_pipeline_plumbing(spark):
    """Typed-metadata schema + Arrow batch path, deterministic fake
    decoder; the real-decoder route raises NotImplementedError."""
    rows = [(i, bytes([i % 256] * 16), 16000, 1, 1000, 1) for i in range(10)]
    df = spark.createDataFrame(rows, multimodal.AUDIO_SCHEMA)
    got = multimodal.audio_features(df).select(
        "media_id", "rms_milli", "zero_crossings"
    ).collect()
    assert len(got) == 10
    assert all(r["rms_milli"] > 0 and r["zero_crossings"] > 0 for r in got)
    # determinism across runs
    again = multimodal.audio_features(df).select("media_id", "rms_milli").collect()
    assert {r["media_id"]: r["rms_milli"] for r in got} == {
        r["media_id"]: r["rms_milli"] for r in again
    }
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"")
    with pytest.raises(NotImplementedError):
        multimodal.decode_video_frames(b"", 10)


def test_real_decoder_route_fails_cleanly_and_is_recorded(spark):
    """Decoder-path contract (the plug-point swap): with ffmpeg absent,
    requesting the real decoder raises NotImplementedError at PLAN BUILD
    (driver-side, no executor crash mid-job), and every feature row
    carries an explicit decoder column so the gate records which path
    ran."""
    rows = [(1, b"x", 16000, 1, 1000, 1)]
    df = spark.createDataFrame(rows, multimodal.AUDIO_SCHEMA)
    assert multimodal.FFMPEG_PATH is None  # this container has no ffmpeg
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        multimodal.audio_features(df, use_fake_decoder=False)
    vrows = [(1, b"x", 32, 24, 24000, 95, 1)]
    vdf = spark.createDataFrame(vrows, multimodal.VIDEO_SCHEMA)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        multimodal.video_frame_features(vdf, use_fake_decoder=False)
    got = multimodal.audio_features(df).select("decoder").collect()
    assert [r["decoder"] for r in got] == ["fake"]
    vgot = multimodal.video_frame_features(vdf).select("decoder").collect()
    assert [r["decoder"] for r in vgot] == ["fake"]


def test_video_frame_sample_plumbing(spark):
    """Frame-sampling pipeline: every_n-th frame count is exact, features
    are deterministic, and only scalars cross the Arrow boundary."""
    rows = [(i, bytes([i % 256] * 16), 32, 24, 24000, 95 + i, 1)
            for i in range(8)]
    df = spark.createDataFrame(rows, multimodal.VIDEO_SCHEMA)
    got = multimodal.video_frame_features(df, every_n=10).select(
        "media_id", "n_frames", "n_sampled_frames",
        "mean_luma_milli", "std_luma_milli"
    ).collect()
    assert len(got) == 8
    for r in got:
        # ceil(n_frames / 10) sampled frames
        assert r["n_sampled_frames"] == -(-r["n_frames"] // 10)
        assert 0 < r["mean_luma_milli"] < 256_000
        assert r["std_luma_milli"] > 0
    again = multimodal.video_frame_features(df, every_n=10).select(
        "media_id", "mean_luma_milli"
    ).collect()
    assert {r["media_id"]: r["mean_luma_milli"] for r in got} == {
        r["media_id"]: r["mean_luma_milli"] for r in again
    }


def test_sql_surface_select_and_gate(spark):
    register_views(spark, SF_TINY)
    env = run_user_sql(
        spark,
        "SELECT tile_kind, count(*) AS n FROM tiles GROUP BY tile_kind",
    )
    assert env["stats"]["total_matches"] == 7
    assert not env["stats"]["was_truncated"]

    env2 = run_user_sql(spark, "SELECT image_id FROM tiles", max_rows=10)
    assert env2["stats"]["returned"] == 10
    assert env2["stats"]["total_matches"] == 1500
    assert env2["stats"]["was_truncated"]

    for bad in (
        "DROP TABLE tiles",
        "INSERT INTO tiles VALUES (1)",
        "SELECT 1; SELECT 2",
        "SET spark.sql.shuffle.partitions=1",
    ):
        with pytest.raises(ValueError):
            run_user_sql(spark, bad)


def test_sql_surface_spatial_join(spark):
    """Ad-hoc SQL can express the cell join over the registered views."""
    register_views(spark, SF_TINY)
    env = run_user_sql(
        spark,
        """SELECT z.polygon_id, count(*) AS n
           FROM tiles t JOIN zones z
             ON t.lon >= z.xmin AND t.lon < z.xmax
            AND t.lat >= z.ymin AND t.lat < z.ymax
           GROUP BY z.polygon_id ORDER BY n DESC LIMIT 5""",
    )
    assert env["stats"]["returned"] == 5
    assert env["results"][0]["n"] >= env["results"][-1]["n"]
