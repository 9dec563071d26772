"""R135 pixel_verify_pairs: numpy reference replay on real corpus pairs
plus a constructed-input pin that every verdict class (exact / near40 /
differs / shape_mismatch) is reachable and the log-free PSNR>=40 rational
(400*sse <= 2601*n) agrees with the float PSNR definition."""

from __future__ import annotations

import numpy as np

from .conftest import SF_TINY


def _verify_df(spark, rows):
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("image_a", StringType()),
        StructField("image_b", StringType()),
        StructField("hamming", LongType()),
        StructField("bytes_a", BinaryType()),
        StructField("bytes_b", BinaryType()),
    ])
    return spark.createDataFrame(rows, schema=schema)


def test_verdict_classes_on_constructed_pairs(spark):
    from tree_sitter_analyzer_spark.sources import codec

    px = codec.synth_pixels("img_000000000007", 32, 32)
    other = codec.synth_pixels("img_000000000008", 32, 32)
    small = codec.synth_pixels("img_000000000007", 16, 16)
    rows = [
        ("a", "a2", 0, codec.encode_px(px, "png"), codec.encode_px(px, "png")),
        ("a", "aj", 0, codec.encode_px(px, "png"), codec.encode_px(px, "jpeg")),
        ("a", "b", 5, codec.encode_px(px, "png"), codec.encode_px(other, "png")),
        ("a", "s", 9, codec.encode_px(px, "png"), codec.encode_px(small, "png")),
    ]
    got = (
        codec.pair_pixel_verify(_verify_df(spark, rows))
        .toPandas()
        .set_index("image_b")
    )
    assert got.loc["a2", "verdict"] == "exact" and got.loc["a2", "sse"] == 0
    assert got.loc["aj", "verdict"] == "near40"
    assert got.loc["b", "verdict"] == "differs"
    assert got.loc["s", "verdict"] == "shape_mismatch"
    # the integer rational == the float PSNR definition, on both sides
    for key in ("aj", "b"):
        sse, n = int(got.loc[key, "sse"]), int(got.loc[key, "n_subpx"])
        psnr = 10 * np.log10(255.0**2 / (sse / n))
        assert (psnr >= 40.0) == bool(got.loc[key, "psnr40_ok"])
        assert (400 * sse <= 2601 * n) == bool(got.loc[key, "psnr40_ok"])


def test_corpus_pairs_match_numpy_reference(spark):
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.sources import codec

    got = (
        load_all()["pixel_verify_pairs"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(got) > 0
    # every candidate pair accounted for, exactly once
    assert not got.duplicated(["image_a", "image_b"]).any()
    # replay the first few same-shape pairs pixel-for-pixel
    same = got[got.verdict != "shape_mismatch"].head(5)
    assert len(same) > 0
    from tree_sitter_analyzer_spark import synth
    tiles = synth.tiles_df(spark, SF_TINY).select(
        "image_id", "w", "h", "fmt"
    ).toPandas()
    meta = {
        r.image_id: (int(r.w), int(r.h), r.fmt) for r in tiles.itertuples()
    }

    def decoded(image_id):
        # the registered query decodes ENCODED payloads: jpeg is lossy,
        # so re-encode/decode the same way before differencing
        w, h, fmt = meta[image_id]
        px = codec.synth_pixels(image_id, w, h)
        return codec.decode_px(codec.encode_px(px, fmt)).astype(np.int64)

    for r in same.itertuples():
        da, db = decoded(r.image_a), decoded(r.image_b)
        assert int(r.sse) == int(((da - db) ** 2).sum())
        assert int(r.n_subpx) == da.size
