"""R223: exact numpy-reference oracle for glcm_texture (the pixel
source is Philox-seeded so no SQL oracle exists; the reference here is
computed from synth_pixels directly, NOT from any Spark output)."""

from __future__ import annotations

import numpy as np

from .conftest import SF_TINY, register_views


def test_glcm_texture_matches_numpy_reference(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.sources.codec import (
        decode_px, encode_px, synth_pixels,
    )
    from tree_sitter_analyzer_spark.sources.multimodal import glcm_features_np

    register_views(duck, SF_TINY)
    meta = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        "SELECT image_id, w, h, fmt, tile_kind FROM tiles WHERE i <= 8000"
    ).fetchall()
    want: dict[str, list[int]] = {}
    for image_id, w, h, fmt, kind in meta:
        # the codec round-trip (jpeg quantizes) is part of the contract
        px = decode_px(encode_px(synth_pixels(image_id, int(w), int(h)), fmt))
        np_pairs, contrast, energy, hom = glcm_features_np(px)
        cur = want.setdefault(kind, [0, 0, 0, 0, 0])
        cur[0] += 1
        cur[1] += np_pairs
        cur[2] += contrast
        cur[3] += energy
        cur[4] += hom

    out = load_all()["glcm_texture"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.tile_kind: [
            int(r.n_tiles), int(r.n_pairs), int(r.contrast),
            int(r.energy), int(r.hom_milli),
        ]
        for r in out.itertuples()
    }
    assert got == want


def test_glcm_features_np_hand_checked():
    """Pin the feature arithmetic on a hand-computable 2x3 image."""
    from tree_sitter_analyzer_spark.sources.multimodal import glcm_features_np

    # gray levels (after luma + >>5): row0 = [0, 0, 7], row1 = [3, 3, 3]
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[0, 2] = 255          # luma 255 -> level 7
    px[1, :] = 100          # luma 100 -> level 3
    n_pairs, contrast, energy, hom = glcm_features_np(px)
    # pairs: (0,0), (0,7), (3,3), (3,3)
    assert n_pairs == 4
    assert contrast == 0 + 49 + 0 + 0
    assert energy == 1 + 1 + 4  # counts 1,1,2 squared
    assert hom == 1000 + (1000 // 8) + 2000
