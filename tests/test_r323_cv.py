"""R323-R325: exact numpy-reference oracles for harris_corners,
lbp_texture, image_moments (pixel sources are Philox-seeded so no SQL
oracle exists; references are computed from synth_pixels directly, NOT
from any Spark output), plus structural invariants."""

from __future__ import annotations

import numpy as np

from .conftest import SF_TINY, register_views


def _decoded(duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.sources.codec import (
        decode_px, encode_px, synth_pixels,
    )

    register_views(duck, SF_TINY)
    meta = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        "SELECT image_id, w, h, fmt, tile_kind FROM tiles WHERE i <= 8000"
    ).fetchall()
    for image_id, w, h, fmt, kind in meta:
        yield kind, decode_px(
            encode_px(synth_pixels(image_id, int(w), int(h)), fmt)
        )


# --------------------------------------------------------------------- R323
def test_harris_matches_numpy_reference(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.sources.multimodal import (
        harris_features_np,
    )

    want: dict[str, list[int]] = {}
    for kind, px in _decoded(duck):
        n, c, rr, mx = harris_features_np(px)
        cur = want.setdefault(kind, [0, 0, 0, 0, -(1 << 62)])
        cur[0] += 1
        cur[1] += n
        cur[2] += c
        cur[3] += rr
        cur[4] = max(cur[4], mx)

    out = load_all()["harris_corners"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.tile_kind: [int(r.n_tiles), int(r.n_resp), int(r.corners),
                      int(r.resp_red), int(r.max_r20)]
        for r in out.itertuples()
    }
    assert set(got) == set(want)
    for kind, cur in want.items():
        assert got[kind] == cur, kind
        # derived milli column
        row = out[out.tile_kind == kind].iloc[0]
        assert int(row.corner_milli) == (1000 * cur[2]) // cur[1]
    # the threshold separates: corners exist but are not every pixel
    tot_c = sum(v[2] for v in want.values())
    tot_n = sum(v[1] for v in want.values())
    assert 0 < tot_c < tot_n


# --------------------------------------------------------------------- R324
def test_lbp_matches_numpy_reference(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.sources.multimodal import (
        _LBP_UNIFORM, lbp_features_np,
    )

    # the uniform mask is the classic 58-pattern set
    assert int(_LBP_UNIFORM.sum()) == 58

    want: dict[str, list[int]] = {}
    for kind, px in _decoded(duck):
        n, u, e, dc, dn = lbp_features_np(px)
        cur = want.setdefault(kind, [0, 0, 0, 0, 256, -1, 0])
        cur[0] += 1
        cur[1] += n
        cur[2] += u
        cur[3] += e
        cur[4] = min(cur[4], dc)
        cur[5] = max(cur[5], dc)
        cur[6] += dn
        # per-tile sanity: energy between flat lower bound and n^2
        assert n <= e <= n * n
        assert 0 <= u <= n

    out = load_all()["lbp_texture"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.tile_kind: [int(r.n_tiles), int(r.n_interior),
                      int(r.uniform_px), int(r.energy),
                      int(r.dom_code_min), int(r.dom_code_max),
                      int(r.dom_count)]
        for r in out.itertuples()
    }
    assert set(got) == set(want)
    for kind, cur in want.items():
        assert got[kind] == cur, kind
        row = out[out.tile_kind == kind].iloc[0]
        assert int(row.uniform_milli) == (1000 * cur[2]) // cur[1]


def test_lbp_hand_checked_gradient():
    """A horizontal luma ramp: every interior pixel sees east-side
    neighbors (and same-column N/S wrap of the ramp) >= center — the
    code is the same for all interior pixels and is uniform."""
    from tree_sitter_analyzer_spark.sources.multimodal import (
        lbp_features_np,
    )

    w, h = 8, 6
    ramp = np.tile(np.arange(w, dtype=np.uint8) * 10, (h, 1))
    px = np.stack([ramp, ramp, ramp], axis=-1)
    n, u, e, dc, dn = lbp_features_np(px)
    assert n == (w - 2) * (h - 2)
    # east bits (2,3,4) + same-column N/S (>= holds on equality: bits
    # 1 and 5) set; west bits clear -> code 0b00111110 = 62
    assert dc == 62 and dn == n
    assert e == n * n  # single code -> maximal energy
    assert u == n  # 00111110 has 2 circular transitions -> uniform


# --------------------------------------------------------------------- R325
def test_moments_match_numpy_reference(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.sources.multimodal import (
        moments_features_np,
    )

    want: dict[str, list[int]] = {}
    for kind, px in _decoded(duck):
        m00, cx, cy, mu20, mu02, mu11 = moments_features_np(px)
        h, w = px.shape[:2]
        assert 0 <= cx < w and 0 <= cy < h
        assert mu20 >= 0 and mu02 >= 0
        cur = want.setdefault(kind, [0] * 9)
        cur[0] += 1
        cur[1] += m00
        cur[2] += cx
        cur[3] += cy
        cur[4] += mu20
        cur[5] += mu02
        cur[6] += mu11
        cur[7] += 1 if mu20 > mu02 else 0
        cur[8] += 1 if mu11 > 0 else 0

    out = load_all()["image_moments"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.tile_kind: [int(r.n_tiles), int(r.m00_sum), int(r.cx_sum),
                      int(r.cy_sum), int(r.mu20_sum), int(r.mu02_sum),
                      int(r.mu11_sum), int(r.aniso_x_tiles),
                      int(r.mu11_pos_tiles)]
        for r in out.itertuples()
    }
    assert got == want


def test_moments_hand_checked_point_mass():
    """A single bright pixel at (row 2, col 5) on black: centroid is
    exactly there, all central second moments are zero."""
    from tree_sitter_analyzer_spark.sources.multimodal import (
        moments_features_np,
    )

    px = np.zeros((4, 8, 3), dtype=np.uint8)
    px[2, 5] = (255, 255, 255)
    m00, cx, cy, mu20, mu02, mu11 = moments_features_np(px)
    assert m00 == 255  # (255*299 + 255*587 + 255*114) // 1000
    assert (cx, cy) == (5, 2)
    assert (mu20, mu02, mu11) == (0, 0, 0)
