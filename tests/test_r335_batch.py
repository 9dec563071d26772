"""R335-R337 batch: python replays + invariants for view_selection,
absorbing_chain, median_denoise. Oracle parity rides
test_oracle_parity (view_selection, absorbing_chain); median_denoise
is a decoded-pixel rows-only op with a numpy reference."""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

import numpy as np

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R335
def test_view_selection_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    base = duck.sql(
        "SELECT DISTINCT l_returnflag, l_linestatus,"
        " year(l_shipdate) FROM lineitem"
    ).fetchall()
    sz = {}
    for mask in range(8):
        proj = {
            (r if mask & 4 else None, s if mask & 2 else None,
             y if mask & 1 else None)
            for r, s, y in base
        }
        sz[mask] = len(proj)
    assert sz[0] == 1 and sz[7] == len(base)

    cost = {w: sz[7] for w in range(8)}
    picked, rows = {7}, []
    for rnd in (1, 2):
        best = None
        for v in range(8):
            if v in picked:
                continue
            ben = sum(max(0, cost[w] - sz[v])
                      for w in range(8) if (w & v) == w)
            if best is None or (ben, -v) > (best[0], -best[1]):
                best = (ben, v)
        ben, v = best
        picked.add(v)
        for w in range(8):
            if (w & v) == w:
                cost[w] = min(cost[w], sz[v])
        rows.append((rnd, v, sz[v], ben, sum(cost.values())))

    out = load_all()["view_selection"].spark_fn(spark, SF_TINY).toPandas()
    got = sorted(
        (int(r.round), int(r.view_mask), int(r.view_size),
         int(r.benefit), int(r.total_cost_after))
        for r in out.itertuples()
    )
    assert got == rows
    # greedy benefit is non-increasing across rounds
    assert rows[0][3] >= rows[1][3]
    # total query cost can only improve as views are added
    assert rows[0][4] >= rows[1][4]


# --------------------------------------------------------------------- R336
def test_absorbing_chain_matches_fraction_reference(spark, duck):
    """Independent reference: exact-FRACTION absorbing-chain solve of
    the same milli-floored Q via Gaussian elimination — not the
    cofactor route the query uses."""
    from tree_sitter_analyzer_spark.queries_relational import _AC_STATES
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    pairs = duck.sql(
        "WITH s AS (SELECT user_id, event_type AS cur,"
        " lead(event_type) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS nxt FROM events)"
        " SELECT cur, nxt, count(*) FROM s WHERE nxt IS NOT NULL"
        " GROUP BY 1, 2"
    ).fetchall()
    c = defaultdict(int)
    tot = defaultdict(int)
    for a, b, n in pairs:
        c[(a, b)] += int(n)
        tot[a] += int(n)
    st = _AC_STATES
    q = [[(1000 * c[(a, b)]) // max(tot[a], 1) for b in st] for a in st]
    # M x = 1000 * 1, solved in exact fractions
    m = [[Fraction(1000 if i == j else 0) - q[i][j] for j in range(4)]
         for i in range(4)]
    rhs = [Fraction(1000)] * 4
    for col in range(4):
        piv = next(r for r in range(col, 4) if m[r][col] != 0)
        m[col], m[piv] = m[piv], m[col]
        rhs[col], rhs[piv] = rhs[piv], rhs[col]
        for r in range(4):
            if r != col and m[r][col] != 0:
                f = m[r][col] / m[col][col]
                rhs[r] -= f * rhs[col]
                for k in range(4):
                    m[r][k] -= f * m[col][k]
    t = [rhs[i] / m[i][i] for i in range(4)]

    out = load_all()["absorbing_chain"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 4
    for r in out.itertuples():
        i = st.index(r.state)
        # t_milli = floor(1000 * t) for positive t (sign-safe DIV)
        want = t[i] * 1000
        assert int(r.t_milli) == int(want.numerator // want.denominator)
        assert int(r.det_pos) == 1
        assert int(r.n_out) == max(tot[st[i]], 1)
        assert int(r.p_leave_milli) == 1000 - sum(q[i])
        # at least one full step is always taken
        assert int(r.t_milli) >= 1000
    # some probability mass actually absorbs from every state
    assert all(1000 - sum(q[i]) > 0 for i in range(4))


# --------------------------------------------------------------------- R337
def test_median_denoise_matches_numpy_reference(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.sources.codec import (
        decode_px, encode_px, synth_pixels,
    )
    from tree_sitter_analyzer_spark.sources.multimodal import (
        median3_features_np,
    )

    register_views(duck, SF_TINY)
    meta = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        "SELECT image_id, w, h, fmt, tile_kind FROM tiles WHERE i <= 8000"
    ).fetchall()
    want: dict[str, list[int]] = {}
    for image_id, w, h, fmt, kind in meta:
        px = decode_px(encode_px(synth_pixels(image_id, int(w), int(h)),
                                 fmt))
        n, ch, mass, mx = median3_features_np(px)
        assert 0 <= ch <= n and mass >= ch  # every change is >= 1 level
        cur = want.setdefault(kind, [0, 0, 0, 0, 0])
        cur[0] += 1
        cur[1] += n
        cur[2] += ch
        cur[3] += mass
        cur[4] = max(cur[4], mx)

    out = load_all()["median_denoise"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.tile_kind: [int(r.n_tiles), int(r.n_interior), int(r.changed),
                      int(r.change_mass), int(r.max_change)]
        for r in out.itertuples()
    }
    assert got == want
    for kind, cur in want.items():
        row = out[out.tile_kind == kind].iloc[0]
        assert int(row.changed_milli) == (1000 * cur[2]) // cur[1]


def test_median_denoise_hand_checked_impulse():
    """A single white impulse on black: the median filter erases it
    (and changes nothing else)."""
    from tree_sitter_analyzer_spark.sources.multimodal import (
        median3_features_np,
    )

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[4, 4] = (255, 255, 255)
    n, ch, mass, mx = median3_features_np(px)
    assert n == 36
    assert (ch, mass, mx) == (1, 255, 255)
