"""R305-R307 batch: python replays + invariants for luby_mis, hillshade,
wilcoxon_signed. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from .conftest import SF_TINY, register_views


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------------------------------- R305
def test_luby_mis_matches_python_replay_and_invariants(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        MIS_ROUNDS,
        _MIS_PACK,
        edges_sql,
        luby_mis,
        edges_df,
    )

    rows = duck.sql(edges_sql("bfs")).fetchall()
    nbrs = defaultdict(set)
    for s, d in rows:
        if s != d:
            nbrs[int(s)].add(int(d))
            nbrs[int(d)].add(int(s))
    live = set(nbrs)
    mis: dict[int, int] = {}
    for r in range(MIS_ROUNDS):
        keys = {v: _md5int(f"mis{r}_{v}") * _MIS_PACK + v for v in live}
        winners = {
            v for v in live
            if all(keys[u] < keys[v] for u in nbrs[v] if u in live)
        }
        for v in winners:
            mis[v] = r
        removed = set(winners)
        for v in winners:
            removed |= nbrs[v] & live
        live -= removed
    # 8 rounds drain the graph completely (and round 8 == round 7 state)
    assert not live

    out = luby_mis(spark, edges_df(spark, "bfs")).toPandas()
    got = {int(v): int(r) for v, r in zip(out.v, out.mis_round)}
    assert got == mis

    # independence: no edge inside the MIS
    m = set(got)
    assert not any(u in m and v_ in m for u in m for v_ in nbrs[u])
    # maximality: every non-MIS vertex has a MIS neighbor
    for v in set(nbrs) - m:
        assert nbrs[v] & m, v


# --------------------------------------------------------------------- R306
def test_hillshade_matches_python_replay(spark, duck):
    import math

    from tree_sitter_analyzer_spark.operators.zonal import (
        HS_NZ,
        HS_RES,
        _HS_DIRS,
        _HS_L,
        _HS_LNORM,
    )
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.synth import oracle_ctes
    from tree_sitter_analyzer_spark import grid

    register_views(duck, SF_TINY)
    occ = {
        (int(x), int(y)): int(n)
        for x, y, n in duck.sql(
            f"{oracle_ctes()} SELECT {grid.ix_sql('lon', HS_RES)},"
            f" {grid.iy_sql('lat', HS_RES)}, count(*) FROM tiles GROUP BY 1, 2"
        ).fetchall()
    }
    zmax = max(occ.values())
    z = {c: (1000 * n) // zmax for c, n in occ.items()}
    lx, ly, lz = _HS_L
    exp = {}
    for (cx, cy), zz in z.items():
        gx = sum(wx * z.get((cx + dx, cy + dy), 0)
                 for dx, dy, wx, wy in _HS_DIRS)
        gy = sum(wy * z.get((cx + dx, cy + dy), 0)
                 for dx, dy, wx, wy in _HS_DIRS)
        num = -lx * gx + -ly * gy + HS_NZ * lz
        den = math.isqrt(gx * gx + gy * gy + HS_NZ * HS_NZ) * _HS_LNORM
        shade = 0 if num <= 0 else (1000 * num) // den
        exp[(cx, cy)] = (zz, gx, gy, shade)

    out = load_all()["hillshade"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(exp)
    classes = set()
    for r in out.itertuples():
        zz, gx, gy, shade = exp[(int(r.cx), int(r.cy))]
        assert (int(r.z), int(r.gx), int(r.gy), int(r.shade_milli)) == (
            zz, gx, gy, shade,
        )
        assert 0 <= shade <= 1000
        # flat surface reads exactly cos(45°) = 707 milli
        if gx == 0 and gy == 0:
            assert shade == 707
        classes.add(r.shade_class)
    # the relief is real: at least 3 illumination classes present
    assert len(classes) >= 3, classes


# --------------------------------------------------------------------- R307
def test_wilcoxon_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    daily = duck.sql(
        "SELECT year(o_orderdate), month(o_orderdate), day(o_orderdate),"
        " CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000 AS BIGINT)"
        " FROM orders WHERE year(o_orderdate) IN (1996, 1997)"
        " GROUP BY 1, 2, 3"
    ).fetchall()
    v = {(int(y), int(m), int(d)): int(val) for y, m, d, val in daily}
    mlens = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    diffs = []
    for m, ln in enumerate(mlens, start=1):
        for d in range(1, ln + 1):
            dd = v.get((1997, m, d), 0) - v.get((1996, m, d), 0)
            if dd:
                diffs.append(dd)
    n = len(diffs)
    groups = defaultdict(lambda: [0, 0])
    for dd in diffs:
        g = groups[abs(dd)]
        g[0] += 1
        g[1] += 1 if dd > 0 else 0
    w2 = 0
    cum = 0
    tie3 = 0
    for ad in sorted(groups):
        t, p = groups[ad]
        w2 += p * (2 * cum + t + 1)
        tie3 += t * t * t - t
        cum += t
    diff2 = 2 * w2 - n * (n + 1)
    var12 = 2 * n * (n + 1) * (2 * n + 1) - tie3
    out = load_all()["wilcoxon_signed"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_pairs), int(r.w2), int(r.tie3)) == (n, w2, tie3)
    assert int(r.z_sign) == (1 if diff2 > 0 else (-1 if diff2 < 0 else 0))
    assert int(r.z2_milli) == (3000 * diff2 * diff2) // var12
    # W2 is bounded by the total doubled rank mass n(n+1)
    assert 0 <= w2 <= n * (n + 1)
