"""R242-R244 batch: python replays + invariants for kendall_cells,
haar_energy, interval_peak. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from .conftest import SF_TINY, register_views

_DAY_US = 86_400_000_000


# --------------------------------------------------------------------- R242
def test_kendall_cells_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.synth import tiles_sql

    register_views(duck, SF_TINY)
    # per (kind, cell): x = n tiles, y = n hot tiles — brute in python
    from tree_sitter_analyzer_spark.grid import cell_sql

    rows = duck.sql(
        f"WITH tiles AS ({tiles_sql()}) "
        f"SELECT tile_kind, {cell_sql('lon', 'lat', 8)}, i % 5 = 0 "
        "FROM tiles"
    ).fetchall()
    cells: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for kind, cell, hot in rows:
        cells[(kind, cell)][0] += 1
        cells[(kind, cell)][1] += bool(hot)
    by_kind: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (kind, _), (x, y) in cells.items():
        by_kind[kind].append((x, y))

    out = (
        load_all()["kendall_cells"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert set(out.tile_kind) == set(by_kind)
    for r in out.itertuples():
        pts = by_kind[r.tile_kind]
        n = len(pts)
        nc = nd = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                if dx * dy > 0:
                    nc += 1
                elif dx * dy < 0:
                    nd += 1
        tx = sum(
            t * (t - 1) // 2
            for t in Counter(p[0] for p in pts).values()
        )
        ty = sum(
            t * (t - 1) // 2
            for t in Counter(p[1] for p in pts).values()
        )
        assert int(r.n_cells) == n
        assert int(r.nc) == nc and int(r.nd) == nd
        assert int(r.ties_x) == tx and int(r.ties_y) == ty
        n0 = n * (n - 1) // 2
        den2 = (n0 - tx) * (n0 - ty)
        s = math.isqrt(den2)
        assert int(r.tau_sign) == (1 if nc >= nd else -1)
        assert int(r.tau_abs_milli) == (1000 * abs(nc - nd)) // s
        # density and hot mass should correlate positively everywhere
        # (weakly at sf0.001 where most cells hold 1-2 tiles)
        assert int(r.tau_sign) == 1 and int(r.tau_abs_milli) > 150


# --------------------------------------------------------------------- R243
def test_haar_energy_matches_python_replay_and_parseval(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT date_diff('microsecond', TIMESTAMP '1970-01-01',"
        f" o_orderdate) // {_DAY_US},"
        " CAST(floor(o_totalprice) AS BIGINT) // 100 FROM orders"
    ).fetchall()
    daily: dict[int, int] = defaultdict(int)
    for d, v in rows:
        daily[int(d)] += int(v)
    d0, d1 = min(daily), max(daily)
    nb16 = (d1 - d0 + 1) // 16
    series = [daily.get(d0 + i, 0) for i in range(16 * nb16)]

    # textbook cascade DWT
    exp: dict[tuple[str, int], tuple[int, int]] = {}
    cur = series
    for lvl in range(1, 5):
        s = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
        d = [cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)]
        exp[("detail", lvl)] = (len(d), sum(x * x for x in d))
        cur = s
    exp[("smooth", 4)] = (len(cur), sum(x * x for x in cur))
    exp[("raw", 0)] = (len(series), sum(x * x for x in series))

    out = load_all()["haar_energy"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 6
    got = {
        (r.part, int(r.level)): (int(r.n_blocks), int(r.energy))
        for r in out.itertuples()
    }
    assert got == exp
    # exact unnormalized Parseval identity
    e = {k: v[1] for k, v in got.items()}
    assert 16 * e[("raw", 0)] == (
        8 * e[("detail", 1)]
        + 4 * e[("detail", 2)]
        + 2 * e[("detail", 3)]
        + e[("detail", 4)]
        + e[("smooth", 4)]
    )
    # the daily series is genuinely non-flat at every scale
    assert all(e[("detail", lv)] > 0 for lv in range(1, 5))


# --------------------------------------------------------------------- R244
def test_interval_peak_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT l_returnflag,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', l_shipdate)"
        f" // {_DAY_US}, l_partkey % 30 FROM lineitem"
    ).fetchall()
    by: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for m, s, dur in rows:
        by[m].append((int(s), int(s) + int(dur)))

    out = load_all()["interval_peak"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out["flag"]) == set(by)
    for r in out.itertuples():
        ivs = by[r.flag]
        deltas: dict[int, int] = defaultdict(int)
        for s, e in ivs:
            deltas[s] += 1
            deltas[e + 1] -= 1
        active, peak, peak_day = 0, -1, None
        for d in sorted(deltas):
            active += deltas[d]
            if active > peak:
                peak, peak_day = active, d
        sum_days = sum(e - s + 1 for s, e in ivs)
        assert int(r.n_intervals) == len(ivs)
        assert int(r.sum_days) == sum_days
        assert int(r.mean_days_milli) == (1000 * sum_days) // len(ivs)
        assert int(r.peak_active) == peak
        assert int(r.peak_day) == peak_day
        assert peak >= 2  # the sweep found genuine overlap, not n=1 noise
