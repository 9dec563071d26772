"""R210-R211 batch: python replays + invariants for zonemap_prune and
curve_range_plan. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


def _keyed_tiles(duck):
    from tree_sitter_analyzer_spark import grid, synth
    from tree_sitter_analyzer_spark.operators.layout import morton_sql

    register_views(duck, SF_TINY)
    return duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT i, {grid.ix_sql('lon', 9)} AS ix,"
        f" {grid.iy_sql('lat', 9)} AS iy,"
        f" {morton_sql('lon', 'lat', 9)} AS zkey FROM tiles"
    ).fetchall()


def _ntile_chunks(rows, n):
    """Replicate SQL ntile: first (len % n) chunks get one extra row."""
    sz, extra = divmod(len(rows), n)
    out, pos = [], 0
    for f in range(n):
        take = sz + (1 if f < extra else 0)
        out.append(rows[pos : pos + take])
        pos += take
    return out


# --------------------------------------------------------------------- R210
def test_zonemap_prune_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.layout import PRUNE_WORKLOAD
    from tree_sitter_analyzer_spark.registry import load_all

    tiles = _keyed_tiles(duck)
    want = {}
    truth = {
        q: sum(1 for _, ix, iy, _ in tiles
               if x0 <= ix <= x1 and y0 <= iy <= y1)
        for q, x0, x1, y0, y1 in PRUNE_WORKLOAD
    }
    for lay, keyfn in (
        ("zorder", lambda r: (r[3], r[0])), ("by_id", lambda r: r[0]),
    ):
        chunks = _ntile_chunks(sorted(tiles, key=keyfn), 64)
        stats = [
            (min(r[1] for r in ch), max(r[1] for r in ch),
             min(r[2] for r in ch), max(r[2] for r in ch), len(ch))
            for ch in chunks if ch
        ]
        for q, x0, x1, y0, y1 in PRUNE_WORKLOAD:
            hit = [
                s for s in stats
                if s[1] >= x0 and s[0] <= x1 and s[3] >= y0 and s[2] <= y1
            ]
            want[(lay, q)] = (len(hit), 64, sum(s[4] for s in hit), truth[q])

    out = load_all()["zonemap_prune"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (r.layout, int(r.qid)): (
            int(r.files_scanned), int(r.files_total),
            int(r.rows_scanned), int(r.rows_matched),
        )
        for r in out.itertuples()
    }
    assert got == want
    for q, *_ in PRUNE_WORKLOAD:
        z, b = got[("zorder", q)], got[("by_id", q)]
        assert z[0] <= b[0]          # zorder never scans MORE files
        assert z[2] >= z[3] and b[2] >= b[3]  # scans cover the matches
    assert got[("zorder", 6)][0] == 0 and got[("by_id", 6)][0] == 0


# --------------------------------------------------------------------- R211
def test_curve_range_plan_matches_python_replay(spark):
    from tree_sitter_analyzer_spark.operators.layout import (
        RANGE_BBOX, py_hilbert, py_morton,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    x0, x1, y0, y1 = RANGE_BBOX
    cells = [(ix, iy) for ix in range(x0, x1 + 1) for iy in range(y0, y1 + 1)]

    def ranges(keys):
        ks = sorted(keys)
        out = [[ks[0], ks[0], 1]]
        for k in ks[1:]:
            if k == out[-1][1] + 1:
                out[-1][1] = k
                out[-1][2] += 1
            else:
                out.append([k, k, 1])
        return [tuple(r) for r in out]

    want = {
        "hilbert": ranges([py_hilbert(ix, iy) for ix, iy in cells]),
        "zorder": ranges([py_morton(ix, iy) for ix, iy in cells]),
    }
    out = load_all()["curve_range_plan"].spark_fn(spark, SF_TINY).toPandas()
    got: dict[str, list] = {"hilbert": [], "zorder": []}
    for r in out.sort_values(["curve", "k0"]).itertuples():
        got[r.curve].append((int(r.k0), int(r.k1), int(r.n_cells)))
    assert got == want
    for curve, rs in got.items():
        assert sum(n for _, _, n in rs) == len(cells)  # lossless cover
        for a, b in zip(rs, rs[1:]):
            assert b[0] > a[1] + 1  # maximally merged, disjoint
    # Hilbert's unit-step continuity beats Z-order's diagonal jumps
    assert len(got["hilbert"]) < len(got["zorder"])
