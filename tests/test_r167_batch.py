"""R167-R169: python replays for diameter_sweep, isoband_boundaries and
watermark_lateness. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import deque

from .conftest import SF_TINY, register_views


def test_diameter_sweep_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.graph import (
        DIAM_CAP, diameter_sweep, edges_df, edges_sql,
    )

    e = [tuple(r) for r in duck.sql(edges_sql("bfs")).fetchall()]
    adj: dict[int, set] = {}
    for a, b in e:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def bfs(s):
        d = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if d[v] >= DIAM_CAP:
                continue
            for n in adj.get(v, ()):
                if n not in d:
                    d[n] = d[v] + 1
                    q.append(n)
        return d

    d0 = bfs(0)
    u = min((v for v in d0), key=lambda v: (-d0[v], v))
    d1 = bfs(u)
    far = min((v for v in d1), key=lambda v: (-d1[v], v))
    got = diameter_sweep(spark, edges_df(spark, "bfs")).toPandas().iloc[0]
    assert int(got.sweep_start) == u
    assert int(got.ecc_start) == d0[u]
    assert int(got.diameter_lb) == max(d1.values())
    assert int(got.far_v) == far
    assert int(got.n_reached) == len(d1)
    # the second sweep can only improve (or equal) the first eccentricity
    assert int(got.diameter_lb) >= int(got.ecc_start)


def test_isobands_conserve_open_boundary_and_split_edges(spark, duck):
    """Structural invariants: (1) every (hi, lo) row has hi > lo; (2)
    total open-boundary edges == 4*n_cells - 2*interior_adjacencies
    (each cell emits 4 fan rows; occupied neighbors consume 2 per
    unordered adjacency, equal-band or not)."""
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql
    from tree_sitter_analyzer_spark.operators.zonal import (
        ISO_RES, isoband_boundaries,
    )

    register_views(duck, SF_TINY)
    cells = duck.sql(
        f"{synth.oracle_ctes()} SELECT {ix_sql('lon', ISO_RES)},"
        f" {iy_sql('lat', ISO_RES)}, count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    occ = {(ix, iy) for ix, iy, _ in cells}
    n_adj = sum(
        1 for ix, iy in occ if (ix + 1, iy) in occ
    ) + sum(1 for ix, iy in occ if (ix, iy + 1) in occ)

    got = isoband_boundaries(
        synth.tiles_df(spark, SF_TINY)
    ).toPandas()
    assert all(r.band_hi > r.band_lo for r in got.itertuples())
    open_total = int(got[got.band_lo == -1].n_edges.sum())
    assert open_total == 4 * len(occ) - 2 * n_adj
    # multi-band signal: at least one occupied-pair contour row exists
    assert len(got[got.band_lo >= 0]) >= 1


def test_watermark_lateness_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT event_type, event_id,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
        " FROM events"
    ).fetchall()
    streams: dict[str, list] = {}
    for et, eid, us in rows:
        streams.setdefault(et, []).append(
            (us + md5int_py(str(eid)) % 600000000, eid, us)
        )
    want = {}
    for et, evs in streams.items():
        evs.sort()
        for d in (0, 60, 300, 600):
            wm, late = None, 0
            for _, _, us in evs:
                if wm is not None and us < wm - d * 1000000:
                    late += 1
                wm = us if wm is None else max(wm, us)
            want[(et, d)] = (len(evs), late, 1000 * late // len(evs))
    q = load_all()["watermark_lateness"]
    got = q.spark_fn(spark, SF_TINY).toPandas()
    gm = {
        (r.event_type, int(r.delay_s)): (
            int(r.n_events), int(r.n_late), int(r.late_pm)
        )
        for r in got.itertuples()
    }
    assert gm == want
    # the ladder is monotone per stream and has live + drained rungs
    lates = [sum(want[(et, d)][1] for et in streams) for d in (0, 60, 300, 600)]
    assert lates[0] >= lates[1] >= lates[2] >= lates[3]
    assert lates[0] > 0 and lates[3] == 0
