"""R359-R361 batch: python replays + invariants for the geodesy family
(projection_distortion, metric_cell_geometry, geodesic_nn_flip). The
replays recompute the trig literals INDEPENDENTLY with math.cos (same
formula, not imported from the module) and rebuild every output from
the raw synthetic tiles fetched through DuckDB."""

from __future__ import annotations

import math

from tree_sitter_analyzer_spark import synth

from .conftest import SF_TINY, register_views

LAT0, BW, NB = 35.4, 0.05, 10
COS = [
    int(math.floor(math.cos(math.radians(LAT0 + BW * (b + 0.5))) * 1e6))
    for b in range(NB)
]
MLON = [int(math.floor(111319.49 * c / 1e6)) for c in COS]
MLAT = 111132
AREA = [(3 * m * MLAT) // 100 for m in MLON]


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark DIV == DuckDB int //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _band(lat: float) -> int:
    return min(9, max(0, math.floor((lat - 35.4) * 20.0)))


def _tiles(duck):
    register_views(duck, SF_TINY)
    return duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) SELECT lon, lat FROM tiles"
    ).fetchall()


# --------------------------------------------------------------------- R359
def test_projection_distortion_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    pts = _tiles(duck)
    n = [0] * NB
    for lon, lat in pts:
        n[_band(lat)] += 1
    total = sum(n)
    dens = [1000000 * n[b] // (AREA[b] // 1000) for b in range(NB)]
    rank_p = {
        b: r + 1
        for r, b in enumerate(sorted(range(NB), key=lambda b: (-n[b], b)))
    }
    rank_m = {
        b: r + 1
        for r, b in enumerate(sorted(range(NB), key=lambda b: (-dens[b], b)))
    }

    out = (
        load_all()["projection_distortion"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == sum(1 for v in n if v > 0)
    for row in out.itertuples():
        b = int(row.band)
        assert int(row.n_tiles) == n[b]
        assert int(row.share_milli) == 1000 * n[b] // total
        assert int(row.m_per_deg_lon) == MLON[b]
        assert int(row.band_area_m2) == AREA[b]
        assert int(row.dens_scaled) == dens[b]
        assert int(row.shrink_ppm) == 1000000 * (MLON[0] - MLON[b]) // MLON[0]
        assert int(row.rank_planar) == rank_p[b]
        assert int(row.rank_metric) == rank_m[b]
        assert int(row.rank_flip) == (1 if rank_p[b] != rank_m[b] else 0)
    # physically: longitude shrinks monotonically going north here
    assert MLON == sorted(MLON, reverse=True)
    assert all(0 <= s < 10000 for s in out.shrink_ppm.astype(int))


# --------------------------------------------------------------------- R360
def test_metric_cell_geometry_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    pts = _tiles(duck)
    agg: dict[tuple[int, int], tuple[int, set]] = {}
    for res in (7, 9, 11):
        for lon, lat in pts:
            ix = math.floor((lon + 180.0) * (1 << res))
            iy = math.floor((lat + 90.0) * (1 << res))
            key = (res, _band(lat))
            cnt, cells = agg.setdefault(key, [0, set()])
            agg[key][0] += 1
            cells.add((ix, iy))

    out = (
        load_all()["metric_cell_geometry"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == len(agg)
    for row in out.itertuples():
        res, b = int(row.res), int(row.band)
        cnt, cells = agg[(res, b)]
        p2 = 1 << res
        w = MLON[b] * 1000 // p2
        h = MLAT * 1000 // p2
        assert (int(row.n_tiles), int(row.n_cells)) == (cnt, len(cells))
        assert (int(row.width_mm), int(row.height_mm)) == (w, h)
        assert int(row.aspect_milli) == 1000 * w // h
        assert int(row.area_m2_milli) == w * h // 1000
        assert int(row.tiles_per_cell_milli) == 1000 * cnt // len(cells)
        # anisotropy: every cell here is ~19% narrower than tall
        assert 780 <= int(row.aspect_milli) <= 840


# --------------------------------------------------------------------- R361
def test_geodesic_nn_flip_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    pts = _tiles(duck)
    res = 8
    cells: dict[tuple[int, int], list[int]] = {}
    for lon, lat in pts:
        ix = math.floor((lon + 180.0) * (1 << res))
        iy = math.floor((lat + 90.0) * (1 << res))
        c = cells.setdefault((ix, iy), [0, 0, 0])
        c[0] += 1
        c[1] += math.floor(lon * 1e6)
        c[2] += math.floor(lat * 1e6)
    cent = {
        k: (s1 // n, s2 // n) for k, (n, s1, s2) in cells.items()
    }
    stats: dict[int, list[int]] = {}
    for (ix, iy), (clon, clat) in cent.items():
        e = cent.get((ix + 1, iy))
        nn = cent.get((ix, iy + 1))
        if e is None or nn is None:
            continue
        band = min(9, max(0, (clat - 35400000) // 50000))
        ml = MLON[band]
        dle, dae = e[0] - clon, e[1] - clat
        dln, dan = nn[0] - clon, nn[1] - clat
        p_east = 1 if dle * dle + dae * dae < dln * dln + dan * dan else 0
        me2 = _tdiv(dle * ml, 1000) ** 2 + _tdiv(dae * MLAT, 1000) ** 2
        mn2 = _tdiv(dln * ml, 1000) ** 2 + _tdiv(dan * MLAT, 1000) ** 2
        m_east = 1 if me2 < mn2 else 0
        s = stats.setdefault(band, [0, 0, 0, 0])
        s[0] += 1
        s[1] += 1 if p_east != m_east else 0
        s[2] += p_east
        s[3] += m_east

    out = (
        load_all()["geodesic_nn_flip"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == len(stats) > 0
    for row in out.itertuples():
        s = stats[int(row.band)]
        assert (
            int(row.n_triples), int(row.n_flips),
            int(row.planar_east_wins), int(row.metric_east_wins),
        ) == tuple(s)
        assert int(row.flip_milli) == 1000 * s[1] // s[0]
        # metric shrinks east distances, so east can only WIN more often
        # under the metric, never less
        assert int(row.metric_east_wins) >= int(row.planar_east_wins)
