"""R263-R265 batch: python replays + invariants for density_peaks,
directional_variogram, kind_diversity. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict

from .conftest import SF_TINY, register_views


def _cells(duck, res):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql

    register_views(duck, SF_TINY)
    return duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT {ix_sql('lon', res)}, {iy_sql('lat', res)}, tile_kind "
        "FROM tiles"
    ).fetchall()


# --------------------------------------------------------------------- R263
def test_density_peaks_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    counts = Counter((ix, iy) for ix, iy, _ in _cells(duck, 8))
    want = {}
    for (ix, iy), n in counts.items():
        nbr = max(
            (
                counts.get((ix + dx, iy + dy), 0)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)
            ),
        )
        if n > nbr:
            want[(ix, iy)] = (n, nbr)

    out = load_all()["density_peaks"].spark_fn(spark, SF_TINY).toPandas()
    from tree_sitter_analyzer_spark.grid import IX_MUL, RES_MUL

    got = {}
    for r in out.itertuples():
        c = int(r.cell) - 8 * RES_MUL
        got[(c // IX_MUL, c % IX_MUL)] = (int(r.n_tiles), int(r.nbr_max))
        assert int(r.prominence) == int(r.n_tiles) - int(r.nbr_max) > 0
    assert got == want
    # peaks are sparse: far fewer peaks than occupied cells
    assert 0 < len(got) < len(counts) // 2


# --------------------------------------------------------------------- R264
def test_directional_variogram_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    counts = Counter((ix, iy) for ix, iy, _ in _cells(duck, 8))
    dirs = {"E": (1, 0), "NE": (1, 1), "N": (0, 1), "NW": (-1, 1)}
    out = (
        load_all()["directional_variogram"]
        .spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == 12
    for r in out.itertuples():
        dx, dy = dirs[r.dir]
        h = int(r.h)
        pairs = [
            (v, counts[(ix + dx * h, iy + dy * h)])
            for (ix, iy), v in counts.items()
            if (ix + dx * h, iy + dy * h) in counts
        ]
        gsum = sum((a - b) ** 2 for a, b in pairs)
        assert int(r.n_pairs) == len(pairs)
        assert int(r.gamma_sum) == gsum
        assert int(r.gamma_milli) == (1000 * gsum) // (2 * len(pairs))
    # anisotropy is detectable: direction gammas differ at lag 1
    g1 = {r.dir: int(r.gamma_milli) for r in out.itertuples() if r.h == 1}
    assert len(set(g1.values())) > 1


# --------------------------------------------------------------------- R265
def test_kind_diversity_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.grid import IX_MUL, RES_MUL

    per_cell: dict[tuple, Counter] = defaultdict(Counter)
    for ix, iy, kind in _cells(duck, 7):
        per_cell[(ix, iy)][kind] += 1

    out = load_all()["kind_diversity"].spark_fn(spark, SF_TINY).toPandas()
    want = {k: v for k, v in per_cell.items() if sum(v.values()) > 1}
    assert len(out) == len(want)
    for r in out.itertuples():
        c = int(r.cell) - 7 * RES_MUL
        kc = want[(c // IX_MUL, c % IX_MUL)]
        n = sum(kc.values())
        p2 = sum(v * (v - 1) for v in kc.values())
        sq = sum(v * v for v in kc.values())
        assert int(r.n_tiles) == n
        assert int(r.richness) == len(kc)
        assert int(r.simpson_milli) == (1000 * p2) // (n * (n - 1))
        assert int(r.hill2_milli) == (1000 * n * n) // sq
        # Hill effective count is between 1 and richness (x1000)
        assert 1000 <= int(r.hill2_milli) <= 1000 * len(kc)
