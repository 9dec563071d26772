"""R166: range_fragmentation python replay — runs counted from scratch
with py_morton / py_hilbert. Oracle parity rides test_oracle_parity."""

from __future__ import annotations


def _runs(keys):
    ks = sorted(keys)
    return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b - a != 1)


def test_range_fragmentation_matches_python_replay(spark):
    from tree_sitter_analyzer_spark.operators.layout import (
        RF_NQ, py_hilbert, py_morton, range_fragmentation,
    )

    M31 = 2147483647

    def lcg(x, a):
        return ((x % M31) * a % M31 + 999983) * 69621 % M31

    want = {}
    for q in range(RF_NQ):
        cx0 = lcg(q, 48271) % ((1 << 16) - 16)
        cy0 = lcg(q, 16807) % ((1 << 15) - 16)
        w, h = 4 + q % 5, 4 + (q * 3) % 5
        cells = [
            (cx0 + i, cy0 + j) for i in range(w) for j in range(h)
        ]
        zk = [py_morton(x, y) for x, y in cells]
        hk = [py_hilbert(x, y) for x, y in cells]
        want[q] = (
            len(cells), _runs(zk), _runs(hk),
            1000 * _runs(hk) // _runs(zk),
        )

    got = range_fragmentation(spark).toPandas()
    gm = {
        int(r.qi): (int(r.n_cells), int(r.z_runs), int(r.h_runs),
                    int(r.frag_ratio_pm))
        for r in got.itertuples()
    }
    assert gm == want
    # Hilbert's clustering advantage is real in aggregate: strictly
    # fewer total runs than Z-order across the 20 queries
    assert sum(v[2] for v in want.values()) < sum(v[1] for v in want.values())
    # every query covers its full rectangle
    for q, v in want.items():
        assert v[0] == (4 + q % 5) * (4 + (q * 3) % 5)
