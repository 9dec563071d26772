"""Round-5 batch: independent python replays for the two round-4
shared-SQL-text operators that shipped without one (round-4 advice #1):
sar_lag (row-normalized rook Wx / W^2x SAR ladder) and temperature_mix
(largest-remainder temperature quotas).  Both replays recompute from the
RAW tables (tiles / documents), never from the modules' own SQL helpers
— the energy_distance lesson: two-engine parity cannot catch a bug that
lives in the shared SQL text; an independent recomputation can.
"""

from __future__ import annotations

import math
from collections import defaultdict

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    """SQL DIV / DuckDB // truncate toward zero; python // floors —
    they differ on negative operands (CLAUDE.md signed-DIV rule)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ----------------------------------------------------------------- sar_lag
def test_sar_lag_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql
    from tree_sitter_analyzer_spark.queries_spatial import SAR_RES
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT {ix_sql('lon', SAR_RES)}, {iy_sql('lat', SAR_RES)}, "
        "count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    occ = {(int(x), int(y)): int(n) for x, y, n in rows}
    offs = [(1, 0), (-1, 0), (0, 1), (0, -1)]

    wx, deg, swx = {}, {}, {}
    for (cx, cy), x in occ.items():
        nbr = [occ[(cx + dx, cy + dy)] for dx, dy in offs
               if (cx + dx, cy + dy) in occ]
        deg[(cx, cy)] = len(nbr)
        swx_raw = sum(nbr)
        wx[(cx, cy)] = _tdiv(1000 * swx_raw, max(len(nbr), 1))
    for (cx, cy) in occ:
        swx[(cx, cy)] = sum(wx[(cx + dx, cy + dy)] for dx, dy in offs
                            if (cx + dx, cy + dy) in wx)
    expected = {}
    for c, x in occ.items():
        g = max(deg[c], 1)
        expected[c] = (
            x, deg[c], wx[c], _tdiv(swx[c], g),
            1000 * x + _tdiv(wx[c], 2) + _tdiv(_tdiv(swx[c], g), 4),
        )

    out = load_all()["sar_lag"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (int(r.ix), int(r.iy)): (
            int(r.n_tiles), int(r.deg), int(r.wx_milli),
            int(r.w2x_milli), int(r.sar_milli),
        )
        for r in out.itertuples()
    }
    assert got == expected and len(got) > 0


# --------------------------------------------------------- temperature_mix
def test_temperature_mix_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT source, count(*) FROM documents GROUP BY 1"
    ).fetchall()
    n_docs = {s: int(n) for s, n in rows}
    b = 1000
    w_sqrt = {s: math.isqrt(n) for s, n in n_docs.items()}

    def quotas(w: dict[str, int]) -> dict[str, int]:
        tot = sum(w.values())
        base = {s: _tdiv(b * w[s], tot) for s in w}
        rem = {s: (b * w[s]) % tot for s in w}
        # row_number() ORDER BY remainder DESC, source ASC
        ranked = sorted(w, key=lambda s: (-rem[s], s))
        short = b - sum(base.values())
        return {s: base[s] + (1 if i < short else 0)
                for i, s in enumerate(ranked)}

    q1 = quotas(n_docs)
    q2 = quotas(w_sqrt)
    qi = quotas({s: 1 for s in n_docs})
    for q in (q1, q2, qi):
        assert sum(q.values()) == b  # apportionment invariant

    out = load_all()["temperature_mix"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.source: (int(r.n_docs), int(r.w_sqrt), int(r.quota_t1),
                   int(r.quota_t2), int(r.quota_inf))
        for r in out.itertuples()
    }
    expected = {s: (n_docs[s], w_sqrt[s], q1[s], q2[s], qi[s])
                for s in n_docs}
    assert got == expected and len(got) > 1


# ------------------------------------------------- least_cost_path rounds
def test_least_cost_path_trace_rounds_logarithmic(spark):
    """Plan pin (round-4 verdict "What's wrong" #1): the corridor trace
    must cost O(log L) materialized Spark rounds via pointer-doubling on
    the backlink table — never the old O(L/2) pointer-chase. For the
    24-step budget that is at most ceil(log2(24)) + 1 = 6 rounds."""
    import math

    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators import cost_distance as cd

    tiles = synth.tiles_df(spark, SF_TINY)
    path = cd.least_cost_path(spark, tiles).toPandas()
    cap = math.ceil(math.log2(cd.TRACE_MAX_STEPS)) + 1
    assert 1 <= cd.LAST_TRACE_ROUNDS <= cap, cd.LAST_TRACE_ROUNDS
    # the trace is still the real corridor: contiguous steps from 0
    steps = sorted(path.step.tolist())
    assert steps == list(range(len(steps))) and len(steps) > 2
