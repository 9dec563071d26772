"""R350-R352 batch: python replays + invariants for js_shrinkage,
huffman_cost, min_var_portfolio. Oracle parity rides
test_oracle_parity. NOTE: Spark DIV and DuckDB integer // both
TRUNCATE toward zero (probed), so the replay uses trunc-division, not
python's flooring //, wherever a numerator can be negative."""

from __future__ import annotations

import heapq

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark DIV == DuckDB int //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --------------------------------------------------------------------- R350
def test_js_shrinkage_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql
    from tree_sitter_analyzer_spark.operators.zonal import JS_RES
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT {ix_sql('lon', JS_RES)}, {iy_sql('lat', JS_RES)},"
        " count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    xs = [int(n) for _, _, n in rows]
    k = len(xs)
    tot = sum(xs)
    m = tot // k
    ss = sum((x - m) ** 2 for x in xs)
    b = max(0, 1000 - (1000 * (k - 3) * m) // max(ss, 1))
    sh = [m + _tdiv(b * (x - m) + (500 if x >= m else -500), 1000)
          for x in xs]

    out = load_all()["js_shrinkage"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.k_cells), int(r.grand_mean), int(r.ss),
            int(r.b_milli)) == (k, m, ss, b)
    assert (int(r.raw_min), int(r.raw_max)) == (min(xs), max(xs))
    assert (int(r.shrunk_min), int(r.shrunk_max)) == (min(sh), max(sh))
    assert int(r.mass_drift) == sum(sh) - tot
    # shrinkage contracts the spread and never crosses the mean
    assert min(sh) >= min(xs) and max(sh) <= max(xs)
    assert 0 <= b <= 1000
    for x, s in zip(xs, sh):
        if x >= m:
            assert m <= s <= x
        else:
            assert x <= s <= m


# --------------------------------------------------------------------- R351
def test_huffman_cost_matches_heapq_reference(spark, duck):
    """Independent reference: the standard heapq Huffman build with
    per-symbol depths — a genuinely different algorithm from the
    query's chained merge-sum picks."""
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    freqs = sorted(
        int(n) for _, n in duck.sql(
            "SELECT event_type, count(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert len(freqs) == 5
    # heapq Huffman: cost = sum over merges of combined weight
    h = list(freqs)
    heapq.heapify(h)
    cost = 0
    while len(h) > 1:
        a, b = heapq.heappop(h), heapq.heappop(h)
        cost += a + b
        heapq.heappush(h, a + b)
    total = sum(freqs)

    out = load_all()["huffman_cost"].spark_fn(spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_events), int(r.huffman_cost)) == (total, cost)
    assert int(r.avg_len_milli) == (1000 * cost) // total
    assert int(r.fixed_len_milli) == 3000
    assert int(r.savings_milli) == 3000 - (1000 * cost) // total
    assert int(r.never_worse) == 1
    # Shannon bounds for 5 near-uniform symbols: avg length in
    # [log2(5), 3] bits => [2321, 3000] milli
    assert 2321 <= int(r.avg_len_milli) <= 3000


# --------------------------------------------------------------------- R352
def test_min_var_portfolio_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT dayofyear(CAST(l_shipdate AS DATE)),"
        " sum(CASE WHEN l_returnflag = 'A' THEN"
        " CAST(floor(l_extendedprice * (1e0 - l_discount)) AS BIGINT)"
        " ELSE 0 END) // 1000,"
        " sum(CASE WHEN l_returnflag = 'R' THEN"
        " CAST(floor(l_extendedprice * (1e0 - l_discount)) AS BIGINT)"
        " ELSE 0 END) // 1000"
        " FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1"
    ).fetchall()
    d = {int(r[0]): (int(r[1]), int(r[2])) for r in rows}
    obs = [d.get(doy, (0, 0)) for doy in range(1, 367)]
    n = len(obs)
    mx = sum(x for x, _ in obs) // n
    my = sum(y for _, y in obs) // n
    s11 = sum((x - mx) ** 2 for x, _ in obs)
    s22 = sum((y - my) ** 2 for _, y in obs)
    s12 = sum((x - mx) * (y - my) for x, y in obs)
    den = s11 + s22 - 2 * s12
    if den <= 0:
        w = 500
    else:
        w = max(0, min(1000, _tdiv(1000 * (s22 - s12), den)))

    out = load_all()["min_var_portfolio"].spark_fn(
        spark, SF_TINY).toPandas()
    r = out.iloc[0]
    assert (int(r.n_days), int(r.s11), int(r.s22), int(r.s12)) == (
        n, s11, s22, s12)
    assert int(r.w_num) == s22 - s12 and int(r.w_den) == den
    assert int(r.w_milli) == w
    assert int(r.den_pos) == (1 if den > 0 else 0)
    assert int(r.best_single_var) == min(s11, s22)
    # the mixed variance at w* (exact cross-multiplied, milli^2 scale)
    # never exceeds the better single stream
    mixed = (w * w * s11 + (1000 - w) * (1000 - w) * s22
             + 2 * w * (1000 - w) * s12)
    assert mixed <= 1000 * 1000 * min(s11, s22)
