"""R227-R229 batch: python replays + invariants for f2_sketch_audit,
encoding_audit, sprt_monitor. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R227
def test_f2_sketch_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    keys = [int(k) for (k,) in duck.sql(
        "SELECT l_partkey FROM lineitem"
    ).fetchall()]
    z = [0] * 16
    for k in keys:
        for j in range(16):
            z[j] += 1 if md5int_py(f"ams{j}_{k}") % 2 == 0 else -1
    means = sorted(
        (z[4 * g] ** 2 + z[4 * g + 1] ** 2 + z[4 * g + 2] ** 2
         + z[4 * g + 3] ** 2) // 4
        for g in range(4)
    )
    est = (means[1] + means[2]) // 2
    freq: dict[int, int] = {}
    for k in keys:
        freq[k] = freq.get(k, 0) + 1
    exact = sum(f * f for f in freq.values())

    row = load_all()["f2_sketch_audit"].spark_fn(spark, SF_TINY).toPandas().iloc[0]
    assert int(row.exact_f2) == exact
    assert int(row.est_f2) == est
    assert int(row.n_keys) == len(freq)
    assert int(row.n_rows) == len(keys)
    assert int(row.err_milli) == (1000 * abs(est - exact)) // exact
    # the unbiased-estimator sanity band: within 2x of exact
    assert exact // 2 <= est <= exact * 2


# --------------------------------------------------------------------- R228
def test_encoding_audit_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import grid, synth
    from tree_sitter_analyzer_spark.operators.layout import morton_sql
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT i, {grid.ix_sql('lon', 9)} * {grid.IX_MUL}"
        f" + {grid.iy_sql('lat', 9)} AS cell9, tile_kind,"
        f" {morton_sql('lon', 'lat', 9)} AS zkey FROM tiles"
    ).fetchall()

    def chunks(sorted_rows):
        sz, extra = divmod(len(sorted_rows), 64)
        out, pos = [], 0
        for f in range(64):
            take = sz + (1 if f < extra else 0)
            out.append(sorted_rows[pos : pos + take])
            pos += take
        return out

    want = {}
    for lay, keyfn in (
        ("zorder", lambda r: (r[3], r[0])), ("by_id", lambda r: r[0]),
    ):
        files = chunks(sorted(rows, key=keyfn))
        for col, idx in (("cell9", 1), ("kind", 2)):
            runs = dist = 0
            for ch in files:
                vals = [r[idx] for r in ch]
                runs += 1 + sum(
                    1 for a, b in zip(vals, vals[1:]) if a != b
                )
                dist += len(set(vals))
            n = len(rows)
            want[(lay, col)] = (n, runs, dist, (1000 * n) // runs)

    out = load_all()["encoding_audit"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (r.layout, r.column_name): (
            int(r.n_rows), int(r.total_runs), int(r.total_distinct),
            int(r.rows_per_run_milli),
        )
        for r in out.itertuples()
    }
    assert got == want
    # the layout claim itself: the spatial sort compresses the spatial
    # column (and for a spatially-sorted file runs == distinct)
    assert got[("zorder", "cell9")][1] < got[("by_id", "cell9")][1]
    assert got[("zorder", "cell9")][1] == got[("zorder", "cell9")][2]


# --------------------------------------------------------------------- R229
def test_sprt_monitor_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT user_id, ts, event_id, value FROM events"
        " WHERE event_type = 'purchase' ORDER BY ts, event_id"
    ).fetchall()
    arms: dict[str, list[int]] = {"A": [], "B": []}
    for uid, ts, eid, val in rows:
        arm = "A" if md5int_py(str(int(uid))) % 2 == 0 else "B"
        arms[arm].append(1 if float(val) >= 150.0 else 0)
    want = {}
    for arm, xs in arms.items():
        llr, cross, dec = 0, -1, "continue"
        for i, x in enumerate(xs, 1):
            llr += 336472 if x else -143101
            if cross == -1 and (llr >= 2944439 or llr <= -2944439):
                cross = i
                dec = "accept_h1" if llr >= 2944439 else "accept_h0"
        want[arm] = (len(xs), sum(xs), llr, cross, dec)

    out = load_all()["sprt_monitor"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.arm: (
            int(r.n_obs), int(r.successes), int(r.llr_final_micro),
            int(r.cross_at_n), r.decision,
        )
        for r in out.itertuples()
    }
    assert got == want
    # a crossing, once it happens, picks the matching boundary
    for arm, (_, _, _, cross, dec) in got.items():
        assert (cross == -1) == (dec == "continue")
