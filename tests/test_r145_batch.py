"""R145-R149 batch: python replays + invariants for spearman_acf,
linear_attribution, participation_ratios, domain_mix_sample.
Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter, defaultdict

from .conftest import SF_TINY, register_views


def _q(name):
    from tree_sitter_analyzer_spark.registry import load_all

    return load_all()[name].spark_fn


def test_spearman_acf_matches_python_replay(spark, duck):
    register_views(duck, SF_TINY)
    daily = dict(
        duck.sql(
            "SELECT date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
            " // 86400000000 AS day, count(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    got = _q("spearman_acf")(spark, SF_TINY).toPandas()
    assert sorted(got["lag"]) == list(range(1, 8))
    for r in got.itertuples():
        k = int(r.lag)
        pairs = [
            (d, daily[d], daily[d + k]) for d in sorted(daily) if d + k in daily
        ]
        rx = {
            d: i + 1
            for i, (d, _, _) in enumerate(
                sorted(pairs, key=lambda p: (p[1], p[0]))
            )
        }
        ry = {
            d: i + 1
            for i, (d, _, _) in enumerate(
                sorted(pairs, key=lambda p: (p[2], p[0]))
            )
        }
        d2 = sum((rx[d] - ry[d]) ** 2 for d, _, _ in pairs)
        n = len(pairs)
        assert int(r.n_pairs) == n
        assert int(r.sum_d2) == d2
        assert int(r.rho_milli) == 1000 - (6000 * d2) // (n * (n * n - 1))
        assert -1000 <= int(r.rho_milli) <= 1000


def test_linear_attribution_conserves_credit(spark, duck):
    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT user_id, event_id, event_type,"
        " date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS us"
        " FROM events"
    ).fetchall()
    convs = [(u, e, us) for u, e, t, us in rows if t == "purchase"]
    touches = [
        (u, e, t, us)
        for u, e, t, us in rows
        if t in ("click", "signup", "view")
    ]
    by_user = defaultdict(list)
    for u, e, t, us in touches:
        by_user[u].append((e, t, us))
    credit = Counter()
    n_credits = Counter()
    win = 7 * 86400000000
    for u, _, cus in convs:
        ts = [
            (e, t, us)
            for e, t, us in by_user.get(u, [])
            if cus - win < us <= cus
        ]
        if not ts:
            credit["direct"] += 1000
            n_credits["direct"] += 1
            continue
        n = len(ts)
        last = max(ts, key=lambda x: (x[2], x[0]))
        for e, t, us in ts:
            c = 1000 // n
            if (e, t, us) == last:
                c = 1000 - (n - 1) * (1000 // n)
            credit[t] += c
            n_credits[t] += 1
    got = _q("linear_attribution")(spark, SF_TINY).toPandas()
    for r in got.itertuples():
        assert credit[r.channel] == int(r.credit_milli)
        assert n_credits[r.channel] == int(r.n_credits)
    # the audit invariant: every purchase distributes exactly 1000
    assert int(got["credit_milli"].sum()) == 1000 * len(convs)


def test_participation_ratios_matches_numpy_replay(spark, duck):
    from tree_sitter_analyzer_spark import grid, synth

    register_views(duck, SF_TINY)
    pdf = duck.sql(
        f"{synth.oracle_ctes()} SELECT lon, lat, tile_kind FROM tiles"
    ).df()
    ix, iy = grid.np_ixiy(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 8)
    cells = (ix.astype("int64") * 1_048_576 + iy.astype("int64")).tolist()
    counts = Counter(zip(cells, pdf["tile_kind"]))
    present = defaultdict(set)
    for (c, k), _ in counts.items():
        present[c].add(k)
    totals = Counter(pdf["tile_kind"])
    got = _q("participation_ratios")(spark, SF_TINY).toPandas()
    kinds = sorted(totals)
    assert len(got) == len(kinds) * (len(kinds) - 1)
    for r in got.itertuples():
        with_b = sum(
            n
            for (c, k), n in counts.items()
            if k == r.kind_a and r.kind_b in present[c]
        )
        assert int(r.with_b) == with_b
        assert int(r.total_a) == totals[r.kind_a]
        assert int(r.pr_milli) == 1000 * with_b // totals[r.kind_a]
        assert 0 <= int(r.pr_milli) <= 1000


def test_domain_mix_quotas_and_picks(spark):
    from tree_sitter_analyzer_spark.functions import md5int_py
    from tree_sitter_analyzer_spark.operators.packing import (
        MIX_TARGET, domain_mix_sample,
    )

    docs = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", "source")
        .toPandas()
    )
    w = {s: (md5int_py(s) % 9) + 1 for s in set(docs["source"])}
    wsum = sum(w.values())
    base = {s: MIX_TARGET * w[s] // wsum for s in w}
    rem = MIX_TARGET - sum(base.values())
    order = sorted(w, key=lambda s: (-(MIX_TARGET * w[s] % wsum), s))
    quota = dict(base)
    for s in order[:rem]:
        quota[s] += 1
    avail = Counter(docs["source"])
    expect_quota = {s: min(quota[s], avail[s]) for s in w}
    got = domain_mix_sample(
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
    ).toPandas()
    # composition matches the apportionment exactly
    assert Counter(got["source"]) == Counter(
        {s: q for s, q in expect_quota.items() if q > 0}
    )
    assert len(got) == sum(expect_quota.values())
    # picks per source are exactly the lowest-md5 docs
    for s, sub in got.groupby("source"):
        ids = sorted(
            (md5int_py(str(int(d))), int(d))
            for d in docs[docs["source"] == s]["doc_id"]
        )
        expect_ids = {d for _, d in ids[: expect_quota[s]]}
        assert set(sub["doc_id"].astype(int)) == expect_ids
        assert int(sub["quota"].iloc[0]) == expect_quota[s]
