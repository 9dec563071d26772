"""R220-R222 batch: python replays + invariants for snapshot_expiry,
selectivity_qerror, tcloseness_audit. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY, register_views


# --------------------------------------------------------------------- R220
def test_snapshot_expiry_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT doc_id // 16, CAST(sum(n_chars) AS BIGINT)"
        " FROM documents GROUP BY 1"
    ).fetchall()

    def life(f):
        return 1 + ((((f % 2147483647) * 48271 % 2147483647 + 999983)
                     * 69621 % 2147483647) % 6)

    want: dict[tuple[int, str], list[int]] = {}
    for f, b in rows:
        f, b = int(f), int(b)
        added = f % 7
        status = "retained" if added + life(f) > 6 else "orphan"
        cur = want.setdefault((added, status), [0, 0])
        cur[0] += 1
        cur[1] += b
    out = load_all()["snapshot_expiry"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (int(r.added_at), r.status): [int(r.n_files), int(r.bytes)]
        for r in out.itertuples()
    }
    assert got == want
    # conservation: every file lands in exactly one class
    assert sum(v[0] for v in got.values()) == len(rows)
    # a file added in a retained snapshot is retained by definition
    for (added, status) in got:
        if added > 6:
            assert status == "retained"


# --------------------------------------------------------------------- R221
def test_selectivity_qerror_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.queries_relational import _QE_WORKLOAD
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = sorted(duck.sql(
        "SELECT CAST(floor(o_totalprice * 100e0) AS BIGINT), o_orderkey"
        " FROM orders"
    ).fetchall())
    cents = [int(c) for c, _ in rows]
    # replicate ntile(8): first (n % 8) buckets get the extra row
    n = len(cents)
    sz, extra = divmod(n, 8)
    buckets, pos = [], 0
    for b in range(8):
        take = sz + (1 if b < extra else 0)
        chunk = cents[pos : pos + take]
        buckets.append((min(chunk), max(chunk), len(chunk)))
        pos += take

    out = load_all()["selectivity_qerror"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        int(r.qid): (int(r.act_rows), int(r.est_milli), int(r.qerr_milli))
        for r in out.itertuples()
    }
    for qid, qlo, qhi in _QE_WORKLOAD:
        act = sum(1 for c in cents if qlo <= c <= qhi)
        est = sum(
            (1000 * rb * max(min(hi, qhi) - max(lo, qlo) + 1, 0))
            // (hi - lo + 1)
            for lo, hi, rb in buckets
            if hi >= qlo and lo <= qhi
        )
        qerr = (1000 * max(est, 1000 * act)) // max(min(est, 1000 * act), 1)
        assert got[qid] == (act, est, qerr)
    # the empty range estimates 0; the full range is exact (q-error 1.0)
    assert got[5] == (0, 0, 0)
    assert got[6][0] == n and got[6][2] == 1000


# --------------------------------------------------------------------- R222
def test_tcloseness_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.textstats import text_stats
    from tree_sitter_analyzer_spark.registry import load_all

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    grades = {
        int(r.doc_id): r.grade
        for r in text_stats(docs).select("doc_id", "grade")
        .toPandas().itertuples()
    }
    register_views(duck, SF_TINY)
    meta = duck.sql(
        "SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) // 128"
        " FROM documents"
    ).fetchall()
    cell: dict[tuple, dict[str, int]] = {}
    glob: dict[str, int] = {}
    for d, lang, src, band in meta:
        g = grades[int(d)]
        key = (lang, src, int(band))
        cell.setdefault(key, {})[g] = cell.setdefault(key, {}).get(g, 0) + 1
        glob[g] = glob.get(g, 0) + 1
    nn = sum(glob.values())
    want = {}
    for key, h in cell.items():
        n = sum(h.values())
        term = sum(abs(h.get(g, 0) * nn - m * n) for g, m in glob.items())
        tv = (1000 * term) // (2 * n * nn)
        want[key] = (n, tv, 1 if tv <= 200 else 0)

    out = load_all()["tcloseness_audit"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (r.lang, r.source, int(r.len_band)): (
            int(r.n), int(r.tv_milli), int(r.t_ok),
        )
        for r in out.itertuples()
    }
    assert got == want
    # TV is a metric bounded by 1
    assert all(0 <= v[1] <= 1000 for v in got.values())
