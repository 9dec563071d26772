"""R212-R214 batch: python/numpy replays + invariants for
knn_label_noise, cluster_validity, rater_kappa. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

import math

from .conftest import SF_TINY, register_views


def _sigs_and_vecs(duck):
    """(vec_id -> (sig, qv, label)) using only the signature SQL pieces
    (the python replay consumes them; the kNN/vote logic is replayed in
    pure python)."""
    from tree_sitter_analyzer_spark.functions import md5int_duck
    from tree_sitter_analyzer_spark.operators.similarity import (
        _QVEC_DUCK, N_PLANES,
    )

    register_views(duck, SF_TINY)
    parts = []
    for p in range(N_PLANES):
        h = md5int_duck(f"'p{p}_' || d")
        parts.append(f"sum(CASE WHEN {h} % 2 = 0 THEN qx ELSE -qx END) AS c{p}")
    comps = ", ".join(parts)
    sig = " + ".join(
        f"(CASE WHEN c{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(N_PLANES)
    )
    rows = duck.sql(f"""
WITH ex AS (
  SELECT vec_id, unnest({_QVEC_DUCK}) AS qx,
         unnest(generate_series(0, len(embedding) - 1)) AS d
  FROM embeddings),
comps AS (SELECT vec_id, {comps} FROM ex GROUP BY vec_id),
sigs AS (SELECT vec_id, {sig} AS sig FROM comps)
SELECT s.vec_id, s.sig, {_QVEC_DUCK} AS qv, e.label
FROM sigs s JOIN embeddings e ON e.vec_id = s.vec_id
""").fetchall()
    return {int(v): (int(s), [int(x) for x in qv], int(lb))
            for v, s, qv, lb in rows}


# --------------------------------------------------------------------- R212
def test_knn_label_noise_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.similarity import (
        VOTE_K, VOTE_MAX_HAMMING,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    data = _sigs_and_vecs(duck)
    ids = sorted(data)
    norm = {i: sum(x * x for x in data[i][1]) for i in ids}
    votes = {}
    for i in ids:
        sig_i, qi, _ = data[i]
        cands = []
        for j in ids:
            if j == i:
                continue
            sig_j, qj, _ = data[j]
            if bin(sig_i ^ sig_j).count("1") > VOTE_MAX_HAMMING:
                continue
            dot = sum(a * b for a, b in zip(qi, qj))
            cm = math.floor(1e6 * dot / math.sqrt(norm[i] * norm[j]))
            cands.append((-cm, j))
        cands.sort()
        top = [j for _, j in cands[:VOTE_K]]
        if not top:
            votes[i] = -1
            continue
        cnt: dict[int, int] = {}
        for j in top:
            cnt[data[j][2]] = cnt.get(data[j][2], 0) + 1
        votes[i] = min(cnt, key=lambda lb: (-cnt[lb], lb))
    want: dict[tuple[int, int], int] = {}
    for i in ids:
        key = (data[i][2], votes[i])
        want[key] = want.get(key, 0) + 1

    out = load_all()["knn_label_noise"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (int(r.own_label), int(r.voted_label)): int(r.n_points)
        for r in out.itertuples()
    }
    assert got == want
    assert sum(got.values()) == len(ids)  # every point accounted for


# --------------------------------------------------------------------- R213
def test_cluster_validity_matches_integer_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    data = _sigs_and_vecs(duck)
    groups: dict[int, list[list[int]]] = {}
    for i, (_, qv, lb) in data.items():
        groups.setdefault(lb, []).append(qv)
    d = len(next(iter(data.values()))[1])
    n = len(data)
    k = len(groups)
    ssq = sum(sum(x * x for x in qv) for _, qv, _ in data.values())
    gsum_milli = 0
    for qvs in groups.values():
        s = [sum(qv[j] for qv in qvs) for j in range(d)]
        gsum_milli += (1000 * sum(x * x for x in s)) // len(qvs)
    glob = [sum(qv[j] for _, qv, _ in data.values()) for j in range(d)]
    sn = sum(x * x for x in glob)
    b_milli = gsum_milli - (1000 * sn) // n
    w_milli = 1000 * ssq - gsum_milli
    ch_milli = (1000 * b_milli * (n - k)) // (w_milli * (k - 1))

    out = load_all()["cluster_validity"].spark_fn(spark, SF_TINY).toPandas()
    row = out[out.partitioning == "labels"].iloc[0]
    assert (int(row.n), int(row.k), int(row.ssq_q)) == (n, k, ssq)
    assert int(row.b_milli) == b_milli
    assert int(row.w_milli) == w_milli
    assert int(row.ch_milli) == ch_milli
    # the geometric partition must out-score the (random) label column,
    # and the label column must sit at the CH null (~1.0)
    ivf = out[out.partitioning == "ivf16"].iloc[0]
    assert int(ivf.ch_milli) > int(row.ch_milli)
    assert 500 <= int(row.ch_milli) <= 2000


# --------------------------------------------------------------------- R214
def test_rater_kappa_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT n_chars,"
        " len(list_filter(string_split(text, ' '), x -> x <> ''))"
        " FROM documents"
    ).fetchall()

    def ga(nc):
        return "A" if nc >= 450 else "B" if nc >= 300 else "C" if nc >= 150 else "D"

    def gb(wc):
        return "A" if wc >= 80 else "B" if wc >= 55 else "C" if wc >= 27 else "D"

    conf: dict[tuple[str, str], int] = {}
    for nc, wc in rows:
        key = (ga(int(nc)), gb(int(wc)))
        conf[key] = conf.get(key, 0) + 1
    n = sum(conf.values())
    diag = sum(v for (a, b), v in conf.items() if a == b)
    grades = sorted({a for a, _ in conf} | {b for _, b in conf})
    pe_num = sum(
        sum(v for (a, _), v in conf.items() if a == g)
        * sum(v for (_, b), v in conf.items() if b == g)
        for g in grades
    )
    kappa = math.floor(1000.0 * (n * diag - pe_num) / (n * n - pe_num))

    out = load_all()["rater_kappa"].spark_fn(spark, SF_TINY).toPandas()
    got = {(r.grade_a, r.grade_b): int(r.n) for r in out.itertuples()}
    assert got == conf
    assert int(out.iloc[0].n_total) == n
    assert int(out.iloc[0].kappa_milli) == kappa
    assert int(out.iloc[0].po_milli) == math.floor(1000.0 * diag / n)
    # chance-corrected: kappa strictly below raw agreement
    assert int(out.iloc[0].kappa_milli) < int(out.iloc[0].po_milli)
