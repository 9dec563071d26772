"""R248-R250 batch: python replays + invariants for poisson_bootstrap,
jackknife_blocks, capture_recapture. Oracle parity rides
test_oracle_parity."""

from __future__ import annotations

import math
from collections import defaultdict

from tree_sitter_analyzer_spark.functions import md5int_py

from .conftest import SF_TINY, register_views

# floor(cum_k * 2^32) for Poisson(1) inverse-CDF, k = 0..6 (else 7) —
# the same literals embedded in the SQL.
_TH = [
    1580030168, 3160060337, 3950075421, 4213413783,
    4279248373, 4292415291, 4294609777,
]


def _pois(u: int) -> int:
    for k, t in enumerate(_TH):
        if u < t:
            return k
    return 7


def _isqrt_exact(v: int) -> int:
    s0 = math.floor(math.sqrt(float(v)))
    if (s0 + 1) * (s0 + 1) <= v:
        return s0 + 1
    if s0 * s0 > v:
        return s0 - 1
    return s0


def _lineitem(duck):
    register_views(duck, SF_TINY)
    return duck.sql(
        "SELECT l_returnflag, l_orderkey, l_linenumber, "
        "CAST(floor(l_extendedprice * (1e0 - l_discount) * 100e0)"
        " AS BIGINT) FROM lineitem"
    ).fetchall()


# --------------------------------------------------------------------- R248
def test_poisson_bootstrap_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    rows = _lineitem(duck)
    reps: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    base: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for flag, ok, ln, cents in rows:
        base[flag][0] += 1
        base[flag][1] += cents
        for b in range(64):
            w = _pois(md5int_py(f"{ok}-{ln}|{b}"))
            reps[(flag, b)][0] += w
            reps[(flag, b)][1] += w * cents
    means: dict[str, list[int]] = defaultdict(list)
    for (flag, _), (sw, swc) in sorted(reps.items()):
        if sw > 0:
            means[flag].append(swc // sw)

    out = (
        load_all()["poisson_bootstrap"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert set(out.flag) == set(base)
    for r in out.itertuples():
        ms = means[r.flag]
        bn = len(ms)
        var = (bn * sum(m * m for m in ms) - sum(ms) ** 2) // (
            bn * (bn - 1)
        )
        n, s = base[r.flag]
        assert int(r.n_rows) == n
        assert int(r.mean_cents_milli) == (1000 * s) // n
        assert int(r.n_reps) == bn == 64
        assert int(r.rep_min_cents) == min(ms)
        assert int(r.rep_max_cents) == max(ms)
        assert int(r.boot_se_cents) == _isqrt_exact(var)
        # the bootstrap SE of a mean over thousands of rows is tiny
        # relative to the mean itself
        assert 0 < int(r.boot_se_cents) * 20 < int(r.mean_cents_milli)
        # replicate means bracket the point mean
        pm = int(r.mean_cents_milli) // 1000
        assert int(r.rep_min_cents) <= pm <= int(r.rep_max_cents)


# --------------------------------------------------------------------- R249
def test_jackknife_blocks_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    rows = _lineitem(duck)
    blk: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for _, ok, _, cents in rows:
        blk[ok % 10][0] += 1
        blk[ok % 10][1] += cents
    n = sum(v[0] for v in blk.values())
    s = sum(v[1] for v in blk.values())
    g = len(blk)
    loo_c = {b: (s - si) // (n - ni) for b, (ni, si) in blk.items()}
    var = (
        (g - 1)
        * (g * sum(x * x for x in loo_c.values())
           - sum(loo_c.values()) ** 2)
    ) // (g * g)
    se = _isqrt_exact(var)
    mean_milli = (1000 * s) // n

    out = (
        load_all()["jackknife_blocks"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert len(out) == g == 10
    for r in out.itertuples():
        b = int(r.blk)
        ni, si = blk[b]
        loo_m = (1000 * (s - si)) // (n - ni)
        assert int(r.n_i) == ni
        assert int(r.loo_milli) == loo_m
        assert int(r.pseudo_milli) == g * mean_milli - (g - 1) * loo_m
        assert int(r.mean_cents_milli) == mean_milli
        assert int(r.jk_se_cents) == se
    # pseudo-values average back to roughly the overall mean (exact
    # only for equal block sizes; orderkey%10 blocks are merely close,
    # so pin a tight relative band instead of the identity)
    ps = sum(int(r) for r in out.pseudo_milli)
    assert abs(ps - g * mean_milli) <= (g * mean_milli) // 1000


# --------------------------------------------------------------------- R250
def test_capture_recapture_matches_brute_force(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT doc_id, source, text FROM documents"
    ).fetchall()
    seen: dict[str, dict[str, list[bool]]] = defaultdict(
        lambda: defaultdict(lambda: [False, False])
    )
    for did, src, text in rows:
        for tok in text.split(" "):
            if tok:
                seen[src][tok][did % 2] = True

    out = (
        load_all()["capture_recapture"].spark_fn(spark, SF_TINY).toPandas()
    )
    assert set(out.source) == set(seen)
    for r in out.itertuples():
        toks = seen[r.source]
        n1 = sum(1 for v in toks.values() if v[0])
        n2 = sum(1 for v in toks.values() if v[1])
        m = sum(1 for v in toks.values() if v[0] and v[1])
        chap = (n1 + 1) * (n2 + 1) // (m + 1) - 1
        assert int(r.n_types) == len(toks)
        assert int(r.n1) == n1 and int(r.n2) == n2 and int(r.m) == m
        assert int(r.chapman) == chap
        assert int(r.seen_milli) == (1000 * len(toks)) // chap
        # the estimate is sane: at least the overlap count, and the
        # observed vocabulary never exceeds ~the estimate by much
        # (floors can put chapman a hair under n_types)
        assert chap >= m
        assert int(r.seen_milli) <= 1100
