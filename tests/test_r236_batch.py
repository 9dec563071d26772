"""R236-R238 batch: python replays + invariants for radiation_flows,
shapley_attribution, bpe_merges. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import itertools
from collections import Counter

from .conftest import SF_TINY, register_views

_PACK = 268_435_456


# --------------------------------------------------------------------- R236
def test_radiation_flows_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.operators.trajectory import (
        pings_oracle_cte,
    )
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH {pings_oracle_cte()} "
        "SELECT user_id, seq, ix // 32, iy // 32 FROM pings ORDER BY 1, 2"
    ).fetchall()
    mass: Counter = Counter()
    first: dict[int, int] = {}
    last: dict[int, int] = {}
    for uid, _seq, cx, cy in rows:
        cell = cx * _PACK + cy
        mass[cell] += 1
        first.setdefault(uid, cell)
        last[uid] = cell
    od: Counter = Counter()
    for uid in first:
        if first[uid] != last[uid]:
            od[(first[uid], last[uid])] += 1
    t_i: Counter = Counter()
    for (o, _d), n in od.items():
        t_i[o] += n

    def coords(cell: int) -> tuple[int, int]:
        return cell // _PACK, cell % _PACK

    out = load_all()["radiation_flows"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(od) > 0
    for r in out.itertuples():
        o, d = int(r.origin_cell), int(r.dest_cell)
        ox, oy = coords(o)
        dx, dy = coords(d)
        d2 = (ox - dx) ** 2 + (oy - dy) ** 2
        s_ij = sum(
            m
            for k, m in mass.items()
            if k not in (o, d)
            and (coords(k)[0] - ox) ** 2 + (coords(k)[1] - oy) ** 2 < d2
        )
        assert int(r.n_obs) == od[(o, d)]
        assert int(r.t_i) == t_i[o]
        assert int(r.m_i) == mass[o]
        assert int(r.n_j) == mass[d]
        assert int(r.d2) == d2
        assert int(r.s_ij) == s_ij
        m_i, n_j = mass[o], mass[d]
        pred = ((1_000_000 * t_i[o] * m_i) // (m_i + s_ij)) * n_j // (
            m_i + n_j + s_ij
        )
        assert int(r.pred_micro) == pred
        assert pred >= 0
    # the model must discriminate: predictions are not all equal
    assert out.pred_micro.nunique() > 1


# --------------------------------------------------------------------- R237
_BITS = {"click": 1, "error": 2, "signup": 4, "view": 8}


def test_shapley_attribution_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    ev = duck.sql(
        "SELECT user_id, ts, event_type FROM events ORDER BY user_id, ts"
    ).fetchall()
    conv_ts: dict[int, object] = {}
    for uid, ts, et in ev:
        if et == "purchase" and (uid not in conv_ts or ts < conv_ts[uid]):
            conv_ts[uid] = ts
    masks: Counter = Counter()
    touched: dict[str, set] = {c: set() for c in _BITS}
    for uid in conv_ts:
        m = 0
        for vuid, ts, et in ev:
            if vuid == uid and et != "purchase" and ts < conv_ts[uid]:
                m |= _BITS[et]
                touched[et].add(uid)
        masks[m] += 1

    def v(s: int) -> int:
        return sum(n for m, n in masks.items() if m & s == m)

    import math

    k = 4
    phi: dict[str, int] = {}
    for c, b in _BITS.items():
        num = 0
        for s in range(16):
            if s & b:
                continue
            w = math.factorial(bin(s).count("1")) * math.factorial(
                k - 1 - bin(s).count("1")
            )
            num += w * (v(s | b) - v(s))
        phi[c] = num

    out = load_all()["shapley_attribution"].spark_fn(spark, SF_TINY).toPandas()
    assert set(out.channel) == set(_BITS)
    for r in out.itertuples():
        assert int(r.phi_num) == phi[r.channel]
        assert int(r.n_touched) == len(touched[r.channel])
        assert int(r.phi_micro) == (1_000_000 * phi[r.channel]) // 24
        assert int(r.phi_num) >= 0  # v is monotone, so every phi >= 0
    # Shapley efficiency: sum phi = v(full) - v(empty)
    assert int(out.phi_num.sum()) == 24 * (v(15) - v(0))


# --------------------------------------------------------------------- R238
def _bpe_replay(wt: Counter, rounds: int):
    reps = {w: tuple(w) for w in wt}
    merges = []
    for _ in range(rounds):
        pc: Counter = Counter()
        for w, syms in reps.items():
            f = wt[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (lft, rgt), cnt = best
        merges.append((lft, rgt, lft + rgt, cnt))
        for w, syms in reps.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lft
                    and syms[i + 1] == rgt
                ):
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            reps[w] = tuple(out)
    return merges


def test_bpe_merges_matches_textbook_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    words = duck.sql(
        "SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))"
        " FROM documents"
    ).fetchall()
    wt = Counter(w for (w,) in words)
    # delimiter safety: '_' must never occur in the corpus vocabulary
    assert all("_" not in w for w in wt)
    want = _bpe_replay(wt, 6)

    out = (
        load_all()["bpe_merges"]
        .spark_fn(spark, SF_TINY)
        .toPandas()
        .sort_values("merge_rank", ignore_index=True)
    )
    assert len(out) == 6
    got = [
        (r.lft, r.rgt, r.merged, int(r.pair_count)) for r in out.itertuples()
    ]
    assert got == want
    # counts are non-increasing is NOT guaranteed (merged symbols can
    # recombine), but every count must be positive
    assert all(c > 0 for *_x, c in got)
