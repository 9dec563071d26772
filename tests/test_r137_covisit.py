"""R137 covisit_topk: python pair-counting replay (from the visit sets)
plus structural invariants. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from .conftest import SF_TINY


def test_covisit_matches_python_replay(spark):
    from tree_sitter_analyzer_spark.operators.trajectory import (
        COVISIT_K, COVISIT_SHIFT, covisit_topk, pings_df,
    )

    visits = (
        pings_df(spark, SF_TINY)
        .selectExpr(
            "user_id",
            f"shiftright(ix, {COVISIT_SHIFT}) AS cx",
            f"shiftright(iy, {COVISIT_SHIFT}) AS cy",
        )
        .distinct()
        .toPandas()
    )
    by_user: dict = {}
    for r in visits.itertuples():
        by_user.setdefault(r.user_id, set()).add((int(r.cx), int(r.cy)))
    cooc: Counter = Counter()
    pop: Counter = Counter()
    for cells in by_user.values():
        pop.update(cells)
        for a, b in combinations(sorted(cells), 2):
            cooc[(a, b)] += 1
    recs: dict = {}
    for (a, b), c in cooc.items():
        for src, dst in ((a, b), (b, a)):
            sim = 1000 * c * c // (pop[src] * pop[dst])
            recs.setdefault(src, []).append(
                (-sim, -c, dst[0] * 1_048_576 + dst[1], dst, c, sim)
            )
    expected = {}
    for src, lst in recs.items():
        for rank, (_, _, _, dst, c, sim) in enumerate(sorted(lst)[:COVISIT_K],
                                                      start=1):
            expected[(src, rank)] = (dst, c, sim)

    got = covisit_topk(spark, SF_TINY).toPandas()
    assert len(got) == len(expected)
    for r in got.itertuples():
        dst, c, sim = expected[((int(r.cx), int(r.cy)), int(r.rank))]
        assert dst == (int(r.rcx), int(r.rcy))
        assert (int(r.cooc), int(r.sim_milli)) == (c, sim)
        # cooc can never exceed either endpoint's popularity
        assert c <= min(pop[(r.cx, r.cy)], pop[dst])
