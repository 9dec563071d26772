"""Seeded property tests for the round-2 primitives: each checks the
Spark operator against an independent local oracle on randomized inputs
(fixed seeds — deterministic CI, multiple draws per property)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from tree_sitter_analyzer_spark.operators.dedup import band_layout


@pytest.mark.parametrize("bits,bands", [(12, 5), (16, 4), (32, 4), (13, 6), (8, 8)])
def test_band_layout_partitions_bits(bits, bands):
    """Bands are disjoint, cover exactly [0, bits), widths differ ≤1."""
    layout = band_layout(bits, bands)
    assert len(layout) == bands
    covered = []
    for shift, width in layout:
        assert width >= 1
        covered.extend(range(shift, shift + width))
    assert covered == list(range(bits))
    widths = [w for _, w in layout]
    assert max(widths) - min(widths) <= 1


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    """asof_join_latest == pd.merge_asof(direction='backward') on random
    keyed event streams (unique right timestamps per key, as the operator
    contract requires)."""
    from tree_sitter_analyzer_spark.operators.range_join import asof_join_latest

    rng = random.Random(seed)
    left_rows = [
        (k, rng.randint(0, 1000), i)
        for i, k in enumerate(rng.choices(range(5), k=60))
    ]
    right_ts = {(k, t) for k in range(5) for t in rng.sample(range(1000), 25)}
    right_rows = [(k, t, 10_000 + j) for j, (k, t) in enumerate(sorted(right_ts))]

    left = spark.createDataFrame(left_rows, "k BIGINT, ts BIGINT, lid BIGINT")
    right = spark.createDataFrame(right_rows, "k BIGINT, ts BIGINT, rid BIGINT")
    got = {
        (r["lid"]): (r["r_rid"], r["r_ts"])
        for r in asof_join_latest(left, right, key="k").collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "ts", "lid"]).sort_values("ts")
    rp = (
        pd.DataFrame(right_rows, columns=["k", "rts", "rid"]).sort_values("rts")
    )
    merged = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k", direction="backward"
    )
    want = {
        int(row.lid): (int(row.rid), int(row.rts))
        for row in merged.itertuples()
        if pd.notna(row.rid)
    }
    # merge_asof keeps unmatched lefts as NaN; the operator is inner —
    # compare the matched set exactly
    assert {k: (v[0], v[1]) for k, v in got.items()} == {
        k: (v[0], v[1]) for k, v in want.items()
    }
    assert len(got) > 0


def test_asof_join_null_right_columns_never_splice(spark):
    """A NULL in one right column must not splice field values from two
    different right rows (the per-column-window hazard): the carried row
    is the latest right row AS A WHOLE, nulls included."""
    from tree_sitter_analyzer_spark.operators.range_join import asof_join_latest

    left = spark.createDataFrame([(1, 3, 100)], "k BIGINT, ts BIGINT, lid BIGINT")
    right = spark.createDataFrame(
        [(1, 1, None, 7), (1, 2, 3, None)],
        "k BIGINT, ts BIGINT, a BIGINT, b BIGINT",
    )
    rows = asof_join_latest(left, right, key="k").collect()
    assert len(rows) == 1
    r = rows[0]
    # latest right row is (ts=2, a=3, b=NULL) — b must be NULL, not 7
    assert r["r_ts"] == 2 and r["r_a"] == 3 and r["r_b"] is None


def test_raycast_predicate_matches_python_reference(spark):
    """The SQL even-odd ray-cast predicate == a pure-python even-odd
    implementation on a dense probe grid over the star zones, and the
    stars are GENUINELY concave: some probe points lie inside the convex
    hull but outside the polygon (where the half-plane test would be
    wrong)."""
    from tree_sitter_analyzer_spark import synth

    zones = synth.star_zones_df(spark).limit(3).collect()
    k = synth._STAR_K

    def inside_py(px, py, z):
        cnt = 0
        for m in range(k):
            n = (m + 1) % k
            x1, y1, x2, y2 = z[f"x{m}"], z[f"y{m}"], z[f"x{n}"], z[f"y{n}"]
            if (y1 > py) != (y2 > py):
                lhs = (px - x1) * (y2 - y1)
                rhs = (py - y1) * (x2 - x1)
                if (lhs < rhs) if y2 > y1 else (lhs > rhs):
                    cnt += 1
        return cnt % 2 == 1

    notch_found = False
    for z in zones:
        xs = [z[f"x{m}"] for m in range(k)]
        ys = [z[f"y{m}"] for m in range(k)]
        # probe grid centered on the CENTROID so the 20x20 grid densely
        # covers the star (vertex-0-centered grids miss half the shape)
        cx, cy = sum(xs) / k, sum(ys) / k
        probes = [
            (cx + (max(xs) - min(xs)) * (i / 19.0 - 0.5),
             cy + (max(ys) - min(ys)) * (j / 19.0 - 0.5))
            for i in range(20)
            for j in range(20)
        ]
        pdf = spark.createDataFrame(probes, "lon DOUBLE, lat DOUBLE")
        zrow = spark.createDataFrame([z.asDict()])
        got = {
            (r["lon"], r["lat"]): r["inside"]
            for r in pdf.crossJoin(zrow)
            .selectExpr(
                "lon", "lat",
                f"{synth.raycast_pip_predicate('lon', 'lat')} AS inside",
            )
            .collect()
        }
        for (px, py), inside_sql in got.items():
            assert inside_sql == inside_py(px, py, z), (px, py)
            # concavity: a point may be inside the hull-ish bbox center
            # region yet outside the star (the reflex notch)
            if not inside_sql:
                # crude hull proxy: inside the outer-vertex quadrilateral?
                outer = [(xs[m], ys[m]) for m in range(0, k, 2)]
                ox = [p[0] for p in outer]
                oy = [p[1] for p in outer]
                if min(ox) < px < max(ox) and min(oy) < py < max(oy):
                    notch_found = True
    assert notch_found, "no notch point — zones are not concave enough"


@pytest.mark.parametrize("seed,threshold", [(11, 500), (12, 300), (13, 700)])
def test_prefix_filter_jaccard_matches_bruteforce(spark, seed, threshold):
    """token_jaccard_pairs (prefix-filtered AllPairs) == brute-force
    python Jaccard on random corpora — the completeness lemma holds at
    every threshold, including corpora with shared hot tokens."""
    from tree_sitter_analyzer_spark.operators.dedup import token_jaccard_pairs

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)] + ["hot1", "hot2"]
    docs = []
    for i in range(36):
        words = set(rng.sample(vocab, rng.randint(3, 12)))
        if rng.random() < 0.7:
            words |= {"hot1", "hot2"}  # ubiquitous tokens
        docs.append((i, "en", " ".join(sorted(words))))
    # guarantee non-vacuous high-threshold pairs: near-dup clones of doc 0
    base = set(docs[0][2].split())
    docs.append((36, "en", " ".join(sorted(base))))
    docs.append((37, "en", " ".join(sorted(base | {"w0"}))))
    docs.append((38, "en", " ".join(sorted(base | {"w1", "w2"}))))
    docs.append((39, "en", " ".join(sorted(set(rng.sample(vocab, 6))))))

    sdf = spark.createDataFrame(docs, "doc_id BIGINT, lang STRING, text STRING")
    got = {
        (r["doc_a"], r["doc_b"]): r["jac_milli"]
        for r in token_jaccard_pairs(sdf, threshold).collect()
    }

    sets = {i: set(t.split()) for i, _, t in docs}
    want = {}
    for a in range(40):
        for b in range(a + 1, 40):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            jac = 1000 * inter // len(sets[a] | sets[b])
            if jac >= threshold:
                want[(a, b)] = jac
    assert got == want
    assert len(want) > 0, "seed produced no pairs — property vacuous"


def test_bfs_wide_frontier_shuffled_join_matches_broadcast(spark):
    """VERDICT r2 #10: bfs_khop's broadcast escape. A dense fan-out graph
    whose frontier exceeds the broadcast threshold must take the shuffled
    hash-join path and return byte-identical (v, depth) labels — the
    guard changes the physical join, never the traversal."""
    from pyspark.sql import functions as F

    from tree_sitter_analyzer_spark.operators.graph import bfs_khop

    # Star burst: 0 -> 1..800 (one hop makes the frontier 800 wide),
    # then i -> 801 + (i*7 % 400) collapses into a second shell, plus
    # back-edges into the first shell to exercise the visited anti-join.
    e1 = [(0, i) for i in range(1, 801)]
    e2 = [(i, 801 + (i * 7) % 400) for i in range(1, 801)]
    e3 = [(801 + j, 1 + (j * 13) % 800) for j in range(400)]
    edges = spark.createDataFrame(e1 + e2 + e3, "src BIGINT, dst BIGINT")

    def run(threshold):
        df = bfs_khop(spark, edges, [0], max_depth=4,
                      broadcast_threshold=threshold)
        return sorted((r["v"], r["depth"]) for r in df.collect())

    via_broadcast = run(10**6)  # frontier always under → broadcast path
    via_shuffle = run(16)       # 800-wide frontier busts it → shuffled
    assert via_shuffle == via_broadcast
    assert len(via_broadcast) == 1 + 800 + 400  # every vertex reached


def test_kcore_peel_converges_and_recovers_planted_block(spark):
    """The fixed 8-round unrolled peel must have CONVERGED (7 rounds ==
    8 rounds — otherwise the fixed depth would silently truncate the
    true k-core), and the k=8 core must be exactly the planted dense
    block: every survivor below CORE_BLOCK, every core degree >= k."""
    from tree_sitter_analyzer_spark.operators import graph as g

    edges = g.core_edges_df(spark)
    r8 = g.kcore(spark, edges, rounds=8).toPandas()
    r7 = g.kcore(spark, edges, rounds=7).toPandas()
    key = ["v", "core_deg"]
    assert sorted(map(tuple, r7[key].values.tolist())) == sorted(
        map(tuple, r8[key].values.tolist())
    )
    assert len(r8) > 0
    assert (r8.v < g.CORE_BLOCK).all()
    assert (r8.core_deg >= g.KCORE_K).all()
