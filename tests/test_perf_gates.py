"""Benchmarks as assertions (reference: tests/benchmarks — hard
wall-clock gates, SURVEY.md §5.6). Generous ceilings: these catch
order-of-magnitude regressions (an accidental cross join, a lost
broadcast), not jitter.
"""

from __future__ import annotations

import time

import pytest

from tree_sitter_analyzer_spark.registry import load_all

from .conftest import SF_TINY

# name → ceiling seconds at sf0.001 on local[8]
GATES = {
    "tile_manifest": 15.0,
    "pip_join": 15.0,
    "knn": 30.0,
    "zonal_stats": 15.0,
    "minhash_lsh": 30.0,
    "ann_cosine_topk": 15.0,
    "ingest_summary": 40.0,
    "bfs_khop": 45.0,
    # continuation-2 heavy queries: iterative loops and fans whose cheap
    # shape depends on staying quotient-sized — an accidental tile-level
    # fan or a lost broadcast blows these by an order of magnitude
    "quadtree_leaves": 20.0,
    "hilbert_layout": 30.0,
    "semivariogram": 15.0,
    "cross_k_pairs": 20.0,
    "isochrone_bands": 60.0,
    "cost_allocation": 60.0,
    "percolation_profile": 60.0,
    "epidemic_reach": 45.0,
    "line_of_sight": 20.0,
    "kcore_community": 60.0,
}


@pytest.mark.parametrize("name", sorted(GATES))
def test_query_under_ceiling(spark, name):
    q = load_all()[name]
    t0 = time.time()
    n = q.spark_fn(spark, SF_TINY).count()
    wall = time.time() - t0
    assert n >= 0
    assert wall < GATES[name], f"{name}: {wall:.1f}s ≥ {GATES[name]}s gate"
