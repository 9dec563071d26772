"""Per-round hygiene sweep (CLAUDE.md): run EVERY registered query at the
driver's gate scale (sf0.01), compare against its DuckDB oracle the way
the driver does (sorted columns, aligned dtypes, exact values), and flag
vacuous results — a query that returns 0 rows at the gate passes parity
vacuously and hides bugs (the interval_join lesson).

Usage: python tests/sweep_sf001.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

# `python tests/sweep_sf001.py` puts tests/ on sys.path, not the repo root
# where __spark_entry__ lives.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from tree_sitter_analyzer_spark.registry import load_all
    from tree_sitter_analyzer_spark.session import get_spark

    # Guard (round-2 lesson: degree_histogram landed after the final sweep
    # and had no sweep row): the sweep MUST cover every registered query —
    # a missing row means a stale __spark_entry__ import or a half-wired
    # registration, and the artifact would otherwise overstate coverage.
    registered = set(load_all())
    swept = set(entry.queries())
    assert swept == registered, (
        f"sweep does not cover the registry: missing={sorted(registered - swept)} "
        f"extra={sorted(swept - registered)}"
    )

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    queries, oracles = entry.queries(), entry.oracle_sql()
    failures, vacuous = [], []
    for i, (name, fn) in enumerate(queries.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as exc:
            failures.append((name, f"spark error: {exc}"))
            print(f"{i:3d} {name:28s} SPARK-ERROR {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            tag = "rows-only"
            ok = True
        else:
            odf = con.sql(oracles[name]).df()
            cols = sorted(sdf.columns)
            err = None
            try:
                # Dtype-strict gate (round-4 verdict #2): the driver hashes
                # values WITHOUT coercion, so an oracle column landing as a
                # different numpy KIND than Spark's (HUGEINT→float64 vs
                # int64) is a driver hash-fail even when values are equal.
                # Assert kind equality BEFORE the astype (which remains only
                # to align within-kind units, e.g. datetime64[us] vs [ns]).
                kind_skew = [
                    f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
                    for c in cols
                    if sdf[c].dtype.kind != odf[c].dtype.kind
                ]
                if kind_skew:
                    raise AssertionError(f"oracle dtype skew {kind_skew}")
                s = sdf[cols].sort_values(cols).reset_index(drop=True)
                o = (
                    odf[cols]
                    .sort_values(cols)
                    .reset_index(drop=True)
                    .astype(s.dtypes.to_dict())
                )
                ok = s.equals(o) and len(s) == len(o)
            except Exception as exc:
                ok = False
                err = f"compare error: {exc}"
            tag = "ok" if ok else "MISMATCH"
            if not ok:
                failures.append((name, err or "value mismatch"))
        if len(sdf) == 0:
            vacuous.append(name)
            tag += " VACUOUS"
        print(f"{i:3d} {name:28s} {tag:12s} rows={len(sdf):7d} {dt:6.1f}s")
    print(
        f"\n{len(queries)} queries swept == {len(registered)} registered; "
        f"failures={failures}; vacuous={vacuous}"
    )
    return 1 if failures or vacuous else 0


if __name__ == "__main__":
    raise SystemExit(main())
