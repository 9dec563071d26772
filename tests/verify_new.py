"""Ad-hoc driver-style check of newly added queries at sf0.001 + sf0.01.

Usage: python tests/verify_new.py name1 name2 ...
Runs each query's Spark side AND DuckDB oracle, compares sorted values
exactly (the conftest discipline), prints row counts per SF.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb

from conftest import assert_frames_match, register_views
from tree_sitter_analyzer_spark.registry import load_all
from tree_sitter_analyzer_spark.session import get_spark


def main(names: list[str]) -> int:
    qs = load_all()
    spark = get_spark(cpus=8)
    bad = 0
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        duck = duckdb.connect()
        register_views(duck, sf)
        for name in names:
            q = qs[name]
            sdf = q.spark_fn(spark, sf).toPandas()
            if q.oracle is None:
                print(f"{sf} {name}: rows-only rows={len(sdf)}")
                continue
            odf = duck.sql(q.oracle).df()
            try:
                assert_frames_match(sdf, odf, name)
                status = "ok"
            except AssertionError as e:
                status = f"MISMATCH: {e}"
                bad += 1
            print(f"{sf} {name}: rows={len(sdf)} oracle_rows={len(odf)} {status}")
            if len(sdf) == 0:
                print(f"  WARNING: vacuous at {sf}")
    return bad


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
