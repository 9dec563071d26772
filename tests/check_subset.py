"""Driver-style side-by-side for a SUBSET of registered queries — the
per-batch verification loop (sf0.001 then sf0.01) without paying for a
full sweep. Same compare as tests/sweep_sf001.py.

Usage: python tests/check_subset.py q1 [q2 ...] [--sf DIR ...]
       (default sf dirs: /root/testdata/sf0.001 and /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    names, sfs, it = [], [], iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            names.append(a)
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    import __spark_entry__ as entry
    from tree_sitter_analyzer_spark.session import get_spark

    queries, oracles = entry.queries(), entry.oracle_sql()
    unknown = [n for n in names if n not in queries]
    assert not unknown, f"not registered: {unknown}"

    spark = get_spark(cpus=8)
    bad = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        for name in names:
            t0 = time.time()
            sdf = queries[name](spark, sf).toPandas()
            dt = time.time() - t0
            if name not in oracles:
                tag = "rows-only"
            else:
                odf = con.sql(oracles[name]).df()
                cols = sorted(sdf.columns)
                s = sdf[cols].sort_values(cols).reset_index(drop=True)
                o = (
                    odf[cols]
                    .sort_values(cols)
                    .reset_index(drop=True)
                    .astype(s.dtypes.to_dict())
                )
                tag = "ok" if (s.equals(o) and len(s) == len(o)) else "MISMATCH"
            if len(sdf) == 0:
                tag += " VACUOUS"
            if tag != "ok" and tag != "rows-only":
                bad += 1
            print(f"{sf.split('/')[-1]:8s} {name:28s} {tag:12s} "
                  f"rows={len(sdf):7d} {dt:6.1f}s")
        con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
