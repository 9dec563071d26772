"""Gate preflight (round-4 verdict #6): run exactly the 50 GATE_ORDER
entries through a driver-identical compare at the driver's scale (sf0.01)
BEFORE the driver does, and write the result to GATE_PREFLIGHT.json.

Driver semantics replicated here (inferred from three rounds of
CORRECTNESS_r*.json behavior):
  - rows_match:   row counts equal
  - schema_match: sorted column-name sets equal
  - hash_match:   hash over the row-sorted values converted to PYTHON
                  objects (``.values.tolist()`` — so int32(5) == int64(5),
                  proven benign by chain_ladder/gale_shapley gate-greens,
                  but float64(3.0) != int(3), the HUGEINT failure mode)
  - entries with no oracle record err="no_oracle" (counts as not-passing
    at the driver — keep such slots to a minimum, verdict #3)

Usage: python tests/gate_preflight.py [sf_dir]
Exit 0 = all 50 slots green; 1 otherwise.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df) -> str:
    cols = sorted(df.columns)
    rows = df[cols].sort_values(cols).values.tolist()
    return hashlib.sha256(repr(rows).encode()).hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from tree_sitter_analyzer_spark.registry import GATE_ORDER
    from tree_sitter_analyzer_spark.session import get_spark

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    queries, oracles = entry.queries(), entry.oracle_sql()
    assert len(GATE_ORDER) >= 50, f"GATE_ORDER has {len(GATE_ORDER)} < 50"
    results: dict[str, dict] = {}
    n_green = 0
    for name in GATE_ORDER[:50]:
        t0 = time.time()
        rec: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            sdf = queries[name](spark, sf).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as exc:
            rec["err"] = f"spark: {exc}"
            results[name] = rec
            print(f"{name:30s} SPARK-ERROR {exc}")
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            results[name] = rec
            print(f"{name:30s} no_oracle rows={len(sdf)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            rec["err"] = f"oracle: {exc}"
            results[name] = rec
            print(f"{name:30s} ORACLE-ERROR {exc}")
            continue
        rec["oracle_rows"] = len(odf)
        rec["rows_match"] = len(sdf) == len(odf)
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        rec["hash_match"] = (
            rec["schema_match"] and value_hash(sdf) == value_hash(odf)
        )
        green = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        n_green += bool(green)
        vac = " VACUOUS" if len(sdf) == 0 else ""
        tag = "green" if green else "RED"
        print(f"{name:30s} {tag}{vac} rows={len(sdf)} "
              f"({time.time() - t0:.1f}s)")
        results[name] = rec
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GATE_PREFLIGHT.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\n{n_green}/50 green -> {out}")
    return 0 if n_green == 50 else 1


if __name__ == "__main__":
    raise SystemExit(main())
