"""Regression guard for the oracle-dtype bug class (round-4 verdict #2).

The driver hashes pandas values without dtype coercion; DuckDB HUGEINT /
DECIMAL outputs land as float64/object and hash-red against Spark int64
even when value-equal (the r1->r3 gate slide).  This test re-runs the
static planner-type audit (no jobs executed on either engine) over the
FINAL registered oracle strings — i.e. after registry._ORACLE_CASTS
normalization — so any new HUGEINT-emitting oracle fails CI immediately.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_dtype_audit import audit  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_no_oracle_dtype_violations():
    violations = audit(SF)
    assert not violations, (
        "oracle output dtypes diverge from Spark (driver hash hazard); "
        "add CASTs in the oracle SQL or registry._ORACLE_CASTS: "
        + "; ".join(f"{n}.{c} spark={s} duckdb={o}"
                    for n, c, s, o in violations)
    )
