"""Driver-contract tests: __spark_entry__ surface shape, every oracle
parses in DuckDB, entry() smoke."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

from .conftest import SF_TINY, register_views


def test_contract_shape():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_every_oracle_parses_in_duckdb(duck):
    """EXPLAIN each oracle — a binder/parse error here is exactly what
    would fail silently inside the driver's correctness gate."""
    register_views(duck, SF_TINY)
    for name, sql in E.oracle_sql().items():
        try:
            duck.sql("EXPLAIN " + sql)
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"oracle {name} failed to bind: {ex}")


def test_entry_runs_and_has_stable_schema(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "polygon_id", "zkind", "n_tiles", "n_distinct_phash",
        "n_jpeg", "sum_w", "max_h",
    ]
