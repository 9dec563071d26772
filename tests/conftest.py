"""Shared pytest fixtures: one SparkSession per test run + oracle harness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from tree_sitter_analyzer_spark.session import get_spark

    sp = get_spark(cpus=8, shuffle_partitions=8)
    yield sp
    sp.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for order-insensitive compare: sort columns by name,
    then rows by every column (mirrors the driver's value-hash compare)."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    a, b = canon(spark_pdf), canon(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == np.float64 or bv.dtype == np.float64:
            ok = np.allclose(
                av.astype(np.float64), bv.astype(np.float64), rtol=0, atol=0,
                equal_nan=True,
            )
        else:
            ok = (pd.isna(av) & pd.isna(bv)).all() or (
                (av == bv) | (pd.isna(av) & pd.isna(bv))
            ).all()
        assert ok, f"{name}: value mismatch in column {c}: {av[:5]} vs {bv[:5]}"
