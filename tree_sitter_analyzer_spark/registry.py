"""Named query library — the engine's predefined-query surface.

Mirrors the reference's named tree-sitter query library
(``queries/python.py``, ``query_loader.py:83-257``, SURVEY.md X2): every
implemented operator is exposed as a named entry with (a) a Spark builder
``(spark, sf_dir) -> DataFrame`` and (b) an equivalent DuckDB oracle SQL
string over the same parquet views. The driver's correctness gate runs
both sides and hash-compares.

Column-name contract: Spark output and oracle output must carry identical
column names (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, doc: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query-defining module (side-effect registration)."""
    from . import queries_spatial  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_graph  # noqa: F401

    return REGISTRY
