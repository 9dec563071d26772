"""User-supplied SQL surface (SURVEY.md X3).

The reference executes user ``.scm`` query text through a safety layer
(literal-only parsing, ``_codegraph_query_dsl.py:245-300``). The Spark
analog: register the engine's tables as temp views and run user SQL
through ``spark.sql`` behind a statement-shape gate — SELECT-only, no
side-effecting commands, bounded result (LIMIT injected when absent), the
T5 capped-with-total contract.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .. import synth
from ..operators.pip_join import tile_cells

_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|merge|drop|create|alter|truncate|set|add|refresh)\b",
    re.IGNORECASE,
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose the engine's tables as temp views for ad-hoc SQL."""
    from ..operators.pip_join import pip_join

    synth.tiles_df(spark, sf_dir).createOrReplaceTempView("tiles")
    tile_cells(synth.tiles_df(spark, sf_dir), 9).createOrReplaceTempView(
        "tiles_indexed"
    )
    synth.zones_df(spark).createOrReplaceTempView("zones")
    synth.qpoints_df(spark).createOrReplaceTempView("qpoints")
    # The relationship table (the reference's unified `edges` store): PIP
    # join rows as a lazy view — computed only when a user query reads it.
    pip_join(
        synth.tiles_df(spark, sf_dir), synth.zones_df(spark), res=9
    ).select(
        "image_id", "polygon_id", "zkind", "tile_kind", "cell"
    ).createOrReplaceTempView("join_rows")
    for t in ("orders", "lineitem", "customer", "nation", "region",
              "documents", "embeddings", "events", "supplier", "part"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return [
        "tiles", "tiles_indexed", "zones", "qpoints", "join_rows", "orders",
        "lineitem", "customer", "nation", "region", "documents",
        "embeddings", "events", "supplier", "part",
    ]


def run_user_sql(
    spark: SparkSession, sql: str, max_rows: int = 2000
) -> dict[str, Any]:
    """Gated ad-hoc SQL with the capped-plus-total envelope (T5).

    Rejects non-SELECT statements; truncates to ``max_rows`` while
    reporting the true total (separate count, like hyphae/evaluator.py:
    83-144).
    """
    text = sql.strip().rstrip(";")
    if ";" in text:
        raise ValueError("one statement only")
    if not re.match(r"^(select|with)\b", text, re.IGNORECASE):
        raise ValueError("SELECT-only surface")
    if _FORBIDDEN.search(text):
        raise ValueError("side-effecting SQL is not allowed")
    df: DataFrame = spark.sql(text)
    total = df.count()
    rows = [r.asDict() for r in df.limit(max_rows).collect()]
    return {
        "verdict": "ok",
        "results": rows,
        "stats": {
            "total_matches": total,
            "returned": len(rows),
            "was_truncated": total > len(rows),
        },
    }
