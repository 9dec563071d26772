"""Token-compact tabular encoders (TOON-style + markdown), as library sinks.

The reference ships a token-oriented encoder for LLM consumption
(``formatters/toon_encoder.py``: ``[count]{f1,f2}:`` header + delimited
rows, union-schema inference over row dicts) and a markdown table
formatter (``formatters/default_table_formatter.py``). This module is the
Spark-side analog (SURVEY.md S8): a DataFrame goes through a bounded,
deterministic collect (explicit sort keys, capped with the true-total T5
envelope) and renders to a byte-stable text artifact — golden-master
tested (tests/test_storage.py, goldens under tests/golden/).

Format (TOON-style)::

    name[3]{image_id,fmt,n}:
      img_1,png,4
      img_2,jpeg,7
      "img,3",png,2

- header: ``key[row_count]{schema}:``; schema = explicit column order or
  the union of all rows' keys in first-seen order (a first-row-only
  schema silently drops fields later rows carry — the reference fixed
  exactly that).
- cells: CSV-style quoting — quoted iff the value contains the
  delimiter, a quote, a newline, or leading/trailing space; quotes
  escape by doubling. None renders as the empty cell.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def union_schema(rows: list[dict[str, Any]]) -> list[str]:
    """Union of all rows' keys in first-seen order (lossless header)."""
    schema: list[str] = []
    seen: set[str] = set()
    for row in rows:
        for key in row:
            if key not in seen:
                seen.add(key)
                schema.append(key)
    return schema


def _cell(value: Any, delimiter: str) -> str:
    if value is None:
        return ""
    s = str(value)
    if (
        delimiter in s
        or '"' in s
        or "\n" in s
        or s != s.strip()
    ):
        return '"' + s.replace('"', '""') + '"'
    return s


def encode_rows(
    rows: list[dict[str, Any]],
    schema: list[str] | None = None,
    key: str = "rows",
    delimiter: str = ",",
    indent: int = 0,
) -> str:
    """Encode row dicts as a TOON-style table (deterministic bytes)."""
    pad = "  " * indent
    cols = schema if schema is not None else union_schema(rows)
    header = f"{pad}{key}[{len(rows)}]{{{delimiter.join(cols)}}}:"
    lines = [header]
    for row in rows:
        lines.append(
            pad + "  " + delimiter.join(_cell(row.get(c), delimiter) for c in cols)
        )
    return "\n".join(lines) + "\n"


def toon_table(
    df: DataFrame,
    order_by: list[str],
    key: str = "rows",
    max_rows: int = 1000,
    delimiter: str = ",",
) -> dict[str, Any]:
    """DataFrame → TOON text, bounded and deterministic.

    Sorted by ``order_by`` (callers pass a unique key suffix for a total
    order), capped at ``max_rows`` with the capped-plus-true-total
    envelope (T5) — the encoder never triggers an unbounded collect.
    """
    total = df.count()
    rows = [r.asDict() for r in df.orderBy(*order_by).limit(max_rows).collect()]
    text = encode_rows(rows, schema=list(df.columns), key=key, delimiter=delimiter)
    return {
        "text": text,
        "total_rows": total,
        "rendered_rows": len(rows),
        "was_truncated": total > len(rows),
    }


_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")


def markdown_table(
    df: DataFrame, order_by: list[str], max_rows: int = 200
) -> dict[str, Any]:
    """DataFrame → GFM table text (default_table_formatter analog):
    numeric columns right-aligned, pipes escaped, same bounded-collect +
    envelope discipline as ``toon_table``."""
    total = df.count()
    rows = [r.asDict() for r in df.orderBy(*order_by).limit(max_rows).collect()]
    cols = list(df.columns)
    numeric = {
        name
        for name, dtype in df.dtypes
        if dtype.startswith(_NUMERIC_PREFIXES)
    }

    def esc(value: Any) -> str:
        return "" if value is None else str(value).replace("|", "\\|")

    lines = ["| " + " | ".join(cols) + " |"]
    lines.append(
        "|" + "|".join(" ---: " if c in numeric else " --- " for c in cols) + "|"
    )
    for row in rows:
        lines.append("| " + " | ".join(esc(row.get(c)) for c in cols) + " |")
    return {
        "text": "\n".join(lines) + "\n",
        "total_rows": total,
        "rendered_rows": len(rows),
        "was_truncated": total > len(rows),
    }
