"""Sinks: canonical, deterministic writers (SURVEY.md S8/S9).

The reference ships format-specific encoders (TOON/markdown/CSV/mermaid)
with golden-master byte-diff tests; the engine's analog is a canonical
write discipline: explicit column order, deterministic row order, single
file for golden-master artifacts, path+metrics response envelopes for big
results (S9: "large results written to disk, response returns the path").
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame


def write_canonical(
    df: DataFrame,
    path: str,
    order_by: list[str],
    fmt: str = "parquet",
    single_file: bool = False,
) -> dict[str, Any]:
    """Deterministic write: sorted by ``order_by`` (total order required —
    callers pass a unique key suffix), canonical column order (sorted
    names), golden-master-stable.

    Returns the S9 envelope: path + row count, never the rows.
    """
    cols = sorted(df.columns)
    out = df.select(*cols).orderBy(*order_by)
    n = out.count()
    writer = out.coalesce(1) if single_file else out
    if fmt == "parquet":
        writer.write.mode("overwrite").parquet(path)
    elif fmt == "csv":
        writer.write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "json":
        writer.write.mode("overwrite").json(path)
    else:
        raise ValueError(f"unsupported sink format {fmt!r}")
    return {"path": path, "rows": n, "format": fmt, "columns": cols}


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> dict[str, Any]:
    """Hive-partitioned layout — the storage-side analog of partition
    pruning (O1/O2): downstream reads with a partition-column predicate
    scan only matching directories."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    return {
        "path": path,
        "format": "parquet",
        "partitioned_by": partition_cols,
        "n_partition_dirs": sum(
            1 for d in os.listdir(path) if "=" in d
        ),
    }


def to_mermaid(
    edges: DataFrame,
    src: str,
    dst: str,
    label: str | None = None,
    direction: str = "LR",
    max_edges: int = 200,
) -> dict[str, Any]:
    """Render a relationship DataFrame as deterministic Mermaid flowchart
    text (the reference's mermaid/graphology exporters,
    knowledge_graph/exporters.py:20-135, SURVEY.md S8).

    Edges are deduplicated, sorted by every output column (so duplicate
    (src, dst) pairs with different labels have a total order), and capped
    at ``max_edges`` with the capped-with-true-total envelope (T5): the
    text never silently truncates. Node ids are sanitized to mermaid-safe
    tokens with a collision-proof suffix (distinct names never merge);
    display labels and edge labels are Mermaid-escaped. The collect here
    is bounded by max_edges — graph exports are small-result sinks by
    definition; big relationship tables go through write_canonical.
    """
    cols = [src, dst] + ([label] if label else [])
    ordered = edges.select(*cols).dropDuplicates(cols).orderBy(*cols)
    total = ordered.count()
    rows = ordered.limit(max_edges).collect()

    ids: dict[str, str] = {}  # original name -> unique mermaid-safe id

    def node_id(name: str) -> str:
        name = str(name)
        if name not in ids:
            base = "".join(c if c.isalnum() else "_" for c in name) or "n"
            nid = base
            k = 1
            while nid in ids.values():  # sanitization collision: suffix
                nid = f"{base}__{k}"
                k += 1
            ids[name] = nid
        return ids[name]

    def esc(text: str) -> str:
        # Mermaid string/label escapes: quotes end the string, pipes end
        # an edge label — entity-encode both.
        return str(text).replace('"', "#quot;").replace("|", "#124;")

    lines = [f"flowchart {direction}"]
    for r in rows:
        for name in (r[src], r[dst]):
            known = str(name) in ids
            nid = node_id(name)
            if not known:
                lines.append(f'    {nid}["{esc(name)}"]')
    for r in rows:
        edge = (
            f"    {node_id(r[src])} -->|{esc(r[label])}| {node_id(r[dst])}"
            if label
            else f"    {node_id(r[src])} --> {node_id(r[dst])}"
        )
        lines.append(edge)
    return {
        "text": "\n".join(lines) + "\n",
        "total_edges": total,
        "rendered_edges": len(rows),
        "was_truncated": total > len(rows),
        "n_nodes": len(ids),
    }
