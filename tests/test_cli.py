"""CLI↔API parity (the reference's contract tests, tests/contracts/ +
facade_map.py: surfaces route through one registry so they cannot drift)."""

from __future__ import annotations

import json
import subprocess
import sys


def run_cli(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "tree_sitter_analyzer_spark", *args],
        capture_output=True, text=True, check=True,
    )
    return out.stdout


def test_cli_list_covers_registry():
    from tree_sitter_analyzer_spark.registry import load_all

    listed = run_cli("list")
    for name in load_all():
        assert name in listed


def test_cli_run_matches_api(spark):
    from tree_sitter_analyzer_spark.registry import load_all

    env = json.loads(run_cli("run", "phash_dups", "--limit", "5"))
    api_total = (
        load_all()["phash_dups"].spark_fn(spark, "/root/testdata/sf0.001").count()
    )
    assert env["stats"]["total_matches"] == api_total
    assert env["stats"]["returned"] == 5


def test_cli_sql_gate():
    env = json.loads(run_cli("sql", "SELECT count(*) AS n FROM tiles"))
    assert env["results"][0]["n"] == 1500


def test_cli_compact_format_is_lossless_and_smaller():
    """S8 TOON analog: compact envelope carries identical data as JSON in
    columnar form, with fewer characters for multi-row payloads."""
    full = json.loads(run_cli("run", "zonal_stats", "--limit", "20"))
    comp = json.loads(run_cli("run", "zonal_stats", "--limit", "20",
                              "--format", "compact"))
    assert comp["cols"] == sorted(full["results"][0])
    rebuilt = [dict(zip(comp["cols"], row)) for row in comp["rows"]]
    full_sorted = [{k: r[k] for k in comp["cols"]} for r in full["results"]]
    assert rebuilt == full_sorted
    assert comp["stats"] == full["stats"]
    assert len(json.dumps(comp)) < len(json.dumps(full))


def test_cli_explain_shows_plan():
    out = run_cli("explain", "pip_join", "--mode", "simple")
    assert "BroadcastHashJoin" in out
    assert "SortMergeJoin" not in out
