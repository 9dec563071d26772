"""Identifier tokenizer (F1): camelCase split + separator normalization +
suffix stemming, one semantic definition with per-engine spellings."""

from __future__ import annotations

import duckdb

from tree_sitter_analyzer_spark.functions import (
    ident_tokens_duck,
    ident_tokens_spark,
)

CASES = {
    "getCustomerValue_fastId": ["get", "custom", "value", "fast", "id"],
    "HTTPServer": ["httpserv"],          # no lower→UPPER boundary inside HTTP
    "snake_case_name": ["snake", "case", "name"],
    "dash-and/path.ext": ["dash", "and", "path", "ext"],
    "parsing parsers parsed parses": ["pars", "pars", "pars", "pars"],
    "es ed s a": ["es", "ed"],           # 1-char dropped; 2-char kept unstemmed
    "reading": ["read"],
    "id": ["id"],                        # too short to stem ('id' keeps its d)
}


def test_spark_tokenizer_cases(spark):
    df = spark.createDataFrame([(t,) for t in CASES], "name STRING")
    got = {
        r["name"]: list(r["toks"])
        for r in df.selectExpr(
            "name", f"{ident_tokens_spark('name')} AS toks"
        ).collect()
    }
    for text, want in CASES.items():
        assert got[text] == want, (text, got[text])


def test_duck_tokenizer_matches_spark(spark):
    con = duckdb.connect()
    for text, want in CASES.items():
        out = con.sql(
            f"SELECT {ident_tokens_duck('?')} AS toks", params=[text]
        ).fetchone()[0]
        assert list(out) == want, (text, out)
