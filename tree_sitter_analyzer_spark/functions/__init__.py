"""Cross-engine scalar helpers.

Each helper emits SQL text for BOTH Spark and DuckDB where syntax differs
(hex parsing, bit shifts, xor) so every operator keeps a single semantic
definition with per-engine spellings verified equal by the parity suite.
"""

from __future__ import annotations


def md5int_spark(x: str) -> str:
    """First 32 bits of md5 as BIGINT — the engine-portable string hash
    (SURVEY.md F2). Verified equal to the DuckDB spelling."""
    return f"CAST(conv(substr(md5({x}),1,8),16,10) AS BIGINT)"


def md5int_duck(x: str) -> str:
    return f"CAST(('0x' || substr(md5({x}),1,8)) AS BIGINT)"


def bit_spark(h: str, k: int) -> str:
    return f"(CASE WHEN (shiftright({h}, {k}) & 1) = 1 THEN 1 ELSE -1 END)"


def bit_duck(h: str, k: int) -> str:
    return f"(CASE WHEN (({h} >> {k}) & 1) = 1 THEN 1 ELSE -1 END)"


def xor_spark(a: str, b: str) -> str:
    return f"({a} ^ {b})"


def xor_duck(a: str, b: str) -> str:
    # DuckDB's ^ is exponentiation; xor() is the bitwise op.
    return f"xor({a}, {b})"
