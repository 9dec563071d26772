"""Selector-text surface: compile a query string to a ``Chain`` plan.

The reference's primary ad-hoc surface is a parsed selector string
(``hyphae/lexer.py``, ``hyphae/parser.py``, evaluated at
``hyphae/evaluator.py:83-136``) plus a chain-string parser with
literal-only safety (``_codegraph_query_dsl.py:123-150, 245-300``). This
module gives the Spark engine the same "an agent can ship a string"
entry point: the string compiles to the SAME lazy ``Chain`` plans as the
fluent API (the facade-map contract, ``mcp/facade_map.py:8-12``), so one
Catalyst plan serves both surfaces and parity is testable string-vs-chain.

Grammar (whitespace-separated terms, all values literal-only)::

    query  := term*
    term   := kv | pseudo | take | sort
    kv     := key '=' value            -> Chain.filter(key=value)
                                          ('*' in value -> key__like)
    pseudo := ':within(' zkind ')'     -> Chain.within_zones(kind=...)
            | ':adjacent(' zkind ')'   -> Chain.adjacent_zones(kind=...)
            | ':outside(' zkind ')'    -> Chain.outside_zones(kind=...)
            | ':not(' kv ')'           -> Chain.exclude(...)
            | ':near(' lon ',' lat ',' k ')' -> Chain.near(lon, lat, k)
            | ':search(' words [',' k] ')'   -> Chain.search(words, k)
            | ':first-per(' group ')'        -> Chain.nth_per(group, 1)
            | ':nth-per(' group ',' n ')'    -> Chain.nth_per(group, n)
    take   := 'take' N                 -> Chain.take(N)
    sort   := 'sort' col ['desc']      -> Chain.sort(by=col, desc=...)

Safety discipline (the reference's literal-only rule): tokens must match a
strict charset — no quotes, parens outside pseudo args, semicolons, or
expression syntax ever reach the plan; filter keys are whitelisted by the
Chain's own ``_FILTER_COLS`` dispatch, unknown keys raise with the allowed
set listed (query_filter.py:48-157 behavior).
"""

from __future__ import annotations

import re

from .chain import _FILTER_COLS, Chain

_TOKEN = re.compile(
    r"""
    :(?P<pseudo>[a-z_-]+)\((?P<arg>[^()]*)\)   # :name(arg)
  | (?P<kv>[a-z_][a-z0-9_]*=[A-Za-z0-9_.*\- ]+?)(?=\s+\S+=|\s+:|\s+take\s|\s+sort\s|$)
  | (?P<word>take|sort|desc|asc)\b
  | (?P<num>[0-9]+)\b
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)\b
    """,
    re.VERBOSE,
)

_VALUE_OK = re.compile(r"^[A-Za-z0-9_.*\- ]+$")
# :search terms additionally allow '=' (caption tokens like kind=marine);
# safe because search words only ever become literal DataFrame rows,
# never plan/SQL text.
_SEARCH_OK = re.compile(r"^[A-Za-z0-9_.*=\- ]+$")
_NUM = re.compile(r"^-?[0-9]+(\.[0-9]+)?$")
_INT = re.compile(r"^[0-9]+$")


class SelectorError(ValueError):
    """Malformed selector string (syntax or unknown key/pseudo)."""


def _tokens(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    text = text.strip()
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN.match(text, pos)
        if not m:
            raise SelectorError(f"unexpected character at {pos}: {text[pos:pos+10]!r}")
        if m.group("pseudo") is not None:
            out.append(("pseudo", f"{m.group('pseudo')}|{m.group('arg')}"))
        else:
            # lastgroup is the LAST group that matched in the alternation —
            # for non-pseudo branches exactly one of kv/word/num/ident is set.
            kind = next(
                g for g in ("kv", "word", "num", "ident")
                if m.group(g) is not None
            )
            out.append((kind, m.group(kind)))
        pos = m.end()
    return out


def _parse_kv(term: str, filter_cols: dict | None = None) -> tuple[str, object]:
    cols = _FILTER_COLS if filter_cols is None else filter_cols
    key, _, value = term.partition("=")
    key, value = key.strip(), value.strip()
    base = key[:-6] if key.endswith("__like") else key
    if base not in cols:
        raise SelectorError(
            f"unknown filter key {key!r}; allowed: {sorted(cols)}"
        )
    if not _VALUE_OK.match(value):
        raise SelectorError(f"illegal characters in value {value!r}")
    if "*" in value and not key.endswith("__like"):
        key = f"{key}__like"
    if key.startswith("min_") or (base in {"w", "h"}):
        if not _INT.match(value):
            raise SelectorError(f"{key} needs an integer, got {value!r}")
        return key, int(value)
    return key, value


def _step(fn, *args, **kwargs):
    """Invoke a chain step, surfacing table-mismatch TypeErrors (e.g. a
    tile-only spatial step on a documents chain) as SelectorError so the
    CLI keeps its clean error envelope."""
    try:
        return fn(*args, **kwargs)
    except TypeError as exc:
        raise SelectorError(str(exc)) from exc


def apply_selector(chain: Chain, text: str) -> Chain:
    """Compile ``text`` onto ``chain`` — same plans as the fluent calls."""
    toks = _tokens(text)
    i = 0
    while i < len(toks):
        kind, val = toks[i]
        if kind == "kv":
            key, value = _parse_kv(val, chain.FILTER_COLS)
            chain = chain.filter(**{key: value})
        elif kind == "pseudo":
            name, _, arg = val.partition("|")
            arg = arg.strip()
            if name == "within":
                chain = _step(chain.within_zones, kind=arg)
            elif name == "adjacent":
                chain = _step(chain.adjacent_zones, kind=arg)
            elif name == "outside":
                chain = _step(chain.outside_zones, kind=arg)
            elif name == "not":
                key, value = _parse_kv(arg, chain.FILTER_COLS)
                chain = chain.exclude(**{key: value})
            elif name == "near":
                parts = [p.strip() for p in arg.split(",")]
                if (
                    len(parts) != 3
                    or not all(_NUM.match(p) for p in parts[:2])
                    or not _INT.match(parts[2])
                ):
                    raise SelectorError(
                        f":near needs (lon, lat, k) with integer k, got {arg!r}"
                    )
                chain = _step(chain.near, float(parts[0]), float(parts[1]), int(parts[2]))
            elif name == "search":
                parts = [p.strip() for p in arg.split(",")]
                k = 10
                if len(parts) > 1 and _NUM.match(parts[-1]):
                    if not _INT.match(parts[-1]):
                        raise SelectorError(
                            f":search k must be an integer, got {parts[-1]!r}"
                        )
                    k = int(parts[-1])
                    parts = parts[:-1]
                query = ", ".join(parts)
                if not query or not _SEARCH_OK.match(query.replace(",", "")):
                    raise SelectorError(f":search needs (words[, k]), got {arg!r}")
                chain = chain.search(query, k=k)
            elif name == "first-per":
                arg_clean = arg.strip()
                if not arg_clean or not _VALUE_OK.match(arg_clean):
                    raise SelectorError(f":first-per needs (group), got {arg!r}")
                chain = _step(chain.nth_per, arg_clean)
            elif name == "nth-per":
                parts = [p.strip() for p in arg.split(",")]
                if (
                    len(parts) != 2
                    or not parts[0]
                    or not _VALUE_OK.match(parts[0])
                    or not _INT.match(parts[1])
                    or int(parts[1]) < 1
                ):
                    raise SelectorError(
                        f":nth-per needs (group, n) with integer n >= 1, got {arg!r}"
                    )
                chain = _step(chain.nth_per, parts[0], int(parts[1]))
            else:
                raise SelectorError(
                    f"unknown pseudo-class :{name}; "
                    "allowed: within, outside, adjacent, not, near, search, "
                    "first-per, nth-per"
                )
        elif kind == "word" and val == "take":
            i += 1
            if i >= len(toks) or toks[i][0] != "num":
                raise SelectorError("take needs a number")
            chain = chain.take(int(toks[i][1]))
        elif kind == "word" and val == "sort":
            i += 1
            if (
                i >= len(toks)
                or toks[i][0] != "ident"
                or toks[i][1] in {"desc", "asc", "take", "sort"}
            ):
                raise SelectorError("sort needs a column name")
            col = toks[i][1]
            if col not in chain.columns:
                raise SelectorError(
                    f"unknown sort column {col!r}; "
                    f"allowed: {sorted(chain.columns)}"
                )
            desc = False
            if i + 1 < len(toks) and toks[i + 1] == ("word", "desc"):
                desc = True
                i += 1
            elif i + 1 < len(toks) and toks[i + 1] == ("word", "asc"):
                i += 1
            chain = chain.sort(by=col, desc=desc)
        else:
            raise SelectorError(f"unexpected token {val!r}")
        i += 1
    return chain
