"""Round-5 batch: independent python replays for the two round-4
shared-SQL-text operators that shipped without one (round-4 advice #1):
sar_lag (row-normalized rook Wx / W^2x SAR ladder) and temperature_mix
(largest-remainder temperature quotas).  Both replays recompute from the
RAW tables (tiles / documents), never from the modules' own SQL helpers
— the energy_distance lesson: two-engine parity cannot catch a bug that
lives in the shared SQL text; an independent recomputation can.
"""

from __future__ import annotations

import math
from collections import defaultdict

from .conftest import SF_TINY, register_views


def _tdiv(a: int, b: int) -> int:
    """SQL DIV / DuckDB // truncate toward zero; python // floors —
    they differ on negative operands (CLAUDE.md signed-DIV rule)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ----------------------------------------------------------------- sar_lag
def test_sar_lag_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.grid import ix_sql, iy_sql
    from tree_sitter_analyzer_spark.queries_spatial import SAR_RES
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) "
        f"SELECT {ix_sql('lon', SAR_RES)}, {iy_sql('lat', SAR_RES)}, "
        "count(*) FROM tiles GROUP BY 1, 2"
    ).fetchall()
    occ = {(int(x), int(y)): int(n) for x, y, n in rows}
    offs = [(1, 0), (-1, 0), (0, 1), (0, -1)]

    wx, deg, swx = {}, {}, {}
    for (cx, cy), x in occ.items():
        nbr = [occ[(cx + dx, cy + dy)] for dx, dy in offs
               if (cx + dx, cy + dy) in occ]
        deg[(cx, cy)] = len(nbr)
        swx_raw = sum(nbr)
        wx[(cx, cy)] = _tdiv(1000 * swx_raw, max(len(nbr), 1))
    for (cx, cy) in occ:
        swx[(cx, cy)] = sum(wx[(cx + dx, cy + dy)] for dx, dy in offs
                            if (cx + dx, cy + dy) in wx)
    expected = {}
    for c, x in occ.items():
        g = max(deg[c], 1)
        expected[c] = (
            x, deg[c], wx[c], _tdiv(swx[c], g),
            1000 * x + _tdiv(wx[c], 2) + _tdiv(_tdiv(swx[c], g), 4),
        )

    out = load_all()["sar_lag"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        (int(r.ix), int(r.iy)): (
            int(r.n_tiles), int(r.deg), int(r.wx_milli),
            int(r.w2x_milli), int(r.sar_milli),
        )
        for r in out.itertuples()
    }
    assert got == expected and len(got) > 0


# --------------------------------------------------------- temperature_mix
def test_temperature_mix_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    rows = duck.sql(
        "SELECT source, count(*) FROM documents GROUP BY 1"
    ).fetchall()
    n_docs = {s: int(n) for s, n in rows}
    b = 1000
    w_sqrt = {s: math.isqrt(n) for s, n in n_docs.items()}

    def quotas(w: dict[str, int]) -> dict[str, int]:
        tot = sum(w.values())
        base = {s: _tdiv(b * w[s], tot) for s in w}
        rem = {s: (b * w[s]) % tot for s in w}
        # row_number() ORDER BY remainder DESC, source ASC
        ranked = sorted(w, key=lambda s: (-rem[s], s))
        short = b - sum(base.values())
        return {s: base[s] + (1 if i < short else 0)
                for i, s in enumerate(ranked)}

    q1 = quotas(n_docs)
    q2 = quotas(w_sqrt)
    qi = quotas({s: 1 for s in n_docs})
    for q in (q1, q2, qi):
        assert sum(q.values()) == b  # apportionment invariant

    out = load_all()["temperature_mix"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        r.source: (int(r.n_docs), int(r.w_sqrt), int(r.quota_t1),
                   int(r.quota_t2), int(r.quota_inf))
        for r in out.itertuples()
    }
    expected = {s: (n_docs[s], w_sqrt[s], q1[s], q2[s], qi[s])
                for s in n_docs}
    assert got == expected and len(got) > 1


# ------------------------------------------------- least_cost_path rounds
def test_least_cost_path_trace_rounds_logarithmic(spark):
    """Plan pin (round-4 verdict "What's wrong" #1): the corridor trace
    must cost O(log L) materialized Spark rounds via pointer-doubling on
    the backlink table — never the old O(L/2) pointer-chase. For the
    24-step budget that is at most ceil(log2(24)) + 1 = 6 rounds."""
    import math

    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators import cost_distance as cd

    tiles = synth.tiles_df(spark, SF_TINY)
    path = cd.least_cost_path(spark, tiles).toPandas()
    cap = math.ceil(math.log2(cd.TRACE_MAX_STEPS)) + 1
    assert 1 <= cd.LAST_TRACE_ROUNDS <= cap, cd.LAST_TRACE_ROUNDS
    # the trace is still the real corridor: contiguous steps from 0
    steps = sorted(path.step.tolist())
    assert steps == list(range(len(steps))) and len(steps) > 2


# ----------------------------------------------------- charset family (R398/9)
def _enc_plant(doc_id: int, text: str) -> bytes:
    """Replay of the planted-encoding synthesis from raw text."""
    b = text.encode("utf-8")
    cls = doc_id % 7
    if cls == 3:
        return b"\xef\xbb\xbf" + b
    if cls == 4:
        return b"\xff\xfe" + text.encode("utf-16-le")
    if cls == 5:
        return b"\xe9" + b + b"\x93"
    if cls == 6:
        return b"\xc2\x92" + b + b"\xef\xbf\xbd"
    return b


def _enc_detect(raw: bytes):
    """Independent detection: python's own codec machinery decides
    validity (not a reimplementation of the SQL DFA regex)."""
    if raw.startswith(b"\xef\xbb\xbf"):
        bom, body = "utf8", raw[3:]
    elif raw.startswith(b"\xff\xfe"):
        bom, body = "utf16le", raw[2:]
    elif raw.startswith(b"\xfe\xff"):
        bom, body = "utf16be", raw[2:]
    else:
        bom, body = "none", raw
    try:
        body.decode("utf-8", errors="strict")
        valid = 1
    except UnicodeDecodeError:
        valid = 0
    return bom, body, valid


def _scan_count(body: bytes, pat: bytes) -> int:
    """Left-to-right aligned scan count (the regex alternation
    semantics: match pat or consume one byte)."""
    n = i = 0
    while i <= len(body) - len(pat):
        if body[i:i + len(pat)] == pat:
            n += 1
            i += len(pat)
        else:
            i += 1
    return n


def _scan_c1(body: bytes) -> int:
    n = i = 0
    while i < len(body) - 1:
        if body[i] == 0xC2 and 0x80 <= body[i + 1] <= 0x9F:
            n += 1
            i += 2
        else:
            i += 1
    return n


def test_charset_audit_matches_python_replay(spark, duck):
    register_views(duck, SF_TINY)
    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    expected = {}
    for doc_id, text in docs:
        doc_id = int(doc_id)
        raw = _enc_plant(doc_id, text)
        bom, body, valid = _enc_detect(raw)
        n_ascii = sum(1 for b in body if b < 0x80)
        n_cont = sum(1 for b in body if 0x80 <= b <= 0xBF)
        n_lead = sum(1 for b in body if b >= 0xC0)
        n_c1 = _scan_c1(body)
        n_repl = _scan_count(body, b"\xef\xbf\xbd")
        n_nul = sum(1 for b in body if b == 0)
        moji = (1000 * (2 * n_c1 + 3 * n_repl)) // len(body) + (
            0 if bom in ("utf16le", "utf16be") or valid else 200
        )
        guess = {
            "utf8": "utf-8-sig", "utf16le": "utf-16-le",
            "utf16be": "utf-16-be",
        }.get(bom, "utf-8" if valid else "latin-1")
        expected[doc_id] = (bom, valid, len(body), n_ascii, n_cont,
                            n_lead, n_c1, n_repl, n_nul, moji, guess)
    from tree_sitter_analyzer_spark.registry import load_all

    out = load_all()["charset_audit"].spark_fn(spark, SF_TINY).toPandas()
    got = {
        int(r.doc_id): (r.bom, int(r.utf8_valid), int(r.n_bytes),
                        int(r.n_ascii), int(r.n_cont), int(r.n_lead),
                        int(r.n_c1), int(r.n_repl), int(r.n_nul),
                        int(r.mojibake_milli), r.enc_guess)
        for r in out.itertuples()
    }
    assert got == expected and len(got) == len(docs)


def test_charset_normalize_matches_python_replay(spark, duck):
    register_views(duck, SF_TINY)
    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    expected = {}
    for doc_id, text in docs:
        doc_id = int(doc_id)
        raw = _enc_plant(doc_id, text)
        bom, body, valid = _enc_detect(raw)
        if bom == "utf8" and valid:
            action, out = "strip_bom", body
        elif bom == "utf16le" and all(
            body[i + 1] == 0 and body[i] < 0x80
            for i in range(0, len(body), 2)
        ):
            # python's own utf-16 codec is the independent path
            action = "utf16le_to_utf8"
            out = body.decode("utf-16-le").encode("utf-8")
        elif bom in ("utf16le", "utf16be"):
            action, out = "unsupported", body
        elif not valid:
            # reference fallback codec: decode latin-1, re-encode utf-8
            action = "latin1_transcode"
            out = body.decode("latin-1").encode("utf-8")
        elif _scan_c1(body) > 0:
            action = "scrub_c1"
            # replace each C1 pair with U+FFFD (aligned scan)
            pieces, i = [], 0
            while i < len(body):
                if (i < len(body) - 1 and body[i] == 0xC2
                        and 0x80 <= body[i + 1] <= 0x9F):
                    pieces.append(b"\xef\xbf\xbd")
                    i += 2
                else:
                    pieces.append(body[i:i + 1])
                    i += 1
            out = b"".join(pieces)
        else:
            action, out = "none", body
        expected[doc_id] = (action, len(raw), len(out),
                            int(out != raw), out.hex().upper())
    from tree_sitter_analyzer_spark.registry import load_all

    res = load_all()["charset_normalize"].spark_fn(
        spark, SF_TINY
    ).toPandas()
    got = {
        int(r.doc_id): (r.action, int(r.n_bytes_in), int(r.n_bytes_out),
                        int(r.changed), r.out_hex)
        for r in res.itertuples()
    }
    assert got == expected and len(got) == len(docs)
    # round-trip invariant: every normalized body decodes as clean UTF-8
    for doc_id, (_a, _bi, _bo, _ch, oh) in expected.items():
        bytes.fromhex(oh).decode("utf-8", errors="strict")


def test_charset_confusion_matches_python_replay(spark, duck):
    register_views(duck, SF_TINY)
    docs = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    from collections import Counter

    planted_name = {0: "utf8", 1: "utf8", 2: "utf8", 3: "utf8_bom",
                    4: "utf16le", 5: "latin1", 6: "mojibake_utf8"}
    expect_guess = {"utf8": "utf-8", "utf8_bom": "utf-8-sig",
                    "utf16le": "utf-16-le", "latin1": "latin-1",
                    "mojibake_utf8": "utf-8"}
    cnt, correct = Counter(), Counter()
    for doc_id, text in docs:
        doc_id = int(doc_id)
        raw = _enc_plant(doc_id, text)
        bom, body, valid = _enc_detect(raw)
        guess = {"utf8": "utf-8-sig", "utf16le": "utf-16-le",
                 "utf16be": "utf-16-be"}.get(
            bom, "utf-8" if valid else "latin-1")
        planted = planted_name[doc_id % 7]
        cnt[(planted, guess)] += 1
        if guess == expect_guess[planted]:
            correct[(planted, guess)] += 1
    from tree_sitter_analyzer_spark.registry import load_all

    out = load_all()["charset_confusion"].spark_fn(
        spark, SF_TINY
    ).toPandas()
    got = {(r.planted, r.enc_guess): (int(r.n_docs), int(r.n_correct))
           for r in out.itertuples()}
    expected = {k: (cnt[k], correct[k]) for k in cnt}
    assert got == expected
    # the synthetic corpus detects perfectly: diagonal matrix
    assert all(n == c for n, c in got.values())
