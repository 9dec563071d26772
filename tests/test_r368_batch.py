"""R368-R370 batch: python replays + invariants for
pip_selectivity_audit, erlang_audit, soundex_blocks."""

from __future__ import annotations

import math

from tree_sitter_analyzer_spark import synth

from .conftest import SF_TINY, register_views

RES = 7
NANO = 10**9 // (1 << RES)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --------------------------------------------------------------------- R368
def test_pip_selectivity_matches_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    pts = duck.sql(
        f"WITH tiles AS ({synth.tiles_sql()}) SELECT lon, lat FROM tiles"
    ).fetchall()
    zones = duck.sql(
        f"WITH zones AS ({synth.zones_sql()})"
        " SELECT j, CAST(floor(xmin * 1e9) AS BIGINT),"
        " CAST(floor(xmax * 1e9) AS BIGINT),"
        " CAST(floor(ymin * 1e9) AS BIGINT),"
        " CAST(floor(ymax * 1e9) AS BIGINT) FROM zones"
    ).fetchall()
    hist: dict[tuple[int, int], int] = {}
    for lon, lat in pts:
        ix = math.floor((lon + 180.0) * (1 << RES))
        iy = math.floor((lat + 90.0) * (1 << RES))
        hist[(ix, iy)] = hist.get((ix, iy), 0) + 1
    est: dict[int, int] = {}
    exact: dict[int, int] = {}
    for j, zx0, zx1, zy0, zy1 in zones:
        j = int(j)
        acc = 0
        for (ix, iy), n in hist.items():
            x0, x1 = ix * NANO - 180 * 10**9, (ix + 1) * NANO - 180 * 10**9
            y0, y1 = iy * NANO - 90 * 10**9, (iy + 1) * NANO - 90 * 10**9
            ox = max(0, min(x1, zx1) - max(x0, zx0))
            oy = max(0, min(y1, zy1) - max(y0, zy0))
            if ox > 0 and oy > 0:
                acc += n * ((1000 * ox) // NANO) * ((1000 * oy) // NANO)
        est[j] = acc // 1000000
        exact[j] = sum(
            1
            for lon, lat in pts
            if zx0 <= math.floor(lon * 1e9) < zx1
            and zy0 <= math.floor(lat * 1e9) < zy1
        )

    out = (
        load_all()["pip_selectivity_audit"].spark_fn(spark, SF_TINY)
        .toPandas()
    )
    assert len(out) == len(zones)
    qerrs = []
    for row in out.itertuples():
        j = int(row.zone)
        assert int(row.exact_n) == exact[j]
        assert int(row.est_n) == est[j]
        hi, lo = max(exact[j], est[j]), min(exact[j], est[j])
        assert int(row.qerr_milli) == 1000 * hi // max(lo, 1)
        qerrs.append(int(row.qerr_milli))
    # the estimator is genuinely informative: the MEDIAN zone q-error is
    # under 2x (uniformity holds inside most cells)
    qerrs.sort()
    assert qerrs[len(qerrs) // 2] < 2000


# --------------------------------------------------------------------- R369
def test_erlang_audit_matches_recurrence_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    n, hours = duck.sql(
        "SELECT count(*),"
        " max(date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
        "     // 3600000000)"
        " - min(date_diff('microsecond', TIMESTAMP '1970-01-01', ts)"
        "     // 3600000000) + 1 FROM events"
    ).fetchall()[0]
    a = (1000 * int(n)) // (int(hours) * 30)
    b = {0: 1000}
    for k in range(1, 9):
        b[k] = (1000 * (a * b[k - 1])) // (1000000 * k + a * b[k - 1])
    out = load_all()["erlang_audit"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == 8
    for row in out.itertuples():
        c = int(row.c)
        assert int(row.a_milli) == a
        assert int(row.b_milli) == b[c]
        stable = 1 if 1000 * c > a else 0
        assert int(row.stable) == stable
        if stable:
            w = (1000 * (c * b[c])) // (
                c * 1000 - a + (a * b[c]) // 1000
            )
            assert int(row.wait_milli) == w
        # Erlang-B blocking decreases in the server count
    bm = out.sort_values("c").b_milli.astype(int).tolist()
    assert bm == sorted(bm, reverse=True)
    sla = min(
        int(r.c) for r in out.itertuples() if int(r.wait_milli) <= 200
    )
    assert all(int(r.min_c_sla) == sla for r in out.itertuples())


# --------------------------------------------------------------------- R370
def _soundex(word: str) -> str:
    m = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"))
    u = word.upper()
    code = "".join(m[ch] for ch in u if ch in m)
    for d in "123456":
        while d + d in code:
            code = code.replace(d + d, d)
    if code and m.get(u[0]) == code[0]:
        code = code[1:]
    code = code.replace("0", "")
    return u[0] + (code + "000")[:3]


def test_soundex_blocks_matches_python_replay(spark, duck):
    from tree_sitter_analyzer_spark.registry import load_all

    register_views(duck, SF_TINY)
    words = duck.sql(
        "SELECT string_split(p_name, ' ')[1], count(*) FROM part GROUP BY 1"
    ).fetchall()
    blocks: dict[str, dict] = {}
    for w, n in words:
        c = _soundex(w)
        b = blocks.setdefault(c, dict(n=0, words=set()))
        b["n"] += int(n)
        b["words"].add(w)
    total = sum(b["n"] for b in blocks.values())
    bp2 = sum(b["n"] * (b["n"] - 1) for b in blocks.values())

    out = load_all()["soundex_blocks"].spark_fn(spark, SF_TINY).toPandas()
    assert len(out) == len(blocks)
    for row in out.itertuples():
        b = blocks[row.code]
        assert int(row.n_parts) == b["n"]
        assert int(row.n_words) == len(b["words"])
        assert row.word_a == min(b["words"])
        assert row.word_b == max(b["words"])
        assert int(row.collision) == (1 if len(b["words"]) > 1 else 0)
        assert int(row.n_blocks) == len(blocks)
        assert int(row.pair_ratio_milli) \
            == 1000 * bp2 // max(total * (total - 1), 1)
        # codes follow the Soundex shape: letter + exactly 3 digits
        assert len(row.code) == 4 and row.code[1:].isdigit()
    # blocking genuinely reduces candidate pairs
    assert 0 < bp2 < total * (total - 1)
