"""Porter stemmer verification: the classic example vectors from the
published algorithm (M.F. Porter 1980, public) must stem identically on
BOTH engines — the real check behind the shared-SQL porter_stems query
(two-engine parity alone cannot catch a bug in shared text)."""

from __future__ import annotations

from tree_sitter_analyzer_spark.functions.porter import porter_ctes

# (word, expected stem) — drawn from the steps' example lists in the
# paper plus standard voc/output pairs exercising every step.
VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # engine-corpus words (documents.text vocabulary)
    "merge": "merg", "table": "tabl", "scan": "scan", "batch": "batch",
}


def _vector_sql(engine: str) -> str:
    vals = ", ".join(f"('{w}')" for w in VECTORS)
    frag, final = porter_ctes(engine, "pin", "token")
    src = (
        f"SELECT * FROM (VALUES {vals}) t(token)"
        if engine == "duck"
        else f"SELECT token FROM (VALUES {vals}) AS t(token)"
    )
    return f"WITH pin AS ({src}),{frag}\nSELECT token, stem FROM {final}"


def test_porter_vectors_duckdb(duck):
    got = dict(duck.sql(_vector_sql("duck")).fetchall())
    bad = {w: (got[w], e) for w, e in VECTORS.items() if got[w] != e}
    assert not bad, bad


def test_porter_vectors_spark(spark):
    rows = spark.sql(_vector_sql("spark")).collect()
    got = {r["token"]: r["stem"] for r in rows}
    bad = {w: (got[w], e) for w, e in VECTORS.items() if got[w] != e}
    assert not bad, bad


def test_porter_vectors_python():
    """The python reference implementation (the Spark production path's
    pandas_udf kernel) must agree with the paper vectors too — so the
    gate compares two INDEPENDENT implementations (python vs generated
    SQL)."""
    from tree_sitter_analyzer_spark.functions.porter import porter_stem_py

    bad = {
        w: (porter_stem_py(w), e)
        for w, e in VECTORS.items()
        if porter_stem_py(w) != e
    }
    assert not bad, bad


def test_porter_python_vs_duckdb_sql_fuzz(duck):
    """Cross-implementation fuzz: the python reference (Spark's UDF
    kernel) and the generated DuckDB SQL must agree on arbitrary words,
    not just the paper vectors — 500 seeded-random lowercase words
    covering y-edge-cases, short words, and suffix pileups."""
    import random

    from tree_sitter_analyzer_spark.functions.porter import porter_stem_py

    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    sufs = ["", "s", "es", "ed", "ing", "ation", "iveness", "ously",
            "ement", "izer", "ies", "eed", "y", "ly", "ful", "ness",
            "al", "e", "ll"]
    words = set()
    while len(words) < 500:
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        words.add(base + rng.choice(sufs))
    # y-run vectors (round-4 advice): long consecutive-y runs pin the
    # cvpat fixpoint pass count — each pass resolves ~2 y's, and the
    # 8-pass bound must cover the longest run the SQL will ever see.
    for k in range(1, 17):
        words.add("b" + "y" * k)
        words.add("a" + "y" * k)
        words.add("y" * k)
        words.add("b" + "y" * k + "ing")
    words = sorted(words)
    vals = ", ".join(f"('{w}')" for w in words)
    frag, final = porter_ctes("duck", "pin", "token")
    got = dict(duck.sql(
        f"WITH pin AS (SELECT * FROM (VALUES {vals}) t(token)),{frag}\n"
        f"SELECT token, stem FROM {final}"
    ).fetchall())
    bad = {w: (porter_stem_py(w), got[w])
           for w in words if porter_stem_py(w) != got[w]}
    assert not bad, f"{len(bad)} disagreements: {dict(list(bad.items())[:8])}"
