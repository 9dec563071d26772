"""R156-R157 batch: python-reference replays + invariants for pii_scrub
and doc_chunks. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

import hashlib
import re

import duckdb

from .conftest import SF_TINY


def _pii_corpus():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet' ORDER BY 1"
    ).fetchall()
    con.close()
    out = {}
    for doc_id, text in rows:
        t = text
        if doc_id % 3 == 0:
            t += f" reach user{doc_id}@mail-{doc_id % 7}.org"
        if doc_id % 5 == 0:
            t += f" ssn {100 + doc_id % 900}-{10 + doc_id % 90}-{1000 + doc_id % 9000}"
        if doc_id % 4 == 0:
            t += f" call 555-{1000 + (doc_id * 7) % 9000}"
        out[doc_id] = t
    return out


def test_pii_scrub_matches_python_re_replay(spark):
    from tree_sitter_analyzer_spark.operators.textstats import (
        PII_EMAIL, PII_PHONE, PII_SSN, pii_scrub,
    )

    corpus = _pii_corpus()
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = pii_scrub(docs).toPandas().set_index("doc_id")
    assert len(got) == len(corpus)
    for doc_id, txt in corpus.items():
        r = got.loc[doc_id]
        assert int(r.n_email) == len(re.findall(PII_EMAIL, txt))
        assert int(r.n_ssn) == len(re.findall(PII_SSN, txt))
        assert int(r.n_phone) == len(re.findall(PII_PHONE, txt))
        red = re.sub(PII_EMAIL, "<EMAIL>", txt)
        red = re.sub(PII_SSN, "<SSN>", red)
        red = re.sub(PII_PHONE, "<PHONE>", red)
        assert r.redacted_md5 == hashlib.md5(red.encode()).hexdigest()
        assert int(r.clean_len) == len(red)
        # redaction is complete: no pattern survives
        for pat in (PII_EMAIL, PII_SSN, PII_PHONE):
            assert not re.search(pat, red)
    # the enrichment plants signal: every doc_id%3==0 doc has >=1 email
    assert all(
        int(got.loc[d].n_email) >= 1 for d in corpus if d % 3 == 0
    )


def test_doc_chunks_matches_python_replay_and_covers(spark):
    from tree_sitter_analyzer_spark.operators.textstats import (
        CHUNK_S, CHUNK_W, doc_chunks,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet' ORDER BY 1"
    ).fetchall()
    con.close()
    want = {}
    for doc_id, text in rows:
        ws = [w for w in text.split(" ") if w]
        n = len(ws)
        if n == 0:
            continue
        nc = 1 if n <= CHUNK_W else 1 + -(-(n - CHUNK_W) // CHUNK_S)
        covered = set()
        for i in range(nc):
            lo = i * CHUNK_S
            toks = ws[lo : lo + CHUNK_W]
            assert toks, "no empty chunk may exist"
            covered.update(range(lo, lo + len(toks)))
            want[(doc_id, i)] = (
                len(toks),
                hashlib.md5(" ".join(toks).encode()).hexdigest(),
            )
        assert covered == set(range(n)), "every token in >= 1 chunk"
        # tail keeps at least W-S+1 tokens (single-chunk docs keep all n)
        if nc > 1:
            assert want[(doc_id, nc - 1)][0] >= CHUNK_W - CHUNK_S + 1

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = doc_chunks(docs).toPandas()
    gm = {
        (int(r.doc_id), int(r.chunk_idx)): (int(r.n_chunk_tokens), r.chunk_md5)
        for r in got.itertuples()
    }
    assert gm == want
