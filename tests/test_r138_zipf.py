"""R138 zipf_audit: python replay. Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from .conftest import SF_TINY


def test_zipf_matches_python(spark):
    from tree_sitter_analyzer_spark.operators.textstats import (
        ZIPF_DEPTH, zipf_audit,
    )

    docs = pq.read_table(f"{SF_TINY}/documents.parquet").to_pandas()
    cnt: Counter = Counter()
    for t in docs["text"]:
        cnt.update(w for w in t.split(" ") if w)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_DEPTH]
    expected = {}
    for r, (tok, c) in enumerate(top, start=1):
        c2 = top[2 * r - 1][1] if 2 * r <= len(top) else None
        expected[r] = (
            tok, c, c.bit_length() - 1,
            0 if c2 is None else 1000 * c // c2,
        )
    got = zipf_audit(
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
    ).toPandas()
    assert len(got) == len(expected)
    for r in got.itertuples():
        assert expected[int(r.rank)] == (
            r.tok, int(r.cnt), int(r.bits), int(r.ratio_milli),
        )
    # the audit is informative: some doubling ratio deviates from the
    # natural-text ~2000 on this synthetic corpus
    ratios = [v[3] for v in expected.values() if v[3] > 0]
    assert ratios and any(abs(x - 2000) > 200 for x in ratios)
