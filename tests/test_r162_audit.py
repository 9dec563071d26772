"""R162: lsh_recall_audit invariants — the audit's counts must agree with
the two registered queries it evaluates (minhash_lsh vs ngram_jaccard).
Oracle parity rides test_oracle_parity."""

from __future__ import annotations

from .conftest import SF_TINY


def test_lsh_recall_audit_agrees_with_the_registered_tiers(spark):
    from tree_sitter_analyzer_spark.registry import load_all

    qs = load_all()
    true_df = qs["ngram_jaccard"].spark_fn(spark, SF_TINY).toPandas()
    lsh_df = qs["minhash_lsh"].spark_fn(spark, SF_TINY).toPandas()
    audit = qs["lsh_recall_audit"].spark_fn(spark, SF_TINY).toPandas().iloc[0]

    true_set = {(int(a), int(b)) for a, b in zip(true_df.doc_a, true_df.doc_b)}
    lsh_set = {(int(a), int(b)) for a, b in zip(lsh_df.doc_a, lsh_df.doc_b)}
    # confirmed LSH pairs are a subset of ground truth by construction
    assert lsh_set <= true_set
    assert int(audit.n_true) == len(true_set) > 0
    assert int(audit.n_confirmed) == len(lsh_set)
    assert int(audit.missed) == len(true_set - lsh_set)
    assert int(audit.recall_pm) == 1000 * len(lsh_set) // len(true_set)
    # candidates superset the confirmed pairs
    assert int(audit.n_cand) >= int(audit.n_confirmed)
    assert int(audit.cand_precision_pm) == (
        1000 * int(audit.n_confirmed) // max(int(audit.n_cand), 1)
    )
    # B=8,R=1 at t=0.5: the band config should catch nearly everything
    assert int(audit.recall_pm) >= 990
