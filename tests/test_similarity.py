"""ANN tests: brute-force exactness is oracle-gated (test_oracle_parity);
here: LSH recall vs brute (the approximate tier must stay honest) and
dedup-operator invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_analyzer_spark.operators import dedup, similarity

from .conftest import SF_TINY


def _emb(spark):
    return spark.read.parquet(f"{SF_TINY}/embeddings.parquet")


def test_lsh_recall_vs_brute(spark):
    brute = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_brute_topk(_emb(spark), 5, 5).collect()
    }
    lsh = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_lsh_topk(_emb(spark), 5, 5, max_hamming=3).collect()
    }
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.6, f"LSH recall too low: {recall} ({len(lsh)} hits)"


def test_lsh_results_subset_scores_exact(spark):
    """Every LSH hit's score must equal the brute score for that pair —
    LSH only prunes candidates, never changes the metric."""
    brute = {
        (r["query_id"], r["vec_id"]): r["cos_micro"]
        for r in similarity.ann_brute_topk(_emb(spark), 5, 200).collect()
    }
    for r in similarity.ann_lsh_topk(_emb(spark), 5, 5, max_hamming=3).collect():
        key = (r["query_id"], r["vec_id"])
        assert brute[key] == r["cos_micro"]


def test_minhash_candidates_superset_of_high_jaccard(spark):
    """LSH guarantee direction: every pair the exact Jaccard op reports at
    ≥0.5 should be surfaced by MinHash-LSH (B=8, R=1 → miss prob (1-j)^8
    ≤ 0.4% at j=0.5) — on this corpus, zero misses expected."""
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.token_jaccard_pairs(docs, 500).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_dups(docs, 500).collect()
    }
    assert lsh == exact, f"missed={exact - lsh} extra={lsh - exact}"


def test_simhash_close_pairs_have_high_jaccard(spark):
    """SimHash hamming ≤3 pairs should be materially similar — sanity link
    between the two similarity measures (not exact equivalence)."""
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    sim_pairs = dedup.simhash_dups(docs, 3, 16)
    jac = dedup.token_jaccard_pairs(docs, 0)  # all pairs with any overlap
    joined = sim_pairs.join(jac, ["doc_a", "doc_b"])
    stats = joined.agg(F.min("jac_milli").alias("mn"),
                       F.count("*").alias("n")).collect()[0]
    if stats["n"] > 0:
        assert stats["mn"] >= 200  # simhash-close pairs are genuinely similar
