"""ANN + dedup approximate-tier tests.

Brute-force exactness is oracle-gated in test_oracle_parity; these tests
pin the approximate tiers' contracts. Corpus realities (driver data):
embeddings are weakly structured (true-NN cosine ≈ 0.3-0.4) and documents
are dense (mean pairwise Jaccard ≈ 0.62), so the honest assertions are
(a) the approximate machinery is EXACT when not pruning, (b) pruning
loses only what the theory predicts, (c) scores are never altered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_analyzer_spark.operators import dedup, similarity

from .conftest import SF_TINY


def _emb(spark):
    return spark.read.parquet(f"{SF_TINY}/embeddings.parquet")


def _brute_pairs(spark, k=5):
    return {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_brute_topk(_emb(spark), 5, k).collect()
    }


def test_lsh_unpruned_equals_brute(spark):
    """max_hamming = N_PLANES disables pruning → LSH must equal brute
    exactly (the approximate tier degenerates to the exact one)."""
    brute = _brute_pairs(spark)
    full = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_lsh_topk(
            _emb(spark), 5, 5, max_hamming=similarity.N_PLANES
        ).collect()
    }
    assert full == brute


def test_lsh_prunes_and_recalls(spark):
    """At hamming ≤4 of 12 planes the bucket probe must (a) keep recall
    above the random-pruning floor and (b) actually prune candidates.
    On weakly-structured embeddings (NN cos ≈ 0.35 → P(plane agrees) ≈
    0.61 → expected NN hamming ≈ 4.7) theory predicts recall ≈ 0.5."""
    brute = _brute_pairs(spark)
    lsh_hits = similarity.ann_lsh_topk(_emb(spark), 5, 5, max_hamming=4).collect()
    lsh = {(r["query_id"], r["vec_id"]) for r in lsh_hits}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.3, f"recall {recall} below theory floor"
    assert len(lsh) <= len(brute)  # it returns ≤ k per query, never extra ranks


def test_lsh_scores_exact(spark):
    """LSH only prunes candidates — every surfaced score must equal the
    brute score bit-for-bit."""
    brute = {
        (r["query_id"], r["vec_id"]): r["cos_micro"]
        for r in similarity.ann_brute_topk(_emb(spark), 5, 400).collect()
    }
    for r in similarity.ann_lsh_topk(_emb(spark), 5, 5, max_hamming=4).collect():
        assert brute[(r["query_id"], r["vec_id"])] == r["cos_micro"]


def test_minhash_recall_matches_theory(spark):
    """B=8/R=1 banding: miss probability (1-j)^8 ≤ 0.4% at j = 0.5 —
    assert ≥99% recall of exact-Jaccard pairs and zero false positives
    (the verify phase guarantees precision = 1.0)."""
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.token_jaccard_pairs(docs, 500).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_dups(docs, 500).collect()
    }
    assert not (lsh - exact), f"false positives: {lsh - exact}"
    miss_rate = len(exact - lsh) / len(exact)
    assert miss_rate <= 0.01, f"miss rate {miss_rate}"


def test_simhash_separates_similarity(spark):
    """Directional sanity on a dense corpus: pairs at hamming ≤3 must be
    more similar on average than the all-pairs baseline."""
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    jac = dedup.token_jaccard_pairs(docs, 0)
    base_avg = jac.agg(F.avg("jac_milli")).collect()[0][0]
    close = dedup.simhash_dups(docs, 3, 16).join(jac, ["doc_a", "doc_b"])
    close_avg = close.agg(F.avg("jac_milli")).collect()[0][0]
    assert close.count() > 0
    assert close_avg > base_avg + 50, (close_avg, base_avg)


def test_ivf_unprobed_equals_brute(spark):
    """n_probe = n_centroids → every bucket probed → exact brute result
    (ranking identical, including ranks)."""
    brute = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in similarity.ann_brute_topk(_emb(spark), 5, 5).collect()
    }
    full = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in similarity.ann_ivf_topk(
            _emb(spark), 5, 5, n_centroids=16, n_probe=16
        ).collect()
    }
    assert full == brute


def test_ivf_probe_recall(spark):
    brute = _brute_pairs(spark)
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_ivf_topk(_emb(spark), 5, 5).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"IVF recall {recall}"


def test_ivf_kmeans_unprobed_equals_brute_and_recalls(spark):
    """KMeans-quantizer IVF: probing ALL buckets equals brute force
    exactly (every bucket probed — independent of clustering quality),
    and the default probe width keeps recall above the floor."""
    brute = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in similarity.ann_brute_topk(_emb(spark), 5, 5).collect()
    }
    full = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in similarity.ann_ivf_kmeans_topk(
            _emb(spark), 5, 5, n_centroids=8, n_probe=8
        ).collect()
    }
    assert full == brute
    brute_pairs = _brute_pairs(spark)
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_ivf_kmeans_topk(
            _emb(spark), 5, 5, n_centroids=8, n_probe=3
        ).collect()
    }
    recall = len(brute_pairs & ivf) / len(brute_pairs)
    assert recall >= 0.5, f"KMeans-IVF recall {recall}"


def test_neardup_lsh_full_radius_equals_exact(spark):
    """Embedding near-dup: max_hamming = N_PLANES disables LSH pruning →
    must equal the exact all-pairs result, scores included."""
    # sf0.001 max pairwise cos_micro ≈ 512k; 350k keeps a non-trivial set
    exact = {
        (r["vec_id_a"], r["vec_id_b"], r["cos_micro"])
        for r in similarity.embedding_neardup_pairs(_emb(spark)).collect()
    }
    assert exact, "threshold too high — no near-dup pairs in tiny corpus"
    full = {
        (r["vec_id_a"], r["vec_id_b"], r["cos_micro"])
        for r in similarity.embedding_neardup_pairs(
            _emb(spark), max_hamming=similarity.N_PLANES
        ).collect()
    }
    assert full == exact


def test_neardup_lsh_pruned_is_subset(spark):
    """Pruned near-dup output ⊆ exact output (LSH never invents pairs,
    never alters a surviving pair's score), and actually prunes."""
    exact = {
        (r["vec_id_a"], r["vec_id_b"], r["cos_micro"])
        for r in similarity.embedding_neardup_pairs(_emb(spark)).collect()
    }
    pruned = {
        (r["vec_id_a"], r["vec_id_b"], r["cos_micro"])
        for r in similarity.embedding_neardup_pairs(
            _emb(spark), max_hamming=4
        ).collect()
    }
    assert pruned <= exact
    assert len(pruned) < len(exact)  # hamming ≤4/12 prunes on this corpus


def test_gini_udaf_matches_numpy(spark):
    """X4 grouped-agg pandas UDAF vs local numpy oracle per zone."""
    import numpy as np

    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators.custom_agg import (
        gini_np,
        zone_area_inequality,
    )
    from tree_sitter_analyzer_spark.operators.pip_join import pip_join

    matched = pip_join(
        synth.tiles_df(spark, SF_TINY), synth.zones_df(spark), res=9
    )
    got = {
        r["polygon_id"]: (r["n_tiles"], r["area_gini"])
        for r in zone_area_inequality(matched).collect()
    }
    pdf = matched.select("polygon_id", "w", "h").toPandas()
    pdf["pixels"] = pdf["w"].astype(float) * pdf["h"]
    for pid, grp in pdf.groupby("polygon_id"):
        n, g = got[pid]
        assert n == len(grp)
        assert abs(g - gini_np(grp["pixels"].to_numpy())) < 1e-12


def test_grouped_map_zscore_matches_numpy(spark):
    """Grouped-map applyInPandas vs a local per-group numpy oracle."""
    import numpy as np

    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators.custom_agg import per_zone_zscore
    from tree_sitter_analyzer_spark.operators.pip_join import pip_join

    matched = pip_join(
        synth.tiles_df(spark, SF_TINY), synth.zones_df(spark), res=9
    )
    got = {
        (r["polygon_id"], r["image_id"]): r["area_z_milli"]
        for r in per_zone_zscore(matched).collect()
    }
    pdf = matched.select("polygon_id", "image_id", "w", "h").toPandas()
    pdf["area"] = pdf["w"].astype(float) * pdf["h"]
    for pid, grp in pdf.groupby("polygon_id"):
        a = grp["area"].to_numpy()
        mu, sd = a.mean(), a.std()
        z = np.zeros(len(a)) if sd == 0 else (a - mu) / sd
        for iid, zz in zip(grp["image_id"], z):
            assert got[(pid, iid)] == int(np.floor(zz * 1000))


def test_prefix_filter_excludes_stop_words_and_stays_exact(spark):
    """AllPairs prefix-filter audit (the stop-word blowup VERDICT flagged):
    on a corpus where one token appears in EVERY doc, the candidate stage
    must not bucket all docs on the stop word — yet the output must still
    equal the naive exact Jaccard (prefix filtering is lossless for
    jac >= t)."""
    from pyspark.sql import functions as F

    rows = [(i, "en", f"the a{i} b{i}") for i in range(20)]
    rows += [(100, "en", "the dup1 dup2"), (101, "en", "the dup1 dup2")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, text STRING")

    w = dedup._words(docs)
    sizes = w.groupBy("doc_id").agg(F.count("*").alias("n"))
    cand = dedup.jaccard_prefix_candidates(w, sizes, 500)
    # every doc is 3 words -> prefix = 2 rarest; "the" (df=22) is never a
    # prefix token, so the only candidate is the true dup pair — a naive
    # word join on "the" would have yielded all 231 pairs.
    assert [(r["doc_a"], r["doc_b"]) for r in cand.collect()] == [(100, 101)]

    got = {
        (r["doc_a"], r["doc_b"], r["jac_milli"])
        for r in dedup.token_jaccard_pairs(docs, 500).collect()
    }
    assert got == {(100, 101, 1000)}


def test_simhash_bands_are_not_degenerate(spark):
    """Bucket-size audit for the simhash band join (the phash-bits
    lesson): on a DIVERSE corpus every band must spread across values — a
    band over structurally-constant bits (wrong shift/width) would put all
    docs in one bucket and silently restore the all-pairs join.

    The audit runs on a seeded random-vocabulary corpus, not the driver
    documents: that corpus is deliberately dense (mean pairwise Jaccard
    ≈0.62), so its simhash values cluster GENUINELY — there, big buckets
    mirror true dup-cluster sizes, which is the collision LSH wants."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = [
        (i, "en", " ".join(rng.sample(vocab, 20))) for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, text STRING")
    s = dedup.simhash_docs(docs, 16)
    n = s.count()
    for shift, width in dedup.band_layout(16, dedup.SIMHASH_BANDS):
        top = (
            s.groupBy(
                F.expr(f"shiftright(simhash, {shift}) & {(1 << width) - 1}").alias("v")
            )
            .count()
            .agg(F.max("count").alias("m"), F.count("*").alias("nv"))
            .first()
        )
        assert top["nv"] > 1, f"band@{shift} constant"
        assert top["m"] < n * 0.5, f"band@{shift} degenerate: {top['m']}/{n}"


def test_phash_bands_are_not_degenerate(spark):
    """Bucket-size audit for the multi-index hamming join: no (band,
    value) bucket may hold a large share of the corpus. Guards against
    the constant-band regression (a band over bits the synthetic phash
    never sets made every tile share one bucket -> full N^2 candidates)."""
    from pyspark.sql import functions as F

    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators import dedup

    tiles = synth.tiles_df(spark, SF_TINY)
    n = tiles.count()
    for b in range(dedup.PHASH_BANDS):
        top = (
            tiles.groupBy(F.expr(dedup._phash_band_spark(b)).alias("v"))
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        assert top < n * 0.2, f"band {b} degenerate: max bucket {top}/{n}"
