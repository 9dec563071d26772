"""Approximate-nearest-neighbor search over embedding columns.

Re-expresses the reference's semantic search (``semantic_search.py:26-60,
132-163``: BM25 prefilter → token-cosine rerank) for `array<float>`
embeddings:

- ``ann_brute_topk`` — exact cosine top-k, the correctness baseline.
  Embeddings are quantized to integers (floor(x·1000)) BEFORE the dot
  product, so both Spark and the DuckDB oracle compute bit-identical
  scores: integer dot products are summation-order-independent (the
  float-reduction nondeterminism problem is designed out).
- ``ann_lsh_topk`` — the scale path: random-hyperplane (sign) LSH over
  md5-seeded ±1 planes bucketizes vectors; top-k is searched only within
  buckets at increasing hamming radius. Candidate gen → exact rerank,
  the O4 two-phase pattern again. Verified by a recall test vs brute
  force (tests/test_similarity.py), not by SQL oracle.

All vector math is JVM-side (``zip_with`` + ``aggregate`` higher-order
functions) — no UDF in the hot path.

Scale: brute force is O(Q·N) — correct baseline, usable when Q is small
(it's a broadcast of Q against an N-row scan, no shuffle). LSH buckets
cut the scan to matching buckets; at 10^12 rows add IVF-style coarse
centroids per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import md5int_spark

QUANT = 1000

_QVEC = f"transform(embedding, x -> CAST(floor(x * {QUANT}e0) AS BIGINT))"
_DOT = "aggregate(zip_with(qa, ca, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def _norm_sql(vec: str) -> str:
    return f"aggregate(transform({vec}, x -> x * x), 0L, (acc, x) -> acc + x)"


def _quantized(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        F.expr(_QVEC).alias("qv"),
        F.expr(_norm_sql(_QVEC)).alias("nrm"),
    )


def ann_brute_topk(emb: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Exact cosine top-k of every vector against the first ``n_queries``
    vectors (vec_id < n_queries), self excluded.

    cos_micro = floor(1e6 · dot / sqrt(na·nb)) over quantized ints —
    deterministic across engines. Ties broken by vec_id.
    """
    q = _quantized(emb)
    queries = q.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qa"),
        F.col("nrm").alias("qn"),
    )
    cands = q.select(
        F.col("vec_id"), F.col("qv").alias("ca"), F.col("nrm").alias("cn")
    )
    scored = (
        cands.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cos_micro",
            F.expr("CAST(floor(1e6 * dot / sqrt(CAST(qn AS DOUBLE) * cn)) AS BIGINT)"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cos_micro"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), "vec_id", "cos_micro")
    )


def ann_brute_oracle(n_queries: int = 5, k: int = 5) -> str:
    qvec = f"list_transform(embedding, x -> CAST(floor(x * {QUANT}e0) AS DOUBLE))"
    return f"""
WITH q AS (
  SELECT vec_id,
         {qvec} AS qv,
         list_dot_product({qvec}, {qvec}) AS nrm
  FROM embeddings
),
scored AS (
  SELECT c.vec_id AS vec_id, s.vec_id AS query_id,
         CAST(floor(1e6 * list_dot_product(s.qv, c.qv)
              / sqrt(s.nrm * c.nrm)) AS BIGINT) AS cos_micro
  FROM q c CROSS JOIN (SELECT * FROM q WHERE vec_id < {n_queries}) s
  WHERE c.vec_id <> s.vec_id
)
SELECT query_id, rank, vec_id, cos_micro FROM (
  SELECT query_id, vec_id, cos_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_micro DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# --- Embedding-cosine near-duplicate pairs (task-brief dedup tier) ----------

NEARDUP_THRESHOLD_MICRO = 350_000


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold_micro: int = NEARDUP_THRESHOLD_MICRO,
    max_hamming: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: all (a, b), a < b, with
    quantized cosine >= ``threshold_micro`` / 1e6 (A3 clone detection's
    similarity-join tier; the task brief's "embedding-cosine near-dup").

    ``max_hamming=None`` — exact all-pairs verify (the oracle-gated
    baseline; O(N^2), correct and fine when the candidate pool is small —
    documented audit-only tier).
    ``max_hamming=h`` — sign-LSH pruning: only pairs whose ``N_PLANES``-bit
    signatures differ in <= h bits are verified. Candidates come from a
    pigeonhole band EQUI-join (exactly like ``phash_hamming_pairs``): the
    signature splits into h+1 disjoint bands, any pair with hamming <= h
    shares >= 1 exact band, so candidates = pairs sharing (band_idx,
    band_val) — the signature IS the join key, no nested-loop over N^2
    pairs. Exact bit_count + cosine verify restores precision (the same
    candidate-gen -> exact-verify shape as the PIP join, SURVEY.md O4).
    ``h >= N_PLANES`` makes the hamming filter vacuous -> degenerates to
    the exact tier (asserted in tests).
    """
    from .dedup import band_layout

    q = _quantized(emb)
    a = q.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("qv").alias("qa"),
        F.col("nrm").alias("qn"),
    )
    b = q.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("qv").alias("ca"),
        F.col("nrm").alias("cn"),
    )
    if max_hamming is None or max_hamming >= N_PLANES:
        # Exact tier (or vacuous prune): ordered-pair join, no signatures.
        pairs = a.join(F.broadcast(b), F.col("vec_id_a") < F.col("vec_id_b"))
    else:
        bands = max_hamming + 1
        dim_probe = emb.select(F.size("embedding").alias("d")).first()["d"]
        sig = q.withColumn("sig", F.expr(_sig_expr(dim_probe)))
        banded = sig.select(
            "vec_id",
            "sig",
            F.explode(
                F.array(
                    *[
                        F.expr(
                            f"named_struct('b', {i}, 'v', "
                            f"(shiftright(sig, {shift}) & {(1 << width) - 1}))"
                        )
                        for i, (shift, width) in enumerate(
                            band_layout(N_PLANES, bands)
                        )
                    ]
                )
            ).alias("band"),
        ).select(
            "vec_id", "sig",
            F.col("band.b").alias("b"), F.col("band.v").alias("v"),
        )
        ba = banded.toDF("vec_id_a", "sig_a", "b", "v")
        bb = banded.toDF("vec_id_b", "sig_b", "b", "v")
        cand = (
            ba.join(bb, ["b", "v"])
            .where(F.col("vec_id_a") < F.col("vec_id_b"))
            .select("vec_id_a", "vec_id_b", "sig_a", "sig_b")
            .dropDuplicates(["vec_id_a", "vec_id_b"])
            .where(F.expr("bit_count(sig_a ^ sig_b)") <= max_hamming)
            .select("vec_id_a", "vec_id_b")
        )
        pairs = cand.join(a, "vec_id_a").join(b, "vec_id_b")
    return (
        pairs.withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cos_micro",
            F.expr("CAST(floor(1e6 * dot / sqrt(CAST(qn AS DOUBLE) * cn)) AS BIGINT)"),
        )
        .where(F.col("cos_micro") >= threshold_micro)
        .select("vec_id_a", "vec_id_b", "cos_micro")
    )


def embedding_neardup_oracle(threshold_micro: int = NEARDUP_THRESHOLD_MICRO) -> str:
    qvec = f"list_transform(embedding, x -> CAST(floor(x * {QUANT}e0) AS DOUBLE))"
    return f"""
WITH q AS (
  SELECT vec_id, {qvec} AS qv, list_dot_product({qvec}, {qvec}) AS nrm
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         CAST(floor(1e6 * list_dot_product(a.qv, b.qv)
              / sqrt(a.nrm * b.nrm)) AS BIGINT) AS cos_micro
  FROM q a JOIN q b ON a.vec_id < b.vec_id
)
SELECT vec_id_a, vec_id_b, cos_micro FROM scored
WHERE cos_micro >= {threshold_micro}
"""


# --- LSH variant (Spark-only; recall-tested vs brute) -----------------------

N_PLANES = 12


def _sig_expr(dim: int) -> str:
    """Sign-LSH signature: bit p = sign(dot(v, plane_p)) where plane_p's
    ±1 components are md5-derived from (p, dim index) — deterministic,
    no stored plane matrix, fully JVM-side."""
    bits = []
    for p in range(N_PLANES):
        plane_hash = md5int_spark(f"concat('p{p}_', d)")
        comp = (
            f"aggregate(zip_with(qv, sequence(0, size(qv) - 1), "
            f"(x, d) -> CASE WHEN {plane_hash} % 2 = 0 "
            f"THEN x ELSE -x END), 0L, (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {comp} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _banded(df: DataFrame, sig_col: str, bands: int):
    """Explode a signature into (b, v) pigeonhole band keys — the same
    banding the dedup tiers join on (dedup.band_layout)."""
    from .dedup import band_layout

    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.expr(
                        f"named_struct('b', {i}, 'v', "
                        f"(shiftright({sig_col}, {shift}) & {(1 << width) - 1}))"
                    )
                    for i, (shift, width) in enumerate(band_layout(N_PLANES, bands))
                ]
            )
        ).alias("band"),
    ).select(*df.columns, F.col("band.b").alias("b"), F.col("band.v").alias("v"))


def ann_lsh_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 5, max_hamming: int = 2
) -> DataFrame:
    """Sign-LSH bucketed ANN: candidates = vectors whose signature is
    within ``max_hamming`` bits of the query signature; exact quantized
    cosine reranks. Recall vs brute measured in tests (≈1.0 at these
    parameters on the synthetic embeddings).

    Candidate generation is a pigeonhole band EQUI-JOIN (the signature IS
    the join key, not a post-scan filter): the ``N_PLANES``-bit signature
    splits into ``max_hamming + 1`` disjoint bands, any pair within the
    hamming radius shares ≥ 1 exact band, so candidates = rows sharing
    (band, value) with a query — at 10^12 rows the scan prunes to the
    queries' buckets instead of filtering all N per query (the same
    banded join the dedup tier uses, ``embedding_neardup_pairs``).
    Exact bit_count + cosine verify on candidates restores precision, so
    the result set is IDENTICAL to the full-scan definition (which the
    DuckDB oracle replicates). ``max_hamming >= N_PLANES`` makes the
    radius vacuous — falls back to the exact broadcast scan."""
    q = _quantized(emb)
    dim_probe = emb.select(F.size("embedding").alias("d")).first()["d"]
    sig = q.withColumn("sig", F.expr(_sig_expr(dim_probe)))
    queries = sig.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qa"),
        F.col("nrm").alias("qn"),
        F.col("sig").alias("qsig"),
    )
    cands = sig.select(
        "vec_id", F.col("qv").alias("ca"), F.col("nrm").alias("cn"), "sig"
    )
    if max_hamming >= N_PLANES:
        pairs = cands.crossJoin(F.broadcast(queries)).where(
            F.col("vec_id") != F.col("query_id")
        )
    else:
        pairs = (
            _banded(cands, "sig", max_hamming + 1)
            .join(F.broadcast(_banded(queries, "qsig", max_hamming + 1)),
                  ["b", "v"])
            .where(F.col("vec_id") != F.col("query_id"))
            # a pair can share several bands — one candidate row per pair
            .dropDuplicates(["query_id", "vec_id"])
            .drop("b", "v")
        )
    scored = (
        pairs.where(F.expr("bit_count(sig ^ qsig)") <= max_hamming)
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cos_micro",
            F.expr("CAST(floor(1e6 * dot / sqrt(CAST(qn AS DOUBLE) * cn)) AS BIGINT)"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cos_micro"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), "vec_id", "cos_micro")
    )


# --- IVF variant (coarse quantizer buckets; Spark-only, recall-tested) -------

N_CENTROIDS = 16
N_PROBE = 4


def _assignments(emb: DataFrame, n_centroids: int) -> tuple[DataFrame, DataFrame]:
    """(centroids, vector→centroid assignment) by max quantized cosine.

    Centroids are the first ``n_centroids`` vectors — a deterministic
    stand-in for a k-means coarse quantizer (swap in Spark ML KMeans on a
    sampled fraction at production scale; the bucketing/probing mechanics
    are identical)."""
    q = _quantized(emb)
    cents = (
        q.where(F.col("vec_id") < n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("qv").alias("qa"),
            F.col("nrm").alias("qn"),
        )
    )
    scored = (
        q.select(F.col("vec_id"), F.col("qv").alias("ca"), F.col("nrm").alias("cn"))
        .crossJoin(F.broadcast(cents))
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cos", F.expr("dot / sqrt(CAST(qn AS DOUBLE) * cn)")
        )
    )
    win = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "centroid_id")
    assign = (
        scored.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") == 1)
        .select("vec_id", "centroid_id")
    )
    return cents, assign


def ann_ivf_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF ANN: vectors bucketed by nearest coarse centroid; each query
    probes its ``n_probe`` closest centroids' buckets only, then exact
    quantized-cosine rerank (candidate-gen → verify, SURVEY.md O4).

    ``n_probe == n_centroids`` degenerates to exact brute force (asserted
    in tests); recall at the default probe width is measured vs brute.
    At 10^12 rows: partition the table by centroid_id (Iceberg bucket) so
    a probe reads only matching partitions.
    """
    q = _quantized(emb)
    cents, assign = _assignments(emb, n_centroids)
    queries = q.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qa"),
        F.col("nrm").alias("qn"),
    )
    # which buckets each query probes
    probe_scored = (
        queries.crossJoin(F.broadcast(cents.withColumnRenamed("qa", "ca")
                                      .withColumnRenamed("qn", "cn")))
        .withColumn("dot", F.expr(_DOT))
        .withColumn("cos", F.expr("dot / sqrt(CAST(qn AS DOUBLE) * cn)"))
    )
    pwin = Window.partitionBy("query_id").orderBy(F.desc("cos"), "centroid_id")
    probes = (
        probe_scored.withColumn("rk", F.row_number().over(pwin))
        .where(F.col("rk") <= n_probe)
        .select("query_id", "centroid_id")
    )
    cand_ids = (
        assign.join(F.broadcast(probes), "centroid_id")
        .select("query_id", "vec_id")
    )
    cands = cand_ids.join(
        q.select("vec_id", F.col("qv").alias("ca"), F.col("nrm").alias("cn")),
        "vec_id",
    )
    scored = (
        cands.join(F.broadcast(queries), "query_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cos_micro",
            F.expr("CAST(floor(1e6 * dot / sqrt(CAST(qn AS DOUBLE) * cn)) AS BIGINT)"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cos_micro"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), "vec_id", "cos_micro")
    )


def ann_ivf_kmeans_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    seed: int = 7,
) -> DataFrame:
    """IVF ANN with a REAL coarse quantizer: Spark ML KMeans centroids
    replace the deterministic first-N stand-in of ``ann_ivf_topk`` (its
    docstring's own production prescription). Bucketing/probing mechanics
    are identical: vectors partition by nearest centroid (the model's
    prediction), each query probes its ``n_probe`` closest centroids'
    buckets, exact quantized-cosine rerank on the candidates.

    Spark-only (KMeans is not SQL-expressible): correctness comes from
    the probe-all invariant — ``n_probe == n_centroids`` equals brute
    force EXACTLY regardless of clustering quality (every bucket is
    probed) — plus a recall floor at the default probe width; both pinned
    in tests/test_similarity.py. At 10^12 rows: fit on a sample, store
    centroid_id as an Iceberg bucket partition, probes prune partitions.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=10).fit(feats)
    assign = model.transform(feats).select(
        "vec_id", F.col("prediction").alias("centroid_id")
    )
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cents = emb.sparkSession.createDataFrame(
        centers, "centroid_id INT, center ARRAY<DOUBLE>"
    )
    q = _quantized(emb)
    queries = q.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qa"),
        F.col("nrm").alias("qn"),
    )
    # probe selection: euclidean distance query→centroid (KMeans' metric)
    qvecs = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    dist2 = (
        "aggregate(zip_with(qe, center, (x, c) -> (x - c) * (x - c)),"
        " 0d, (acc, v) -> acc + v)"
    )
    probe_scored = qvecs.crossJoin(F.broadcast(cents)).withColumn(
        "d2", F.expr(dist2)
    )
    pwin = Window.partitionBy("query_id").orderBy("d2", "centroid_id")
    probes = (
        probe_scored.withColumn("rk", F.row_number().over(pwin))
        .where(F.col("rk") <= n_probe)
        .select("query_id", "centroid_id")
    )
    cand_ids = assign.join(F.broadcast(probes), "centroid_id").select(
        "query_id", "vec_id"
    )
    cands = cand_ids.join(
        q.select("vec_id", F.col("qv").alias("ca"), F.col("nrm").alias("cn")),
        "vec_id",
    )
    scored = (
        cands.join(F.broadcast(queries), "query_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cos_micro",
            F.expr("CAST(floor(1e6 * dot / sqrt(CAST(qn AS DOUBLE) * cn)) AS BIGINT)"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cos_micro"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), "vec_id", "cos_micro")
    )


# --- DuckDB oracles for the approximate variants ----------------------------
#
# Both LSH and IVF are fully deterministic (md5-seeded planes, first-N
# centroids, integer dot products, centroid-id tie-breaks), so the oracle
# can replicate the *approximate* plan exactly rather than settle for a
# rows-only check: same signatures, same probe sets, same rerank.

_QVEC_DUCK = f"list_transform(embedding, x -> CAST(floor(x * {QUANT}e0) AS BIGINT))"
_QVEC_DUCK_D = f"list_transform(embedding, x -> CAST(floor(x * {QUANT}e0) AS DOUBLE))"


def ann_lsh_oracle(n_queries: int = 5, k: int = 5, max_hamming: int = 2) -> str:
    from ..functions import md5int_duck

    parts = []
    for p in range(N_PLANES):
        h = md5int_duck(f"'p{p}_' || d")
        parts.append(f"sum(CASE WHEN {h} % 2 = 0 THEN qx ELSE -qx END) AS c{p}")
    comps = ",\n         ".join(parts)
    sig = " + ".join(
        f"(CASE WHEN c{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(N_PLANES)
    )
    return f"""
WITH ex AS (
  SELECT vec_id,
         unnest({_QVEC_DUCK}) AS qx,
         unnest(generate_series(0, len(embedding) - 1)) AS d
  FROM embeddings
),
comps AS (
  SELECT vec_id,
         {comps}
  FROM ex GROUP BY vec_id
),
sigs AS (SELECT vec_id, {sig} AS sig FROM comps),
q AS (
  SELECT e.vec_id, {_QVEC_DUCK_D} AS qv,
         list_dot_product({_QVEC_DUCK_D}, {_QVEC_DUCK_D}) AS nrm, s.sig
  FROM embeddings e JOIN sigs s ON s.vec_id = e.vec_id
),
scored AS (
  SELECT c.vec_id AS vec_id, s.vec_id AS query_id,
         CAST(floor(1e6 * list_dot_product(s.qv, c.qv)
              / sqrt(s.nrm * c.nrm)) AS BIGINT) AS cos_micro
  FROM q c JOIN (SELECT * FROM q WHERE vec_id < {n_queries}) s
    ON c.vec_id <> s.vec_id AND bit_count(xor(c.sig, s.sig)) <= {max_hamming}
)
SELECT query_id, rank, vec_id, cos_micro FROM (
  SELECT query_id, vec_id, cos_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_micro DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def ann_ivf_oracle(
    n_queries: int = 5,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> str:
    return f"""
WITH q AS (
  SELECT vec_id, {_QVEC_DUCK_D} AS qv,
         list_dot_product({_QVEC_DUCK_D}, {_QVEC_DUCK_D}) AS nrm
  FROM embeddings
),
cents AS (SELECT vec_id AS centroid_id, qv, nrm FROM q WHERE vec_id < {n_centroids}),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.qv, c.qv) / sqrt(v.nrm * c.nrm) DESC,
                      c.centroid_id) AS rk
    FROM q v CROSS JOIN cents c
  ) WHERE rk = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT s.vec_id AS query_id, c.centroid_id,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY list_dot_product(s.qv, c.qv) / sqrt(s.nrm * c.nrm) DESC,
                      c.centroid_id) AS rk
    FROM (SELECT * FROM q WHERE vec_id < {n_queries}) s CROSS JOIN cents c
  ) WHERE rk <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.vec_id FROM assign a JOIN probes p USING (centroid_id)
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         CAST(floor(1e6 * list_dot_product(s.qv, c.qv)
              / sqrt(s.nrm * c.nrm)) AS BIGINT) AS cos_micro
  FROM cand
  JOIN q c ON c.vec_id = cand.vec_id
  JOIN q s ON s.vec_id = cand.query_id
)
SELECT query_id, rank, vec_id, cos_micro FROM (
  SELECT query_id, vec_id, cos_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_micro DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# --- Product quantization (PQ/ADC) variant ----------------------------------
#
# R129: the fourth ANN tier (Jégou 2011 "Product Quantization for Nearest
# Neighbor Search" — public paper), completing the quartet: brute =
# exactness, sign-LSH = hash buckets, IVF = coarse partitions, PQ =
# compressed-domain scan. Vectors are cut into PQ_M subspaces; each
# subvector is replaced by the id of its nearest codebook centroid (integer
# L2 over the quantized ints, centroid-id tie-break), so a 64-dim float
# vector becomes PQ_M bytes. A query never touches the raw vectors: it
# precomputes an ADC lookup table (query-subvector → centroid distance,
# PQ_M·PQ_K integers) and scores every database vector by summing PQ_M
# table entries — here an equi-join of the code frame against the
# broadcast table on (subspace, code), i.e. the compressed-domain scan is
# a narrow join, not a math kernel. The codebook is the first PQ_K
# vectors' subvectors (the IVF first-N discipline — deterministic, so the
# DuckDB oracle rebuilds codes, tables, and scores bit-for-bit; swap in
# sampled k-means per subspace at production scale, mechanics unchanged).
# At 10^12 rows the code frame is ~PQ_M·8 bytes/vector — the thing you
# keep hot while raw vectors stay cold.

PQ_M = 8  # subspaces (64-dim → 8 dims each)
PQ_K = 16  # centroids per subspace codebook


def _pq_subvectors(q: DataFrame) -> DataFrame:
    """(vec_id, s, sub) — the quantized vector cut into PQ_M slices.
    posexplode materializes the slice as a generator output attribute, so
    downstream lambdas bind to the exploded column (the winnow
    Catalyst-recompute trap never applies)."""
    dim = 64 // PQ_M
    slices = F.array(*[F.slice("qv", s * dim + 1, dim) for s in range(PQ_M)])
    return q.select(
        "vec_id", F.posexplode(slices).alias("s", "sub")
    )


_SUB_D2 = (
    "aggregate(zip_with(sub, cvec, (x, y) -> (x - y) * (x - y)), "
    "0L, (acc, v) -> acc + v)"
)


def ann_pq_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """PQ-ADC approximate top-k: (query_id, rank, vec_id, adc_d2) — the k
    database vectors with the smallest summed ADC distance per query
    (self excluded, vec_id tie-break). Exact integer arithmetic end to
    end: the oracle replays codebook assignment, table build, and the
    compressed-domain scan identically."""
    q = _quantized(emb)
    subs = _pq_subvectors(q)
    cents = F.broadcast(
        _pq_subvectors(q.where(F.col("vec_id") < PQ_K)).select(
            F.col("vec_id").alias("cid"), "s", F.col("sub").alias("cvec")
        )
    )
    codes = (
        subs.join(cents, "s")
        .withColumn("d2", F.expr(_SUB_D2))
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select("vec_id", "s", F.col("m.cid").alias("code"))
    )
    qtab = F.broadcast(
        _pq_subvectors(q.where(F.col("vec_id") < n_queries))
        .withColumnRenamed("vec_id", "query_id")
        .join(cents, "s")
        .withColumn("qd2", F.expr(_SUB_D2))
        .select("query_id", "s", "cid", "qd2")
    )
    adc = (
        codes.join(qtab, (codes.s == qtab.s) & (codes.code == qtab.cid))
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd2").alias("adc_d2"))
    )
    win = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("bigint").alias("rank"),
            "vec_id", "adc_d2",
        )
    )


def ann_pq_oracle(n_queries: int = 5, k: int = 5) -> str:
    dim = 64 // PQ_M
    return f"""
WITH pq_v AS (
  SELECT vec_id, (j - 1) // {dim} AS s, (j - 1) % {dim} AS p,
         CAST(floor(e * {QUANT}e0) AS BIGINT) AS x
  FROM (SELECT vec_id, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS j
        FROM embeddings)),
pq_c AS (SELECT vec_id AS cid, s, p, x AS cx FROM pq_v
         WHERE vec_id < {PQ_K}),
pq_d AS (
  SELECT v.vec_id, v.s, c.cid,
         sum((v.x - c.cx) * (v.x - c.cx)) AS d2
  FROM pq_v v JOIN pq_c c ON c.s = v.s AND c.p = v.p
  GROUP BY 1, 2, 3),
pq_code AS (
  SELECT vec_id, s, cid AS code FROM (
    SELECT vec_id, s, cid,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY d2, cid) AS rk
    FROM pq_d) WHERE rk = 1),
pq_q AS (SELECT vec_id AS query_id, s, cid, d2 AS qd2 FROM pq_d
         WHERE vec_id < {n_queries}),
pq_adc AS (
  SELECT q.query_id, v.vec_id, CAST(sum(q.qd2) AS BIGINT) AS adc_d2
  FROM pq_code v JOIN pq_q q ON q.s = v.s AND q.cid = v.code
  WHERE v.vec_id <> q.query_id
  GROUP BY 1, 2)
SELECT query_id, rank, vec_id, adc_d2 FROM (
  SELECT query_id, vec_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, vec_id) AS rank
  FROM pq_adc) WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# R200: dimension-truncation recall audit (the Matryoshka/MRL question,
# public: Kusupati et al. 2022) — what does serving a PREFIX of each
# embedding cost in retrieval quality? For prefix widths 8/16/32/64,
# the exact brute-force cosine top-k is recomputed on the truncated
# vectors and scored against the full-width ground truth as recall@k
# per-mille. Same integer-quantized cosine as ann_brute_topk, so both
# engines replay the identical rankings; ties by vec_id.
# Scale: an EVAL harness — runs on a query sample by design (Q·N
# broadcast per width, like the brute tier it audits); the per-width
# passes are independent scans of the same quantized frame.
# ---------------------------------------------------------------------------

DIMS_LADDER = (8, 16, 32, 64)


def _topk_at_dims(q: DataFrame, dims: int, n_queries: int,
                  k: int) -> DataFrame:
    t = q.select(
        "vec_id",
        F.expr(f"slice(qv, 1, {dims})").alias("tv"),
    ).select(
        "vec_id", F.col("tv"),
        F.expr(_norm_sql("tv")).alias("nrm"),
    )
    queries = t.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("tv").alias("qa"),
        F.col("nrm").alias("qn"),
    )
    cands = t.select(
        "vec_id", F.col("tv").alias("ca"), F.col("nrm").alias("cn")
    )
    scored = (
        cands.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cos_micro",
            F.expr(
                "CAST(floor(1e6 * dot / sqrt(CAST(qn AS DOUBLE) * cn))"
                " AS BIGINT)"
            ),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), "vec_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id")
    )


def ann_dim_audit(emb: DataFrame, n_queries: int = 5,
                  k: int = 5) -> DataFrame:
    """(dims, matched, recall_pm): recall@k of prefix-width brute
    retrieval vs the full-width ground truth."""
    q = _quantized(emb).localCheckpoint(eager=False)
    full = _topk_at_dims(q, DIMS_LADDER[-1], n_queries, k)
    outs = []
    for d in DIMS_LADDER:
        t = _topk_at_dims(q, d, n_queries, k)
        outs.append(
            t.join(full, ["query_id", "vec_id"], "left_semi")
            .agg(F.count("*").cast("bigint").alias("matched"))
            .selectExpr(
                f"CAST({d} AS BIGINT) AS dims", "matched",
                f"(1000 * matched) DIV {n_queries * k} AS recall_pm",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def ann_dim_audit_oracle(n_queries: int = 5, k: int = 5) -> str:
    arms = []
    for d in DIMS_LADDER:
        arms.append(f"""
  SELECT CAST({d} AS BIGINT) AS dims,
         CAST(count(*) AS BIGINT) AS matched,
         (1000 * count(*)) // {n_queries * k} AS recall_pm
  FROM da_top{d} t JOIN da_top{DIMS_LADDER[-1]} g
    ON g.query_id = t.query_id AND g.vec_id = t.vec_id""")
    ctes = ["""da_q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(x * 1000e0) AS DOUBLE)) AS qv
  FROM embeddings)"""]
    for d in DIMS_LADDER:
        ctes.append(f"""da_t{d} AS (
  SELECT vec_id, qv[1:{d}] AS tv,
         list_sum(list_transform(qv[1:{d}], x -> x * x)) AS nrm
  FROM da_q)""")
        ctes.append(f"""da_s{d} AS (
  SELECT c.vec_id, q.vec_id AS query_id,
         CAST(floor(1e6 * list_sum(list_transform(range(1, {d} + 1),
             i -> q.tv[i] * c.tv[i]))
           / sqrt(q.nrm * c.nrm)) AS BIGINT) AS cos_micro
  FROM da_t{d} c JOIN da_t{d} q
    ON q.vec_id < {n_queries} AND c.vec_id <> q.vec_id)""")
        ctes.append(f"""da_top{d} AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos_micro DESC, vec_id) AS rnk
    FROM da_s{d}) WHERE rnk <= {k})""")
    return "WITH " + ",\n".join(ctes) + "\n" + "\n  UNION ALL\n".join(arms)


# ---------------------------------------------------------------------------
# R205: embedding domain-shift matrix — per source pair, the cosine
# between the two sources' embedding CENTROIDS. Key trick: cosine is
# scale-invariant, so cos(mean_A, mean_B) == cos(sum_A, sum_B) and the
# whole statistic computes on integer SUMS of the quantized vectors —
# no division until the final micro-cosine. Scale shape: vectors
# posexplode to (source, dim, val) and aggregate map-side onto the
# (sources × 64-dim) frame; the pair fan joins per-dim on the bounded
# dimension frame and the dot aggregates in-stream. The reader: a
# near-1e6 off-diagonal means two domains are embedding-
# indistinguishable (this synthetic corpus — pinned); real domain
# shift reads as depressed off-diagonal entries.
# ---------------------------------------------------------------------------


def source_shift(emb: DataFrame, docs: DataFrame) -> DataFrame:
    """(source_a, source_b, cos_micro): centroid cosine per unordered
    source pair (including the diagonal, which pins at 1e6)."""
    sums = (
        emb.join(
            docs.selectExpr("doc_id AS vec_id", "source"), "vec_id"
        )
        .selectExpr(
            "source",
            f"posexplode({_QVEC}) AS (dim, val)",
        )
        .groupBy("source", "dim")
        .agg(F.expr("CAST(sum(val) AS BIGINT) AS s"))
        .localCheckpoint(eager=False)
    )
    nrm = sums.groupBy("source").agg(
        F.expr("CAST(sum(s * s) AS BIGINT) AS n2")
    )
    a = sums.selectExpr("source AS source_a", "dim", "s AS sa")
    b = sums.selectExpr("source AS source_b", "dim", "s AS sb")
    dots = (
        a.join(b, "dim")
        .where(F.col("source_a") <= F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.expr("CAST(sum(sa * sb) AS BIGINT) AS dot"))
    )
    return (
        dots.join(
            nrm.selectExpr("source AS source_a", "n2 AS na"), "source_a"
        )
        .join(nrm.selectExpr("source AS source_b", "n2 AS nb"), "source_b")
        .selectExpr(
            "source_a", "source_b",
            "CAST(floor(1e6 * dot / sqrt(CAST(na AS DOUBLE) * nb))"
            " AS BIGINT) AS cos_micro",
        )
    )


def source_shift_oracle() -> str:
    return f"""
WITH ss_sums AS (
  SELECT d.source, u.j AS dim,
         CAST(sum(CAST(floor(u.e * {QUANT}e0) AS BIGINT)) AS BIGINT) AS s
  FROM (SELECT vec_id, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS j
        FROM embeddings) u
  JOIN documents d ON d.doc_id = u.vec_id
  GROUP BY 1, 2),
ss_nrm AS (
  SELECT source, CAST(sum(s * s) AS BIGINT) AS n2 FROM ss_sums GROUP BY 1),
ss_dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(a.s * b.s) AS BIGINT) AS dot
  FROM ss_sums a JOIN ss_sums b
    ON b.dim = a.dim AND a.source <= b.source
  GROUP BY 1, 2)
SELECT d.source_a, d.source_b,
       CAST(floor(1e6 * d.dot / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2))
         AS BIGINT) AS cos_micro
FROM ss_dots d
JOIN ss_nrm na ON na.source = d.source_a
JOIN ss_nrm nb ON nb.source = d.source_b"""


# --- R212: kNN label-noise detection (confident-learning-lite) ---------------
#
# The training-data hygiene op (Northcutt 2021 "confident learning"
# shape, kNN-vote form): a point whose k nearest neighbors
# predominantly carry a DIFFERENT label is a label-noise suspect.
# Candidates come from the same pigeonhole sign-LSH band EQUI-join the
# dedup tier uses (signature IS the join key — no all-pairs scan);
# exact integer-cosine verify + top-k per point; majority vote with
# deterministic (count DESC, label ASC) tie-break. Points with no
# hamming<=h candidate vote as -1 (isolated). Fully deterministic —
# the oracle replicates the candidate set itself via the same
# md5-seeded signatures.

VOTE_K = 5
VOTE_MAX_HAMMING = 3


def knn_label_noise(
    emb: DataFrame, k: int = VOTE_K, max_hamming: int = VOTE_MAX_HAMMING
) -> DataFrame:
    """(own_label, voted_label, n_points) — the kNN-vote label confusion
    matrix; off-diagonal mass = noise suspects."""
    from .dedup import band_layout

    q = _quantized(emb)
    dim_probe = emb.select(F.size("embedding").alias("d")).first()["d"]
    sig = q.withColumn("sig", F.expr(_sig_expr(dim_probe)))
    bands = max_hamming + 1
    banded = sig.select(
        "vec_id", "sig",
        F.explode(
            F.array(
                *[
                    F.expr(
                        f"named_struct('b', {i}, 'v', "
                        f"(shiftright(sig, {shift}) & {(1 << width) - 1}))"
                    )
                    for i, (shift, width) in enumerate(
                        band_layout(N_PLANES, bands)
                    )
                ]
            )
        ).alias("band"),
    ).select(
        "vec_id", "sig",
        F.col("band.b").alias("b"), F.col("band.v").alias("v"),
    )
    ba = banded.toDF("ia", "sig_a", "b", "v")
    bb = banded.toDF("ib", "sig_b", "b", "v")
    cand = (
        ba.join(bb, ["b", "v"])
        .where("ia <> ib")
        .select("ia", "ib", "sig_a", "sig_b")
        .dropDuplicates(["ia", "ib"])
        .where(F.expr(f"bit_count(sig_a ^ sig_b) <= {max_hamming}"))
        .select("ia", "ib")
    )
    va = q.selectExpr("vec_id AS ia", "qv AS qa", "nrm AS qn")
    vb = q.selectExpr("vec_id AS ib", "qv AS ca", "nrm AS cn")
    scored = (
        cand.join(va, "ia").join(vb, "ib")
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cos_micro",
            F.expr(
                "CAST(floor(1e6 * dot / sqrt(CAST(qn AS DOUBLE) * cn))"
                " AS BIGINT)"
            ),
        )
        .withColumn(
            "rk",
            F.expr(
                "row_number() OVER (PARTITION BY ia"
                " ORDER BY cos_micro DESC, ib)"
            ),
        )
        .where(F.col("rk") <= k)
        .select("ia", "ib")
    )
    lab = emb.select("vec_id", F.col("label").cast("bigint").alias("label"))
    votes = (
        scored.join(lab.selectExpr("vec_id AS ib", "label AS nb_label"), "ib")
        .groupBy("ia", "nb_label")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "wrk",
            F.expr(
                "row_number() OVER (PARTITION BY ia"
                " ORDER BY cnt DESC, nb_label)"
            ),
        )
        .where("wrk = 1")
        .selectExpr("ia AS vec_id", "nb_label AS voted_label")
    )
    return (
        lab.join(votes, "vec_id", "left")
        .selectExpr(
            "label AS own_label",
            "coalesce(voted_label, CAST(-1 AS BIGINT)) AS voted_label",
        )
        .groupBy("own_label", "voted_label")
        .agg(F.count("*").cast("bigint").alias("n_points"))
    )


def knn_label_noise_oracle(
    k: int = VOTE_K, max_hamming: int = VOTE_MAX_HAMMING
) -> str:
    from ..functions import md5int_duck

    parts = []
    for p in range(N_PLANES):
        h = md5int_duck(f"'p{p}_' || d")
        parts.append(
            f"sum(CASE WHEN {h} % 2 = 0 THEN qx ELSE -qx END) AS c{p}"
        )
    comps = ",\n         ".join(parts)
    sig = " + ".join(
        f"(CASE WHEN c{p} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"""
WITH ln_ex AS (
  SELECT vec_id, unnest({_QVEC_DUCK}) AS qx,
         unnest(generate_series(0, len(embedding) - 1)) AS d
  FROM embeddings),
ln_comps AS (SELECT vec_id, {comps} FROM ln_ex GROUP BY vec_id),
ln_sigs AS (SELECT vec_id, {sig} AS sig FROM ln_comps),
ln_q AS (
  SELECT e.vec_id, e.label, {_QVEC_DUCK_D} AS qv,
         list_dot_product({_QVEC_DUCK_D}, {_QVEC_DUCK_D}) AS nrm, s.sig
  FROM embeddings e JOIN ln_sigs s ON s.vec_id = e.vec_id),
ln_knn AS (
  SELECT ia, ib FROM (
    SELECT a.vec_id AS ia, b.vec_id AS ib,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY
             CAST(floor(1e6 * list_dot_product(a.qv, b.qv)
                  / sqrt(a.nrm * b.nrm)) AS BIGINT) DESC, b.vec_id)
             AS rk
    FROM ln_q a JOIN ln_q b
      ON a.vec_id <> b.vec_id
     AND bit_count(xor(a.sig, b.sig)) <= {max_hamming})
  WHERE rk <= {k}),
ln_votes AS (
  SELECT ia AS vec_id, nb_label AS voted_label FROM (
    SELECT n.ia, q.label AS nb_label, count(*) AS cnt,
           row_number() OVER (PARTITION BY n.ia
             ORDER BY count(*) DESC, q.label) AS wrk
    FROM ln_knn n JOIN ln_q q ON q.vec_id = n.ib
    GROUP BY 1, 2)
  WHERE wrk = 1)
SELECT CAST(q.label AS BIGINT) AS own_label,
       CAST(coalesce(v.voted_label, -1) AS BIGINT) AS voted_label,
       CAST(count(*) AS BIGINT) AS n_points
FROM ln_q q LEFT JOIN ln_votes v ON v.vec_id = q.vec_id
GROUP BY 1, 2
"""


# --- R213: cluster validity (Calinski-Harabasz) -------------------------------
#
# The linear-cost cluster-quality index (Calinski & Harabasz 1974):
# CH = [B/(k-1)] / [W/(n-k)] with B/W the between/within sums of
# squares — computable from per-cluster integer sums alone (no pair
# fan, unlike silhouette): W = SSQ_total - SUM_g |s_g|^2/n_g and
# B = SUM_g |s_g|^2/n_g - |S|^2/N over the quantized vectors. Each
# rational term is floored to milli-units per cluster (integer
# division — deterministic), then summed as bigints: no distributed
# float sum anywhere. Evaluated for TWO partitions of the same
# points — the data's label column and the deterministic IVF
# nearest-centroid assignment — so the index's discrimination is
# recorded, not assumed: on this corpus labels are geometry-random
# (CH ~ 1.0, exactly the null expectation: E[between per df] =
# E[within per df]) while the geometric partition scores well above
# it. Scale: one explode to (partition, dim) with map-side partial
# agg; everything after lives on the k x d dimension frame.


def _ivf_assign(emb: DataFrame) -> DataFrame:
    """Deterministic IVF coarse assignment (the ann_ivf_topk quantizer):
    nearest of the first-N_CENTROIDS vectors by cosine, centroid-id
    tie-break. Returns (vec_id, label)."""
    q = _quantized(emb)
    cents = q.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("qv").alias("qa"),
        F.col("nrm").alias("qn"),
    )
    return (
        q.selectExpr("vec_id", "qv AS ca", "nrm AS cn")
        .crossJoin(F.broadcast(cents))
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "rk",
            F.expr(
                "row_number() OVER (PARTITION BY vec_id ORDER BY"
                " dot / sqrt(CAST(qn AS DOUBLE) * cn) DESC, cid)"
            ),
        )
        .where("rk = 1")
        .selectExpr("vec_id", "CAST(cid AS BIGINT) AS label")
    )


def cluster_validity(emb: DataFrame) -> DataFrame:
    """One row per partitioning in {labels, ivf16}: (partitioning, n, k,
    ssq_q, b_milli, w_milli, ch_milli) over the quantized embeddings."""
    out = []
    for pname, lab in (
        ("labels", emb.select(
            "vec_id", F.col("label").cast("bigint").alias("label"))),
        ("ivf16", _ivf_assign(emb)),
    ):
        out.append(
            _cluster_validity_one(emb, lab).selectExpr(
                f"'{pname}' AS partitioning", "n", "k", "ssq_q",
                "b_milli", "w_milli", "ch_milli",
            )
        )
    return out[0].unionByName(out[1])


def _cluster_validity_one(emb: DataFrame, lab: DataFrame) -> DataFrame:
    q = _quantized(emb).join(lab, "vec_id")
    ex = q.selectExpr("label", "posexplode(qv) AS (d, qx)")
    sd = ex.groupBy("label", "d").agg(
        F.expr("CAST(sum(qx) AS BIGINT)").alias("sd")
    )
    per_g = (
        q.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("ng"),
            F.expr("CAST(sum(nrm) AS BIGINT)").alias("ssq_g"),
        )
        .join(
            sd.groupBy("label").agg(
                F.expr("CAST(sum(sd * sd) AS BIGINT)").alias("gn")
            ),
            "label",
        )
        .selectExpr(
            "label", "ng", "ssq_g",
            "CAST((1000 * gn) DIV ng AS BIGINT) AS gterm_milli",
        )
    )
    glob = (
        sd.groupBy("d")
        .agg(F.expr("CAST(sum(sd) AS BIGINT)").alias("gsd"))
        .agg(F.expr("CAST(sum(gsd * gsd) AS BIGINT)").alias("sn"))
    )
    return (
        per_g.agg(
            F.expr("CAST(sum(ng) AS BIGINT) AS n"),
            F.expr("CAST(count(*) AS BIGINT) AS k"),
            F.expr("CAST(sum(ssq_g) AS BIGINT) AS ssq_q"),
            F.expr("CAST(sum(gterm_milli) AS BIGINT) AS gsum_milli"),
        )
        .crossJoin(F.broadcast(glob))
        .selectExpr(
            "n", "k", "ssq_q",
            "gsum_milli - CAST((1000 * sn) DIV n AS BIGINT) AS b_milli",
            "1000 * ssq_q - gsum_milli AS w_milli",
            "CAST((1000 * (gsum_milli - CAST((1000 * sn) DIV n AS BIGINT))"
            " * (n - k)) DIV ((1000 * ssq_q - gsum_milli) * (k - 1))"
            " AS BIGINT) AS ch_milli",
        )
    )


def cluster_validity_oracle() -> str:
    return f"""
WITH cv_qv AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, {_QVEC_DUCK} AS qv,
         {_QVEC_DUCK_D} AS qvd,
         CAST(list_dot_product({_QVEC_DUCK}, {_QVEC_DUCK}) AS BIGINT)
           AS nrm
  FROM embeddings),
cv_asn AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.vec_id AS cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_dot_product(v.qvd, c.qvd)
               / sqrt(CAST(v.nrm AS DOUBLE) * c.nrm) DESC, c.vec_id)
             AS rk
    FROM cv_qv v JOIN cv_qv c ON c.vec_id < {N_CENTROIDS})
  WHERE rk = 1),
cv_q AS (
  SELECT 'labels' AS pt, vec_id, label, qv, nrm FROM cv_qv
  UNION ALL
  SELECT 'ivf16', q.vec_id, CAST(a.cid AS BIGINT), q.qv, q.nrm
  FROM cv_qv q JOIN cv_asn a ON a.vec_id = q.vec_id),
cv_ex AS (
  SELECT pt, label, unnest(qv) AS qx,
         unnest(generate_series(0, len(qv) - 1)) AS d
  FROM cv_q),
cv_sd AS (
  SELECT pt, label, d, CAST(sum(qx) AS BIGINT) AS sd
  FROM cv_ex GROUP BY 1, 2, 3),
cv_g AS (
  SELECT g.pt, g.label, g.ng, g.ssq_g,
         CAST((1000 * n.gn) // g.ng AS BIGINT) AS gterm_milli
  FROM (SELECT pt, label, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(nrm) AS BIGINT) AS ssq_g
        FROM cv_q GROUP BY 1, 2) g
  JOIN (SELECT pt, label, CAST(sum(sd * sd) AS BIGINT) AS gn
        FROM cv_sd GROUP BY 1, 2) n
    ON n.pt = g.pt AND n.label = g.label),
cv_glob AS (
  SELECT pt, CAST(sum(gsd * gsd) AS BIGINT) AS sn FROM (
    SELECT pt, d, CAST(sum(sd) AS BIGINT) AS gsd FROM cv_sd
    GROUP BY 1, 2) GROUP BY 1),
cv_agg AS (
  SELECT pt, CAST(sum(ng) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ssq_g) AS BIGINT) AS ssq_q,
         CAST(sum(gterm_milli) AS BIGINT) AS gsum_milli
  FROM cv_g GROUP BY 1)
SELECT a.pt AS partitioning, a.n, a.k, a.ssq_q,
       a.gsum_milli - CAST((1000 * g.sn) // a.n AS BIGINT) AS b_milli,
       1000 * a.ssq_q - a.gsum_milli AS w_milli,
       CAST((1000 * (a.gsum_milli - CAST((1000 * g.sn) // a.n AS BIGINT))
             * (a.n - a.k)) // ((1000 * a.ssq_q - a.gsum_milli)
                                * (a.k - 1))
         AS BIGINT) AS ch_milli
FROM cv_agg a JOIN cv_glob g ON g.pt = a.pt
"""


# ---------------------------------------------------------------------------
# R329: dominant principal direction by POWER ITERATION (von Mises
# 1929) — spectral analytics over the embedding table with no matrix
# library and no floats. The (uncentered) second-moment matrix
# S[j,k] = sum_i q_ij * q_ik is built JOIN-FREE: each row emits its
# 64x64 outer product through one nested higher-order lambda and the
# 4096-key hash aggregate eats the amplification in-stage (map-side
# partial agg — the in-stream discipline; no shuffle of exploded
# rows by vector id). Quantized components clamp to ±QUANT so every
# Gram entry stays <= 1e6 * n < 2^63 at 10^12 rows. S is then
# normalized per-mille of its max |entry| (same eigenvectors), and
# three power-iteration steps run on the BOUNDED 64-row vector
# frame (sign-safe per-mille renormalization each step: CASE on the
# sign, DIV on the positive operand). Output: the per-dimension
# trajectory (v1, v2, v3) — max |component| of each iterate is
# exactly 1000.
# ---------------------------------------------------------------------------

PCA_DIM = 64
PCA_ITERS = 3

_PCA_QVEC = (
    f"transform(embedding, x -> GREATEST(LEAST(CAST(floor(x * {QUANT}e0)"
    f" AS BIGINT), {QUANT}), -{QUANT}))"
)


def pca_power(emb: DataFrame) -> DataFrame:
    """(j, v1, v2, v3) — three sign-safe per-mille power iterates of
    the normalized second-moment matrix of quantized embeddings."""
    pairs = emb.selectExpr(f"{_PCA_QVEC} AS qv").selectExpr(
        "explode(flatten(transform(qv, (xj, j) ->"
        " transform(qv, (xk, k) -> struct(j, k, xj * xk AS p))))) AS e"
    )
    s = pairs.groupBy(
        F.expr("e.j").alias("j"), F.expr("e.k").alias("k")
    ).agg(F.expr("CAST(sum(e.p) AS BIGINT)").alias("s"))
    smax = s.agg(
        F.expr("GREATEST(max(abs(s)), CAST(1 AS BIGINT))").alias("smax")
    )
    spm = (
        s.crossJoin(F.broadcast(smax))
        .selectExpr(
            "j AS sj", "k AS sk",
            "CASE WHEN s >= 0 THEN (1000 * s) DIV smax"
            " ELSE -((1000 * (-s)) DIV smax) END AS spm",
        )
        .localCheckpoint(eager=False)
    )
    spark = emb.sparkSession
    v = spark.range(PCA_DIM).selectExpr(
        "CAST(id AS INT) AS vj", "CAST(1000 AS BIGINT) AS v"
    )
    iters = []
    for _ in range(PCA_ITERS):
        w = (
            spm.join(v, F.expr("sk = vj"))
            .groupBy(F.col("sj").alias("wj"))
            .agg(F.expr("CAST(sum(spm * v) AS BIGINT)").alias("w"))
        )
        wmax = w.agg(
            F.expr("GREATEST(max(abs(w)), CAST(1 AS BIGINT))")
            .alias("wmax")
        )
        v = (
            w.crossJoin(F.broadcast(wmax))
            .selectExpr(
                "wj AS vj",
                "CASE WHEN w >= 0 THEN (1000 * w) DIV wmax"
                " ELSE -((1000 * (-w)) DIV wmax) END AS v",
            )
            .localCheckpoint(eager=False)
        )
        iters.append(v)
    out = iters[0].selectExpr("vj AS j", "v AS v1")
    out = out.join(iters[1].selectExpr("vj AS j2", "v AS v2"),
                   F.expr("j = j2")).drop("j2")
    out = out.join(iters[2].selectExpr("vj AS j3", "v AS v3"),
                   F.expr("j = j3")).drop("j3")
    return out.select("j", "v1", "v2", "v3")


def pca_power_oracle() -> str:
    """Chained-CTE replica: Gram via double range cross join, the same
    per-mille normalization and three sign-safe iterates."""
    qv = (
        f"list_transform(embedding, x -> GREATEST(LEAST(CAST("
        f"floor(x * {QUANT}e0) AS BIGINT), {QUANT}), -{QUANT}))"
    )
    norm = (
        "CASE WHEN {x} >= 0 THEN (1000 * {x}) // {mx}"
        " ELSE -((1000 * (-({x}))) // {mx}) END"
    )
    step = """pc_w{r} AS (
  SELECT s.j AS wj, CAST(sum(s.spm * v.v) AS BIGINT) AS w
  FROM pc_spm s JOIN pc_v{p} v ON v.vj = s.k GROUP BY 1),
pc_wm{r} AS (
  SELECT GREATEST(max(abs(w)), CAST(1 AS BIGINT)) AS wmax FROM pc_w{r}),
pc_v{r} AS (
  SELECT wj AS vj, CAST(""" + norm.format(x="w", mx="wmax") + """
    AS BIGINT) AS v
  FROM pc_w{r}, pc_wm{r})"""
    steps = ",\n".join(
        step.format(r=r, p=r - 1 if r > 1 else 0) for r in (1, 2, 3)
    )
    return f"""
WITH pc_q AS (SELECT {qv} AS qv FROM embeddings),
pc_jk AS (SELECT unnest(range(0, {PCA_DIM})) AS j),
pc_s AS (
  SELECT j.j, k.j AS k,
         CAST(sum(q.qv[j.j + 1] * q.qv[k.j + 1]) AS BIGINT) AS s
  FROM pc_q q CROSS JOIN pc_jk j CROSS JOIN pc_jk k
  GROUP BY 1, 2),
pc_sm AS (
  SELECT GREATEST(max(abs(s)), CAST(1 AS BIGINT)) AS smax FROM pc_s),
pc_spm AS (
  SELECT j, k, CAST({norm.format(x="s", mx="smax")} AS BIGINT) AS spm
  FROM pc_s, pc_sm),
pc_v0 AS (
  SELECT CAST(unnest(range(0, {PCA_DIM})) AS INT) AS vj,
         CAST(1000 AS BIGINT) AS v),
{steps}
SELECT CAST(a.vj AS INT) AS j, a.v AS v1, b.v AS v2, c.v AS v3
FROM pc_v1 a JOIN pc_v2 b ON b.vj = a.vj JOIN pc_v3 c ON c.vj = a.vj
"""


# ---------------------------------------------------------------------------
# R345: Johnson-Lindenstrauss distortion audit — does a 64 -> 16 sign
# projection preserve pairwise distances? The sign matrix is BAKED AS
# +/- LITERALS at codegen time (md5int_py seeds, so both engines and
# the python replay share the exact matrix with zero runtime hashing
# — the hough_lines literal discipline applied to random projection);
# each embedding's 16 projection sums and each pair's true/projected
# squared distances are fully generated integer expressions. For
# S in {+-1}^{k x d}, E||Sx||^2 = k ||x||^2, so the unbiased per-pair
# ratio is (1000 * proj_d2) DIV (k * true_d2) — 1000 means perfect.
# Pairs are the deterministic (2i, 2i+1) coupling of vec_ids. The
# audit emits the ratio spread and the share within +-30%.
# ---------------------------------------------------------------------------

JL_K = 16
JL_DIM = 64


def _jl_signs() -> list:
    from ..functions import md5int_py

    return [
        [1 if md5int_py(f"jl:{t}:{j}") % 2 else -1 for j in range(JL_DIM)]
        for t in range(JL_K)
    ]


def _jl_proj_exprs(idx) -> list:
    """16 generated projection sums; idx(j) spells element access."""
    out = []
    for row in _jl_signs():
        terms = " ".join(
            f"{'+' if s > 0 else '-'} {idx(j)}" for j, s in enumerate(row)
        )
        out.append(f"(0 {terms})")
    return out


def _jl_true_d2(idx_a, idx_b) -> str:
    terms = " + ".join(
        f"({idx_a(j)} - {idx_b(j)}) * ({idx_a(j)} - {idx_b(j)})"
        for j in range(JL_DIM)
    )
    return f"({terms})"


def jl_distortion(emb: DataFrame) -> DataFrame:
    """One summary row: (n_pairs, mean_ratio_milli, min_ratio_milli,
    max_ratio_milli, within30_milli)."""
    projs = _jl_proj_exprs(lambda j: f"element_at(qv, {j + 1})")
    v = emb.selectExpr("vec_id", f"{_PCA_QVEC} AS qv").selectExpr(
        "vec_id", "qv",
        *[f"{e} AS y{t}" for t, e in enumerate(projs)],
    )
    a = v.selectExpr(
        "vec_id DIV 2 AS pair", "qv AS qa",
        *[f"y{t} AS ya{t}" for t in range(JL_K)],
    ).where("vec_id % 2 = 0")
    b = v.selectExpr(
        "vec_id DIV 2 AS pairb", "qv AS qb",
        *[f"y{t} AS yb{t}" for t in range(JL_K)],
    ).where("vec_id % 2 = 1")
    proj_d2 = " + ".join(
        f"(ya{t} - yb{t}) * (ya{t} - yb{t})" for t in range(JL_K)
    )
    true_d2 = (
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    pairs = a.join(b, F.expr("pair = pairb")).selectExpr(
        "pair", f"{true_d2} AS td2", f"({proj_d2}) AS pd2"
    ).where("td2 > 0").selectExpr(
        "pair", f"(1000 * pd2) DIV ({JL_K} * td2) AS ratio"
    )
    return pairs.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_pairs"),
        F.expr(
            "CAST(sum(ratio) DIV count(*) AS BIGINT)"
        ).alias("mean_ratio_milli"),
        F.expr("CAST(min(ratio) AS BIGINT)").alias("min_ratio_milli"),
        F.expr("CAST(max(ratio) AS BIGINT)").alias("max_ratio_milli"),
        F.expr(
            "CAST((1000 * sum(CASE WHEN ratio BETWEEN 700 AND 1300"
            " THEN 1 ELSE 0 END)) DIV count(*) AS BIGINT)"
        ).alias("within30_milli"),
    )


def jl_distortion_oracle() -> str:
    qv = (
        f"list_transform(embedding, x -> GREATEST(LEAST(CAST("
        f"floor(x * {QUANT}e0) AS BIGINT), {QUANT}), -{QUANT}))"
    )
    projs = _jl_proj_exprs(lambda j: f"qv[{j + 1}]")
    ycols = ", ".join(f"{e} AS y{t}" for t, e in enumerate(projs))
    proj_d2 = " + ".join(
        f"(a.y{t} - b.y{t}) * (a.y{t} - b.y{t})" for t in range(JL_K)
    )
    true_d2 = _jl_true_d2(
        lambda j: f"a.qv[{j + 1}]", lambda j: f"b.qv[{j + 1}]"
    )
    return f"""
WITH jl_v AS (
  SELECT vec_id, qv, {ycols}
  FROM (SELECT vec_id, {qv} AS qv FROM embeddings)),
jl_p AS (
  SELECT a.vec_id // 2 AS pair,
         {true_d2} AS td2, ({proj_d2}) AS pd2
  FROM jl_v a JOIN jl_v b
    ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0),
jl_r AS (
  SELECT pair, (1000 * pd2) // ({JL_K} * td2) AS ratio
  FROM jl_p WHERE td2 > 0)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(ratio) // count(*) AS BIGINT) AS mean_ratio_milli,
       CAST(min(ratio) AS BIGINT) AS min_ratio_milli,
       CAST(max(ratio) AS BIGINT) AS max_ratio_milli,
       CAST((1000 * sum(CASE WHEN ratio BETWEEN 700 AND 1300
         THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS within30_milli
FROM jl_r"""
