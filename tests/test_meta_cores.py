"""Cross-checks tying the oracled metadata cores (R400-R406) to their
rows-only decode companions: the meta query's SQL-derived numbers must
match what the real decode pipeline reports for the same frame — so a
driver-green meta row genuinely pins the non-pixel half of each decode
operator, and a drift between the two halves fails loudly here.
"""

from __future__ import annotations

from .conftest import SF_TINY


def _run(spark, name, sf=SF_TINY):
    from tree_sitter_analyzer_spark.registry import load_all

    return load_all()[name].spark_fn(spark, sf).toPandas()


def test_ingest_meta_matches_ingest_summary(spark):
    meta = _run(spark, "ingest_meta").set_index("fmt")
    full = _run(spark, "ingest_summary").set_index("fmt")
    assert sorted(meta.index) == sorted(full.index)
    for fmt in meta.index:
        assert int(meta.loc[fmt, "n_tiles"]) == int(full.loc[fmt, "n_tiles"])
        # the caption invariant holds on BOTH paths (target 0)
        assert int(meta.loc[fmt, "n_caption_violations"]) == 0
        assert int(full.loc[fmt, "n_caption_violations"]) == 0


def test_thumbnail_meta_matches_thumbnail_stats(spark):
    meta = _run(spark, "thumbnail_meta").set_index("fmt")
    full = _run(spark, "thumbnail_stats").set_index("fmt")
    for fmt in meta.index:
        n = int(meta.loc[fmt, "n_tiles"])
        assert n == int(full.loc[fmt, "n_tiles"])
        # resize always lands 8x8x3 lossless GPNG: 12 + 192 = 204 bytes
        assert int(meta.loc[fmt, "bytes_out"]) == 204 * n
        for c in ("avg_thumb_bytes", "min_thumb_bytes", "max_thumb_bytes"):
            assert int(full.loc[fmt, c]) == 204


def test_video_frame_meta_matches_video_frame_stats(spark):
    meta = _run(spark, "video_frame_meta")
    full = _run(spark, "video_frame_stats")
    m = meta.set_index("codec")
    f = full.groupby("codec")[["n_clips", "n_sampled_frames"]].sum()
    assert sorted(m.index) == sorted(f.index)
    for c in m.index:
        assert int(m.loc[c, "n_clips"]) == int(f.loc[c, "n_clips"])
        # the every-10th contract: sum of ceil(n_frames/10) per codec
        assert int(m.loc[c, "sum_sampled"]) == int(
            f.loc[c, "n_sampled_frames"]
        )


def test_audio_feature_meta_matches_real_wav_bytes(spark):
    import pyspark.sql.functions as F

    from tree_sitter_analyzer_spark.sources import multimodal

    meta = _run(spark, "audio_feature_meta").set_index("sample_rate")
    o = (
        spark.read.parquet(f"{SF_TINY}/orders.parquet")
        .select("o_orderkey")
        .where(F.col("o_orderkey") <= 8000)
    )
    clips = o.select(
        F.col("o_orderkey").alias("media_id"),
        F.expr("CAST(NULL AS BINARY)").alias("bytes"),
        F.expr(
            "CAST(CASE pmod(o_orderkey, 3) WHEN 0 THEN 8000 WHEN 1 "
            "THEN 16000 ELSE 44100 END AS INT)"
        ).alias("sample_rate"),
        F.lit(1).cast("int").alias("n_channels"),
        F.lit(1000).cast("bigint").alias("duration_ms"),
        F.expr("CAST(pmod(o_orderkey, 2) AS INT)").alias("codec"),
    )
    real = (
        multimodal.attach_audio_bytes(clips)
        .groupBy("sample_rate")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum(F.octet_length("bytes")).alias("sum_bytes"),
        )
        .toPandas()
        .set_index("sample_rate")
    )
    assert sorted(meta.index) == sorted(real.index)
    for r in meta.index:
        assert int(meta.loc[r, "n_clips"]) == int(real.loc[r, "n_clips"])
        # canonical PCM16 mono WAV: 44-byte header + 2 bytes/sample
        assert int(meta.loc[r, "sum_wav_bytes"]) == int(
            real.loc[r, "sum_bytes"]
        )


def test_pixel_verify_meta_matches_pixel_verify_pairs(spark):
    meta = _run(spark, "pixel_verify_meta").set_index("hamming")
    full = _run(spark, "pixel_verify_pairs")
    counts = full.groupby("hamming").size()
    assert sorted(meta.index) == sorted(counts.index)
    for h in meta.index:
        assert int(meta.loc[h, "n_pairs"]) == int(counts.loc[h])


def test_cv_input_census_matches_edge_stats(spark):
    meta = _run(spark, "cv_input_census")
    full = _run(spark, "edge_stats").set_index("tile_kind")
    per_kind = meta.groupby("tile_kind")["n_tiles"].sum()
    assert sorted(per_kind.index) == sorted(full.index)
    for k in per_kind.index:
        assert int(per_kind.loc[k]) == int(full.loc[k, "n_tiles"])


def test_embedding_census_matches_table(spark):
    meta = _run(spark, "embedding_census")
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet").toPandas()
    assert int(meta.n_vecs.sum()) == len(emb)
    dim = len(emb.embedding.iloc[0])
    assert (meta.min_dim == dim).all() and (meta.max_dim == dim).all()
    # independent python recompute of one label's norm sum
    import math

    lab = int(meta.label.iloc[0])
    sub = emb[emb.label == lab]
    exp = sum(
        sum(int(math.floor(float(x) * 1000)) ** 2 for x in v)
        for v in sub.embedding
    )
    got = int(meta.set_index("label").loc[lab, "sum_norm2_q"])
    assert got == exp
