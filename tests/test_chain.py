"""Chain API tests: lazy composition, envelope contract (capped + true
totals, SURVEY.md T5), filter/exclude/spatial steps vs direct predicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.plans.chain import Engine

from .conftest import SF_TINY


def test_filter_matches_direct_predicate(spark):
    chain = Engine(spark, SF_TINY).tiles().filter(fmt="png", kind="aerial")
    direct = synth.tiles_df(spark, SF_TINY).where(
        (F.col("fmt") == "png") & (F.col("tile_kind") == "aerial")
    )
    assert chain.df().count() == direct.count()


def test_filter_list_is_or(spark):
    chain = Engine(spark, SF_TINY).tiles().filter(fmt=["png", "jpeg"])
    assert chain.df().count() == synth.tiles_df(spark, SF_TINY).count()


def test_like_wildcard(spark):
    n = Engine(spark, SF_TINY).tiles().filter(caption__like="tile 1*").df().count()
    direct = (
        synth.tiles_df(spark, SF_TINY)
        .where(F.col("caption").rlike("^tile 1.*$"))
        .count()
    )
    assert n == direct > 0


def test_exclude_is_complement(spark):
    base = Engine(spark, SF_TINY).tiles()
    total = base.df().count()
    kept = base.filter(fmt="jpeg").df().count()
    excluded = base.exclude(fmt="jpeg").df().count()
    assert kept + excluded == total


def test_within_outside_partition(spark):
    base = Engine(spark, SF_TINY).tiles()
    inside = base.within_zones().df().count()
    outside = base.outside_zones().df().count()
    assert inside + outside == base.df().count()
    assert inside > 0 and outside > 0


def test_answer_envelope_truncation(spark):
    env = (
        Engine(spark, SF_TINY)
        .tiles()
        .filter(fmt="png")
        .sort(by="phash", desc=True)
        .take(7)
        .answer(compact=True)
    )
    assert env["verdict"] == "ok"
    assert env["stats"]["returned"] == 7
    assert env["stats"]["was_truncated"] is True
    assert env["stats"]["total_matches"] > 7
    assert set(env["results"][0]) == {"image_id", "lon", "lat", "tile_kind"}


def test_near_returns_k(spark):
    env = Engine(spark, SF_TINY).tiles().near(139.7, 35.6, k=8).answer()
    assert env["stats"]["total_matches"] == 8
