"""Storage-layout scale tests (SURVEY.md O1/O2): partition pruning on
Hive-partitioned writes, and bucketed tables joining without a shuffle —
the storage-side levers the engine relies on at 100 TB (Iceberg bucketing
stands in for these in production).
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from tree_sitter_analyzer_spark import synth
from tree_sitter_analyzer_spark.operators.pip_join import tile_cells
from tree_sitter_analyzer_spark.sources.sinks import write_partitioned

from .conftest import SF_TINY
from .test_plans import plan_of


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "tiles_by_kind")
    env = write_partitioned(
        synth.tiles_df(spark, SF_TINY), out, ["tile_kind"]
    )
    assert env["n_partition_dirs"] == 7
    back = spark.read.parquet(out).where(F.col("tile_kind") == "marine")
    plan = plan_of(back)
    assert "PartitionFilters: [isnotnull(tile_kind" in plan
    # pruned scan reads exactly the one partition's rows
    assert back.count() == synth.tiles_df(spark, SF_TINY).where(
        "tile_kind = 'marine'"
    ).count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key co-locate: the join plan must
    contain no Exchange on either side (the bucketing guide pattern; at
    scale this is Iceberg bucket-partitioning on image_id/cell)."""
    t = tile_cells(synth.tiles_df(spark, SF_TINY), res=7)
    a = t.select("image_id", "cell", "phash")
    b = t.select("cell", "w", "h", "image_id")
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    # a previous session may have left the managed-table dirs behind
    shutil.rmtree("spark-warehouse/bt_a", ignore_errors=True)
    shutil.rmtree("spark-warehouse/bt_b", ignore_errors=True)
    a.write.bucketBy(8, "cell").sortBy("cell").mode("overwrite").saveAsTable("bt_a")
    b.write.bucketBy(8, "cell").sortBy("cell").mode("overwrite").saveAsTable("bt_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # At test scale the planner prefers broadcast (also shuffle-free);
        # disable it so the bucketed sort-merge path itself is exercised —
        # that's the path a 100 TB × 100 TB co-located join takes.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bt_a").join(spark.table("bt_b"), "cell")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_mermaid_export_is_deterministic_and_capped(spark):
    """S8 mermaid sink: byte-identical across runs/partitionings, node
    declarations before edges, capped-with-true-total envelope (T5)."""
    from tree_sitter_analyzer_spark import synth
    from tree_sitter_analyzer_spark.operators import pip_join
    from tree_sitter_analyzer_spark.sources import sinks

    zones = synth.zones_df(spark)
    pairs = pip_join.zone_overlap_join(zones, res=9)
    out1 = sinks.to_mermaid(pairs, "polygon_a", "polygon_b", max_edges=50)
    out2 = sinks.to_mermaid(
        pairs.repartition(7), "polygon_a", "polygon_b", max_edges=50
    )
    assert out1["text"] == out2["text"]  # repartition-invariant bytes
    assert out1["text"].startswith("flowchart LR\n")
    assert out1["was_truncated"] and out1["total_edges"] > 50
    assert out1["rendered_edges"] == 50
    # every rendered edge references a declared node
    decls = {
        line.strip().split("[")[0]
        for line in out1["text"].splitlines()
        if "[" in line and "-->" not in line
    }
    for line in out1["text"].splitlines():
        if "-->" in line:
            a, b = line.strip().split(" --> ")
            assert a in decls and b in decls


def test_mermaid_collisions_and_escaping(spark):
    """Distinct names whose sanitized forms collide get unique ids; quotes
    and pipes in names/labels are entity-escaped (valid Mermaid)."""
    from tree_sitter_analyzer_spark.sources import sinks

    df = spark.createDataFrame(
        [("a.b", 'zone "X"', "p|q"), ("a_b", 'zone "X"', "r")],
        ["s", "d", "lbl"],
    )
    out = sinks.to_mermaid(df, "s", "d", label="lbl")
    text = out["text"]
    assert out["n_nodes"] == 3  # a.b and a_b must NOT merge
    assert "a_b__1" in text  # collision suffix
    assert "#quot;" in text and '"zone "X""' not in text
    assert "#124;" in text and "|p|q|" not in text


# --- TOON / markdown table encoders (S8, golden-master byte tests) -----------

GOLDEN = __file__.rsplit("/", 1)[0] + "/golden"


def _enc_df(spark):
    return spark.createDataFrame(
        [(1, "png", "plain", 4), (2, "jpeg", "has,comma", 7),
         (3, "png", 'has "quote"', 2), (4, None, " leading space", 9)],
        "id BIGINT, fmt STRING, note STRING, n INT",
    )


def test_toon_table_golden_bytes(spark):
    """TOON encoder output is byte-identical to the committed golden
    (toon_encoder.py golden-master discipline): header `key[n]{schema}:`,
    CSV-style quoting (delimiter/quote/edge-space), None -> empty cell."""
    from tree_sitter_analyzer_spark.sources import toon

    out = toon.toon_table(_enc_df(spark), ["id"], key="tiles")
    assert out["text"] == open(f"{GOLDEN}/tiles.toon").read()
    assert out["was_truncated"] is False and out["total_rows"] == 4


def test_markdown_table_golden_bytes(spark):
    """GFM table golden: numeric columns right-aligned, pipes escaped."""
    from tree_sitter_analyzer_spark.sources import toon

    out = toon.markdown_table(_enc_df(spark), ["id"])
    assert out["text"] == open(f"{GOLDEN}/tiles.md").read()


def test_toon_union_schema_and_cap(spark):
    """Union-schema inference keeps fields later rows introduce (a
    first-row-only header would drop them), and the collect is capped
    with the true-total envelope."""
    from tree_sitter_analyzer_spark.sources import toon

    text = toon.encode_rows([{"a": 1, "b": 2}, {"b": 3, "c": 4}], key="u")
    assert text == "u[2]{a,b,c}:\n  1,2,\n  ,3,4\n"

    big = spark.range(100).selectExpr("id", "id * 2 AS v")
    out = toon.toon_table(big, ["id"], max_rows=10)
    assert out["rendered_rows"] == 10
    assert out["total_rows"] == 100 and out["was_truncated"] is True
