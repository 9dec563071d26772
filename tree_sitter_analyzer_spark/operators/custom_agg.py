"""Custom aggregation surface (SURVEY.md X4): grouped-agg pandas UDF.

The reference's UDAF-like accumulators (complexity node-walk counting,
``complexity_heatmap.py:207-220``) mostly decompose into per-row metrics +
built-in aggs — the preferred path everywhere else in this engine. This
module covers the residual class: aggregates with no built-in equivalent,
via ``pandas_udf`` GROUPED_AGG (Arrow-batched per group).

Example: Gini coefficient of tile pixel-area distribution per zone — an
inequality measure needing a full sorted pass over the group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def gini_np(values: np.ndarray) -> float:
    """Gini coefficient via the sorted-rank identity; 0 = equal, →1 =
    concentrated. Shared by the UDAF and the test oracle."""
    x = np.sort(np.asarray(values, dtype=np.float64))
    n = len(x)
    if n == 0 or x.sum() == 0:
        return 0.0
    ranks = np.arange(1, n + 1)
    return float((2.0 * (ranks * x).sum() / (n * x.sum())) - (n + 1.0) / n)


def _gini_series(v: pd.Series) -> float:  # GROUPED_AGG: Series in, scalar out
    return gini_np(v.to_numpy())


def gini_udaf_col():
    # Built lazily: a module-level @pandas_udf would re-register on worker
    # import, where no SparkContext exists.
    return pandas_udf(_gini_series, "double")


def zone_area_inequality(matched: DataFrame) -> DataFrame:
    """Per-zone Gini of tile pixel areas over a PIP join result —
    the weighted-score roll-up shape of health_scorer.py with a custom
    aggregate in place of the built-ins."""
    with_area = matched.withColumn(
        "pixels", (F.col("w").cast("double") * F.col("h"))
    )
    # Spark forbids mixing GROUPED_AGG pandas UDFs with JVM aggregates in
    # one agg — run them side by side and join on the group key (the count
    # side is a broadcast-sized frame).
    gini = with_area.groupBy("polygon_id").agg(
        gini_udaf_col()(F.col("pixels")).alias("area_gini")
    )
    counts = with_area.groupBy("polygon_id").agg(F.count("*").alias("n_tiles"))
    return counts.join(gini, "polygon_id")


def per_zone_zscore(matched: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas (the last UDF family, cf. guide): per
    zone, z-score each tile's pixel area against the zone distribution —
    whole-group-in/whole-group-out transforms that window functions can't
    express when the per-row output needs group-level numpy work.

    Output adds ``area_z_milli`` (int for determinism: floor(1000·z))."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("polygon_id", matched.schema["polygon_id"].dataType),
            StructField("image_id", matched.schema["image_id"].dataType),
            StructField("area_z_milli", LongType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        area = (pdf["w"].astype("float64") * pdf["h"]).to_numpy()
        mu, sd = area.mean(), area.std()
        z = np.zeros(len(area)) if sd == 0 else (area - mu) / sd
        return pd.DataFrame(
            {
                "polygon_id": pdf["polygon_id"],
                "image_id": pdf["image_id"],
                "area_z_milli": np.floor(z * 1000).astype("int64"),
            }
        )

    return matched.groupBy("polygon_id").applyInPandas(zscore, schema)
