"""Grouped-map operators (``applyInPandas``) — the per-group custom
transform surface (pyspark_guide "Grouped map").

Use ONLY when a transform genuinely needs the whole group in memory
(model-per-group fits, per-group resampling, merge_asof fallbacks) —
anything expressible as a window function should stay JVM-side (see
the batch twins in plans/). The z-score example exists to prove the
plumbing and to pin its semantics against the window-function
equivalent in tests.

Scale contract: one group must fit one executor's memory — group by a
bounded key (lang, league, day-bucket), never an unbounded one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def per_group_zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """(group, id, value, zscore) — value standardized within group.

    ddof=0 (population std) to match the SQL ``stddev_pop`` twin.
    """
    schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std > 0 else v * 0.0
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                value_col: v,
                "zscore": z,
            }
        )

    return (
        df.select(group_col, id_col, value_col)
        .groupBy(group_col)
        .applyInPandas(fn, schema)
    )
