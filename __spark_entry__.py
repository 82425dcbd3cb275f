"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``soccer_data_pipeline_spark/``; this module is a
thin adapter. ``queries()`` / ``oracle_sql()`` are populated from the
query registry (``soccer_data_pipeline_spark/plans/``), one entry per
implemented operator from SURVEY.md §2 (+ the [beyond-ref] LLM-data
ops), each with a DuckDB-runnable ANSI oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Import-safe regardless of the caller's cwd/sys.path.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from soccer_data_pipeline_spark.plans import oracle_map, query_fns  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star join (lineitem⋈orders⋈customer⋈nation) → revenue aggregation →
    top-3 customers per nation via ranking window — one plan exercising
    scan, broadcast join, shuffle agg, and window (SURVEY.md §7 slice).
    """
    from soccer_data_pipeline_spark.plans.star_queries import flagship_top_customers

    return flagship_top_customers(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return oracle_map()
