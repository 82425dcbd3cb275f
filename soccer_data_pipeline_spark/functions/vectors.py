"""Vector math over ``array<float/double>`` columns — JVM-side only.

``zip_with`` + ``aggregate`` fold left-to-right in element order, so
the arithmetic is deterministic (same bits on every run and engine),
unlike a shuffle-order-dependent SUM over exploded elements.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
