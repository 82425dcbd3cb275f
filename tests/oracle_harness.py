"""Local mirror of the driver's DuckDB differential check.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value multiset (after sorting columns by name) —
the same contract described in ``__spark_entry__.py``.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DuckDB output types with no exact Spark twin. HUGEINT (INT128) is the
# silent killer: SUM(BIGINT) widens to it, Python fetch still yields int,
# so value comparison passes while the driver's *typed* hash fails
# (VERDICT r1 "What's wrong" #1/#2). Ban them at the harness level.
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UINTEGER", "UBIGINT")


def duckdb_result(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t).upper() for t in rel.types]
    rows = rel.fetchall()
    con.close()
    return cols, types, rows


def _norm(v):
    """Normalize a cell for multiset comparison (timestamps → isoformat)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(spark_df, oracle_sql_text: str, sf_dir: str, float_tol: float = 0.0):
    """Return (ok, message). Sorts columns by name, compares multisets."""
    scols = sorted(spark_df.columns)
    srows = [tuple(_norm(r[c]) for c in scols) for r in spark_df.collect()]
    dcols, dtypes, draws = duckdb_result(oracle_sql_text, sf_dir)
    bad = [
        f"{c}:{t}"
        for c, t in zip(dcols, dtypes)
        if any(t.startswith(b) for b in BANNED_ORACLE_TYPES)
    ]
    if bad:
        return False, (
            f"oracle emits non-Spark-representable types {bad} — "
            "wrap the output column in CAST(... AS BIGINT/DOUBLE)"
        )
    dsort = sorted(dcols)
    if scols != dsort:
        return False, f"schema mismatch: spark={scols} duckdb={dsort}"
    dindex = [dcols.index(c) for c in dsort]
    drows = [tuple(_norm(r[i]) for i in dindex) for r in draws]
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duckdb={len(drows)}"
    if float_tol == 0.0:
        sc, dc = Counter(srows), Counter(drows)
        if sc != dc:
            diff = list((sc - dc).items())[:3] + list((dc - sc).items())[:3]
            return False, f"value mismatch, sample diffs: {diff}"
        return True, "exact match"
    # tolerance path: sort rows and compare cell-wise
    for srow, drow in zip(sorted(srows, key=str), sorted(drows, key=str)):
        for a, b in zip(srow, drow):
            if isinstance(a, float) and isinstance(b, float):
                if not math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol):
                    return False, f"float mismatch {a} vs {b}"
            elif a != b:
                return False, f"cell mismatch {a!r} vs {b!r}"
    return True, "match within tolerance"
