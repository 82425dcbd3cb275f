"""Differential test: every registered query vs its DuckDB oracle.

This is the same gate the driver runs at sf0.01; here we run it at
sf0.001 on every commit (fast) — run with SF=0.01 locally before
round end for the full-fidelity check.
"""

from __future__ import annotations

import os

import pytest

from soccer_data_pipeline_spark.plans import QUERIES

from .oracle_harness import compare

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    if spec.oracle is None:
        n = df.count()
        assert n >= 0
        return
    ok, msg = compare(df, spec.oracle, SF_DIR)
    assert ok, f"{name}: {msg}"


def test_queries_not_trivially_empty(spark):
    """Guard against silently-empty differentials: every query must
    produce rows at sf0.001/0.01 (an empty-vs-empty oracle match
    verifies nothing)."""
    import os

    sf = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    empties = [
        name for name, spec in sorted(QUERIES.items())
        if spec.fn(spark, sf).limit(1).count() == 0
    ]
    assert not empties, f"queries with empty results: {empties}"
