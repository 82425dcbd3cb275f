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


def test_char_entropy_drops_empty_and_null_text(spark, tmp_path):
    """ADVICE r6 (medium): the oracle's UNNEST emits no rows for a doc
    whose text is '' or NULL, so the Spark side must drop those docs
    too instead of emitting n_chars_counted=0 rows with log(0)/0-div
    entropy. The stock testdata has no empty docs, so this runs the
    full driver-style differential on a fixture that plants both."""
    import duckdb

    src = "/root/testdata/sf0.001"
    sf = tmp_path / "sf_empty_text"
    sf.mkdir()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        os.symlink(f"{src}/{t}.parquet", sf / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src}/documents.parquet')
          UNION ALL SELECT 900001, '', 'xx', 'synthetic', 0
          UNION ALL SELECT 900002, NULL, 'xx', 'synthetic', NULL
        ) TO '{sf}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    spec = QUERIES["char_entropy_quality"]
    df = spec.fn(spark, str(sf))
    planted = df.where("doc_id >= 900001").count()
    assert planted == 0, "empty/null-text docs must drop out"
    ok, msg = compare(df, spec.oracle, str(sf))
    assert ok, msg


def test_props_schema_drift_skips_non_object_json(spark, tmp_path):
    """Malformed / array / scalar props must be excluded identically on
    both engines: Spark's json_object_keys NULLs where DuckDB's
    json_keys errors (invalid) or yields [] (array/scalar). Plants all
    three shapes plus a keyless object and runs the full differential."""
    import duckdb

    src = "/root/testdata/sf0.001"
    sf = tmp_path / "sf_bad_props"
    sf.mkdir()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        os.symlink(f"{src}/{t}.parquet", sf / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src}/events.parquet')
          UNION ALL SELECT 900001, TIMESTAMP '2024-01-05 00:00:00', 1, 'view', 1.0, 'not json'
          UNION ALL SELECT 900002, TIMESTAMP '2024-01-05 00:00:01', 1, 'view', 1.0, '[1,2]'
          UNION ALL SELECT 900003, TIMESTAMP '2024-01-05 00:00:02', 1, 'view', 1.0, '"s"'
          UNION ALL SELECT 900004, TIMESTAMP '2024-01-05 00:00:03', 1, 'view', 1.0, NULL
          UNION ALL SELECT 900005, TIMESTAMP '2024-01-05 00:00:04', 1, 'view', 1.0, '{{}}'
        ) TO '{sf}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    spec = QUERIES["props_schema_drift"]
    df = spec.fn(spark, str(sf))
    sigs = {r.key_sig for r in df.collect()}
    assert "" in sigs  # the keyless object survives as its own shape
    ok, msg = compare(df, spec.oracle, str(sf))
    assert ok, msg
