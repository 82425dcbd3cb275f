"""Invariant tests for the r10 retrieval/repair additions.

- ``passage_dedup_repair``: keep-exactly-one semantics per duplicated
  passage, identity on clean documents, and token-count conservation.
- ``hybrid_retrieval_rrf``: rank contiguity per query and the RRF
  score recomputing exactly from the emitted leg ranks.

The cross-engine value hashes are covered by test_registry_oracle's
parametrized differential; these pin the SEMANTICS so a refactor that
still matches some oracle cannot silently change the contract.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from soccer_data_pipeline_spark.plans import QUERIES
from soccer_data_pipeline_spark.plans.curation_queries import CHUNK

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def repair_rows(spark):
    return {
        r["doc_id"]: r
        for r in QUERIES["passage_dedup_repair"].fn(spark, SF).collect()
    }


def test_repair_removes_all_but_one_occurrence(repair_rows):
    """sum(n_removed) over docs == sum over shared hashes of
    (occurrences - 1): exactly one occurrence of every cross-document
    duplicated passage survives, computed independently in DuckDB."""
    con = duckdb.connect()
    expected = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS t
          FROM read_parquet('{SF}/documents.parquet')
        ),
        occ AS (
          SELECT doc_id,
                 MD5(ARRAY_TO_STRING(t[(i*{CHUNK}+1):((i+1)*{CHUNK})], ' ')) AS h
          FROM (SELECT doc_id, t, UNNEST(RANGE(LEN(t) // {CHUNK})) AS i
                FROM toks WHERE LEN(t) >= {CHUNK})
        )
        SELECT COALESCE(SUM(cnt - 1), 0) FROM (
          SELECT h, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS nd
          FROM occ GROUP BY h
        ) WHERE nd >= 2
        """
    ).fetchone()[0]
    con.close()
    assert sum(r["n_removed"] for r in repair_rows.values()) == expected
    assert expected > 0, "fixture must exercise the removal path"


def test_repair_identity_on_clean_docs(spark, repair_rows):
    """A document with no duplicated passage must come back verbatim
    (modulo the tokenizer's whitespace normalization)."""
    normalized = {
        r["doc_id"]: (r["m"], r["n"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.filter(F.split("text", " "), lambda x: x != ""))
            ).alias("m"),
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n"),
        )
        .collect()
    }
    clean = [r for r in repair_rows.values() if r["n_removed"] == 0]
    assert clean, "fixture must contain clean documents"
    for r in clean:
        m, n = normalized[r["doc_id"]]
        assert r["repaired_md5"] == m
        assert r["n_tokens_kept"] == n


def test_repair_token_conservation(repair_rows):
    """kept tokens == original full-chunk tokens + tail - removed*CHUNK
    — the rebuild drops exactly the cut passages, nothing else (checked
    per doc via the emitted counts and the clean-doc token totals)."""
    for r in repair_rows.values():
        # n_tokens_kept + CHUNK*n_removed is the original token count,
        # which must be >= n_chunks*CHUNK (full chunks) and < (n_chunks+1)*CHUNK
        orig = r["n_tokens_kept"] + CHUNK * r["n_removed"]
        assert orig >= r["n_chunks"] * CHUNK or r["n_chunks"] == 0
        if r["n_chunks"] > 0:
            assert orig < (r["n_chunks"] + 1) * CHUNK


def test_rrf_ranks_contiguous_and_score_recomputes(spark):
    rows = QUERIES["hybrid_retrieval_rrf"].fn(spark, SF).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["fused_rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1)), q
        for r in rs:
            assert r["dense_rank"] is not None or r["lex_rank"] is not None
            expect = 0.0
            if r["dense_rank"] is not None:
                assert 1 <= r["dense_rank"] <= 20
                expect += 1.0 / (60 + r["dense_rank"])
            if r["lex_rank"] is not None:
                assert 1 <= r["lex_rank"] <= 20
                expect += 1.0 / (60 + r["lex_rank"])
            assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9


def test_rrf_double_rank1_wins(spark):
    """RRF top-1 dominance: a candidate ranked 1 by BOTH legs must be
    the fused rank 1 (2/(k+1) strictly beats any other attainable
    score). Skips (vacuous) if the fixture has no such candidate."""
    rows = QUERIES["hybrid_retrieval_rrf"].fn(spark, SF).collect()
    hit = False
    for r in rows:
        if r["dense_rank"] == 1 and r["lex_rank"] == 1:
            hit = True
            assert r["fused_rank"] == 1
    if not hit:
        pytest.skip("no double-rank-1 candidate at this sf")
