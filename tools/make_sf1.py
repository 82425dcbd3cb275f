#!/usr/bin/env python3
"""Deterministic sf1 rehearsal data: 10x tiling of /root/testdata/sf0.1.

The driver's testdata stops at sf0.1; the 100 TB contract needs at
least one 10x rehearsal per round (VERDICT r7 #7) to see which plans
drift quadratic and whether the prefit/bucketed paths engage. Tiling
preserves every distribution exactly (each replica is the sf0.1 data
with keys offset by replica * (max_key + 1) — the +1 keeps 0-based
key ranges disjoint across replicas; ADVICE r8 caught the off-by-one
that collided each replica's key 0 with the previous replica's max),
with two deliberate perturbations:

- documents: replicas > 0 get a ' rN' suffix token so exact/minhash
  dedup sees realistic within-replica duplicates instead of a 10x
  pathological cross-replica duplicate of every doc;
- embeddings: replicas > 0 get a small deterministic per-replica,
  per-component jitter for the same reason (identical vectors would
  put 10 copies of every point in every LSH bucket).

dims (region/nation) are NOT tiled — they are fixed-cardinality
lookup tables at every scale, exactly as in TPC-H.

Output: ./testdata_sf1/<table>.parquet (gitignored; ~10x sf0.1).
Usage: python3 tools/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
R = 10  # replicas

# key columns to offset per replica: table -> {col: base_table_max_col}
OFFSETS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "doc_id"},  # vec_id references doc_id
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    maxes = {
        "c_custkey": con.sql(f"SELECT MAX(c_custkey) FROM '{SRC}/customer.parquet'").fetchone()[0],
        "s_suppkey": con.sql(f"SELECT MAX(s_suppkey) FROM '{SRC}/supplier.parquet'").fetchone()[0],
        "p_partkey": con.sql(f"SELECT MAX(p_partkey) FROM '{SRC}/part.parquet'").fetchone()[0],
        "o_orderkey": con.sql(f"SELECT MAX(o_orderkey) FROM '{SRC}/orders.parquet'").fetchone()[0],
        "event_id": con.sql(f"SELECT MAX(event_id) FROM '{SRC}/events.parquet'").fetchone()[0],
        "user_id": con.sql(f"SELECT MAX(user_id) FROM '{SRC}/events.parquet'").fetchone()[0],
        "doc_id": con.sql(f"SELECT MAX(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0],
    }

    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied (dim, not tiled)")

    for t, offs in OFFSETS.items():
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        parts = []
        for r in range(R):
            sel = []
            for c in cols:
                if c in offs:
                    base = maxes[offs[c]]
                    sel.append(f"({c} + {r} * ({base} + 1)) AS {c}")
                elif t == "documents" and c == "text" and r > 0:
                    sel.append(f"(text || ' r{r}') AS text")
                elif t == "documents" and c == "n_chars" and r > 0:
                    # keep the length column consistent with the suffix
                    sel.append(f"(n_chars + {len(f' r{r}')}) AS n_chars")
                elif t == "embeddings" and c == "embedding" and r > 0:
                    jit = 0.003 * r
                    sel.append(
                        f"LIST_TRANSFORM(embedding, x -> x + {jit}::FLOAT) AS embedding"
                    )
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'")
        q = " UNION ALL ".join(parts)
        # Bounded row groups: DuckDB's 122880-row default puts the whole
        # 50k-doc / 20k-embedding table in ONE row group, and a parquet
        # row group is indivisible to Spark — every scan became a single
        # task regardless of maxPartitionBytes, and broadcast-joins that
        # collapse onto the scan stage then ran the whole query in one
        # task (r9: bitext ANN 95s vs 13s). Real production files carry
        # many row groups; 2048 rows gives the doc-scale tables ≥10
        # splittable units at sf1.
        rgs = 2048 if t in ("documents", "embeddings") else 122880
        con.sql(
            f"COPY ({q}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rgs})"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
