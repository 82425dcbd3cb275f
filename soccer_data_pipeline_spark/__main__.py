"""CLI: run the ETL, the incremental runner, or a registry query.

    python -m soccer_data_pipeline_spark etl --raw RAW_DIR \
        --leagues config/leagues.json --staging OUT_DIR [--commit SHA]
    python -m soccer_data_pipeline_spark incremental --raw RAW_DIR \
        --leagues config/leagues.json --staging OUT --checkpoint CKPT
    python -m soccer_data_pipeline_spark query NAME [--sf-dir DIR] [-n 20]
    python -m soccer_data_pipeline_spark corpus --docs DOCS_PARQUET \
        --out OUT_DIR [--shards 16]
    python -m soccer_data_pipeline_spark list
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="soccer_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    etl = sub.add_parser("etl", help="batch ETL: raw JSON → staging parquet")
    etl.add_argument("--raw", required=True)
    etl.add_argument("--leagues", required=True, help="leagues.json path")
    etl.add_argument("--staging", required=True)
    etl.add_argument("--results", help="optional season_results output dir")
    etl.add_argument("--commit", default="unknown", help="source commit SHA")

    inc = sub.add_parser("incremental", help="process only new files, then stop")
    inc.add_argument("--raw", required=True)
    inc.add_argument("--leagues", required=True)
    inc.add_argument("--staging", required=True)
    inc.add_argument("--checkpoint", required=True)
    inc.add_argument("--commit", default="unknown")

    q = sub.add_parser("query", help="run a registry query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("-n", type=int, default=20, help="rows to show")

    corpus = sub.add_parser(
        "corpus", help="training-corpus build: clean → split → shard → manifest"
    )
    corpus.add_argument("--docs", required=True, help="documents parquet path")
    corpus.add_argument("--out", required=True, help="output directory")
    corpus.add_argument("--shards", type=int, default=16)

    sub.add_parser("list", help="list registry queries")

    args = p.parse_args(argv)

    if args.cmd == "list":
        from .plans import QUERIES

        for name, spec in sorted(QUERIES.items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:32s} [{oracle}] {spec.doc}")
        return 0

    from pyspark.sql import SparkSession

    from .session import get_spark

    # Only stop a session this entrypoint created: main() is also
    # callable programmatically (tests, notebooks), where tearing down
    # the caller's shared session would poison every later use of it.
    had_active = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"sdp-{args.cmd}")
    try:
        if args.cmd == "query":
            from .plans import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query: {args.name}", file=sys.stderr)
                return 2
            QUERIES[args.name].fn(spark, args.sf_dir).show(args.n, truncate=False)
            return 0

        if args.cmd == "corpus":
            from .corpus_pipeline import run_corpus_build

            out = run_corpus_build(spark.read.parquet(args.docs), n_shards=args.shards)
            (
                out.corpus.repartition("shard_id")
                .write.mode("overwrite")
                .partitionBy("split")
                .parquet(f"{args.out}/corpus")
            )
            out.manifest.write.mode("overwrite").parquet(f"{args.out}/manifest")
            out.decisions.write.mode("overwrite").parquet(f"{args.out}/decisions")
            kept = spark.read.parquet(f"{args.out}/corpus").count()
            total = spark.read.parquet(f"{args.out}/decisions").count()
            print(f"kept {kept}/{total} docs → {args.out}/corpus (+ manifest, decisions)")
            return 0

        from .sources.lookup import leagues_from_json

        leagues = leagues_from_json(spark, args.leagues)
        if args.cmd == "etl":
            from .pipeline import run_soccer_etl
            from .sources.sinks import write_staging

            out = run_soccer_etl(spark, args.raw, leagues, source_commit=args.commit)
            write_staging(out.matches_normalized, args.staging)
            n = spark.read.parquet(args.staging).count()
            print(f"staged {n} normalized matches → {args.staging}")
            if args.results:
                out.season_results.write.mode("overwrite").parquet(args.results)
                print(f"season_results → {args.results}")
            nq = out.quarantine.count()
            if nq:
                print(f"quarantined {nq} documents", file=sys.stderr)
            return 0

        if args.cmd == "incremental":
            from .streaming import run_incremental_etl

            n_batches = run_incremental_etl(
                spark,
                args.raw,
                leagues,
                args.staging,
                args.checkpoint,
                source_commit=args.commit,
            )
            print(f"processed {n_batches} micro-batch(es)")
            return 0
    finally:
        if not had_active:
            spark.stop()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
