#!/usr/bin/env python3
"""Dump `.explain("formatted")` for benched queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $SPARK_GRAFT_PLAN_SUFFIX,
default "before") for every named query, or for the full bench HEADLINE
roster when no names are given.  Also prints a one-line plan-shape summary
per query (exchange count, join strategies, Python-eval nodes) so the
optimization triage can sort by smell, not just seconds.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def explain_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def plan_shape(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )
    from collections import Counter

    jc = Counter(joins)
    py = len(re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)\b", plan))
    parts = [f"exchanges={n_ex}"]
    for j, c in sorted(jc.items()):
        parts.append(f"{j}={c}")
    if py:
        parts.append(f"python_nodes={py}")
    return " ".join(parts)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    names = sys.argv[2:]
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join(REPO, "plans", tag)
    os.makedirs(out_root, exist_ok=True)

    from bench import HEADLINE
    from soccer_data_pipeline_spark.plans import QUERIES
    from soccer_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    if not names:
        names = list(HEADLINE)

    for name in names:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = explain_str(df)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        path = os.path.join(out_root, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {plan_shape(plan)}")

    spark.stop()


if __name__ == "__main__":
    main()
