#!/usr/bin/env python3
"""Assemble the per-round ANN frontier artifact (VERDICT r9 #8: the
ladder constants stay measured, not extrapolated).

Runs the two config-frontier tuners (bitext sign-LSH, banded embedding
near-dup) as subprocesses — each prints one JSON line per
(sf_dir, config) — then measures this round's gate margins in-process:

- rrf_ann: hybrid_retrieval_rrf_ann's fused-top-10 overlap and macro
  NDCG delta vs the exact-legged audit, per sf;
- ivf_pq_trainer: per-query min / macro recall of the IVF (n_probe
  ladder), incremental-IVF, and PQ paths under the r11 deterministic
  trainer.

Usage: python3 tools/assemble_ann_tune.py <round> [sf01_dir] [sf1_dir]
Writes ANN_TUNE_r{N}.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_tuner(script: str, sf_dirs: list[str]) -> list[dict]:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", script), *sf_dirs],
        capture_output=True,
        text=True,
        check=False,
    )
    rows = []
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if not rows:
        print(f"# {script}: no JSON rows (rc={out.returncode})", file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
    return rows


def main() -> None:
    rnd = int(sys.argv[1])
    sf01 = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sf1 = sys.argv[3] if len(sys.argv) > 3 else os.path.join(ROOT, "testdata_sf1")
    sf_small = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    bitext = run_tuner("tune_bitext_ann.py", [sf01, sf1])
    banded = run_tuner("tune_banded.py", [sf01, sf1])

    from pyspark.sql import functions as F

    from soccer_data_pipeline_spark.session import get_spark
    import soccer_data_pipeline_spark.plans.llm_queries as lq

    spark = get_spark(app_name="ann_tune_gates")

    rrf = []
    for sf in sf_small + [sf01, sf1]:
        q, c = lq._rrf_sides(spark, sf)
        docs = lq.load_table(spark, sf, "documents").select("doc_id", "text")
        ql, cl = lq._rrf_labels(spark, sf)
        exact = lq._rrf_fuse(
            lq._rrf_dense_exact(q, c), lq._rrf_lex_leg(docs, c, prefix=None)
        ).cache()
        ann = lq._rrf_fuse(
            lq._rrf_dense_ann(q, c), lq._rrf_lex_leg(docs, c, prefix=lq._RRF_PREFIX)
        ).cache()
        ov = (
            exact.join(
                ann.select("query_id", "candidate_id", F.lit(1).alias("hit")),
                ["query_id", "candidate_id"],
                "left",
            )
            .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count("*")).alias("f"))
            .collect()[0]["f"]
        )
        ex_n = lq._rrf_ndcg(exact, ql, cl).agg(F.avg("ndcg")).collect()[0][0]
        an_n = lq._rrf_ndcg(ann, ql, cl).agg(F.avg("ndcg")).collect()[0][0]
        rrf.append(
            {
                "sf_dir": sf,
                "overlap": round(float(ov), 4),
                "exact_ndcg": round(float(ex_n), 4),
                "ann_ndcg": round(float(an_n), 4),
                "ndcg_delta": round(float(an_n - ex_n), 4),
            }
        )
        exact.unpersist()
        ann.unpersist()

    from soccer_data_pipeline_spark.operators.kmeans import fit_deterministic_kmeans
    from soccer_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_search,
        ivf_topk,
        pq_rerank_topk,
    )
    from soccer_data_pipeline_spark.sources import load_table

    def recalls(q, c, approx):
        exact = brute_force_topk(q, c, k=5).select("query_id", "candidate_id")
        ap = approx.select("query_id", "candidate_id").withColumn("hit", F.lit(1))
        j = exact.join(ap, ["query_id", "candidate_id"], "left").fillna(0, ["hit"])
        r = (
            j.groupBy("query_id")
            .agg((F.sum("hit") / F.count("*")).alias("rec"))
            .agg(F.min("rec").alias("mn"), F.avg("rec").alias("macro"))
            .collect()[0]
        )
        return round(float(r["mn"]), 3), round(float(r["macro"]), 4)

    trainer = []
    for sf in sf_small + [sf01, sf1]:
        emb = load_table(spark, sf, "embeddings")
        q = emb.where("vec_id < 10")
        c = emb.where("vec_id >= 10")
        ivf_out, model = ivf_topk(q, c, k=5, n_centroids=16, n_probe=12, seed=42)
        ivf_min, ivf_macro = recalls(q, c, ivf_out)
        base = c.where(F.col("vec_id") % 10 != 7)
        new = c.where(F.col("vec_id") % 10 == 7)
        m2 = fit_deterministic_kmeans(base, k=16, n_iters=4, sample_rows=256 * 16)
        n_probe = 16 if c.count() < 1024 else 12
        incr = ivf_search(
            q,
            ivf_index(base, m2).unionByName(ivf_index(new, m2)),
            m2,
            k=5,
            n_probe=n_probe,
        )
        inc_min, inc_macro = recalls(q, c, incr)
        pq_out, _ = pq_rerank_topk(q, c, k=5, shortlist=200, m=16, n_codes=16, seed=42)
        pq_min, pq_macro = recalls(q, c, pq_out)
        trainer.append(
            {
                "sf_dir": sf,
                "ivf_min": ivf_min,
                "ivf_macro": ivf_macro,
                "ivf_incremental_min": inc_min,
                "ivf_incremental_macro": inc_macro,
                "ivf_incremental_n_probe": n_probe,
                "pq_min": pq_min,
                "pq_macro": pq_macro,
            }
        )

    # r11b: residual-vs-raw IVF×PQ encode frontier (the encoding choice
    # is a config, so its effect is MEASURED per round like every other
    # ladder constant): same coarse quantizer, per-encoding codebooks,
    # recall at the registered shortlist=200 and at the stressed 50.
    from soccer_data_pipeline_spark.operators.similarity import ivfpq_topk

    ivfpq_res = []
    for sf in sf_small + [sf01, sf1]:
        emb = load_table(spark, sf, "embeddings")
        q = emb.where("vec_id < 10")
        c = emb.where("vec_id >= 10")
        n_probe = 16 if c.count() < 1024 else 12
        row = {"sf_dir": sf, "n_probe": n_probe}
        coarse = None
        for res in (False, True):
            models = None
            for sl in (200, 50):
                out, coarse, models = ivfpq_topk(
                    q, c, k=5, shortlist=sl, n_centroids=16, n_probe=n_probe,
                    m=16, n_codes=16, seed=42, coarse=coarse, models=models,
                    residual=res,
                )
                mn, macro = recalls(q, c, out)
                tag = "residual" if res else "raw"
                row[f"{tag}_sl{sl}_min"] = mn
                row[f"{tag}_sl{sl}_macro"] = macro
        ivfpq_res.append(row)

    # r12: persisted-index serving margins — the similarity_index_served
    # gates, measured: recall of ann_index_search (index parquet + JSON
    # quantizers read from disk) vs brute force, and row-identity of the
    # served top-k with an in-memory encode under the same quantizers.
    import tempfile

    from soccer_data_pipeline_spark.index_pipeline import (
        ann_index_search,
        run_ann_index_build,
    )
    from soccer_data_pipeline_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_search,
    )

    served = []
    for sf in sf_small + [sf01, sf1]:
        emb = load_table(spark, sf, "embeddings")
        q = emb.where("vec_id < 10")
        c = emb.where("vec_id >= 10")
        n_probe = 16 if c.count() < 1024 else 12
        out_dir = tempfile.mkdtemp(prefix="ann_tune_served_")
        built = run_ann_index_build(
            c, out_dir, n_centroids=16, m=16, n_codes=16, residual=True, seed=42
        )
        srv = ann_index_search(q, c, out_dir, k=5, shortlist=200, n_probe=n_probe)
        mn, macro = recalls(q, c, srv)
        mem = ivfpq_search(
            q, ivfpq_index(c, built.coarse, built.models, residual=True),
            c, built.coarse, built.models,
            k=5, shortlist=200, n_probe=n_probe, residual=True,
        )
        key = lambda rs: {  # noqa: E731
            (r.query_id, r.rn): r.candidate_id for r in rs
        }
        served.append(
            {
                "sf_dir": sf,
                "n_probe": n_probe,
                "served_min": mn,
                "served_macro": macro,
                "served_matches_memory": key(srv.collect()) == key(mem.collect()),
            }
        )

    # r13: rebalance lifecycle gate margins — the ann_index_rebalance
    # differential's config (build 16 cells, split the manifest argmax,
    # probe-all below 1024 candidates / 13-of-17 above), measured from
    # the REWRITTEN artifacts at every sf
    from soccer_data_pipeline_spark.index_pipeline import (
        delete_ids,
        load_ann_quantizers,
        merge_cells,
        rebalance_cell,
    )

    rebalance = []
    for sf in sf_small + [sf01, sf1]:
        emb = load_table(spark, sf, "embeddings")
        q = emb.where("vec_id < 10")
        c = emb.where("vec_id >= 10")
        small = c.count() < 1024
        out_dir = tempfile.mkdtemp(prefix="ann_tune_rebalance_")
        run_ann_index_build(
            c, out_dir, n_centroids=16, m=16, n_codes=16, residual=True, seed=42
        )
        before, after, _ = rebalance_cell(spark, c, out_dir)
        b = {int(r["cell"]): int(r["n_vectors"]) for r in before.collect()}
        a = {int(r["cell"]): int(r["n_vectors"]) for r in after.collect()}
        hot = max(b, key=lambda x: (b[x], -x))
        n_cells = int(load_ann_quantizers(out_dir)[2]["n_centroids"])
        n_probe = n_cells if small else 13
        srv = ann_index_search(q, c, out_dir, k=5, shortlist=200, n_probe=n_probe)
        mn, macro = recalls(q, c, srv)
        # r14: the merge leg of the extended ann_index_rebalance
        # differential — fold the two coldest cells back (k -> 16,
        # epoch -> 2) and re-measure from the twice-rewritten artifacts
        _, after_m, _ = merge_cells(spark, c, out_dir)
        am = {int(r["cell"]): int(r["n_vectors"]) for r in after_m.collect()}
        n_cells_m = int(load_ann_quantizers(out_dir)[2]["n_centroids"])
        n_probe_m = n_cells_m if small else 12
        srv_m = ann_index_search(
            q, c, out_dir, k=5, shortlist=200, n_probe=n_probe_m
        )
        mn_m, macro_m = recalls(q, c, srv_m)
        rebalance.append(
            {
                "sf_dir": sf,
                "n_probe": n_probe,
                "hot_cell": hot,
                "hot_before": b[hot],
                "hot_after": a.get(hot, 0),
                "counts_preserved": sum(a.values()) == sum(b.values()),
                "post_rebalance_min": mn,
                "post_rebalance_macro": macro,
                "merge_counts_preserved": sum(am.values()) == sum(b.values()),
                "n_cells_after_merge": n_cells_m,
                "epoch": int(load_ann_quantizers(out_dir)[2]["epoch"]),
                "post_merge_n_probe": n_probe_m,
                "post_merge_min": mn_m,
                "post_merge_macro": macro_m,
            }
        )

    # r14: deletion gate margins — the ann_index_deletes differential's
    # config (fresh 16-cell build, tombstone the vec_id % 7 == 3 slice,
    # serve over the survivors), measured at every sf
    deletes = []
    for sf in sf_small + [sf01, sf1]:
        emb = load_table(spark, sf, "embeddings")
        q = emb.where("vec_id < 10")
        c = emb.where("vec_id >= 10")
        survivors = c.where("vec_id % 7 <> 3")
        small = c.count() < 1024
        n_probe = 16 if small else 12
        out_dir = tempfile.mkdtemp(prefix="ann_tune_delete_")
        run_ann_index_build(
            c, out_dir, n_centroids=16, m=16, n_codes=16, residual=True, seed=42
        )
        n_del = delete_ids(
            spark, out_dir, c.where("vec_id % 7 = 3").select("vec_id")
        )
        # serve with the FULL candidate set as the re-rank corpus (the
        # registered differential's shape): only the tombstone
        # anti-join keeps deleted ids out of these results
        srv = ann_index_search(
            q, c, out_dir, k=5, shortlist=200, n_probe=n_probe
        )
        mn, macro = recalls(q, survivors, srv)
        deletes.append(
            {
                "sf_dir": sf,
                "n_probe": n_probe,
                "n_deleted": n_del,
                "deleted_served": srv.where("candidate_id % 7 = 3").count(),
                "survivor_min": mn,
                "survivor_macro": macro,
            }
        )

    # r14: persisted incremental-SemDeDup serving gates — served action
    # ledger row-identical to the in-memory operator at every scale
    # (the semantic_dedup_served differential's gate, extended to sf1)
    from soccer_data_pipeline_spark.operators.semdedup import (
        semdedup_incremental_actions,
    )
    from soccer_data_pipeline_spark.semdedup_pipeline import (
        fit_semdedup_base,
        semdedup_incremental_served,
    )

    sem_served = []
    for sf in sf_small + [sf01, sf1]:
        emb = load_table(spark, sf, "embeddings")
        base = emb.where("vec_id % 3 != 0")
        new = emb.where("vec_id % 3 = 0")
        out_dir = tempfile.mkdtemp(prefix="ann_tune_semdedup_")
        config = fit_semdedup_base(base, out_dir)
        srv = {
            r["vec_id"]: r["action"]
            for r in semdedup_incremental_served(spark, new, out_dir).collect()
        }
        mem = {
            r["vec_id"]: r["action"]
            for r in semdedup_incremental_actions(
                base, new, k=config["k"]
            ).collect()
        }
        sem_served.append(
            {
                "sf_dir": sf,
                "k": config["k"],
                "n_new": len(srv),
                "n_dropped": sum(1 for a in srv.values() if a != "keep"),
                "served_matches_memory": srv == mem,
            }
        )

    doc = {
        "metric": "ann_tune_frontier",
        "round": rnd,
        "eval": "noop",
        "note": (
            "Per-round measured ANN frontiers. bitext/banded: the same "
            "config grids as r10 (ladder constants re-confirmed). NEW "
            "r11 sections: rrf_ann_gates (hybrid_retrieval_rrf_ann "
            "production-leg margins vs the exact audit — floors 0.85 "
            "overlap / -0.05 NDCG) and ivf_pq_trainer (per-query "
            "min/macro recall under the deterministic Lloyd trainer "
            "that replaced Spark ML in r11 — IVF floor 0.8, PQ floor "
            "0.6, incremental floors 0.8/0.8). r11b: "
            "ivfpq_residual_frontier measures the residual-vs-raw "
            "encode choice (same coarse quantizer, per-encoding "
            "codebooks) at the registered shortlist=200 and the "
            "stressed 50."
        ),
        "bitext_frontier": bitext,
        "banded_frontier": banded,
        "rrf_ann_gates": rrf,
        "ivf_pq_trainer": trainer,
        "ivfpq_residual_frontier": ivfpq_res,
        # r12: the persisted-serving gates measured (floors 0.8 recall,
        # row-identity with the in-memory encode)
        "index_served_gates": served,
        # r13: rebalance lifecycle gate margins (ann_index_rebalance's
        # config) — post-rebalance recall floor 0.8, balance record;
        # r14: extended with the merge leg (k back to 16, epoch 2,
        # post-merge recall from the twice-rewritten artifacts)
        "rebalance_gates": rebalance,
        # r14: deletion gate margins (ann_index_deletes' config) —
        # tombstoned slice never served, survivor recall floor 0.8
        "delete_gates": deletes,
        # r14: persisted incremental-SemDeDup serving — action-ledger
        # identity with the in-memory operator at every scale
        "semdedup_served_gates": sem_served,
    }
    out = os.path.join(ROOT, f"ANN_TUNE_r{rnd:02d}.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
