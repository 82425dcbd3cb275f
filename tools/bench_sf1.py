#!/usr/bin/env python3
"""Per-round sf1 scale rehearsal artifact (VERDICT r8 #8).

Runs the HEAVY query tier at sf0.1 and at the 10x-tiled sf1 rehearsal
data (tools/make_sf1.py) in one session — one cold noop-executed run
per (query, sf) — and writes BENCH_SF1_r{N}.json with per-query
timings, the x10-data ratio, and a de-noised superlinearity gate:
a query is flagged only if its ratio exceeds RATIO_FLAG and a fresh
confirm rerun at sf1 reproduces it (same discipline as bench.py's
regression gate: a one-off GC/session burst must not record a finding).

r11 (VERDICT r10 #2): the cross-round vs_prev gate is now
probe-normalized, mirroring bench.py's machinery, because the r10
rehearsal crossed a machine reboot and recorded three ~1.7x phantom
regressions traced to boot-level shuffle-I/O throughput (BENCH_NOTES
mechanism section), not code:

- interleaved CANARY probes: every PROBE_EVERY queries (plus pre/post)
  a canary from the HEAVY tier reruns cold at sf1 and its min-of-2
  sample is ratioed against the PREVIOUS round's committed sf1 time —
  a point estimate of combined session-load + boot-I/O drift at that
  moment. Canaries span the two cost modes (shuffle-write-heavy and
  CPU+iteration-heavy) so an I/O-only drift is still seen.
- a buffered-write I/O probe (min-of-3 over 256 MiB to the shuffle
  filesystem) is RECORDED in the artifact (io_probe_mbps) so the next
  round can attribute a vs_prev swing to disk throughput from the two
  artifacts alone — the r10 diagnosis, made reproducible.
- per-query waiver factor = max(1.0, min(nearest probe before, nearest
  probe after)) — bench.py's conservative estimator: probes only ever
  WAIVE a regression flag (never amplify one), and only when both
  enclosing probes agree the machine was slow.

Usage: python3 tools/bench_sf1.py <round> [sf1_dir] [sf01_dir]
  e.g.: python3 tools/bench_sf1.py 9 testdata_sf1
The sf0.1 baseline dir defaults to $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.1 (ADVICE r9: parameterized for portability).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Heavy tier: every query the r7/r8 rehearsals tracked, plus the r9
# substring/set-similarity family. Linear-scaling cheap queries are
# covered by the main bench; this artifact exists to catch plans that
# drift superlinear with data size.
HEAVY = [
    "dedup_exact_documents",
    "dedup_minhash_lsh_pairs",
    "dedup_connected_clusters",
    "dedup_simhash_groups",
    "corpus_clean_decisions",
    "similarity_ann_recall",
    "similarity_ivf_recall",
    "pagerank_suppliers",
    "kcore_peel_suppliers",
    "revenue_concentration",
    "customer_value_deciles",
    "equi_depth_binning",
    "ks_two_sample_split",
    "spearman_spend_balance",
    "pack_sequences",
    "corpus_shuffle_order",
    "embedding_near_dup_banded",
    "bitext_mining_ann",
    "peak_concurrent_users",
    "tpch_q7_shape",
    "embedding_covariance_audit",
    "duplicate_substring_audit_sliced",
    "winnowing_candidate_pairs",
    "jaccard_prefix_join",
    # r10 additions: the gram-incidence leakage repair and the bucketed
    # prefix-sum selection boundary
    "split_leakage_repair",
    "split_ngram_leakage",
    "corpus_budget_select",
    # r10b: the passage-repair rebuild (corpus-sized narrow + id-triple
    # shuffle), the RRF legs (postings join + broadcast-NL cosine), and
    # the MMR pool pass (same dense leg + bounded greedy stages)
    "passage_dedup_repair",
    "hybrid_retrieval_rrf",
    "mmr_diverse_rerank",
    # r11: the production-legged RRF (ANN dense leg + prefix-filtered
    # lexical leg + the exact audit it gates against) and the
    # incremental IVF maintenance path (corpus-scale in-row assign)
    "hybrid_retrieval_rrf_ann",
    "similarity_ivf_incremental",
    "similarity_ivfpq_recall",
    # r11b: the residual IVF x PQ encode/serve, SemDeDup (kmeans assign
    # + within-cell pair join whose k-ladder is the thing to watch at
    # 10x data), and the 4-round BPE merge-learning loop (R full-corpus
    # passes — linear per round by design)
    "similarity_ivfpq_residual",
    "semantic_dedup_semdedup",
    "bpe_learn_merges",
    # r10b: the k-means recompute shuffle (dim x corpus exact-long sums)
    "kmeans_fixed_assign",
    # r12: the persisted-index serving contract (build-once amortizes,
    # search scales with probed cells), the SemDeDup action ledger
    # (same pair joins + the kept-set re-audit), and the sampled BPE
    # learner — the scale claim IS the thing to measure: learn cost
    # constant (bounded sample), apply one corpus pass
    "similarity_index_served",
    "semantic_dedup_repair",
    "bpe_learn_merges_sampled",
    # r14: the deletion differential (tombstone anti-join on the served
    # path — the broadcast must stay invisible at 10x) and the persisted
    # incremental-SemDeDup serving (cell-pruned base read + batch-
    # bounded pair join — the scale claim is batch-, not corpus-, bound)
    "ann_index_deletes",
    "semantic_dedup_served",
]

# 10x data should cost <= ~10x wall for a linear plan; the bucketed /
# banded / capped designs are expected sub-linear. Flag only clearly
# superlinear growth (the r8 findings were 24x and 37x).
RATIO_FLAG = 12.0

# vs_prev canaries: both in HEAVY (so prev artifacts carry their sf1
# times) and spanning the two cost modes the r10 phantom showed are
# normalized differently — dedup_exact is dominated by the corpus-hash
# shuffle write (the I/O mode that drifted 1.7x across the reboot),
# pagerank by iterated join/agg CPU.
CANARIES = ["dedup_exact_documents", "pagerank_suppliers"]
PROBE_EVERY = 8

# buffered-write I/O probe size; large enough to stream past the page
# cache's burst absorption on this box, small enough to stay sub-second
IO_PROBE_BYTES = 256 * 1024 * 1024


def io_probe_mbps(runs: int = 3) -> float:
    """min-of-N buffered sequential-write throughput (MB/s) on the
    shuffle filesystem — the boot-level variable the r10 phantom rode.
    Min, not median: a slow sample under transient contention must not
    report a slow DISK; sustained slowness lowers every sample."""
    import tempfile

    best = 0.0
    buf = b"\0" * (8 * 1024 * 1024)
    for _ in range(runs):
        with tempfile.NamedTemporaryFile(dir="/tmp", suffix=".ioprobe") as fh:
            t0 = time.perf_counter()
            for _ in range(IO_PROBE_BYTES // len(buf)):
                fh.write(buf)
            fh.flush()
            os.fsync(fh.fileno())
            dt = time.perf_counter() - t0
        best = max(best, IO_PROBE_BYTES / dt / 1e6)
    return best


def _exec_full(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rnd = int(sys.argv[1])
    sf1_dir = sys.argv[2] if len(sys.argv) > 2 else "testdata_sf1"
    sf01_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from soccer_data_pipeline_spark.plans import QUERIES
    from soccer_data_pipeline_spark.session import get_spark
    from soccer_data_pipeline_spark.operators.cache import release_session_blocks

    spark = get_spark(
        app_name="bench_sf1",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )

    # suite warmup: JIT/codegen + parquet footers (discarded)
    warm = QUERIES.get("dedup_exact_documents")
    if warm is not None:
        _exec_full(warm.fn(spark, sf01_dir))
        release_session_blocks(spark, gc=True)

    def one_cold(name: str, sf_dir: str) -> float:
        spec = QUERIES[name]
        release_session_blocks(spark, gc=True)
        t0 = time.perf_counter()
        _exec_full(spec.fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        release_session_blocks(spark, gc=True)
        return dt

    # vs the previous round's committed artifact (same eval mode only),
    # loaded UP FRONT so the interleaved probes can ratio against it
    prev = None
    for r in range(rnd - 1, 0, -1):
        p = os.path.join(root, f"BENCH_SF1_r{r:02d}.json")
        if os.path.exists(p):
            try:
                doc = json.load(open(p))
                if doc.get("eval") == "noop":
                    prev = (f"BENCH_SF1_r{r:02d}", doc.get("queries", {}))
            except Exception:
                pass
            break

    io_mbps = io_probe_mbps()
    print(f"# io probe: {io_mbps:.0f} MB/s buffered write", file=sys.stderr)

    def probe(tag: str, idx: int) -> float | None:
        """One interleaved vs_prev load/I-O probe at position ``idx``:
        min-of-2 cold sf1 rerun of a canary vs its committed prev-round
        sf1 time. Only meaningful when a prev artifact exists."""
        if not prev:
            return None
        cname = CANARIES[idx % len(CANARIES)]
        p1 = prev[1].get(cname, {}).get("sf1", 0)
        if not p1 or p1 <= 0 or cname not in QUERIES:
            return None
        try:
            s = min(one_cold(cname, sf1_dir) for _ in range(2))
        except Exception:
            return None
        r = s / p1
        print(f"# probe[{tag}] {cname}: {r:.2f}x vs {prev[0]}", file=sys.stderr)
        return r

    rows = {}
    flagged = {}
    probes: list[tuple[int, float]] = []
    pre = probe("pre", 0)
    if pre is not None:
        probes.append((-1, pre))
    positions: dict[str, int] = {}
    since_probe = 0
    for pos, name in enumerate(HEAVY):
        if name not in QUERIES:
            print(f"# {name}: not registered, skipped", file=sys.stderr)
            continue
        if since_probe >= PROBE_EVERY:
            pr = probe(f"q{pos}", len(probes))
            if pr is not None:
                probes.append((pos - 1, pr))
            since_probe = 0
        since_probe += 1
        positions[name] = pos
        try:
            t01 = one_cold(name, sf01_dir)
            t1 = one_cold(name, sf1_dir)
        except Exception as exc:
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
            rows[name] = {"sf0.1": -1.0, "sf1": -1.0, "ratio": None}
            continue
        ratio = t1 / t01 if t01 > 0 else None
        if ratio is not None and ratio > RATIO_FLAG:
            # confirm-by-rerun before recording a superlinearity finding
            t1c = one_cold(name, sf1_dir)
            conf = t1c / t01
            if conf > RATIO_FLAG:
                flagged[name] = round(min(ratio, conf), 2)
                print(
                    f"# SUPERLINEAR {name}: {t01:.2f}s -> {t1:.2f}s "
                    f"({ratio:.1f}x raw, {conf:.1f}x confirmed for 10x data)",
                    file=sys.stderr,
                )
            else:
                print(
                    f"# noise (unconfirmed) {name}: {ratio:.1f}x re-timed "
                    f"at {conf:.1f}x — not flagged",
                    file=sys.stderr,
                )
            t1 = min(t1, t1c)
            ratio = t1 / t01
        rows[name] = {
            "sf0.1": round(t01, 2),
            "sf1": round(t1, 2),
            "ratio": round(ratio, 2) if ratio is not None else None,
        }
        print(
            f"# {name}: sf0.1 {t01:.2f}s, sf1 {t1:.2f}s ({ratio:.1f}x)",
            file=sys.stderr,
        )
    post = probe("post", len(probes))
    if post is not None:
        probes.append((len(HEAVY), post))

    def q_factor(pos: int) -> float:
        """Waiver factor for a query at HEAVY position ``pos``: the MIN
        of the nearest probe before and after, floored at 1.0 — probes
        only ever WAIVE a vs_prev flag, and only when both enclosing
        probes agree the machine was slow (bench.py's estimator)."""
        before = [r for p, r in probes if p < pos]
        after = [r for p, r in probes if p >= pos]
        if not before or not after:
            return 1.0
        return max(1.0, min(before[-1], after[0]))

    load_factor = 1.0
    if probes:
        vals = sorted(r for _, r in probes)
        load_factor = max(1.0, vals[len(vals) // 2])

    regr = {}
    waived = {}
    confirm_cleared = {}
    if prev:
        for q, cur in rows.items():
            pq = prev[1].get(q, {})
            p1 = pq.get("sf1", -1)
            if p1 and p1 > 0 and cur["sf1"] > 0 and cur["sf1"] / p1 > 1.5:
                # confirm rerun + a FRESH probe pair around it, so the
                # waiver reflects the machine state at confirm time
                cpr = probe(f"confirm:{q}", len(probes))
                t1c = one_cold(q, sf1_dir)
                f = q_factor(positions.get(q, 0))
                if cpr is not None:
                    f = max(1.0, min(f, cpr) if f > 1.0 else cpr)
                norm = (t1c / p1) / f
                if norm > 1.5:
                    regr[q] = round(norm, 2)
                elif t1c / p1 > 1.5:
                    waived[q] = {
                        "raw": round(t1c / p1, 2),
                        "factor": round(f, 2),
                        "norm": round(norm, 2),
                    }
                    print(
                        f"# vs_prev waived {q}: {t1c / p1:.2f}x raw under "
                        f"probe factor {f:.2f} -> {norm:.2f}x normalized",
                        file=sys.stderr,
                    )
                else:
                    # no silent caps: a raw>1.5 entry whose CONFIRM
                    # rerun came back clean is transient (cold page
                    # cache / burst), but the artifact must say so —
                    # r12's vs_prev reads the raw first-run time
                    confirm_cleared[q] = {
                        "raw": round(cur["sf1"] / p1, 2),
                        "confirm": round(t1c / p1, 2),
                    }

    doc = {
        "metric": "sf1_heavy_tier",
        "round": rnd,
        "eval": "noop",
        "ratio_flag": RATIO_FLAG,
        "io_probe_mbps": round(io_mbps, 1),
        "queries": rows,
        "superlinear": flagged,
        "probes": [[p, round(r, 3)] for p, r in probes],
        "load_factor": round(load_factor, 3),
        "vs_prev": {
            "ref": prev[0] if prev else None,
            "regr": regr,
            "waived": waived,
            "confirm_cleared": confirm_cleared,
        },
        "sf1_rows": {"lineitem": 6000000, "documents": 50000, "embeddings": 20000},
    }
    out = os.path.join(root, f"BENCH_SF1_r{rnd:02d}.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({k: doc[k] for k in ("metric", "round", "superlinear")}))
    print(f"# wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
