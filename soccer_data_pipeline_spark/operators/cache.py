"""Cache ownership contract for operators (VERDICT r2 #4 / ADVICE r2).

Some operators must cache an intermediate because the plan consumes it
several times (candidate-pair tables, semi-joined shingle tables). A
bare ``.cache()`` is *catalog-owned*: it stays in the block manager
until someone calls ``unpersist()``/``clearCache()``, so a long-lived
session accumulates executor memory pressure query after query (the r2
bench measured ~40% slowdown on heavy composites by query 40 and worked
around it with per-query ``clearCache()``).

The contract here gives every operator-internal cache an owner:

- the cache lives only while the operator computes its (small, by
  construction) result;
- the result is materialized via an eager ``localCheckpoint`` and the
  caches are released before returning;
- the returned DataFrame is backed by checkpoint blocks that are
  *GC-owned* — Spark's ContextCleaner drops them once the caller drops
  the DataFrame — so nothing outlives its user.

Operators whose result is corpus-sized must NOT use this helper (a
checkpoint would materialize the corpus); none of the current cache
users are in that class — their results are near-dup pair lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_owned(result: DataFrame, *owned: DataFrame) -> DataFrame:
    """Materialize ``result`` and release the operator-owned caches.

    ``owned`` are DataFrames the operator cached/persisted while
    building ``result``. The eager local checkpoint executes the plan
    exactly once (all cache reuse happens during this execution), after
    which the intermediates are dropped from the block manager. The
    returned DataFrame reads the checkpointed blocks; their lifetime is
    tied to the DataFrame object itself (ContextCleaner), not to the
    session catalog.

    GC-ownership is *eventual*, not immediate: ContextCleaner only drops
    the checkpoint blocks after the Python wrapper is collected AND the
    JVM weak-reference queue drains — both asynchronous. A long-lived
    session running many operators back-to-back accumulates blocks in
    the interim (the r3 bench measured a 2× suite-wide slowdown from
    exactly this). Callers with a unit-of-work boundary (per bench
    query, per service request) should call
    :func:`release_session_blocks` at that boundary for deterministic
    release.
    """
    out = result.localCheckpoint(eager=True)
    for df in owned:
        df.unpersist()
    return out


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """IDs of every RDD currently persisted in the block manager —
    catalog caches, operator persists, and localCheckpoint blocks."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def checkpoint_owned(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """Eager localCheckpoint + the EXACT persisted-RDD ids backing it.

    Replaces the pre/post ``persistent_rdd_ids`` diff the loop
    operators used to attribute checkpoint blocks (dedup candidate
    tables, the CC label rounds). The diff was a GLOBAL snapshot, so
    two driver threads checkpointing concurrently would each see the
    other's new blocks in their diff and later unpersist blocks they
    do not own — fatal for localCheckpoint blocks, whose lineage is
    truncated and cannot be recomputed (the thread-safety blocker
    VERDICT r15 #1 named). The checkpointed Dataset's analyzed plan is
    the LogicalRDD over exactly the RDD ``localCheckpoint`` persisted,
    so the id is read off the frame itself: per-thread exact
    ownership, no lock, no window. If the internal plan shape ever
    changes, the except arm leaves the block GC-owned (ContextCleaner
    / the caller's unit-of-work ``release_session_blocks`` boundary
    still reclaims it) rather than guessing from a racy diff.
    """
    out = df.localCheckpoint(eager=True)
    try:
        ids = {int(out._jdf.queryExecution().analyzed().rdd().id())}
    except Exception:
        ids = set()
    return out, ids


def run_concurrently(*thunks, spark: SparkSession | None = None):
    """Run independent job-submitting thunks on driver threads and
    return their results in thunk order (guide §2.6 "overlap
    independent jobs": actions are only sequential because driver code
    calls them sequentially; FIFO scheduling back-fills executors freed
    by one job's tail with the next job's tasks).

    Use for CONSTRUCTION-side eager work that is independent by data
    (e.g. the two evidence tiers of clean_decisions, the served/memory
    twins of the serving gates). Each thunk's exceptions propagate to
    the caller in order. Correctness prerequisite (now guaranteed by
    :func:`checkpoint_owned`): nothing a thunk releases may be
    attributed by a global block-manager diff.

    ``inheritable_thread_target`` carries the parent's JVM thread-local
    properties (job description/group — and, when ``spark`` is passed,
    the session's tags) into the pool threads, per the PySpark
    concurrency docs; identity fallback if the API moves.
    """
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    try:
        from pyspark import inheritable_thread_target as _itt

        wrap = _itt(spark) if spark is not None else _itt
    except ImportError:  # pragma: no cover - API stable since 3.1
        wrap = lambda f: f  # noqa: E731
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(wrap(t)) for t in thunks]
        return [f.result() for f in futures]


def unpersist_ids(spark: SparkSession, ids: set[int]) -> int:
    """Unpersist the given RDD ids (non-blocking); returns count."""
    if not ids:
        return 0
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for k in list(jmap.keySet().toArray()):
        if int(k) in ids:
            jmap.get(k).unpersist(False)
            n += 1
    return n


def release_session_blocks(spark: SparkSession, gc: bool = False) -> int:
    """Deterministically drop EVERY persisted block in the session:
    catalog caches and all persistent RDDs (including localCheckpoint
    blocks backing already-dead DataFrames).

    This is the caller-side lifecycle hook for long-lived sessions: call
    it at a unit-of-work boundary where no DataFrame from previous work
    is still live (bench calls it between queries; a query service would
    call it between requests). Any still-live checkpointed DataFrame
    becomes unusable after this — by contract there are none at the
    boundary. Returns the number of RDDs unpersisted.

    ``gc=True`` additionally triggers a JVM GC: BROADCAST blocks (one
    per broadcast join) are only reclaimed when ContextCleaner sees
    their weak refs die, which needs a collection — across a long suite
    hundreds of dead broadcasts otherwise pile up in the block manager.
    Reserve it for coarse boundaries (bench uses per-query, not
    per-run); a forced GC per service request would be pathological.
    """
    spark.catalog.clearCache()
    n = unpersist_ids(spark, persistent_rdd_ids(spark))
    if gc:
        import gc as _pygc

        _pygc.collect()  # drop py4j refs so the JVM side sees dead objects
        spark._jvm.System.gc()
    return n
