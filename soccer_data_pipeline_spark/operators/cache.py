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

from pyspark.sql import DataFrame


def materialize_owned(result: DataFrame, *owned: DataFrame) -> DataFrame:
    """Materialize ``result`` and release the operator-owned caches.

    ``owned`` are DataFrames the operator cached/persisted while
    building ``result``. The eager local checkpoint executes the plan
    exactly once (all cache reuse happens during this execution), after
    which the intermediates are dropped from the block manager. The
    returned DataFrame reads the checkpointed blocks; their lifetime is
    tied to the DataFrame object itself (ContextCleaner), not to the
    session catalog.
    """
    out = result.localCheckpoint(eager=True)
    for df in owned:
        df.unpersist()
    return out
