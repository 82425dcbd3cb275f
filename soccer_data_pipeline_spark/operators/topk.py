"""Scale-safe global top-k and global rank primitives.

The naive form of "top-k with rank" — ``row_number()`` over an
un-partitioned ``Window.orderBy(...)`` — funnels the ENTIRE input frame
through one task (Spark logs ``WindowExec: No Partition Defined``).
Fine on a post-agg frame of a few thousand rows; wrong on any frame
whose cardinality grows with the data (vocabularies, session paths,
customer dims). These helpers keep the same exact semantics with plans
that survive a 100× scale-up:

- :func:`bounded_topk` — exact top-k + rank via ``orderBy().limit(k)``
  (planned as ``TakeOrderedAndProject``: per-task k-row heaps, driver
  merges k·tasks rows) followed by an in-array rank recovery. No
  ``WindowExec`` at all.
- :func:`exclusive_prefix_offsets` — (bucket, count) → (bucket,
  exclusive running total) folded inside ONE array of ≤ |buckets|
  structs. Replaces the "tiny un-partitioned window over the bucket
  table" step of two-phase prefix sums, erasing the warning even there.
- :func:`value_bucketed_rank` — exact global 1-based rank for EVERY
  row (not just top-k) via value-range buckets + local rank + bucket
  offsets; the full-frame companion the Gini/Lorenz family needs.
- :func:`value_bucketed_prefix_sum` — exact inclusive running totals
  of integral weight columns under a global order, same bucketed
  two-phase shape; the ECDF/Lorenz/bin-budget primitive (KS tests,
  decile tables, compaction planning).

House rule (SURVEY §2 scale notes): any global ordering must either be
k-bounded (``bounded_topk``) or two-phase bucketed (``value_bucketed_
rank`` / the hash-prefix form in ``operators/corpus.shuffle_order``).
``tests/test_plan_shapes.py::test_no_unpartitioned_windows`` enforces
this for the audit tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bounded_topk(
    df: DataFrame,
    k: int,
    order: list[Column],
    encode: list[Column],
    fields: list[str],
    rank_col: str = "rk",
) -> DataFrame:
    """Exact top-``k`` rows of ``df`` under ``order`` (which must be a
    TOTAL order — break ties fully) with their exact 1-based global
    rank, without a single-partition window over the input.

    ``orderBy(*order).limit(k)`` plans as ``TakeOrderedAndProject``:
    every task keeps a local k-row heap and the driver merges
    k·n_tasks rows — distributed regardless of input cardinality. The
    rank is then recovered INSIDE one array: the ≤ k survivors
    collapse to a single ``collect_list``, ``array_sort`` re-orders
    them, and ``posexplode`` emits the 0-based position.

    ``encode``: aliased columns whose ASCENDING lexicographic struct
    sort reproduces ``order`` (negate numeric keys that sort DESC),
    followed by the payload columns. ``fields``: the payload field
    names to emit, in output order.
    """
    top = df.orderBy(*order).limit(k)
    arr = top.agg(F.array_sort(F.collect_list(F.struct(*encode))).alias("_l"))
    return arr.select(F.posexplode("_l").alias("_i", "_e")).select(
        *[F.col(f"_e.{f}").alias(f) for f in fields],
        (F.col("_i") + 1).cast("long").alias(rank_col),
    )


def exclusive_prefix_offsets(
    counts: DataFrame,
    bucket_col: str,
    count_col: str,
    out_col: str = "_off",
    total_col: str | None = None,
) -> DataFrame:
    """(bucket, count) → (bucket, exclusive prefix total) with NO window.

    The bounded bucket table (≤ a few hundred rows by construction in
    every caller) collapses into ONE bucket-sorted array; each
    element's offset is the fold of its predecessors (``slice`` +
    ``aggregate`` — O(B²) element reads, trivial at B ≤ 4096); the
    result explodes back to rows. Replaces the un-partitioned
    ``Window.orderBy(bucket).rowsBetween(unboundedPreceding, -1)``
    idiom: same values, zero ``WindowExec`` nodes.

    ``total_col``: when set, every output row also carries the GRAND
    total (fold of the whole array) under this name — consumers that
    need "n" alongside each row's offset get it from the same ≤B-row
    fold instead of re-traversing the big frame with a separate
    ``count(*)`` + ``crossJoin`` pass.
    """
    arr = counts.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(bucket_col).alias("b"), F.col(count_col).alias("n"))
            )
        ).alias("_l")
    )
    pref = F.transform(
        F.col("_l"),
        lambda e, i: F.struct(
            e["b"].alias("b"),
            F.aggregate(
                F.slice(F.col("_l"), F.lit(1), i),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x["n"],
            ).alias("o"),
        ),
    )
    cols = [
        F.col("_e.b").alias(bucket_col),
        F.col("_e.o").cast("long").alias(out_col),
    ]
    sel = [F.explode(pref).alias("_e")]
    if total_col is not None:
        sel.append(
            F.aggregate(
                F.col("_l"), F.lit(0).cast("long"), lambda acc, x: acc + x["n"]
            ).alias("_t")
        )
        cols.append(F.col("_t").cast("long").alias(total_col))
    return arr.select(*sel).select(*cols)


def value_bucketed_prefix_sum(
    df: DataFrame,
    key: str,
    weights: list[str],
    tiebreak: list[str] | None = None,
    n_buckets: int = 64,
    prefix: str = "cum_",
    boundaries: list[float] | None = None,
    total_prefix: str | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running totals of each ``weights`` column under
    ``ORDER BY key, *tiebreak`` for EVERY row — the cumulative-sum
    companion of :func:`value_bucketed_rank` (ECDFs, Lorenz curves,
    size-budget bin assignment all reduce to this).

    Same two-phase shape: range-bucket on probed boundaries (ANY
    boundary set is correct — bucket order is a prefix of the total
    order), per-bucket ``sum().over(partitionBy(bucket))`` windows
    (frame ≈ 1/B of the input per task, never single-partition), then
    one :func:`exclusive_prefix_offsets`-style array fold over the
    B-row bucket-total table per weight, broadcast-joined back. The
    input is lazily ``localCheckpoint``-ed before the probe for the
    same triple-reuse reason as :func:`value_bucketed_rank` (skipped
    when prefit ``boundaries`` are passed).

    Weight columns must be integral (long) — the per-bucket window sum
    and the bucket-offset fold must BOTH be association-free for the
    result to be exact, which integer addition is and float addition
    is not. Callers scale to cents/milli-units first (house rule).

    Output: ``df``'s columns plus one ``{prefix}{w}`` long per weight.

    ``total_prefix``: when set, also emit the GRAND total of each
    weight as ``{total_prefix}{w}`` on every row — it comes from the
    same broadcast B-row bucket-total fold, so ECDF consumers divide
    by n without a second full-frame agg + crossJoin pass.
    """
    tiebreak = tiebreak or []
    if boundaries is None:
        df = df.localCheckpoint(eager=False)
        qs = [i / n_buckets for i in range(1, n_buckets)]
        row = df.agg(
            F.percentile_approx(F.col(key).cast("double"), qs, 10000).alias("b")
        )
        raw = row.first()["b"] or []
    else:
        raw = boundaries
    bounds = sorted({float(b) for b in raw if b is not None})
    if bounds:
        blit = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(
            F.filter(blit, lambda b: b <= F.col(key).cast("double"))
        ).alias("_b")
    else:
        bucket = F.lit(0).alias("_b")
    t = df.withColumn("_b", bucket)
    w_local = (
        Window.partitionBy("_b")
        .orderBy(key, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t
    for w in weights:
        local = local.withColumn(f"_l_{w}", F.sum(w).over(w_local))
    totals = t.groupBy("_b").agg(
        *[F.sum(w).cast("long").alias(f"_n_{w}") for w in weights]
    )
    offsets = None
    for w in weights:
        off = exclusive_prefix_offsets(
            totals.select("_b", f"_n_{w}"),
            "_b",
            f"_n_{w}",
            out_col=f"_off_{w}",
            total_col=(f"{total_prefix}{w}" if total_prefix is not None else None),
        )
        offsets = off if offsets is None else offsets.join(off, "_b")
    out = local.join(F.broadcast(offsets), "_b")
    for w in weights:
        out = out.withColumn(
            f"{prefix}{w}", (F.col(f"_off_{w}") + F.col(f"_l_{w}")).cast("long")
        )
    return out.drop("_b", *[f"_l_{w}" for w in weights], *[f"_off_{w}" for w in weights])


def value_bucketed_rank(
    df: DataFrame,
    key: str,
    tiebreak: list[str],
    n_buckets: int = 64,
    rank_col: str = "i",
    boundaries: list[float] | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Exact global 1-based rank under ``ORDER BY key, *tiebreak`` for
    EVERY row — the full-frame companion of :func:`bounded_topk` —
    as a two-phase prefix sum over value-range buckets.

    1. Boundary probe: ``percentile_approx`` of ``key`` yields ≤
       ``n_buckets - 1`` split points, collected to the driver as a
       bounded literal list (one extra job at plan-build time). ANY
       boundary set produces correct ranks — bucket assignment
       (#boundaries ≤ value) is monotone in the sort key, so bucket
       order is a prefix of the total order; the probe only balances
       bucket sizes.
    2. Local ``row_number`` per bucket (frame = one bucket, ~1/B of
       the input per task); bucket counts → exclusive offsets via
       :func:`exclusive_prefix_offsets` (array fold, no window);
       broadcast-join back; rank = offset + local rank.

    Equal-``key`` rows land in one bucket by construction (ties are
    never split across buckets), so heavy duplicate keys bound the
    skew exactly as a global sort's range partitioner would.

    The input frame is ``localCheckpoint``-ed LAZILY first: the probe,
    the local-rank branch, and the bucket-count branch would otherwise
    each recompute the caller's upstream plan (3× an aggregation the
    caller already paid for — measured 9.7× on the Gini query at
    sf0.1). Lazy (not eager): the probe is always the first action, so
    it materializes the checkpoint DURING its own pass instead of
    paying a separate write-then-read job (measured ~25% off the whole
    Gini query at both 1× and 256× dims). The checkpoint is GC-owned,
    reclaimed by the session-block release at every bench/query
    boundary (the house cache-ownership contract, operators/cache.py),
    and the ranked frame a caller holds keeps it alive exactly as long
    as needed.

    ``boundaries``: prefit split points to reuse (skips BOTH the
    checkpoint and the probe job — the same prefit escape hatch as
    ``similarity.pq_topk(models=...)``). ANY values are correct; a
    stale set only unbalances buckets, so a pipeline ranking the same
    key repeatedly (daily Gini, rolling binning) can probe once and
    pass the list forward across runs.

    ``total_col``: when set, every output row also carries the grand
    row count n as a long column of this name — it rides the SAME
    broadcast bucket-offset fold (n = Σ bucket counts), so consumers
    whose arithmetic needs n per row (NTILE, top-decile cuts, Gini's
    (n+1)/n term) get it with ZERO extra passes over the ranked frame.
    The r7 verdict measured the alternative — a separate ``count(*)``
    agg + ``crossJoin`` re-traversing the ranked plan — at ~3.7× on
    the Gini query; this closes that.
    """
    if boundaries is None:
        df = df.localCheckpoint(eager=False)
        qs = [i / n_buckets for i in range(1, n_buckets)]
        row = df.agg(
            F.percentile_approx(F.col(key).cast("double"), qs, 10000).alias("b")
        )
        raw = row.first()["b"] or []
    else:
        raw = boundaries
    bounds = sorted({float(b) for b in raw if b is not None})
    if bounds:
        blit = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(
            F.filter(blit, lambda b: b <= F.col(key).cast("double"))
        ).alias("_b")
    else:
        bucket = F.lit(0).alias("_b")
    t = df.withColumn("_b", bucket)
    w_local = Window.partitionBy("_b").orderBy(key, *tiebreak)
    local = t.withColumn("_lr", F.row_number().over(w_local))
    offsets = exclusive_prefix_offsets(
        t.groupBy("_b").agg(F.count("*").alias("_n")),
        "_b",
        "_n",
        total_col=total_col,
    )
    return (
        local.join(F.broadcast(offsets), "_b")
        .withColumn(rank_col, (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_b", "_lr", "_off")
    )
