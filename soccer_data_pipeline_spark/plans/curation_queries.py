"""[beyond-ref] Corpus-curation and snapshot-CDC operators (SURVEY §2.10).

Round-3 additions to the training-data tier. Each query is designed
for the 100 TB shape first, then mirrored by a DuckDB oracle:

- ``repetition_filter`` — Gopher-style repetition stats computed
  entirely NARROW (per-row higher-order functions over the token
  array; zero shuffle, zero explode). The classic explode+groupBy
  formulation shuffles one row per token — ~10^13 rows at corpus
  scale; this plan shuffles nothing.
- ``passage_dedup_stats`` — C4/RefinedWeb-style duplicated-passage
  detection. Only (doc_id, chunk_hash) pairs ever shuffle — the
  document text itself stays columnar in the scan and is never moved.
- ``chunk_documents`` — overlapping-window chunking (the RAG corpus-
  build output shape): per-row sequence + slice + hash, zero shuffle.
- ``snapshot_diff`` — hash-diff CDC between two warehouse snapshots:
  one co-partitioned full-outer join on the key, change classes
  derived from null-sides + cents-exact value compare.
- ``domain_mix_weights`` — per-language sampling allocation toward a
  uniform token budget, integer-exact (LEAST(n, total/k)) so both
  engines agree bit-for-bit; the global total rides a 1-row broadcast
  cross join (same pattern as tfidf_tokens), not a driver collect.
- ``domain_quota_sample`` — the apply half: hash-ordered cumulative
  selection per language until each token budget is spent (seed-free
  deterministic; two-phase prefix sum is the hot-language scale form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import register


def _tokens(col: str = "text"):
    return F.filter(F.split(col, " "), lambda x: x != "")


def _max_run(sorted_arr):
    """Length of the longest run of equal adjacent elements in a SORTED
    array == the multiplicity of the most frequent element. Computed
    with a single F.aggregate pass — narrow, no explode, no shuffle.
    """
    run = lambda acc, x: F.when(  # noqa: E731
        x == acc["prev"], acc["run"] + 1
    ).otherwise(F.lit(1))
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


@register(
    "repetition_filter",
    oracle="""
WITH toks AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS t
  FROM documents
),
uni AS (
  SELECT doc_id, MAX(c) AS top_unigram_count FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST(t) AS tok FROM toks)
    GROUP BY doc_id, tok
  ) GROUP BY doc_id
),
bi AS (
  SELECT doc_id, MAX(c) AS top_bigram_count FROM (
    SELECT doc_id, bg, COUNT(*) AS c
    FROM (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(RANGE(LEN(t) - 1),
                                   i -> t[i + 1] || ' ' || t[i + 2])) AS bg
      FROM toks WHERE LEN(t) >= 2
    )
    GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT toks.doc_id,
       LEN(toks.t) AS n_tokens,
       COALESCE(uni.top_unigram_count, 0) AS top_unigram_count,
       COALESCE(bi.top_bigram_count, 0) AS top_bigram_count,
       CAST(COALESCE(uni.top_unigram_count, 0) AS DOUBLE)
         / NULLIF(LEN(toks.t), 0) AS top_unigram_frac,
       CAST(COALESCE(bi.top_bigram_count, 0) * 2 AS DOUBLE)
         / NULLIF(LEN(toks.t), 0) AS top_bigram_frac,
       (LEN(toks.t) >= 20
        AND CAST(COALESCE(uni.top_unigram_count, 0) AS DOUBLE)
              / NULLIF(LEN(toks.t), 0) <= 0.20
        AND CAST(COALESCE(bi.top_bigram_count, 0) * 2 AS DOUBLE)
              / NULLIF(LEN(toks.t), 0) <= 0.30) AS passes_repetition
FROM toks
LEFT JOIN uni ON toks.doc_id = uni.doc_id
LEFT JOIN bi ON toks.doc_id = bi.doc_id
""",
    doc="[beyond-ref] Gopher-style repetition quality filter, zero-shuffle "
    "narrow plan (SURVEY §2.10)",
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-unigram / top-bigram concentration per document.

    The oracle materializes one row per token (UNNEST + GROUP BY —
    fine for DuckDB on a verification slice); the Spark plan instead
    sorts each row's token array in place and takes the longest equal
    run via one ``F.aggregate`` pass, so a 100 TB corpus scan stays a
    single narrow stage: no explode, no shuffle, whole-stage codegen
    end to end. Thresholds (max 20% top-unigram, 30% top-bigram token
    coverage, ≥20 tokens) follow the published Gopher repetition
    rules.
    """
    from ..operators.skew import spread_for_compute

    # The per-row work below (two array sorts + run-length folds over
    # every token/bigram) is interpreted HOF math running entirely in
    # the scan stage; a single-row-group local scan serializes it on
    # one core (guide §2.5 input skew — the spread is a no-op once the
    # scan itself is parallel, so nothing is tuned to local[32]).
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    toks = _tokens()
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_uni = _max_run(F.array_sort(toks))
    top_bi = _max_run(F.array_sort(bigrams))
    out = docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        top_uni.cast("long").alias("top_unigram_count"),
        top_bi.cast("long").alias("top_bigram_count"),
    )
    uni_frac = F.col("top_unigram_count").cast("double") / F.nullif(
        F.col("n_tokens"), F.lit(0)
    )
    bi_frac = (F.col("top_bigram_count") * 2).cast("double") / F.nullif(
        F.col("n_tokens"), F.lit(0)
    )
    return out.select(
        "*",
        uni_frac.alias("top_unigram_frac"),
        bi_frac.alias("top_bigram_frac"),
        (
            (F.col("n_tokens") >= 20) & (uni_frac <= 0.20) & (bi_frac <= 0.30)
        ).alias("passes_repetition"),
    )


CHUNK = 20  # tokens per passage


@register(
    "passage_dedup_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS t
  FROM documents
),
chunks AS (
  SELECT doc_id,
         MD5(ARRAY_TO_STRING(t[(i * {CHUNK} + 1):((i + 1) * {CHUNK})], ' '))
           AS chunk_hash
  FROM (SELECT doc_id, t, UNNEST(RANGE(LEN(t) // {CHUNK})) AS i FROM toks)
),
shared AS (
  SELECT chunk_hash FROM chunks
  GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT c.doc_id,
       COUNT(*) AS n_chunks,
       COUNT(s.chunk_hash) AS n_shared_chunks,
       CAST(COUNT(s.chunk_hash) AS DOUBLE) / COUNT(*) AS shared_frac,
       CAST(COUNT(s.chunk_hash) AS DOUBLE) / COUNT(*) < 0.5
         AS passes_passage_dedup
FROM chunks c LEFT JOIN shared s ON c.chunk_hash = s.chunk_hash
GROUP BY c.doc_id
""",
    doc="[beyond-ref] passage-level duplicate detection "
    f"({CHUNK}-token chunks, hash-join on 128-bit keys) (SURVEY §2.10)",
)
def passage_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style duplicated-passage stats per document.

    Each document is cut into disjoint CHUNK-token passages; a passage
    whose hash occurs in ≥2 distinct documents is "shared" and counts
    against its document's ``shared_frac`` (drop threshold 0.5).

    Scale shape: chunking + hashing is narrow (in-row higher-order
    functions); the only shuffled payloads are (doc_id, 128-bit hash)
    pairs — groupBy(hash) for the shared set, then a hash-equi join
    back. Document text never leaves the scan stage, mirroring the
    corpus_clean exact-keeper design (VERDICT r2 #6).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_chunks = F.floor(F.size(toks) / CHUNK).cast("int")
    chunks = docs.where(F.size(toks) >= CHUNK).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(toks, i * CHUNK + 1, CHUNK))
                ),
            )
        ).alias("chunk_hash"),
    )
    shared = (
        chunks.groupBy("chunk_hash")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("chunk_hash", F.lit(1).alias("is_shared"))
    )
    marked = chunks.join(shared, "chunk_hash", "left")
    frac = F.col("n_shared_chunks").cast("double") / F.col("n_chunks")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count("is_shared").alias("n_shared_chunks"),
        )
        .select(
            "*",
            frac.alias("shared_frac"),
            (frac < 0.5).alias("passes_passage_dedup"),
        )
    )


CHUNK_W = 32  # tokens per retrieval chunk
CHUNK_S = 24  # stride (8-token overlap carries context across cuts)


@register(
    "chunk_documents",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       CAST(start / {CHUNK_S} AS BIGINT) AS chunk_id,
       CAST(LEN(t[(start + 1):(start + {CHUNK_W})]) AS BIGINT)
         AS n_chunk_tokens,
       MD5(ARRAY_TO_STRING(t[(start + 1):(start + {CHUNK_W})], ' '))
         AS chunk_hash
FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t), {CHUNK_S})) AS start
      FROM toks WHERE LEN(t) >= 1)
""",
    doc="[beyond-ref] overlapping-window document chunking "
    f"({CHUNK_W}-token windows, stride {CHUNK_S}) — the RAG/retrieval "
    "corpus-build output shape (SURVEY §2.10)",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut each document into overlapping token windows — the chunk
    table a retrieval index (and the BM25/ANN tiers) is built over.
    Disjoint-chunk hashing for dedup is ``passage_dedup_stats``; this
    emits the chunks themselves, stride < width so no context is lost
    at cut points.

    Scale shape: entirely NARROW — per-row sequence + slice + hash
    inside whole-stage codegen, one output row per chunk, no shuffle
    at all (the chunk table inherits the scan's partitioning). The
    chunk hash keys downstream dedup/ANN joins; chunk text would be
    emitted the same way (slice + concat_ws) but is hashed here so the
    oracle diff stays byte-bounded.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(CHUNK_S))
    chunk = lambda s: F.slice(F.col("t"), s + 1, CHUNK_W)  # noqa: E731
    return (
        docs.where(F.size(toks) >= 1)
        .select("doc_id", toks.alias("t"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / CHUNK_S).cast("long").alias("chunk_id"),
            F.size(chunk(F.col("start"))).cast("long").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk(F.col("start")))).alias("chunk_hash"),
        )
    )


@register(
    "snapshot_diff",
    oracle="""
WITH snap_a AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey % 13 <> 0
),
snap_b AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS price_cents
  FROM orders WHERE o_orderkey % 17 <> 0
)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN b.o_orderkey IS NULL THEN 'deleted'
            WHEN a.o_orderkey IS NULL THEN 'added'
            ELSE 'changed' END AS change_type,
       a.price_cents AS old_price_cents,
       b.price_cents AS new_price_cents
FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
WHERE b.o_orderkey IS NULL OR a.o_orderkey IS NULL
   OR a.price_cents <> b.price_cents
   OR a.o_custkey <> b.o_custkey
   OR a.o_orderstatus <> b.o_orderstatus
""",
    doc="[beyond-ref] hash-diff CDC between warehouse snapshots "
    "(full-outer join + cents-exact compare) (SURVEY §2.9 family)",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify added / deleted / changed rows between two snapshots.

    The snapshots are derived deterministically from ``orders`` (mod-13
    deletions, mod-17 additions, mod-7 price updates) so the diff is
    reproducible across engines. Scale shape: ONE full-outer
    sort-merge join on the snapshot key — both sides hash-partition on
    ``o_orderkey``, so at 100 TB this is a single co-partitioned
    shuffle; with both snapshots bucketed on the key (see
    ``sources.sinks.write_bucketed_table``) it is shuffle-free.
    Unchanged rows are filtered pre-output so the result is
    |Δ|-sized, not snapshot-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", cents.alias("price_cents")
    )
    snap_a = base.where(F.col("o_orderkey") % 13 != 0)
    snap_b = base.where(F.col("o_orderkey") % 17 != 0).withColumn(
        "price_cents",
        F.col("price_cents")
        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(100)).otherwise(F.lit(0)),
    )
    a = snap_a.alias("a")
    b = snap_b.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return joined.where(
        F.col("b.o_orderkey").isNull()
        | F.col("a.o_orderkey").isNull()
        | (F.col("a.price_cents") != F.col("b.price_cents"))
        | (F.col("a.o_custkey") != F.col("b.o_custkey"))
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
    ).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("b.o_orderkey").isNull(), "deleted")
        .when(F.col("a.o_orderkey").isNull(), "added")
        .otherwise("changed")
        .alias("change_type"),
        F.col("a.price_cents").alias("old_price_cents"),
        F.col("b.price_cents").alias("new_price_cents"),
    )


@register(
    "domain_mix_weights",
    oracle="""
WITH per_lang AS (
  SELECT lang, COUNT(*) AS n_docs,
         SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')))
           AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (
  SELECT SUM(n_tokens) AS total_tokens, COUNT(*) AS n_langs FROM per_lang
)
SELECT lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(LEAST(n_tokens, total_tokens // n_langs) AS BIGINT)
         AS planned_tokens,
       ROUND(CAST(LEAST(n_tokens, total_tokens // n_langs) AS DOUBLE)
             / n_tokens, 6) AS sample_weight
FROM per_lang CROSS JOIN tot
""",
    doc="[beyond-ref] per-language sampling allocation toward a uniform "
    "token budget (SURVEY §2.10)",
)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation per language for corpus mixing.

    Each language may contribute at most ``total_tokens // n_langs``
    tokens (integer arithmetic — bit-identical across engines);
    over-represented languages get a down-sampling weight, the rest
    keep weight 1.0. The corpus-wide total joins back via a 1-row
    broadcast cross join (the tfidf_tokens pattern) — no driver-side
    ``collect`` splitting the plan in two.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens())).cast("long").alias("n_tokens"),
    )
    tot = per_lang.agg(
        F.sum("n_tokens").alias("total_tokens"), F.count("*").alias("n_langs")
    )
    planned = F.least(
        F.col("n_tokens"),
        F.floor(F.col("total_tokens") / F.col("n_langs")).cast("long"),
    )
    return (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            planned.cast("long").alias("planned_tokens"),
            F.round(
                planned.cast("double") / F.col("n_tokens"), 6
            ).alias("sample_weight"),
        )
    )


@register(
    "domain_quota_sample",
    oracle="""
WITH t AS (
  SELECT doc_id, lang,
         LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_tokens,
         SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
  FROM documents
),
per_lang AS (SELECT lang, SUM(n_tokens) AS lang_tokens FROM t GROUP BY 1),
tot AS (SELECT SUM(lang_tokens) AS total_tokens, COUNT(*) AS n_langs FROM per_lang),
budget AS (
  SELECT lang, LEAST(lang_tokens, total_tokens // n_langs) AS budget_tokens
  FROM per_lang CROSS JOIN tot
),
ranked AS (
  SELECT t.doc_id, t.lang, t.n_tokens,
         SUM(t.n_tokens) OVER (PARTITION BY t.lang ORDER BY t.h, t.doc_id)
           AS cum_tokens,
         b.budget_tokens
  FROM t JOIN budget b USING (lang)
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM ranked WHERE cum_tokens <= budget_tokens
""",
    doc="[beyond-ref] apply the domain-mix token budgets: hash-ordered "
    "cumulative selection per language until each budget is spent "
    "(SURVEY §2.10)",
)
def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply half of ``domain_mix_weights``: deterministically pick
    WHICH documents fill each language's token budget. Docs rank by
    (md5(doc_id), doc_id) within their language — seed-free, so a
    re-run or backfill selects the identical corpus — and survive
    while the running token total stays within budget. All integer
    arithmetic; the ordering key is unique, so the running sum is
    frame-unambiguous in both engines.

    Scale note: the per-language running sum is a single window here;
    at 100 TB a hot language would make that partition a straggler —
    the production decomposition is the two-phase per-shard prefix sum
    ``pack_sequences`` demonstrates (shard subtotals → broadcast
    offsets), applied per (lang, shard) with identical semantics.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias("h"),
    )
    per_lang = t.groupBy("lang").agg(F.sum("n_tokens").alias("lang_tokens"))
    tot = per_lang.agg(
        F.sum("lang_tokens").alias("total_tokens"), F.count("*").alias("n_langs")
    )
    budget = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.col("lang_tokens"),
            F.floor(F.col("total_tokens") / F.col("n_langs")).cast("long"),
        ).alias("budget_tokens"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        t.join(F.broadcast(budget), "lang")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= F.col("budget_tokens"))
        .select("doc_id", "lang", "n_tokens", F.col("cum_tokens").cast("long"))
    )


@register(
    "scd2_history",
    oracle="""
WITH log AS (
  SELECT o_custkey AS custkey, o_orderdate AS ts,
         MAX_BY(o_orderpriority, o_orderkey) AS priority
  FROM orders GROUP BY 1, 2
),
flagged AS (
  SELECT custkey, ts, priority,
         LAG(priority) OVER (PARTITION BY custkey ORDER BY ts) AS prev
  FROM log
),
changes AS (
  SELECT custkey, ts, priority FROM flagged
  WHERE prev IS NULL OR prev <> priority
)
SELECT custkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       EPOCH_US(ts) AS valid_from_us,
       EPOCH_US(LEAD(ts) OVER w) AS valid_to_us,
       priority,
       (LEAD(ts) OVER w IS NULL) AS is_current
FROM changes
WINDOW w AS (PARTITION BY custkey ORDER BY ts)
""",
    doc="[beyond-ref] SCD type-2 dimension history build from a change "
    "log (single shuffle; warehouse family, SURVEY §2.9)",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change log.

    ``orders`` acts as the change stream for each customer's tracked
    attribute (``o_orderpriority``): same-timestamp ties resolve to the
    highest ``o_orderkey``, consecutive equal values compress into one
    version, and each version gets ``[valid_from, valid_to)`` bounds
    (epoch-µs — cross-engine-stable timestamp encoding) plus an
    ``is_current`` flag on the open-ended last version.

    Scale shape: ONE hash shuffle on ``custkey``. The tie-break dedup,
    the change-compression lag, and the version/validity windows all
    partition on the same key, and filters preserve both partitioning
    and sort order — so Catalyst plans a single Exchange + sort with
    three WindowExec passes on top (asserted by a plan-shape test).
    Per-key history is bounded (a customer's order count), so no
    single-task skew at 100 TB; contrast the groupBy-then-window
    formulation, which would shuffle twice.
    """
    orders = load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.col("o_custkey").alias("custkey"),
        # NTZ → session-UTC timestamp so unix_micros resolves (loader
        # pins spark.sql.session.timeZone=UTC; same instant in DuckDB)
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
    )
    # tie-break: first row per (custkey, ts) under orderkey-desc sort
    w_tie = Window.partitionBy("custkey").orderBy(
        F.col("ts").asc(), F.col("o_orderkey").desc()
    )
    dedup = log.withColumn("prev_ts", F.lag("ts").over(w_tie)).where(
        F.col("prev_ts").isNull() | (F.col("prev_ts") != F.col("ts"))
    )
    w_ts = Window.partitionBy("custkey").orderBy("ts")
    changes = dedup.withColumn(
        "prev_priority", F.lag("priority").over(w_ts)
    ).where(
        F.col("prev_priority").isNull()
        | (F.col("prev_priority") != F.col("priority"))
    )
    nxt = F.lead("ts").over(w_ts)
    return changes.select(
        "custkey",
        F.row_number().over(w_ts).cast("long").alias("version"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        "priority",
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Passage-dedup REPAIR [beyond-ref] — the action stage for
# ``passage_dedup_stats`` (same audit->action pattern as the r9/r10
# winnowing->clean and leakage->split-repair wirings): instead of only
# measuring duplicated passages, rewrite each document with every
# non-canonical occurrence of a cross-document duplicated passage
# removed (C4/RefinedWeb "keep one occurrence" semantics).
#
# Rule (deterministic, seed-free): a CHUNK-token passage whose hash
# occurs in >= 2 distinct documents keeps ONLY its globally-first
# occurrence by (doc_id, chunk_idx) order; every other occurrence is
# cut. Tail tokens (len % CHUNK) never participate — they cannot be a
# full duplicated passage under the audit's definition — and are
# always kept, so repair(x) == x for every clean document.
#
# Scale shape: only (doc_id, chunk_idx, 128-bit hash) triples shuffle
# — document text never leaves the scan stage. The per-hash keeper is
# a groupBy(hash) min(struct(doc_id, idx)); decisions come back as a
# per-doc sorted int array (bounded by n_chunks), and the rebuild is
# NARROW: in-row index filter + slice + concat inside whole-stage
# codegen. No window over the corpus, no driver materialization.
# ---------------------------------------------------------------------------


@register(
    "passage_dedup_repair",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS t
  FROM documents
),
base AS (SELECT doc_id, t, CAST(LEN(t) // {CHUNK} AS INT) AS nf FROM toks),
occ AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         MD5(ARRAY_TO_STRING(t[(i * {CHUNK} + 1):((i + 1) * {CHUNK})], ' ')) AS h
  FROM (SELECT doc_id, t, UNNEST(RANGE(nf)) AS i FROM base WHERE nf > 0)
),
nd AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM occ GROUP BY h),
rk AS (
  SELECT o.doc_id, o.i,
         ROW_NUMBER() OVER (PARTITION BY o.h ORDER BY o.doc_id, o.i) AS rk,
         nd.nd
  FROM occ o JOIN nd USING (h)
),
dropped AS (
  SELECT doc_id, LIST(i ORDER BY i) AS d
  FROM rk WHERE nd >= 2 AND rk > 1 GROUP BY doc_id
),
built AS (
  SELECT b.doc_id, b.nf, COALESCE(d.d, CAST([] AS INT[])) AS d,
         FLATTEN(LIST_TRANSFORM(
             LIST_FILTER(RANGE(b.nf), i -> NOT LIST_CONTAINS(COALESCE(d.d, CAST([] AS INT[])), i)),
             i -> b.t[(i * {CHUNK} + 1):((i + 1) * {CHUNK})]))
         || b.t[(b.nf * {CHUNK} + 1):LEN(b.t)] AS kept
  FROM base b LEFT JOIN dropped d USING (doc_id)
)
SELECT doc_id,
       CAST(nf AS BIGINT) AS n_chunks,
       CAST(LEN(d) AS BIGINT) AS n_removed,
       CAST(LEN(kept) AS BIGINT) AS n_tokens_kept,
       MD5(COALESCE(ARRAY_TO_STRING(kept, ' '), '')) AS repaired_md5
FROM built
""",
    doc="[beyond-ref] passage-dedup repair: rewrite documents with every "
    f"non-canonical occurrence of a cross-document {CHUNK}-token "
    "duplicated passage removed (keep-first by (doc_id, idx)); the "
    "action stage of passage_dedup_stats (SURVEY §2.10)",
)
def passage_dedup_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove duplicated passages, keeping one canonical occurrence.

    Output per document: chunk counts, how many passages were cut,
    kept-token count, and the md5 of the repaired text (hashed so the
    differential stays byte-bounded; the repaired text itself is the
    same ``concat_ws`` expression, emitted by the corpus build).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    base = docs.select(
        "doc_id",
        toks.alias("t"),
        F.floor(F.size(toks) / CHUNK).cast("int").alias("nf"),
    )
    chunk_at = lambda i: F.slice(F.col("t"), i * CHUNK + 1, CHUNK)  # noqa: E731
    occ = (
        base.where(F.col("nf") > 0)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("nf") - 1),
                    lambda i: F.struct(
                        i.cast("int").alias("i"),
                        F.md5(F.concat_ws(" ", chunk_at(i))).alias("h"),
                    ),
                )
            ).alias("c"),
        )
        .select("doc_id", F.col("c.i").alias("i"), F.col("c.h").alias("h"))
    )
    # Per-hash keeper: one groupBy over (doc_id, idx, hash) triples.
    per_hash = occ.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd"),
        F.min(F.struct("doc_id", "i")).alias("first"),
    )
    dropped = (
        occ.join(per_hash.where(F.col("nd") >= 2), "h")
        .where(
            ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("i") == F.col("first.i"))
            )
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("i")).alias("d"))
    )
    empty_i = F.array().cast("array<int>")
    d = F.coalesce(F.col("d"), empty_i)
    full_idx = F.when(
        F.col("nf") > 0, F.sequence(F.lit(0), F.col("nf") - 1)
    ).otherwise(empty_i)
    kept_full = F.flatten(
        F.transform(
            F.filter(full_idx, lambda i: ~F.array_contains(d, i)),
            lambda i: chunk_at(i),
        )
    )
    tail_len = F.size("t") - F.col("nf") * CHUNK
    tail = F.when(
        tail_len > 0, F.slice(F.col("t"), F.col("nf") * CHUNK + 1, tail_len)
    ).otherwise(F.array().cast("array<string>"))
    kept = F.concat(kept_full, tail)
    # Pin the broadcast: `dropped` is per-doc int arrays (bounded by the
    # duplicated-passage count, orders of magnitude below the corpus) and
    # MUST join broadcast-side so `base`'s token array `t` never crosses
    # an Exchange. Without the pin a stats misestimate could silently
    # regress to SortMergeJoin and shuffle the full corpus tokens
    # (ADVICE r10). The plan guard asserts no Exchange carries `t#`.
    return base.join(F.broadcast(dropped), "doc_id", "left").select(
        "doc_id",
        F.col("nf").cast("long").alias("n_chunks"),
        F.size(d).cast("long").alias("n_removed"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        F.md5(F.concat_ws(" ", kept)).alias("repaired_md5"),
    )
