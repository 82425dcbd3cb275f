"""Model-evaluation tier: exact AUC, calibration, threshold sweeps.

A training-data pipeline does not stop at producing a corpus — every
quality gate in it (lang-ID, the distilled quality classifier in
``ml/quality_model.py``, heuristic filters) is a CLASSIFIER, and the
pipeline needs to grade those classifiers at corpus scale.  This tier
evaluates a deterministic in-plan scorer (English-marker rate per
mille, the same marker lexicon as ``lang_id_heuristic``) against the
``lang = 'en'`` label on ``documents``:

- ``auc_exact_rank``      — exact tie-aware ROC AUC (Mann-Whitney).
- ``calibration_bins``    — reliability table (10 equal-width bins).
- ``threshold_sweep_prf`` — precision / recall / F1 over a threshold grid.

Scale contract (the whole point of doing this in the engine): AUC
needs GLOBAL ranks, but never materializes a corpus-sized window.
Scoring is array-function-only (zero shuffle, whole-stage codegen);
the corpus collapses to the distinct-score frame (≤ 1001 rows by
construction — scores are integer per-mille) at the FIRST shuffle;
midranks ride :func:`~..operators.topk.value_bucketed_prefix_sum`
(bucketed two-phase, no single-partition window); and everything
before the final division is int64 (doubled midranks keep tie-average
ranks integral — same discipline as ``spearman_spend_balance``).

Reference parity: the reference pipeline (README.md:201-249) grades
its champion model offline; this tier is the [beyond-ref] in-engine
analog at 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

# The scorer: English marker-token rate per mille.  Markers match
# _LANG_MARKERS' English row in llm_queries (the lexicon is tiny on
# purpose — the score is a feature, not a model).  Both engines
# compute hits with an array filter over the SAME whitespace split,
# so the double 1000*hits/n_tok is bit-identical before ROUND.
_EN_MARKERS = ("the", "a", "of")

_SCORED_DUCK = f"""
scored AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(ROUND(1000.0 * LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                             x -> x IN {_EN_MARKERS}))
                    / LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS score
  FROM documents
)
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, score): label + integer per-mille marker rate.

    Array-function-only — ``split`` / ``filter`` / ``size`` run inside
    whole-stage codegen on the scan; no explode, no shuffle, no UDF.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_MARKERS)))
    return docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(F.lit(1000.0) * hits / F.size(toks)).cast("long").alias("score"),
    )


def _score_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-score frame (score, np, nn) — ≤ 1001 rows, the single
    corpus-collapsing shuffle every query in this tier shares."""
    return (
        _scored(spark, sf_dir)
        .groupBy("score")
        .agg(
            F.sum("y").cast("long").alias("np"),
            F.sum(1 - F.col("y")).cast("long").alias("nn"),
        )
    )


_GROUPS_DUCK = """
g AS (
  SELECT score,
         CAST(SUM(y) AS BIGINT) AS np,
         CAST(SUM(1 - y) AS BIGINT) AS nn
  FROM scored GROUP BY score
)
"""


@register(
    "auc_exact_rank",
    oracle=f"""
WITH {_SCORED_DUCK.strip()},
{_GROUPS_DUCK.strip()},
c AS (
  SELECT score, np, nn, np + nn AS c,
         CAST(SUM(np + nn) OVER (ORDER BY score) AS BIGINT) AS cum
  FROM g
),
m AS (
  SELECT CAST(SUM(np * (2 * cum - c + 1)) AS BIGINT) AS s_mr2,
         CAST(SUM(np) AS BIGINT) AS tp, CAST(SUM(nn) AS BIGINT) AS tn
  FROM c
)
SELECT tp AS n_pos, tn AS n_neg,
       ROUND(CAST(s_mr2 - tp * (tp + 1) AS DOUBLE) / (2.0 * tp * tn), 6) AS auc
FROM m
""",
    doc=(
        "[beyond-ref] exact tie-aware ROC AUC (Mann-Whitney rank-sum) of the "
        "English-marker-rate scorer vs the lang='en' label — distinct-score "
        "midranks, no corpus-sized window"
    ),
)
def auc_exact_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC via the rank-sum identity
    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻), with textbook average ranks on
    ties.  With doubled midranks mr2 = 2·cum − c + 1 on the
    distinct-score frame, R⁺ = Σ np·mr2 / 2, so

        AUC = (Σ np·mr2 − n⁺(n⁺+1)) / (2 n⁺ n⁻)

    — an all-int64 numerator and ONE double division, identical in
    both engines (validated against the O(n⁺·n⁻) brute-force pairwise
    definition at sf0.01 in tests and in the oracle prototype).

    Scale shape: the corpus collapses to ≤ 1001 (score, np, nn) rows
    at the first shuffle; the global cumulative over that bounded
    frame rides ``value_bucketed_prefix_sum`` (two-phase, no
    single-partition window); the finale is a 1-row agg.  Σ np·mr2 ≤
    2n² fits int64 to n ≈ 2·10⁹ labeled docs; past that promote to
    DECIMAL (same note as ``spearman_spend_balance``).
    """
    from ..operators.topk import value_bucketed_prefix_sum

    g = _score_groups(spark, sf_dir).withColumn(
        "c", (F.col("np") + F.col("nn")).cast("long")
    )
    p = value_bucketed_prefix_sum(g, "score", ["c"], prefix="cum_")
    mr2 = (2 * F.col("cum_c") - F.col("c") + 1).alias("mr2")
    m = p.select("np", "nn", mr2).agg(
        F.sum(F.col("np") * F.col("mr2")).cast("long").alias("s_mr2"),
        F.sum("np").cast("long").alias("tp"),
        F.sum("nn").cast("long").alias("tn"),
    )
    return m.select(
        F.col("tp").alias("n_pos"),
        F.col("tn").alias("n_neg"),
        F.round(
            (F.col("s_mr2") - F.col("tp") * (F.col("tp") + 1)).cast("double")
            / (2.0 * F.col("tp") * F.col("tn")),
            6,
        ).alias("auc"),
    )


@register(
    "calibration_bins",
    oracle=f"""
WITH {_SCORED_DUCK.strip()}
SELECT LEAST(score // 25, 9) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(score) AS DOUBLE) / COUNT(*) / 1000.0, 6) AS mean_score,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate
FROM scored
GROUP BY 1
""",
    doc=(
        "[beyond-ref] classifier reliability table: 10 equal-width score bins "
        "with exact mean score and empirical positive rate (calibration audit)"
    ),
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram data: bucket the score into 10 equal-width
    bins (25 per-mille each, top bin open) and compare the bin's mean
    predicted score against its empirical positive rate — the standard
    calibration audit for any gate the pipeline thresholds on.

    One hash agg on a 10-value key; means are exact (integer sums
    divided once).  Nothing here exceeds a groupBy — the query exists
    for the tier's completeness and as the cheap end of its cost
    spectrum.
    """
    s = _scored(spark, sf_dir)
    return (
        s.groupBy(
            F.least(F.floor(F.col("score") / 25), F.lit(9))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.sum("score").cast("double") / F.count("*") / 1000.0, 6
            ).alias("mean_score"),
            F.round(F.sum("y").cast("double") / F.count("*"), 6).alias(
                "pos_rate"
            ),
        )
    )


_THRESHOLDS = tuple(range(0, 201, 20))  # per-mille grid, 11 points


@register(
    "threshold_sweep_prf",
    oracle=f"""
WITH {_SCORED_DUCK.strip()},
{_GROUPS_DUCK.strip()},
t AS (SELECT CAST(UNNEST({list(_THRESHOLDS)}) AS BIGINT) AS thr),
s AS (
  SELECT t.thr,
         CAST(SUM(CASE WHEN g.score >= t.thr THEN g.np ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN g.score >= t.thr THEN g.nn ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(g.np) AS BIGINT) AS pos
  FROM g CROSS JOIN t GROUP BY t.thr
)
SELECT thr,
       tp, fp,
       ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision_at,
       ROUND(CAST(tp AS DOUBLE) / pos, 6) AS recall_at,
       ROUND(CAST(2 * tp AS DOUBLE) / NULLIF(2 * tp + fp + (pos - tp), 0), 6) AS f1_at
FROM s
""",
    doc=(
        "[beyond-ref] operating-point sweep: precision / recall / F1 at an "
        "11-point threshold grid from the distinct-score frame (one bounded "
        "cross join, no per-threshold corpus pass)"
    ),
)
def threshold_sweep_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 at ``score >= thr`` for an 11-point
    per-mille grid — picks the operating point for a corpus gate.

    Scale shape: the sweep touches the corpus ONCE (the shared
    distinct-score collapse), then cross-joins ≤ 1001 score rows with
    the 11-row broadcast grid and re-aggregates — per-threshold
    confusion cells without a per-threshold corpus scan.  F1 uses the
    algebraic form 2TP / (2TP + FP + FN) so the only divisions are the
    final rounded ones (NULLIF-guarded for empty predictions, matching
    the oracle).
    """
    g = _score_groups(spark, sf_dir)
    thr = F.broadcast(
        spark.createDataFrame([(int(t),) for t in _THRESHOLDS], "thr long")
    )
    s = (
        g.crossJoin(thr)
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("score") >= F.col("thr"), F.col("np")).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(F.col("score") >= F.col("thr"), F.col("nn")).otherwise(0))
            .cast("long")
            .alias("fp"),
            F.sum("np").cast("long").alias("pos"),
        )
    )
    fn = F.col("pos") - F.col("tp")
    return s.select(
        "thr",
        "tp",
        "fp",
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)),
            6,
        ).alias("precision_at"),
        F.round(F.col("tp").cast("double") / F.col("pos"), 6).alias("recall_at"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / F.nullif(2 * F.col("tp") + F.col("fp") + fn, F.lit(0)),
            6,
        ).alias("f1_at"),
    )


@register(
    "brier_decomposition",
    oracle=f"""
WITH {_SCORED_DUCK.strip()},
{_GROUPS_DUCK.strip()},
arr AS (
  SELECT LIST(struct_pack(s := score, np := np, nn := nn) ORDER BY score) AS l
  FROM g
),
t AS (
  SELECT l,
         CAST(LIST_SUM(LIST_TRANSFORM(l, x -> x.np + x.nn)) AS BIGINT) AS n,
         CAST(LIST_SUM(LIST_TRANSFORM(l, x -> x.np)) AS BIGINT) AS p,
         CAST(LIST_SUM(LIST_TRANSFORM(l,
              x -> x.np * (x.s - 1000) * (x.s - 1000) + x.nn * x.s * x.s))
              AS BIGINT) AS bnum
  FROM arr
),
d AS (
  SELECT n, p, bnum,
         CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), LIST_TRANSFORM(l, x ->
             CAST((x.s * (x.np + x.nn) - 1000 * x.np) AS DOUBLE)
             * CAST((x.s * (x.np + x.nn) - 1000 * x.np) AS DOUBLE)
             / (1000000.0 * CAST(x.np + x.nn AS DOUBLE)))),
             (a, b) -> a + b) AS relnum,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), LIST_TRANSFORM(l, x ->
             CAST(x.np + x.nn AS DOUBLE)
             * (CAST(x.np AS DOUBLE) / CAST(x.np + x.nn AS DOUBLE)
                - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(x.np AS DOUBLE) / CAST(x.np + x.nn AS DOUBLE)
                - CAST(p AS DOUBLE) / CAST(n AS DOUBLE)))),
             (a, b) -> a + b) AS resnum
  FROM t
)
SELECT n AS n_docs,
       ROUND(CAST(bnum AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)), 6) AS brier,
       ROUND(relnum / CAST(n AS DOUBLE), 6) AS reliability,
       ROUND(resnum / CAST(n AS DOUBLE), 6) AS resolution,
       ROUND(ybar * (1.0 - ybar), 6) AS uncertainty
FROM d
""",
    doc=(
        "[beyond-ref] Murphy decomposition of the Brier score "
        "(reliability − resolution + uncertainty) for the marker-rate "
        "scorer at per-score granularity — exact identity, ordered-fold "
        "float determinism"
    ),
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the per-mille scorer (as probability s/1000
    against the lang='en' label) with the Murphy decomposition at
    per-distinct-score granularity — the calibration diagnostic that
    splits total error into miscalibration (reliability), discrimination
    (resolution), and irreducible class spread (uncertainty). At
    per-score bins the identity brier = rel − res + unc is EXACT, not
    the usual binned approximation.

    Determinism: the Brier numerator is all-int64
    (np·(s−1000)² + nn·s², ≤ 10⁶·n — int64 to ~9·10¹² docs); the two
    double sums (reliability/resolution) fold over the ≤ 1001-element
    score-sorted array in the SAME order in both engines (the house
    ordered-fold idiom, as in ``source_diversity_index``), and ȳ enters
    each term as the identical p/n expression. One row out.

    Scale shape: the corpus collapses to the shared ≤ 1001-row
    distinct-score frame at the only data-sized shuffle; the fold is
    driver-free and bounded.
    """
    g = _score_groups(spark, sf_dir)
    arr = g.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("score").alias("s"),
                    F.col("np").alias("np"),
                    F.col("nn").alias("nn"),
                )
            )
        ).alias("l")
    )
    lsum = lambda f: F.aggregate(  # noqa: E731
        F.col("l"), F.lit(0).cast("long"), lambda acc, x: acc + f(x)
    )
    dsum = lambda f: F.aggregate(  # noqa: E731
        F.col("l"), F.lit(0.0), lambda acc, x: acc + f(x)
    )
    t = arr.select(
        "l",
        lsum(lambda x: x["np"] + x["nn"]).alias("n"),
        lsum(lambda x: x["np"]).alias("p"),
        lsum(
            lambda x: x["np"] * (x["s"] - 1000) * (x["s"] - 1000)
            + x["nn"] * x["s"] * x["s"]
        ).alias("bnum"),
    )
    nD = F.col("n").cast("double")
    pD = F.col("p").cast("double")
    ybar = pD / nD
    d = t.select(
        "n",
        "bnum",
        ybar.alias("ybar"),
        dsum(
            lambda x: (
                (x["s"] * (x["np"] + x["nn"]) - 1000 * x["np"]).cast("double")
                * (x["s"] * (x["np"] + x["nn"]) - 1000 * x["np"]).cast("double")
                / (F.lit(1000000.0) * (x["np"] + x["nn"]).cast("double"))
            )
        ).alias("relnum"),
        dsum(
            lambda x: (
                (x["np"] + x["nn"]).cast("double")
                * (
                    x["np"].cast("double") / (x["np"] + x["nn"]).cast("double")
                    - pD / nD
                )
                * (
                    x["np"].cast("double") / (x["np"] + x["nn"]).cast("double")
                    - pD / nD
                )
            )
        ).alias("resnum"),
    )
    nD2 = F.col("n").cast("double")
    return d.select(
        F.col("n").alias("n_docs"),
        F.round(F.col("bnum").cast("double") / (F.lit(1000000.0) * nD2), 6).alias(
            "brier"
        ),
        F.round(F.col("relnum") / nD2, 6).alias("reliability"),
        F.round(F.col("resnum") / nD2, 6).alias("resolution"),
        F.round(F.col("ybar") * (F.lit(1.0) - F.col("ybar")), 6).alias(
            "uncertainty"
        ),
    )


# ---------------------------------------------------------------------------
# pass@k [beyond-ref] — the unbiased estimator from the HumanEval paper
# (Chen et al. 2021, arXiv:2107.03374 §2.1): with n samples per task
# and c of them correct, pass@k = 1 − C(n−c, k)/C(n, k), computed
# stably as 1 − Π_{j=0..k−1} (n−c−j)/(n−j). The task/sample frame
# derives deterministically from orders (task = o_custkey % 32, a
# sample per order, correct ⇔ o_orderstatus = 'F'), so n ≥ 35 at
# every sf and k ≤ 10 is always in range.
#
# Cross-engine exactness: n and c are exact int64 aggregates; each
# product term is one correctly-rounded double division of integer
# operands; the Π folds LEFT-TO-RIGHT over j in both engines (Spark
# aggregate over sequence(0, k−1) vs DuckDB LIST_REDUCE over the same
# generated list — LIST_REDUCE seeds with element 0, Spark with
# 1.0·element 0, exactly equal), so the doubles agree bit-for-bit
# before the final 6-dp round.
#
# Scale shape: ONE map-side-combined groupBy collapses orders to the
# 32-row task frame; every pass@k is a k-bounded in-row fold. Zero
# windows, zero joins.
# ---------------------------------------------------------------------------

_PASS_KS = (1, 5, 10)


def _pass_at_k_sql(k: int) -> str:
    return f"""
  CASE WHEN c = 0 THEN 0.0
       WHEN n - c < {k} THEN 1.0
       ELSE ROUND(1.0 - LIST_REDUCE(
              CAST(LIST_TRANSFORM(GENERATE_SERIES(0, {k} - 1),
                   j -> CAST(n - c - j AS DOUBLE) / CAST(n - j AS DOUBLE))
                   AS DOUBLE[]),
              (a, b) -> a * b), 6)
  END AS pass_at_{k}"""


@register(
    "pass_at_k_eval",
    oracle=f"""
WITH t AS (
  SELECT o_custkey % 32 AS task_id,
         COUNT(*) AS n,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c
  FROM orders GROUP BY 1
)
SELECT task_id, CAST(n AS BIGINT) AS n_samples, CAST(c AS BIGINT) AS n_correct,
{",".join(_pass_at_k_sql(k) for k in _PASS_KS)}
FROM t
""",
    doc=(
        "[beyond-ref] unbiased pass@k estimator (Chen et al. 2021): "
        "1 - C(n-c,k)/C(n,k) as a left-to-right product fold, per "
        "deterministic task bucket — the eval-tier metric for "
        "sampled-generation benchmarks (SURVEY §2.10 eval tier)"
    ),
)
def pass_at_k_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    t = orders.groupBy((F.col("o_custkey") % 32).alias("task_id")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("c"),
    )
    cols = [
        F.col("task_id"),
        F.col("n").cast("long").alias("n_samples"),
        F.col("c").cast("long").alias("n_correct"),
    ]
    for k in _PASS_KS:
        prod = F.aggregate(
            F.sequence(F.lit(0), F.lit(k - 1)),
            F.lit(1.0),
            lambda acc, j: acc
            * ((F.col("n") - F.col("c") - j).cast("double")
               / (F.col("n") - j).cast("double")),
        )
        cols.append(
            F.when(F.col("c") == 0, F.lit(0.0))
            .when(F.col("n") - F.col("c") < k, F.lit(1.0))
            .otherwise(F.round(F.lit(1.0) - prod, 6))
            .alias(f"pass_at_{k}")
        )
    return t.select(*cols)


# ---------------------------------------------------------------------------
# Bradley-Terry preference ratings [beyond-ref] — the pairwise-
# preference model under RLHF reward-data pipelines, fit with two
# unrolled minorization-maximization iterations (Hunter 2004):
#
#   s_i ← (W_i + ½) / ( Σ_j n_ij / (s_i + s_j)  +  1/(s_i + 1) )
#
# The ½ win and the virtual unit-rated opponent are the standard
# pseudo-game regularization, keeping every rating strictly positive
# (an all-losses player would otherwise hit 0 and the next iteration
# would divide by s_i + s_j = 0).
#
# Comparisons derive deterministically from lineitem: for every order
# with ≥ 2 lines, line 1's supplier bucket (l_suppkey % 16) plays
# line 2's; earlier l_shipdate wins, date ties break to the smaller
# bucket, self-pairs are dropped.
#
# Cross-engine exactness: W, N, n_ij are exact int64; iteration 1
# closes to a single integer-operand division s1 = (2W+1)/(N+1) (with
# s0 = 1 the pair sum is N/2 and the virtual term ½ — no float fold
# at all); iteration 2's pair sum folds LEFT-TO-RIGHT over opponents
# in ascending bucket order in both engines (sorted collect_list +
# aggregate vs LIST(... ORDER BY) + LIST_REDUCE), so the doubles
# agree bit-for-bit before the 6-dp round.
#
# Scale shape: comparisons collapse at the FIRST shuffle (groupBy
# order key, ≤ 2 rows in); the rating frame is |buckets| = 16 rows;
# iteration joins are 16×16 at most. At 100 TB the pattern holds:
# pairwise counts are |entities|²-bounded, never comparison-bounded.
# ---------------------------------------------------------------------------

_BT_BUCKETS = 16

# Shared comparison derivation for the preference-eval family
# (bradley_terry_rating + winrate_trajectory): line 1's supplier bucket
# plays line 2's per order; earlier l_shipdate wins, date ties break to
# the smaller bucket; game month = the earlier ship date's month.
_BT_GAMES_CTES = f"""
two AS (
  SELECT l_orderkey,
         MAX(CASE WHEN l_linenumber = 1 THEN l_suppkey % {_BT_BUCKETS} END) AS e1,
         MAX(CASE WHEN l_linenumber = 2 THEN l_suppkey % {_BT_BUCKETS} END) AS e2,
         MAX(CASE WHEN l_linenumber = 1 THEN l_shipdate END) AS d1,
         MAX(CASE WHEN l_linenumber = 2 THEN l_shipdate END) AS d2
  FROM lineitem WHERE l_linenumber <= 2
  GROUP BY l_orderkey
),
games AS (
  SELECT CASE WHEN d1 < d2 OR (d1 = d2 AND e1 < e2) THEN e1 ELSE e2 END AS winner,
         CASE WHEN d1 < d2 OR (d1 = d2 AND e1 < e2) THEN e2 ELSE e1 END AS loser,
         STRFTIME(LEAST(d1, d2), '%Y-%m') AS game_month
  FROM two WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e1 <> e2
)
"""


def _bt_games(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(winner, loser, game_month) comparison frame — the Spark twin of
    ``_BT_GAMES_CTES``; comparisons collapse at the FIRST shuffle
    (groupBy order key, ≤ 2 rows in)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    b = (F.col("l_suppkey") % _BT_BUCKETS)
    two = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_linenumber") == 1, b)).alias("e1"),
        F.max(F.when(F.col("l_linenumber") == 2, b)).alias("e2"),
        F.max(F.when(F.col("l_linenumber") == 1, F.col("l_shipdate"))).alias("d1"),
        F.max(F.when(F.col("l_linenumber") == 2, F.col("l_shipdate"))).alias("d2"),
    ).where(F.col("e1").isNotNull() & F.col("e2").isNotNull()
            & (F.col("e1") != F.col("e2")))
    first_wins = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("e1") < F.col("e2"))
    )
    return two.select(
        F.when(first_wins, F.col("e1")).otherwise(F.col("e2")).alias("winner"),
        F.when(first_wins, F.col("e2")).otherwise(F.col("e1")).alias("loser"),
        F.date_format(F.least("d1", "d2"), "yyyy-MM").alias("game_month"),
    )


@register(
    "bradley_terry_rating",
    oracle=f"""
WITH {_BT_GAMES_CTES.strip()},
pairs AS (
  SELECT winner AS i, loser AS j, COUNT(*) AS n FROM games GROUP BY 1, 2
),
sym AS (
  SELECT i, j, SUM(n) AS n_ij FROM (
    SELECT i, j, n FROM pairs
    UNION ALL
    SELECT j AS i, i AS j, n FROM pairs
  ) GROUP BY i, j
),
ent AS (
  SELECT i AS entity,
         SUM(n_ij) AS n_games,
         COALESCE((SELECT SUM(n) FROM pairs p WHERE p.i = sym.i), 0) AS wins
  FROM sym GROUP BY i
),
s1 AS (
  SELECT entity, n_games, wins,
         CAST(2 * wins + 1 AS DOUBLE) / CAST(n_games + 1 AS DOUBLE) AS s
  FROM ent
),
terms AS (
  SELECT a.entity,
         LIST_REDUCE(
           CAST(LIST(CAST(sym.n_ij AS DOUBLE) / (a.s + b.s) ORDER BY b.entity)
                AS DOUBLE[]),
           (x, y) -> x + y) AS pair_sum
  FROM s1 a
  JOIN sym ON sym.i = a.entity
  JOIN s1 b ON b.entity = sym.j
  GROUP BY a.entity
)
SELECT s1.entity, CAST(s1.n_games AS BIGINT) AS n_games,
       CAST(s1.wins AS BIGINT) AS wins,
       ROUND(s1.s, 6) AS rating_1,
       ROUND((s1.wins + 0.5) / (terms.pair_sum + 1.0 / (s1.s + 1.0)), 6)
         AS rating_2
FROM s1 JOIN terms USING (entity)
""",
    doc=(
        "[beyond-ref] Bradley-Terry preference ratings (Hunter 2004 MM, "
        "2 unrolled regularized iterations) over deterministic pairwise "
        "comparisons — the preference-model fit under RLHF reward-data "
        "pipelines (SURVEY §2.10 eval tier)"
    ),
)
def bradley_terry_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    games = _bt_games(spark, sf_dir)
    pairs = games.groupBy(
        F.col("winner").alias("i"), F.col("loser").alias("j")
    ).agg(F.count("*").alias("n"))
    sym = (
        pairs.select("i", "j", "n")
        .unionAll(pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "n"))
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n_ij"))
    )
    wins = pairs.groupBy("i").agg(F.sum("n").alias("wins"))
    ent = (
        sym.groupBy("i")
        .agg(F.sum("n_ij").alias("n_games"))
        .join(wins, "i", "left")
        .withColumn("wins", F.coalesce(F.col("wins"), F.lit(0)))
    )
    s1 = ent.withColumn(
        "s",
        (2 * F.col("wins") + 1).cast("double") / (F.col("n_games") + 1).cast("double"),
    )
    a = s1.select(F.col("i").alias("entity"), F.col("s").alias("sa"))
    bb = s1.select(F.col("i").alias("j"), F.col("s").alias("sb"))
    terms = (
        sym.join(a, sym.i == a.entity)
        .join(bb, "j")
        .groupBy("entity")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("j"),
                            (F.col("n_ij").cast("double")
                             / (F.col("sa") + F.col("sb"))).alias("t"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, e: acc + e["t"],
            ).alias("pair_sum")
        )
    )
    return (
        s1.select(F.col("i").alias("entity"), "n_games", "wins", "s")
        .join(terms, "entity")
        .select(
            "entity",
            F.col("n_games").cast("long").alias("n_games"),
            F.col("wins").cast("long").alias("wins"),
            F.round(F.col("s"), 6).alias("rating_1"),
            F.round(
                (F.col("wins") + 0.5)
                / (F.col("pair_sum") + 1.0 / (F.col("s") + 1.0)),
                6,
            ).alias("rating_2"),
        )
    )


# ---------------------------------------------------------------------------
# Win-rate trajectory [beyond-ref] (VERDICT r11 #8) — the temporal axis
# of the preference-eval tier: per entity, the month-by-month cumulative
# win record over the SAME deterministic comparisons Bradley-Terry fits
# on, plus the Laplace-smoothed running rating (wins+1)/(games+2) — the
# simple posterior-mean strength estimate a reward-data dashboard
# tracks between full BT refits.
#
# Cross-engine exactness: per-month wins/games are exact int64; the
# cumulatives are int64 window sums over the entity-bounded month frame;
# the two ratios are single integer-operand double divisions before the
# 6-dp round — no float folds at all.
#
# Scale shape: comparisons collapse at the FIRST shuffle (the shared
# _bt_games order-key groupBy), then again to the |entities| × |months|
# frame (16 × ~85 rows here) at the second; the trajectory window
# partitions by entity over that BOUNDED frame — never over raw
# comparisons. At 100 TB the pattern holds: trajectory state is
# entities × time-buckets, not comparison-bounded.
# ---------------------------------------------------------------------------


@register(
    "winrate_trajectory",
    oracle=f"""
WITH {_BT_GAMES_CTES.strip()},
per AS (
  SELECT entity, game_month,
         CAST(COUNT(*) AS BIGINT) AS n_games,
         CAST(SUM(win) AS BIGINT) AS n_wins
  FROM (
    SELECT winner AS entity, game_month, 1 AS win FROM games
    UNION ALL
    SELECT loser AS entity, game_month, 0 AS win FROM games
  ) GROUP BY entity, game_month
)
SELECT entity, game_month, n_games, n_wins,
       CAST(SUM(n_games) OVER w AS BIGINT) AS cum_games,
       CAST(SUM(n_wins) OVER w AS BIGINT) AS cum_wins,
       ROUND(CAST(SUM(n_wins) OVER w AS DOUBLE)
             / CAST(SUM(n_games) OVER w AS DOUBLE), 6) AS winrate_cum,
       ROUND(CAST(SUM(n_wins) OVER w + 1 AS DOUBLE)
             / CAST(SUM(n_games) OVER w + 2 AS DOUBLE), 6) AS rating_smoothed
FROM per
WINDOW w AS (PARTITION BY entity ORDER BY game_month)
""",
    doc=(
        "[beyond-ref] win-rate-over-time trajectory per entity over the "
        "Bradley-Terry comparison stream: monthly win record, cumulative "
        "win rate, Laplace-smoothed running rating — the preference-eval "
        "tier's temporal axis (SURVEY §2.10 eval tier)"
    ),
)
def winrate_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    games = _bt_games(spark, sf_dir)
    per = (
        games.select(
            F.col("winner").alias("entity"), "game_month", F.lit(1).alias("win")
        )
        .unionAll(
            games.select(
                F.col("loser").alias("entity"), "game_month", F.lit(0).alias("win")
            )
        )
        .groupBy("entity", "game_month")
        .agg(
            F.count("*").cast("long").alias("n_games"),
            F.sum("win").cast("long").alias("n_wins"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("entity").orderBy("game_month")
    cg = F.sum("n_games").over(w).cast("long")
    cw = F.sum("n_wins").over(w).cast("long")
    return per.select(
        "entity",
        "game_month",
        "n_games",
        "n_wins",
        cg.alias("cum_games"),
        cw.alias("cum_wins"),
        F.round(cw.cast("double") / cg.cast("double"), 6).alias("winrate_cum"),
        F.round(
            (cw + 1).cast("double") / (cg + 2).cast("double"), 6
        ).alias("rating_smoothed"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa [beyond-ref] — inter-rater agreement, the labeler-QA
# metric of an RLHF annotation pipeline (two annotators rate the same
# items; kappa corrects raw agreement for chance). Raters derive
# deterministically from orders: rater A flags o_orderstatus = 'F',
# rater B flags o_orderpriority in ('1-URGENT', '2-HIGH').
#
# Exactness: the whole statistic reduces to ONE double division of
# int64 operands — with marginal products as exact integer numerators,
#   kappa = (n·(n00+n11) − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0))
# (n² fits int64 to n ≈ 3·10⁹ rated items; promote to DECIMAL past
# that, the house note). po/pe are emitted as their own single
# divisions for the dashboard columns.
#
# Scale shape: ONE map-side-combined aggregate collapses the corpus to
# four confusion cells; everything after is constant-size arithmetic.
# ---------------------------------------------------------------------------


@register(
    "cohens_kappa_raters",
    oracle="""
WITH r AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS b
  FROM orders
),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM r
)
SELECT n, n00, n01, n10, n11,
       ROUND(CAST(n00 + n11 AS DOUBLE) / n, 6) AS po,
       ROUND(CAST((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10) AS DOUBLE)
             / (n * n), 6) AS pe,
       ROUND(CAST(n * (n00 + n11) - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) AS DOUBLE)
             / CAST(n * n - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) AS DOUBLE), 6) AS kappa
FROM c
""",
    doc=(
        "[beyond-ref] Cohen's kappa inter-rater agreement between two "
        "deterministic raters over orders — chance-corrected agreement "
        "as one exact-int64 numerator/denominator pair and a single "
        "double division (SURVEY §2.10 eval tier)"
    ),
)
def cohens_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    b = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    c = orders.select(a.alias("a"), b.alias("b")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    a1 = F.col("n11") + F.col("n10")
    b1 = F.col("n11") + F.col("n01")
    a0 = F.col("n00") + F.col("n01")
    b0 = F.col("n00") + F.col("n10")
    pe_num = a1 * b1 + a0 * b0
    n = F.col("n")
    return c.select(
        "n",
        "n00",
        "n01",
        "n10",
        "n11",
        F.round((F.col("n00") + F.col("n11")).cast("double") / n, 6).alias("po"),
        F.round(pe_num.cast("double") / (n * n), 6).alias("pe"),
        F.round(
            (n * (F.col("n00") + F.col("n11")) - pe_num).cast("double")
            / (n * n - pe_num).cast("double"),
            6,
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Fleiss' kappa [beyond-ref] (VERDICT r12 #6) — inter-rater agreement
# for MORE than two raters (Fleiss 1971), the >2-annotator extension of
# Cohen's kappa above: an RLHF labeling pool where every item is rated
# by the same n raters. Three deterministic binary raters derive from
# orders: A flags o_orderstatus = 'F', B flags priority in
# ('1-URGENT','2-HIGH'), C flags o_totalprice > 150000.
#
# With n = 3 raters and 2 categories, per item r1 = votes for 1 and
# r0 = 3 − r1; the textbook quantities reduce to exact-int64 algebra:
#
#   P̄  = (S − 3N) / (6N)            S  = Σ_i (r0² + r1²)
#   P̄e = (T0² + T1²) / (9N²)        T1 = Σ_i r1, T0 = 3N − T1
#   κ  = (P̄ − P̄e)/(1 − P̄e) = (3N(S − 3N) − 2(T0²+T1²))
#                              / (18N² − 2(T0²+T1²))
#
# — every operand an exact int64 (18N² fits to N ≈ 7·10⁸ rated items;
# promote to DECIMAL past that, the house note), each emitted ratio ONE
# correctly-rounded double division, so both engines agree bit-for-bit
# before the 6-dp round.
#
# Scale shape: ONE map-side-combined aggregate collapses the corpus to
# (N, T1, S); everything after is constant-size arithmetic — the same
# shape as Cohen's kappa, independent of rater count.
# ---------------------------------------------------------------------------


@register(
    "fleiss_kappa_raters",
    oracle="""
WITH r AS (
  SELECT (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
        + CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END
        + CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS r1
  FROM orders
),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r1) AS BIGINT) AS t1,
         CAST(SUM((3 - r1) * (3 - r1) + r1 * r1) AS BIGINT) AS s
  FROM r
)
SELECT n, CAST(3 AS BIGINT) AS n_raters, 3 * n - t1 AS t0, t1, s,
       ROUND(CAST(s - 3 * n AS DOUBLE) / (6 * n), 6) AS p_bar,
       ROUND(CAST((3 * n - t1) * (3 * n - t1) + t1 * t1 AS DOUBLE)
             / (9 * n * n), 6) AS p_e,
       ROUND(CAST(3 * n * (s - 3 * n)
                  - 2 * ((3 * n - t1) * (3 * n - t1) + t1 * t1) AS DOUBLE)
             / CAST(18 * n * n
                  - 2 * ((3 * n - t1) * (3 * n - t1) + t1 * t1) AS DOUBLE),
             6) AS kappa
FROM c
""",
    doc=(
        "[beyond-ref] Fleiss' kappa inter-rater agreement for three "
        "deterministic raters over orders (Fleiss 1971) — the "
        ">2-annotator chance-corrected agreement, reduced to exact-"
        "int64 (N, T1, S) by one aggregate and emitted as single "
        "double divisions (SURVEY §2.10 eval tier)"
    ),
)
def fleiss_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    r1 = (
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        + F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0)
        + F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)
    )
    c = orders.select(r1.alias("r1")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r1").cast("long").alias("t1"),
        F.sum((3 - F.col("r1")) * (3 - F.col("r1")) + F.col("r1") * F.col("r1"))
        .cast("long")
        .alias("s"),
    )
    n, t1, s = F.col("n"), F.col("t1"), F.col("s")
    t0 = 3 * n - t1
    q = t0 * t0 + t1 * t1
    return c.select(
        "n",
        F.lit(3).cast("long").alias("n_raters"),
        t0.alias("t0"),
        "t1",
        "s",
        F.round((s - 3 * n).cast("double") / (6 * n), 6).alias("p_bar"),
        F.round(q.cast("double") / (9 * n * n), 6).alias("p_e"),
        F.round(
            (3 * n * (s - 3 * n) - 2 * q).cast("double")
            / (18 * n * n - 2 * q).cast("double"),
            6,
        ).alias("kappa"),
    )
