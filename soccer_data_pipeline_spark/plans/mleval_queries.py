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
