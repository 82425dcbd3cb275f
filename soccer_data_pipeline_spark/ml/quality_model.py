"""[beyond-ref] Corpus-quality classifier: distill the expensive
gate chain into a cheap first-pass filter.

``corpus_clean_decisions`` (operators/corpus.py) decides keep/drop by
running the FULL pipeline — quality ratios, exact dedup, MinHash+LSH
near-dup clustering. At 100 TB you cannot afford that chain on every
crawl snapshot; the production pattern (fastText-style quality
classifiers à la CCNet/RedPajama) is to train a cheap model on the
expensive decisions once, then gate new data with the model and run
the full chain only near the decision boundary.

This module is that distillation on MLlib:

- features are the ENGINE's own narrow per-doc signals (length,
  punctuation/digit/space ratios, mean word length, repetition —
  all JVM expressions, no Python in the feature path);
- labels come from ``corpus.clean_decisions`` (the audited gate);
- the split is the same deterministic md5-bucket assignment as
  ``train_val_test_split`` — reproducible membership, no random();
- evaluation is AUC on the held-out bucket plus the confusion at the
  0.5 operating point.

Scale note: feature extraction and labeling stay distributed; the
LogisticRegression fit sees one row per document with 7 doubles —
MLlib's distributed LBFGS handles corpus-sized inputs, and the model
itself is 8 floats to broadcast at inference.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUALITY_FEATURES = [
    "n_chars",
    "punct_ratio",
    "digit_ratio",
    "space_ratio",
    "mean_word_len",
    "upper_ratio",
    "max_char_run",
]


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc cheap signals, all JVM-side (one narrow projection)."""
    n = F.length("text").cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    count_class = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all("text", F.lit(pat), 0)
    ).cast("double")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    # longest single-character run via the sorted-array fold trick
    # (same shape as char_entropy_quality's run-length fold)
    chars = F.array_sort(F.filter(F.split("text", ""), lambda x: x != ""))
    run_fold = F.aggregate(
        chars,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return docs.select(
        "doc_id",
        n.alias("n_chars"),
        (count_class(r"[\.,;:!\?]") / safe_n).alias("punct_ratio"),
        (count_class(r"[0-9]") / safe_n).alias("digit_ratio"),
        (count_class(r" ") / safe_n).alias("space_ratio"),
        F.coalesce(
            F.aggregate(
                words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
            )
            / F.greatest(F.size(words).cast("double"), F.lit(1.0)),
            F.lit(0.0),
        ).alias("mean_word_len"),
        (count_class(r"[A-Z]") / safe_n).alias("upper_ratio"),
        run_fold.cast("double").alias("max_char_run"),
    )


def split_bucket(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 80/20 membership via the house md5-bucket split."""
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
                    ).cast("long") % 10
    return df.withColumn(
        "is_holdout", (bucket >= 8).cast("boolean")
    )


def train_quality_classifier(docs: DataFrame, labels: DataFrame):
    """Fit the distilled gate. ``labels`` must carry (doc_id, keep) —
    normally ``corpus.clean_decisions`` output. Returns
    (model, assembler, train_df, holdout_df)."""
    feats = quality_features(docs)
    data = split_bucket(
        feats.join(labels.select("doc_id", F.col("keep").cast("double").alias("label")),
                   "doc_id")
    )
    asm = VectorAssembler(inputCols=QUALITY_FEATURES, outputCol="features")
    train = asm.transform(data.where(~F.col("is_holdout")))
    holdout = asm.transform(data.where(F.col("is_holdout")))
    lr = LogisticRegression(maxIter=60, regParam=0.01, standardization=True)
    model = lr.fit(train)
    return model, asm, train, holdout


def evaluate_quality_classifier(model, holdout: DataFrame) -> dict:
    """AUC on the held-out bucket + confusion at the 0.5 point.

    The AUC computation is MLlib's (distributed ranking); the
    confusion is one hash agg — nothing corpus-sized reaches the
    driver."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    scored = model.transform(holdout)
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction", labelCol="label", metricName="areaUnderROC"
    ).evaluate(scored)
    cm = (
        scored.groupBy("label", "prediction").count().collect()
    )  # 4 rows max — bounded
    conf = {(int(r.label), int(r.prediction)): r["count"] for r in cm}
    n = sum(conf.values())
    acc = (conf.get((0, 0), 0) + conf.get((1, 1), 0)) / max(n, 1)
    return {"auc": auc, "accuracy": acc, "n_holdout": n, "confusion": conf}
