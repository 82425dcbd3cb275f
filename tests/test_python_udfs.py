"""Equivalence proofs for the Python escape hatches: the Arrow scalar
pandas_udf and the Spark-4 Python UDTF must agree with pure-JVM
formulations, so using Python stays a measured choice."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_byte_entropy_pandas_udf_matches_jvm(spark):
    from soccer_data_pipeline_spark.functions.python_udfs import byte_entropy_pdf
    from soccer_data_pipeline_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    got = docs.select("doc_id", F.round(byte_entropy_pdf("text"), 6).alias("e"))

    # JVM twin: ASCII corpus ⇒ byte entropy == char entropy; reuse the
    # narrow sorted-fold (nats) and convert to bits
    chars = F.array_sort(F.filter(F.split("text", ""), lambda x: x != ""))
    term = lambda run: F.when(  # noqa: E731
        run > 0, run.cast("double") * F.log(run.cast("double"))
    ).otherwise(F.lit(0.0))
    folded = F.aggregate(
        chars,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("s"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(x == acc["prev"], acc["s"]).otherwise(acc["s"] + term(acc["run"])).alias("s"),
        ),
        lambda acc: acc["s"] + term(acc["run"]),
    )
    n = F.size(chars).cast("double")
    jvm = docs.select(
        "doc_id",
        F.round((F.log(n) - folded / n) / F.log(F.lit(2.0)), 6).alias("e"),
    )
    diff = (
        got.alias("g")
        .join(jvm.alias("j"), "doc_id")
        .where(F.abs(F.col("g.e") - F.col("j.e")) > 1e-6)
        .count()
    )
    assert diff == 0


def test_sentence_splitter_udtf_dataframe_and_sql(spark):
    from soccer_data_pipeline_spark.functions.python_udfs import SentenceSplitter

    text = "First one. Second here! Third?  Fourth trails"
    # DataFrame-side invocation
    rows = SentenceSplitter(F.lit(text)).collect()
    got = [(r.sent_idx, r.sentence, r.n_tokens) for r in rows]
    assert got == [
        (0, "First one.", 2),
        (1, "Second here!", 2),
        (2, "Third?", 1),
        (3, "Fourth trails", 2),
    ]

    # LATERAL position from pure SQL
    spark.udtf.register("sentence_splitter", SentenceSplitter)
    n = spark.sql(
        "SELECT s.* FROM (SELECT 'A b. C d.' AS t), "
        "LATERAL sentence_splitter(t) s"
    ).count()
    assert n == 2

    # JVM twin agreement on sentence COUNT over real docs (the UDTF
    # yields exactly the non-empty regex splits)
    from soccer_data_pipeline_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    via_udtf = (
        docs.lateralJoin(SentenceSplitter(F.col("text").outer()))
        .groupBy("doc_id")
        .count()
    )
    jvm = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split("text", r"(?<=[.!?])\s+"),
                lambda x: F.trim(x) != "",
            )
        ).cast("long").alias("count"),
    )
    mism = (
        via_udtf.alias("u")
        .join(jvm.alias("j"), "doc_id")
        .where(F.col("u.count") != F.col("j.count"))
        .count()
    )
    assert mism == 0


def test_byte_entropy_null_survives_as_null(spark):
    """ADVICE r6: None must reach Spark as NULL, not NaN — plain
    float64 pd.Series coerces None→NaN and Spark treats NaN as a
    value, so a null-text doc would silently get a numeric score."""
    from soccer_data_pipeline_spark.functions.python_udfs import byte_entropy_pdf

    df = spark.createDataFrame(
        [(1, "abab"), (2, None), (3, "")], "id long, text string"
    )
    rows = {r.id: r.e for r in df.select("id", byte_entropy_pdf("text").alias("e")).collect()}
    assert rows[2] is None
    assert rows[3] == 0.0
    assert rows[1] == 1.0  # two symbols, uniform → 1 bit/byte


def test_map_in_arrow_matches_jvm_lengths(spark):
    """The raw-RecordBatch surface (mapInArrow + pyarrow.compute) must
    agree exactly with the JVM twin (length / octet_length), including
    null propagation and multi-byte UTF-8."""
    from soccer_data_pipeline_spark.functions.python_udfs import (
        utf8_byte_stats_arrow,
    )
    from soccer_data_pipeline_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(80)
    extra = spark.createDataFrame(
        [(900001, "héllo wörld"), (900002, None), (900003, "")],
        "doc_id long, text string",
    )
    df = docs.select("doc_id", "text").unionByName(extra)
    got = {
        r.doc_id: (r.n_chars, r.n_bytes) for r in utf8_byte_stats_arrow(df).collect()
    }
    ref = {
        r.doc_id: (r.n_chars, r.n_bytes)
        for r in df.select(
            "doc_id",
            F.length("text").cast("int").alias("n_chars"),
            F.octet_length("text").cast("int").alias("n_bytes"),
        ).collect()
    }
    assert got == ref
    assert got[900002] == (None, None)
    assert got[900001][1] > got[900001][0]  # multi-byte chars
