"""Hypothesis property tests (SURVEY.md §5.3) for the derivation logic
and the skew-safe aggregation, plus salted-agg equivalence."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from soccer_data_pipeline_spark.operators.skew import salted_aggregate

score = st.one_of(st.none(), st.integers(min_value=0, max_value=12))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(score, score),
        min_size=1,
        max_size=30,
    )
)
def test_winner_points_invariants(spark, scores):
    """For any score vector: points conservation + W/D/L partition."""
    from soccer_data_pipeline_spark.schemas import MATCHES_RAW
    import json

    matches = [
        {
            "round": "R1",
            "date": "2020-01-01",
            "team1": "A",
            "team2": "B",
            "score": (
                {"ft": [h, a]} if h is not None and a is not None else {}
            ),
        }
        for h, a in scores
    ]
    doc = {"name": "L", "season": "2020", "matches": matches}
    import tempfile, os

    d = tempfile.mkdtemp()
    sub = os.path.join(d, "2020")
    os.makedirs(sub, exist_ok=True)
    with open(os.path.join(sub, "xx.1.json"), "w") as fh:
        json.dump(doc, fh)

    from soccer_data_pipeline_spark.sources.json_source import (
        read_matches_raw,
        split_quarantine,
    )
    from soccer_data_pipeline_spark.operators import (
        explode_matches,
        normalize_matches,
    )

    valid, _ = split_quarantine(read_matches_raw(spark, d))
    rows = normalize_matches(explode_matches(valid)).collect()
    assert len(rows) == len(scores)
    for r in rows:
        if r.winner is None:
            assert r.points_home is None and r.points_away is None
            assert r.ft_home is None or r.ft_away is None
        else:
            assert r.points_home + r.points_away in (2, 3)
            if r.ft_home > r.ft_away:
                assert (r.winner, r.points_home) == ("home", 3)
            elif r.ft_home < r.ft_away:
                assert (r.winner, r.points_away) == ("away", 3)
            else:
                assert (r.winner, r.points_home, r.points_away) == ("draw", 1, 1)


def test_salted_aggregate_equals_plain(spark):
    """Salted two-phase agg must equal the plain groupBy exactly."""
    import pyspark.sql.functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    from soccer_data_pipeline_spark.functions import cents

    df = li.select("l_returnflag", cents(F.col("l_quantity")).alias("qty_c"))
    plain = {
        (r.l_returnflag): (r.s, r.c, r.mn, r.mx)
        for r in df.groupBy("l_returnflag")
        .agg(
            F.sum("qty_c").alias("s"),
            F.count("qty_c").alias("c"),
            F.min("qty_c").alias("mn"),
            F.max("qty_c").alias("mx"),
        )
        .collect()
    }
    salted = salted_aggregate(
        df,
        ["l_returnflag"],
        {"qty_c": "sum"},
        n_salts=8,
    )
    got = {r.l_returnflag: r.qty_c_sum for r in salted.collect()}
    for k, (s, _, _, _) in plain.items():
        assert got[k] == s
