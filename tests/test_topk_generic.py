"""grouped_topk as a generic operator: window-equivalent results on
arbitrary (key, order, id) frames, bounded-shuffle plan."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from corrie_spark.operators.similarity import grouped_topk


def _frame(spark):
    rows = [
        (g, i, (i * 7919 + g * 104729) % 1000)
        for g in range(6)
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "grp long, item long, score long")


def test_matches_window_formulation_exactly(spark):
    df = _frame(spark).repartition(5)
    got = grouped_topk(df, 3, key_col="grp", order_col="score", id_col="item")
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("item"))
    want = (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("grp", "item", "rnk", "score")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_generic_names_and_single_shuffle(spark):
    from corrie_spark.plans import count_shuffles
    from corrie_spark.plans.inspect import explain_str

    df = _frame(spark)
    out = grouped_topk(df, 2, key_col="grp", order_col="score", id_col="item")
    assert out.columns == ["grp", "item", "rnk", "score"]
    s = explain_str(out)
    assert "Window" not in s
    assert count_shuffles(out) <= 2  # source repartition-free: 1 grouped merge
