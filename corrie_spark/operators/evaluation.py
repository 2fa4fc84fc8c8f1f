"""Classifier evaluation: confusion matrix + per-class
precision/recall/F1 over (label, prediction) column pairs.

A training-data pipeline ships several in-engine classifiers —
language ID, the distilled quality classifier, gate rules — and needs
their quality measured at corpus scale before trusting them to route
100 TB. The evaluation reduces to ONE corpus-sized shuffle: the
confusion matrix groupBy on (label, pred). Everything downstream
(per-class totals, true positives, the report joins) operates on the
#classes x #classes matrix — metadata-sized frames that Spark
broadcasts, so adding the report costs nothing over the matrix.

Exactness contract (the repo-wide cross-engine discipline): counts
are exact BIGINTs; each ratio is ONE IEEE double division of two
exact ints. F1 is computed as 2*tp / (n_pred + n_labeled) — the
algebraic reduction of 2PR/(P+R) — so it too is a single division of
exact ints, never a nested-rounding composition of the already-
divided precision/recall doubles. Classes with no predictions (or no
labels) carry NULL precision (or recall) rather than a fake 0.

Reference scope: the reference engine (kak-tus/corrie) has no
evaluation surface; this is part of the beyond-parity LLM-pipeline
layer the build brief asks for (text-analysis ops family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """(label, pred, n_docs) — the one corpus-sized shuffle of the
    evaluation family; every report statistic derives from this
    #classes^2-bounded frame."""
    return (
        df.groupBy(
            F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class (n_labeled, n_pred, tp, precision, recall, f1),
    classes = union of labeled and predicted — derived entirely from
    the confusion matrix so the corpus is scanned and shuffled ONCE;
    the three derivations and the report join touch only
    #classes-sized frames."""
    # Materialize the matrix before fanning out: three consumers
    # (label totals, prediction totals, diagonal) would otherwise each
    # re-scan + re-shuffle the corpus — column pruning makes the three
    # cm plans textually different, so AQE exchange reuse never fires
    # (measured: 3 parquet scans, 0 ReusedExchange). The matrix is
    # #classes^2-bounded, so the checkpoint is metadata-sized at any
    # corpus scale.
    cm = confusion_matrix(df, label_col, pred_col).localCheckpoint(eager=True)
    lab = cm.groupBy(F.col("label").alias("clazz")).agg(
        F.sum("n_docs").cast("bigint").alias("n_labeled")
    )
    prd = cm.groupBy(F.col("pred").alias("clazz")).agg(
        F.sum("n_docs").cast("bigint").alias("n_pred")
    )
    tp = cm.filter(F.col("label") == F.col("pred")).select(
        F.col("label").alias("clazz"), F.col("n_docs").alias("tp")
    )
    rep = (
        lab.join(prd, "clazz", "full_outer")
        .join(tp, "clazz", "left")
        .fillna(0, subset=["n_labeled", "n_pred", "tp"])
    )
    return rep.select(
        "clazz",
        "n_labeled",
        "n_pred",
        F.col("tp").cast("bigint").alias("tp"),
        F.when(
            F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
        ).alias("precision"),
        F.when(
            F.col("n_labeled") > 0, F.col("tp") / F.col("n_labeled")
        ).alias("recall"),
        F.when(
            F.col("n_pred") + F.col("n_labeled") > 0,
            (2 * F.col("tp")) / (F.col("n_pred") + F.col("n_labeled")),
        ).alias("f1"),
    )
