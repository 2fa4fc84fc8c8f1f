"""Classifier-evaluation operators: confusion matrix + per-class
precision/recall/F1 derived from it (one corpus shuffle)."""

from __future__ import annotations

import pytest

from corrie_spark.operators import evaluation as EV


@pytest.fixture(scope="module")
def preds(spark):
    # labels:  a a a a b b c    (c never predicted; d never labeled)
    # preds:   a a b d b b d
    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"), ("a", "d"),
        ("b", "b"), ("b", "b"), ("c", "d"),
    ]
    return spark.createDataFrame(rows, "y string, yhat string")


def test_confusion_matrix_counts(preds):
    cm = {
        (r.label, r.pred): r.n_docs
        for r in EV.confusion_matrix(preds, "y", "yhat").collect()
    }
    assert cm == {
        ("a", "a"): 2, ("a", "b"): 1, ("a", "d"): 1,
        ("b", "b"): 2, ("c", "d"): 1,
    }


def test_classification_report_values(preds):
    rep = {r.clazz: r for r in EV.classification_report(preds, "y", "yhat").collect()}
    assert set(rep) == {"a", "b", "c", "d"}  # union of labeled + predicted
    a = rep["a"]
    assert (a.n_labeled, a.n_pred, a.tp) == (4, 2, 2)
    assert a.precision == 1.0 and a.recall == 0.5 and a.f1 == 2 * 2 / (2 + 4)
    b = rep["b"]
    assert (b.n_labeled, b.n_pred, b.tp) == (2, 3, 2)
    assert b.precision == 2 / 3 and b.recall == 1.0
    # f1 = 2tp/(n_pred+n_labeled) — single division, equals 2PR/(P+R)
    assert b.f1 == 2 * 2 / (3 + 2)
    p, r = b.precision, b.recall
    assert abs(b.f1 - 2 * p * r / (p + r)) < 1e-15
    # degenerate classes: never-predicted -> NULL precision (not 0);
    # never-labeled -> NULL recall
    c, d = rep["c"], rep["d"]
    assert c.n_pred == 0 and c.precision is None and c.recall == 0.0
    assert d.n_labeled == 0 and d.recall is None and d.precision == 0.0
    assert c.f1 == 0.0 and d.f1 == 0.0


def test_report_single_shuffle_shape(preds):
    """The corpus appears ONCE in the plan (the confusion-matrix
    groupBy); totals/tp derive from the matrix, not rescans."""
    plan = EV.classification_report(preds, "y", "yhat")._jdf.queryExecution().optimizedPlan().toString()
    # one LocalRelation scan per derivation would show 3+ scans of the
    # input; the matrix reuse keeps corpus-side lineage singular. The
    # local-relation test proxy: no more than the 3 matrix-derived
    # branches reference it after optimization.
    assert plan.count("LocalRelation") <= 3
