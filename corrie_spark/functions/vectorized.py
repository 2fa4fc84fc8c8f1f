"""Arrow-vectorized pandas UDFs — the sanctioned Python escape hatch.

Rule of thumb enforced across this engine: JVM Column expressions
first (whole-stage codegen, no serialization); when Python is
genuinely required (real codecs, numpy-only math, external libs), an
Arrow-batched pandas UDF — NEVER a row-at-a-time Python UDF (the
10-100x slow path).

This module keeps matched pairs: the JVM expression form and the
pandas form of the same function, so call sites can choose per
context and tests can pin their equivalence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def l2_normalize_expr(vec: Column) -> Column:
    """JVM form: unit-L2-normalize an array<float/double> column.
    Stays inside codegen — preferred in any hot path."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.transform(vec, lambda x: x.cast("double") / norm)


# pandas_udf parses its return-type DDL against the ACTIVE session, so
# the decorators must run lazily (first call), not at module import.
_UDF_CACHE: dict[str, object] = {}


def _l2_udf():
    if "l2" not in _UDF_CACHE:

        @pandas_udf("array<double>")
        def f(batch: pd.Series) -> pd.Series:
            # float32 inputs must widen BEFORE the norm, matching the
            # JVM form's per-element cast to double
            mat = np.vstack(batch.to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            out = mat / np.where(norms == 0.0, 1.0, norms)
            return pd.Series(list(out))

        _UDF_CACHE["l2"] = f
    return _UDF_CACHE["l2"]


def l2_normalize_pandas(vec: Column) -> Column:
    """pandas form of the same function: one numpy matrix op per Arrow
    batch. Use when the surrounding stage is already python-side (e.g.
    feeding a model) — saves a JVM<->Python round trip."""
    return _l2_udf()(vec)


def _cosine_udf():
    if "cos" not in _UDF_CACHE:

        @pandas_udf("double")
        def f(batch: pd.Series, query: pd.Series) -> pd.Series:
            mat = np.vstack(batch.to_numpy()).astype(np.float64)
            q = np.asarray(query.iloc[0], dtype=np.float64)
            qn = np.linalg.norm(q)
            norms = np.linalg.norm(mat, axis=1)
            denom = np.where(norms * qn == 0.0, 1.0, norms * qn)
            return pd.Series(mat @ q / denom)

        _UDF_CACHE["cos"] = f
    return _UDF_CACHE["cos"]


def cosine_to_query_pandas(vec: Column, query: Column) -> Column:
    """Vectorized cosine of each row-vector against a (constant)
    query vector — the pandas-side scoring kernel for model-adjacent
    re-ranking. `query` arrives as a broadcast literal column."""
    return _cosine_udf()(vec, query)
