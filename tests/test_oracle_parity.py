"""Mimics the driver's correctness gate: run every registered query
through Spark AND its DuckDB oracle at sf0.01, compare row count,
column names, and order-insensitive values.

Comparison is strict (exact equality after normalization) — the
engine's determinism contract says results must match bit-for-bit.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pytest

from corrie_spark.queries.registry import all_oracles, all_queries
from corrie_spark.tables import TABLE_NAMES
from tests.conftest import SF_CORRECT


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_parity(spark, name):
    q = all_queries()[name]
    sdf = q(spark, SF_CORRECT)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = _rows([tuple(r) for r in sdf.collect()])

    con = _duck(SF_CORRECT)
    res = con.sql(_ORACLES[name])
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = _rows(res.fetchall())
    con.close()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
