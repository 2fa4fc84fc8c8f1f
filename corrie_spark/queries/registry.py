"""Query registry: every implemented operator exposes
  - a Spark callable  (spark, sf_dir) -> DataFrame
  - optionally an equivalent ANSI-SQL oracle string (DuckDB-runnable)

`__spark_entry__.py` re-exports this registry to the driver; the
driver compares Spark vs DuckDB per query (row count + schema +
order-insensitive value hash). Column names are part of the contract:
alias every computed column identically in both forms.

Oracle determinism rules used throughout the query modules:
  - sums of doubles go through DECIMAL(18,6) (exact, order-independent)
    and are cast back to DOUBLE so schemas match;
  - averages are expressed as CAST(sum_dec AS DOUBLE)/COUNT so both
    engines do the same double division;
  - hash-derived ints use md5 (identical in both engines) with the
    first 15 hex digits parsed as a 60-bit int.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""
    # one-line justification for every Python/Arrow stage this query's
    # executed plan legitimately contains (None = plan must be pure
    # JVM). THE single source of truth: tests/test_plan_audit_sweep.py
    # derives its allowlist from this field and tools/plan_audit.py
    # prints it — a new query cannot carry an undocumented Python
    # stage without failing the sweep.
    python_stages: str | None = None


_REGISTRY: dict[str, Query] = {}


def _widen_ints(df: DataFrame) -> DataFrame:
    """Cast byte/short/int output columns to bigint.

    The driver hashes Arrow-level values; DuckDB promotes freely between
    integer widths (SUM -> HUGEINT, COUNT -> BIGINT, literals -> INT32),
    so the only width-stable contract is: every integer column a query
    returns is int64 on both engines.  Applied uniformly at the registry
    boundary so individual queries never have to remember it.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    narrow = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType))
    ]
    if not narrow:
        return df
    return df.withColumns({c: F.col(c).cast("long") for c in narrow})


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    python_stages: str | None = None,
):
    """Decorator: register a Spark query fn under `name`.
    `python_stages` documents (and thereby allows) any Python/Arrow
    stage in the query's executed plan — see Query.python_stages."""

    def deco(fn: SparkQuery) -> SparkQuery:
        def widened(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _widen_ints(fn(spark, sf_dir))

        widened.__name__ = fn.__name__
        widened.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(
            name=name,
            spark=widened,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            python_stages=python_stages,
        )
        return fn

    return deco


def get(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]


def all_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {name: q.spark for name, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}


def all_python_stage_notes() -> dict[str, str]:
    """name -> declared Python-stage justification, for every query
    that registered one (the plan-sweep allowlist, derived)."""
    _ensure_loaded()
    return {
        name: q.python_stages
        for name, q in _REGISTRY.items()
        if q.python_stages is not None
    }


_loaded = False


def _ensure_loaded() -> None:
    """Import all query modules so their @register decorators run."""
    global _loaded
    if _loaded:
        return
    # imports deferred to avoid circular import at package import time
    import corrie_spark.queries.analytics  # noqa: F401
    import corrie_spark.queries.analytics_ext  # noqa: F401
    import corrie_spark.queries.envelope_queries  # noqa: F401
    import corrie_spark.queries.dedup_queries  # noqa: F401
    import corrie_spark.queries.text_queries  # noqa: F401
    import corrie_spark.queries.similarity_queries  # noqa: F401
    import corrie_spark.queries.joins  # noqa: F401
    import corrie_spark.queries.window_queries  # noqa: F401
    import corrie_spark.queries.multimodal_queries  # noqa: F401
    import corrie_spark.queries.passage_queries  # noqa: F401
    import corrie_spark.queries.corpus_queries  # noqa: F401
    import corrie_spark.queries.sketch_queries  # noqa: F401
    import corrie_spark.queries.composed_queries  # noqa: F401
    import corrie_spark.queries.warc_queries  # noqa: F401
    import corrie_spark.queries.web_queries  # noqa: F401
    import corrie_spark.queries.pdf_queries  # noqa: F401
    import corrie_spark.queries.office_queries  # noqa: F401
    import corrie_spark.queries.tar_queries  # noqa: F401
    import corrie_spark.queries.avro_queries  # noqa: F401
    import corrie_spark.queries.wiki_queries  # noqa: F401
    import corrie_spark.queries.errors_queries  # noqa: F401

    _loaded = True
