"""Loaders for the driver-provided testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.

Loading is always `spark.read.parquet` (columnar scan, predicate
pushdown + column pruning free via Catalyst). `register_views` exposes
them as temp views so SQL-form queries read identically to the DuckDB
oracle SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables: always broadcast-join candidates at any scale.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def dataset_fingerprint(sf_dir: str, *names: str) -> str:
    """Short content fingerprint of one or more tables under sf_dir:
    md5 over each parquet file's (relative name, size, mtime_ns),
    walked recursively so directory-style parquet fingerprints too.
    Used to key on-disk caches (staged corpus build, ANN index store)
    so REGENERATING a dataset under the same path invalidates the
    cache instead of silently serving stale trained artifacts
    (round-7 advice). Metadata-only — never reads row data."""
    import hashlib

    h = hashlib.md5()
    for name in sorted(names or TABLE_NAMES):
        path = os.path.join(sf_dir, f"{name}.parquet")
        entries = []
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for f in files:
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    entries.append(
                        (os.path.relpath(p, path), st.st_size, st.st_mtime_ns)
                    )
        elif os.path.exists(path):
            st = os.stat(path)
            entries.append((name, st.st_size, st.st_mtime_ns))
        for e in sorted(entries):
            h.update(repr(e).encode())
    return h.hexdigest()[:12]


# Per-session memo of loaded relations. Every `spark.read.parquet`
# call re-resolves the data source, re-lists the files and re-reads
# the parquet footer for schema inference — 200-600 ms of driver-side
# work per call measured on local[32], repeated on EVERY query build
# because queries re-call load() on each run (the serving path).  The
# testdata tables are static for the life of a session (the same
# assumption every `_memo` index/fixture cache already makes;
# `dataset_fingerprint` guards the on-disk caches), so the resolved
# DataFrame — an immutable logical plan, NOT cached row data — is
# reusable across queries exactly like a catalog table's cached
# relation.  Keyed weakly on the session so stopped sessions drop
# their plans.
from weakref import WeakKeyDictionary

_RELATION_MEMO: "WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    WeakKeyDictionary()
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    per_session = _RELATION_MEMO.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    df = per_session.get(key)
    if df is None:
        df = _load_uncached(spark, sf_dir, name)
        per_session[key] = df
    return df


def _load_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with several physical types for `ts`
        # across testdata generations: TIMESTAMP(NANOS) (which the Spark
        # parquet reader only accepts as long via the legacy conf),
        # TIMESTAMP(MICROS) with isAdjustedToUTC=false (read as
        # TIMESTAMP_NTZ), and plain TIMESTAMP.  Normalize all of them to
        # the engine's session-timestamp type so every downstream query
        # (and the DuckDB oracle, which reads the same parquet) sees one
        # stable ts type regardless of the generator version.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":
            # legacy nanos-as-long: floor-convert with exact integer
            # arithmetic — double division would lose precision at 2^60.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type.startswith("timestamp_ntz"):
            # wall-clock-preserving cast (session tz applied then removed
            # symmetrically on collect, so rendered values are identical).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# spread()'s narrowness probe compiles the frame's non-AQE physical
# plan (df.rdd), which is driver-side build cost on every call — the
# decision is a pure function of the (session, analyzed plan), so it
# is memoized on the plan's semantic hash (round-15, per round-14
# advice). Entries from stopped sessions are evicted on first touch.
_SPREAD_MEMO: dict[tuple[str, int], bool] = {}


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's core count IFF the
    frame is narrower (guide §2.5 input skew: a tiny corpus reads as
    one parquet split, so everything upstream of the first exchange —
    signature hashing, decodes, renders, band explodes — would run on
    one core). A no-op whenever the input is already at least
    core-parallel, i.e. on any real-scale table, so nothing heavy is
    ever re-shuffled at 100 TB. Row content unchanged (round-robin is
    deterministic under Spark's sort-before-repartition).

    The probe reads the PRE-AQE partition count: for raw scans and
    broadcast-join outputs (every caller here) that is the real
    runtime layout; a post-shuffle input would read
    spark.sql.shuffle.partitions — a scale-tuned conf that is >= the
    core count on any sane deployment, making spread a no-op there,
    which is exactly the intent."""
    app = df.sparkSession.sparkContext.applicationId
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        key = (app, int(df._jdf.queryExecution().analyzed().semanticHash()))
    except Exception:
        key = None
    narrow = _SPREAD_MEMO.get(key) if key is not None else None
    if narrow is None:
        for stale in [k for k in _SPREAD_MEMO if k[0] != app]:
            del _SPREAD_MEMO[stale]
        narrow = df.rdd.getNumPartitions() < par
        if key is not None:
            _SPREAD_MEMO[key] = narrow
    return df.repartition(par) if narrow else df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view named after the table."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
