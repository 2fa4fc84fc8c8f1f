"""SparkSession builder tuned for the corrie_spark engine.

Defaults are sized for local[32] testing but every knob is the one you
would set on a real cluster: AQE on (runtime re-plan + skew-join
handling), shuffle partitions sized to cores (on a 1000-executor
cluster this would be ~2-3x total cores), Arrow enabled for any
pandas-UDF path, UTC session timezone so timestamp semantics are
stable across driver/oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "corrie-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    cpus = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
    )
    for k, v in engine_confs(cpus).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def engine_confs(cpus: int | None = None) -> dict[str, str]:
    """The conf set we would ship in spark-defaults.conf on a cluster."""
    cpus = cpus or default_parallelism()
    return {
        "spark.sql.shuffle.partitions": str(max(cpus, 8)),
        # Spark 4's DataFrame debugging decorates EVERY Column/DataFrame
        # API call with a call-site capture that costs a Python stack
        # walk plus 2 py4j round trips (conf.get + PySparkCurrentOrigin
        # .set) — measured ~40% of total query-BUILD time on the
        # Column-heavy ANN builders (q_sim_ivfpq_refined_recall build:
        # 2.7k py4j commands, ~1.0 s). Serving paths rebuild plans per
        # request, so this is hot-path work, not startup; the feature
        # only enriches error messages with user line numbers. Off in
        # production, exactly like assertions.
        "spark.python.sql.dataFrameDebugging.enabled": "false",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # pushdown/pruning are on by default; pinned here as documentation
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # rollup-table incremental refresh overwrites ONLY the day
        # partitions a late batch touches (operators/rollup.refresh_days)
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        # long sessions compile hundreds of whole-stage-codegen classes
        # (the bench runs the full registry in one JVM); the JIT's
        # default 240 MB reserved code cache fills and flushes, causing
        # sporadic multi-second stalls on late queries — Spark's own
        # tuning guide recommends raising it for codegen-heavy work
        "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
    }
