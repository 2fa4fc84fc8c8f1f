"""ClickHouse/JDBC sink configuration (SURVEY §2.4 K1/K5/K12).

The reference speaks the ClickHouse native TCP protocol directly
(vendored kshvakov/clickhouse); Spark's idiomatic equivalent is the
JDBC writer with the ClickHouse driver. The pieces of the reference
that survive as *configuration* here:

  K1  INSERT building        -> `dbtable` (the connector builds SQL)
  K5  block auto-flush       -> `batchsize` (driver default was
                                1,000,000 rows, bootstrap.go:80)
  K12 alt_hosts load balance -> comma-separated host list in the URL
                                (native to the CH JDBC driver,
                                bootstrap.go:109-121)

No server in the test environment: `jdbc_writer` is exercised by unit
tests on its option dict, and JdbcSink satisfies the Sink protocol for
deployments that have the driver jar on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def clickhouse_jdbc_url(
    hosts: list[str] | str,
    database: str = "default",
    write_timeout_s: int = 60,  # etc/corrie.yml:16 write_timeout=60
) -> str:
    if isinstance(hosts, str):
        hosts = [hosts]
    # first host + alt_hosts semantics: the JDBC driver accepts a
    # comma-separated failover list directly
    host_part = ",".join(hosts)
    return f"jdbc:clickhouse://{host_part}/{database}?socket_timeout={write_timeout_s * 1000}"


def jdbc_writer_options(
    url: str,
    table: str,
    batch_size: int = 100_000,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Options for df.write.format('jdbc'). batchsize is the K5 flush
    cap; isolation NONE because ClickHouse INSERTs are append-only
    (the reference's 'transaction' is a framing detail, not ACID —
    clickhouse.go:89-150)."""
    opts = {
        "url": url,
        "dbtable": table,
        "driver": "com.clickhouse.jdbc.ClickHouseDriver",
        "batchsize": str(batch_size),
        "isolationLevel": "NONE",
    }
    if num_partitions is not None:
        opts["numPartitions"] = str(num_partitions)
    return opts


class JdbcSink:
    """Sink-protocol adapter over the JDBC writer (deploy-time; needs
    the ClickHouse JDBC jar on the Spark classpath)."""

    def __init__(self, url: str, batch_size: int = 100_000):
        self.url = url
        self.batch_size = batch_size

    def write(self, table: str, df: DataFrame) -> None:
        writer = df.write.format("jdbc").mode("append")
        for k, v in jdbc_writer_options(self.url, table, self.batch_size).items():
            writer = writer.option(k, v)
        writer.save()
