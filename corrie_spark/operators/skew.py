"""Skew mitigation for joins on hot keys.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in
engine_confs) handles most skew at runtime by splitting oversized
partitions; salting is the explicit, planned fallback for the cases
AQE can't fix — e.g. a single key so hot that even a split partition
pins one executor, or non-shuffle-join paths.

salted_join: the classic transform —
  fact side:  salt = uniform int in [0, S)   (one extra column)
  dim side:   exploded S-fold, one row per salt value
  join key:   (key, salt)  -> the hot key's rows spread over S
              partitions instead of one.
Cost: dim side replicated S-fold (choose S ~ partitions-per-hot-key,
not hundreds); result is row-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def with_salt(df: DataFrame, num_salts: int = DEFAULT_SALTS, seed: int = 42) -> DataFrame:
    """Uniform salt column in [0, num_salts)."""
    return df.withColumn("_salt", F.floor(F.rand(seed) * num_salts).cast("int"))


def explode_salts(df: DataFrame, num_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Replicate each row once per salt value (build side of a salted
    join). S-fold blowup — keep the salted side the small one."""
    return df.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    num_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join a skew-keyed DataFrame against `other`, spreading each hot
    key over `num_salts` shuffle partitions. Row-identical to
    skewed.join(other, on, how); the salt is internal and dropped."""
    keys = [on] if isinstance(on, str) else list(on)
    left = with_salt(skewed, num_salts, seed)
    right = explode_salts(other, num_salts)
    return left.join(right, keys + ["_salt"], how).drop("_salt")


def skew_stats(df: DataFrame, key: str | Column, top: int = 10) -> DataFrame:
    """Per-key row counts + share of total for the hottest keys — the
    diagnostic to run before choosing num_salts."""
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.alias("key")).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total")).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(top)
    )
