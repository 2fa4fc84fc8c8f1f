"""Physical-plan inspection helpers.

The 100 TB contract for every operator in this engine is checked
mechanically, not by eyeball: tests assert that

  - filters reach the parquet scan (PushedFilters),
  - scans read only the projected columns (ReadSchema),
  - dimension joins broadcast (BroadcastHashJoin, no big-side shuffle),
  - the shuffle count matches the plan we designed, not whatever
    happened to pass.

Parsing the explain text is version-sensitive by nature; these
helpers centralize it so a Spark upgrade breaks one file.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of each scan (column-pruning evidence)."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", explain_str(df))]


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join broadcasts its small side (hash join for
    equi-keys, nested-loop for cross/theta joins — both avoid
    shuffling the big side)."""
    s = explain_str(df)
    return "BroadcastHashJoin" in s or "BroadcastNestedLoopJoin" in s


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (broadcast exchanges do
    not count — they move only the small side). Counts the formatted
    output's detail headers '(n) Exchange', which appear exactly once
    per operator ('(n) BroadcastExchange' is a different token)."""
    return len(re.findall(r"\(\d+\) Exchange\b", explain_str(df)))
