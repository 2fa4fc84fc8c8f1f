"""Bucketed range join: fact-timestamp x interval containment at scale.

Spark plans a bare `l.ts >= r.start AND l.ts < r.end` join as a
BroadcastNestedLoopJoin — O(|facts| x |intervals|) comparisons, the
classic scale-killer for point-in-interval joins (maintenance windows,
ad campaigns, experiment cohorts against an event stream).

The bucketed formulation makes it an EQUI-join Catalyst can hash:
  1. bin the time axis at `bin_micros`;
  2. each interval explodes to every bin it overlaps (intervals of
     width ~bin emit 1-2 rows — bounded blowup, chosen by the caller);
  3. facts compute one bin each; join on the bin key; the original
     range predicate stays as the residual filter.
Correctness: an (event, interval) pair matches iff the event's bin is
one of the interval's covered bins AND the residual holds — the bin
join loses nothing (the event's bin is covered whenever the event lies
inside the interval) and the residual removes same-bin non-overlaps.

At 100 TB: facts shuffle (or broadcast-join if the exploded interval
side is small) on an equi-key with ordinary AQE skew handling; cost is
O(|facts| + |intervals x bins_per_interval| + |candidate pairs|),
never the cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_micros: int,
    broadcast_intervals: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to the intervals containing their timestamp
    (half-open [start, end)). Output = fact columns + interval columns
    (minus the internal bin key)."""
    # Exact integer binning via `div` (not floor of a double quotient:
    # beyond ~2^53 micros the double rounds, and a bin key off by one
    # silently loses an equi-match the residual can't recover). `div`
    # truncates toward zero rather than flooring, but any MONOTONE
    # non-decreasing bin function is correct here: binf(ts) always lies
    # in [binf(start), binf(end-1)] for ts in [start, end), so the
    # covered-bin sequence still catches every match and the residual
    # removes the rest.
    bf = int(bin_micros)
    binned_facts = facts.withColumn(
        "_rj_bin", F.expr(f"unix_micros(`{ts_col}`) div {bf}")
    )
    covered = F.sequence(
        F.expr(f"unix_micros(`{start_col}`) div {bf}"),
        F.expr(f"(unix_micros(`{end_col}`) - 1) div {bf}"),
    )
    binned_ivals = intervals.filter(
        # empty/reversed intervals match nothing; without the guard
        # sequence(hi, lo) would emit a DESCENDING bin range — spurious
        # exploded rows, and a job-killing length for a large reversal
        F.col(end_col) > F.col(start_col)
    ).withColumn("_rj_bin", F.explode(covered))
    if broadcast_intervals:
        binned_ivals = F.broadcast(binned_ivals)
    residual: Column = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col)
    )
    return binned_facts.join(binned_ivals, "_rj_bin", how).filter(residual).drop("_rj_bin")
