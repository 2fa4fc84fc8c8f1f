"""Expression-level utilities shared by operators."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(expr: Column, f: Callable[[Column], Column]) -> Column:
    """Evaluate `expr` exactly once and pass it to `f` as a lambda
    variable.

    Catalyst inlines sub-expressions on every reference (CollapseProject
    + lambda capture), so an expensive expression referenced inside a
    higher-order-function lambda is otherwise re-evaluated per array
    element. Wrapping it as transform(array(expr), f)[1] forces single
    evaluation: lambda variables are materialized values.
    """
    return F.element_at(F.transform(F.array(expr), f), 1)
