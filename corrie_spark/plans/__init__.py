from corrie_spark.plans.inspect import (
    count_shuffles,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "has_broadcast_join",
    "count_shuffles",
    "read_schemas",
]
