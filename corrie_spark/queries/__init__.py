from corrie_spark.queries.registry import all_oracles, all_queries, get, register

__all__ = ["register", "get", "all_queries", "all_oracles"]
