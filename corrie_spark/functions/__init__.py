from corrie_spark.functions.core import bind

__all__ = ["bind"]
