from corrie_spark.sinks.base import DLQSink, ParquetDirSink, Sink
from corrie_spark.sinks.native_tcp import CHServerException, NativeTcpConn, NativeTcpSink
from corrie_spark.sinks.writer import SchemaRegistry, WriterConfig, process_batch

__all__ = [
    "Sink",
    "ParquetDirSink",
    "DLQSink",
    "SchemaRegistry",
    "WriterConfig",
    "process_batch",
    "NativeTcpConn",
    "NativeTcpSink",
    "CHServerException",
]
