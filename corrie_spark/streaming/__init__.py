from corrie_spark.streaming.health_http import HealthServer, ping_gate
from corrie_spark.streaming.pipeline import (
    HealthListener,
    PipelineConfig,
    dedup_envelope_stream,
    start_pipeline,
)

__all__ = [
    "start_pipeline",
    "PipelineConfig",
    "HealthListener",
    "HealthServer",
    "ping_gate",
    "dedup_envelope_stream",
]
