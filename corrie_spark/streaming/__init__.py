from corrie_spark.streaming.pipeline import HealthListener, PipelineConfig, start_pipeline

__all__ = ["start_pipeline", "PipelineConfig", "HealthListener"]
