from .streaming import PipelineConfig, StreamingFingerprintPipeline  # noqa: F401
