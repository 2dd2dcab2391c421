from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts  # noqa: F401
from dataflow_mm_ray.streaming.sink import EpochSink  # noqa: F401
