from dataflow_mm_ray.sources.tables import read_table  # noqa: F401
from dataflow_mm_ray.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_CTE,
    transcripts_from_events,
)
