"""dataflow_mm_ray — a Ray-Data-native structured-streaming / CEP engine.

A from-scratch rebuild of the data-processing capabilities of
OpenDCAI/DataFlow-MM (reference at /root/reference, see SURVEY.md) as
continuous queries over Parquet-backed multi-turn transcript streams:

- ``ray.data.Dataset`` pipelines, zero-copy Arrow ``map_batches``
- tumbling / sliding / session windows keyed by ``conv_id``
- stateful turn<->tool-response joins
- exactly-once two-phase-commit Parquet sink + checkpoint/resume
- the reference's operator semantics (rule filters, score filters,
  reward evaluation, normalization, dedup) as vectorized kernels.

This package never calls ``ray.init()``; the caller owns the session.
"""

__version__ = "0.1.0"

from dataflow_mm_ray.schema import TRANSCRIPT_SCHEMA  # noqa: F401
