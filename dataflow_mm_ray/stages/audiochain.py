"""The reference's composed audio VAD pipeline as declarative-runner
steps.

``audio_voice_activity_detection_pipeline.py`` chains exactly two
operators over one table (``dataflow/statics/pipelines/gpu_pipelines/
audio_voice_activity_detection_pipeline.py:18-50``):
``SileroVADGenerator`` (audio -> speech-segment ``timestamps``) then
``TimestampChunkRowGenerator`` in ``split`` mode (one output row per
segment), each persisting through the storage cache. Here each step is
a ds -> ds operator resolved through the registry and run by
``pipelines/runner.py`` — the same composition shape as the video
chain (stages/videochain.py), reusing the engine's existing
``audio_vad_pipeline`` (Silero parameter semantics,
stages/multimodal.py:230-340) and ``chunk_rows`` split kernel
(stages/chunks.py:66-95, reference-fuzzed).

Decoder-bound audio stays the engine's established deterministic stub
universe (md5-seeded byte payloads -> frame-RMS energy curve); real
Silero drops into ``AudioVAD._frame_probs`` without changing this
chain.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

US = 1_000_000


def attach_stub_audio(ds, id_col: str = "doc_id", audio_col: str = "audio"):
    """Source glue: rows of the documents table -> (id, audio-bytes)
    fixture rows, the analog of the reference pipeline's
    ``sample_data.jsonl`` audio entries. Deterministic per id (same
    payload universe as the standalone ``audio_vad`` query)."""
    from dataflow_mm_ray.stages.multimodal import fake_image_bytes

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col]].copy(deep=False)
        b[audio_col] = [fake_image_bytes(f"aud-{i}") for i in b[id_col]]
        return b

    return ds.map_batches(kernel, batch_format="pandas")


def vad_segments_to_rows(ds, id_col: str = "doc_id"):
    """Explode the VAD output's per-row segment lists into one
    ``(conv_id, start_us, end_us)`` row per speech segment — the
    timestamp handoff between the reference's two operators
    (``output_answer_key='timestamps'`` ->
    ``input_timestamps_key='timestamps'``), in the integer-µs layout
    ``chunk_rows`` consumes."""

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        n_per = b["n_segments"].to_numpy(dtype=np.int64)
        ids = np.repeat(b[id_col].to_numpy(), n_per)
        starts = (np.concatenate(list(b["seg_starts"]))
                  if len(b) else np.empty(0, dtype=np.float64))
        ends = (np.concatenate(list(b["seg_ends"]))
                if len(b) else np.empty(0, dtype=np.float64))
        return pd.DataFrame(
            {
                "conv_id": ids,
                "start_us": np.round(starts * US).astype(np.int64),
                "end_us": np.round(ends * US).astype(np.int64),
            }
        )

    return ds.map_batches(kernel, batch_format="pandas")
