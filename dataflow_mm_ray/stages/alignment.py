"""Forced-alignment quality filter — reference
``CTCForcedAlignmentFilter`` (``dataflow/operators/core_audio/filter/
audio_ctc_forced_alignment_transcription_quality_filter.py:12-44``,
rules in get_desc 108-119): given a per-word alignment
``[{word, start, end, score}]`` (produced upstream by the evaluator's
actor pool), aggregate the per-word scores with ``threshold_mode`` in
{min, mean}; DROP rows whose alignment has ``error != None`` or whose
aggregate is below ``threshold``.

The alignment model itself (MMS-300m CTC) is a GPU model absent here;
``synthesize_alignment`` provides the deterministic fixture used by the
oracle query — the filter logic operates on the real nested layout.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.schema import DEFAULT_BATCH_SIZE


def synthesize_alignment(doc_id: int, text: str) -> tuple[list[dict], str | None]:
    """Deterministic per-word alignment fixture; every 17th doc gets an
    error (the model-failure path). Mirrored in SQL by
    queries_ops2.ALIGNMENT_SQL."""
    if doc_id % 17 == 0:
        return [], "ctc alignment failed"
    words = str(text).split()[:8]
    out = []
    t = 0.0
    for i, w in enumerate(words):
        dur = 0.1 + (len(w) % 5) * 0.05
        score = ((len(w) * 37 + i * 11) % 100) / 100.0
        out.append({"word": w, "start": round(t, 3), "end": round(t + dur, 3), "score": score})
        t += dur
    return out, None


def alignment_quality_filter(ds, alignment_col: str = "alignment", error_col: str = "align_error",
                             threshold: float = 0.35, threshold_mode: str = "mean",
                             round_to: int = 6):
    """Drop rows with errors or aggregate score < threshold; append the
    aggregate as ``align_score``."""
    if threshold_mode not in ("min", "mean"):
        raise ValueError("threshold_mode must be 'min' or 'mean'")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        scores = np.empty(len(batch), dtype=np.float64)
        ok = np.zeros(len(batch), dtype=bool)
        for i, (al, err) in enumerate(zip(batch[alignment_col], batch[error_col])):
            if err is not None and not (isinstance(err, float) and np.isnan(err)):
                continue
            vals = [w["score"] for w in al]
            if not vals:
                continue
            agg = min(vals) if threshold_mode == "min" else sum(vals) / len(vals)
            scores[i] = round(agg, round_to)
            ok[i] = agg >= threshold
        out = batch.loc[ok].copy(deep=False)
        out["align_score"] = scores[ok]
        return out

    return ds.map_batches(fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE)
