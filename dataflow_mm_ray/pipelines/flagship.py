"""The flagship pipeline: the north-star shape — windowed aggregation +
stateful tool join + filtering — run through the full streaming engine
(micro-batched arrival, watermarks, exactly-once 2PC sink,
checkpointing), then returned as one correlation table.
"""
from __future__ import annotations

import os
import tempfile

import pandas as pd

from dataflow_mm_ray.streaming.engine import StreamingEngine, prepare_transcripts


def flagship_pipeline(sf_dir: str, n_epochs: int = 4, lateness_s: int = 7200) -> pd.DataFrame:
    """Stream sf_dir's transcript table through the engine; return the
    committed tool-join correlations enriched with their conversation's
    committed window volume."""
    work = tempfile.mkdtemp(prefix="dmr-flagship-", dir="/tmp")
    tpath = prepare_transcripts(sf_dir, os.path.join(work, "transcripts"), n_epochs=n_epochs)
    eng = StreamingEngine(
        tpath,
        os.path.join(work, "out"),
        n_epochs=n_epochs,
        n_shards=4,
        lateness_s=lateness_s,
    )
    eng.run()
    res = eng.results()
    joins, windows = res["joins"], res["windows"]
    if not len(joins):
        return joins
    conv_load = (
        windows.groupby("conv_id", as_index=False)["n_turns"].sum().rename(columns={"n_turns": "conv_turns"})
        if len(windows)
        else pd.DataFrame({"conv_id": [], "conv_turns": []})
    )
    out = joins.merge(conv_load, on="conv_id", how="left")
    return out.sort_values(["conv_id", "invoke_idx"]).reset_index(drop=True)
