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
    import shutil

    work = tempfile.mkdtemp(prefix="dmr-flagship-", dir="/tmp")
    try:
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
    finally:
        # the replicated transcript table + committed output are scratch;
        # repeated bench invocations must not accumulate them in /tmp
        shutil.rmtree(work, ignore_errors=True)
    joins, windows = res["joins"], res["windows"]
    conv_load = (
        windows.groupby("conv_id", as_index=False)["n_turns"].sum().rename(columns={"n_turns": "conv_turns"})
        if len(windows)
        else pd.DataFrame({"conv_id": pd.Series([], dtype=object), "conv_turns": []})
    )
    if not len(joins):
        out = joins.copy()
        out["conv_turns"] = pd.Series([], dtype="float64")
        return out
    out = joins.merge(conv_load, on="conv_id", how="left")
    # stable entry() schema: conv_turns is nullable (a conv may have
    # joins but no committed window) — float64-with-NaN always, never a
    # data-dependent int64/float64/absent flip (CLAUDE.md convention)
    out["conv_turns"] = out["conv_turns"].astype("float64")
    return out.sort_values(["conv_id", "invoke_idx"]).reset_index(drop=True)
