"""Score / range filters.

``score_filter`` mirrors the reference's ``ScoreFilter``
(``dataflow/operators/core_vision/filter/score_filter.py:37-84``):
non-destructive — it appends a boolean ``select`` column,
``min_score <= score <= max_score`` with inclusive bounds and
None meaning unbounded; rows are not dropped.

``apply_select`` is the destructive half used by pipelines that want
the filtered stream.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def score_filter(ds, score_col: str, min_score=None, max_score=None, out_col: str = "select"):
    def mark(batch: pa.Table) -> pa.Table:
        col = batch[score_col]
        mask = pc.is_valid(col)
        if min_score is not None:
            mask = pc.and_(mask, pc.greater_equal(col, pa.scalar(min_score)))
        if max_score is not None:
            mask = pc.and_(mask, pc.less_equal(col, pa.scalar(max_score)))
        return batch.append_column(out_col, mask)

    return ds.map_batches(mark, batch_format="pyarrow")


def apply_select(ds, select_col: str = "select", drop: bool = True):
    def filt(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.fill_null(batch[select_col], False))
        if drop:
            out = out.drop_columns([select_col])
        return out

    return ds.map_batches(filt, batch_format="pyarrow")
