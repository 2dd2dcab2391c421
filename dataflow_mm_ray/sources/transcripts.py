"""The canonical transcript stream.

The engine's canonical input (BASELINE.json ``input_hint``) is a
Parquet table of multi-turn conversation / agent transcript turns:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

The sandbox test data has no such table, so we *derive* one
deterministically from the ``events`` table (event_id, ts, user_id,
event_type, value, props):

- ``conv_id``   = ``conv-<user_id zero-padded to 6>`` (one conversation
  per user — user activity skew becomes conversation skew, exercising
  hot-key handling);
- ``turn_idx``  = rank of the event within its user by ``(ts, event_id)``
  (0-based, contiguous, int32);
- ``role``      = cycle by ``turn_idx % 4``: user, assistant, tool,
  assistant — so every 4-turn block contains an assistant turn that
  invokes a tool (idx%4==1) followed by a ``role='tool'`` response
  (idx%4==2): the stateful-join fixture;
- ``text``      = ``"<event_type> #<event_id> <props>"``;
- ``tool``      = ``tool_<event_type>`` on turns with idx%4 in (1,2),
  NULL otherwise;
- ``ts``        = the event timestamp (event time).

The same derivation is expressed in ANSI SQL (``TRANSCRIPTS_CTE``) so
every downstream query has a DuckDB oracle over the raw tables.

Scale note: the derivation needs all turns of one conversation
co-located to rank them — a single hash-partitioned shuffle on
``user_id`` via partition_map; per-partition ranking is vectorized
(``groupby(...).cumcount``), not a Python loop per conversation.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS
from dataflow_mm_ray.sources.tables import read_table

# Shared SQL CTE: prepend to every oracle query. DuckDB views `events`
# etc. are pre-registered by the correctness driver.
TRANSCRIPTS_CTE = """
WITH _ev_ranked AS (
  SELECT user_id, event_id, event_type, props, ts,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx
  FROM events
), transcripts AS (
  SELECT
    'conv-' || printf('%06d', user_id) AS conv_id,
    turn_idx,
    CASE turn_idx % 4 WHEN 0 THEN 'user' WHEN 2 THEN 'tool' ELSE 'assistant' END AS role,
    event_type || ' #' || CAST(event_id AS VARCHAR) || ' ' || props AS text,
    CASE WHEN turn_idx % 4 IN (1, 2) THEN 'tool_' || event_type END AS tool,
    ts
  FROM _ev_ranked
)
"""

_ROLE_CYCLE = np.array(["user", "assistant", "tool", "assistant"], dtype=object)


def _events_to_turns(part: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-partition derivation (partition = hash(user_id)).

    The string columns are assembled with pyarrow.compute kernels
    (binary_join_element_wise / utf8_lpad — contiguous Arrow buffers,
    no per-element Python concat; measured ~2.8x on the reduce task,
    the hottest code in the scaling pipeline) and materialized to the
    engine's object-dtype layout once. NULL ``event_type``/``props``
    propagate to NULL text/tool exactly like the oracle's ``||``
    concatenation (``null_handling="emit_null"``); ``utf8_lpad`` never
    truncates, matching ``str.zfill`` for 7+-digit user ids
    (pinned in tests/test_temporal.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    part = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    turn_idx = part.groupby("user_id", sort=False).cumcount().to_numpy().astype(np.int32)
    mod4 = turn_idx % 4
    et = pa.array(part["event_type"], type=pa.string())
    pr = pa.array(part["props"], type=pa.string())
    ids = pc.cast(pa.array(part["event_id"]), pa.string())
    text = pc.binary_join_element_wise(
        pc.binary_join_element_wise(et, ids, " #", null_handling="emit_null"),
        pr, " ", null_handling="emit_null",
    )
    uid = pc.cast(pa.array(part["user_id"]), pa.string())
    conv = pc.binary_join_element_wise(
        pa.scalar("conv-"), pc.utf8_lpad(uid, 6, "0"), "", null_handling="emit_null"
    )
    tool_mask = pa.array((mod4 == 1) | (mod4 == 2))
    tool = pc.if_else(
        tool_mask,
        pc.binary_join_element_wise(pa.scalar("tool_"), et, "", null_handling="emit_null"),
        pa.scalar(None, type=pa.string()),
    )
    return pd.DataFrame(
        {
            "conv_id": conv.to_numpy(zero_copy_only=False),
            "turn_idx": turn_idx,
            "role": _ROLE_CYCLE[mod4],
            "text": text.to_numpy(zero_copy_only=False),
            "tool": tool.to_numpy(zero_copy_only=False),
            "ts": part["ts"].to_numpy(),
        }
    )


def _events_to_turns_arrow(tbl):
    """``_events_to_turns`` as a pure Arrow Table -> Table kernel: sort
    via sort_indices+take (keys are unique per row — event_id — so
    stability is moot), cumcount from int64 run boundaries (zero-copy
    numpy view), role as a dictionary take cast to string, all string
    assembly in pyarrow.compute. NOTHING materializes Python objects —
    the full-derivation ``transcripts`` output stays Arrow end-to-end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "role": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "tool": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        )
    idx = pc.sort_indices(
        tbl,
        sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
    )
    t = tbl.take(idx)
    uid = t.column("user_id").to_numpy()
    n = len(uid)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    turn_idx = (np.arange(n) - starts[run_id]).astype(np.int32)
    mod4 = (turn_idx % 4).astype(np.int8)
    role = pc.cast(
        pa.DictionaryArray.from_arrays(
            pa.array(mod4), pa.array(["user", "assistant", "tool", "assistant"])
        ),
        pa.string(),
    )
    et = pc.cast(t.column("event_type"), pa.string())
    pr = pc.cast(t.column("props"), pa.string())
    ids = pc.cast(t.column("event_id"), pa.string())
    text = pc.binary_join_element_wise(
        pc.binary_join_element_wise(et, ids, " #", null_handling="emit_null"),
        pr, " ", null_handling="emit_null",
    )
    conv = pc.binary_join_element_wise(
        pa.scalar("conv-"), pc.utf8_lpad(pc.cast(t.column("user_id"), pa.string()), 6, "0"),
        "", null_handling="emit_null",
    )
    tool = pc.if_else(
        pa.array((mod4 == 1) | (mod4 == 2)),
        pc.binary_join_element_wise(pa.scalar("tool_"), et, "", null_handling="emit_null"),
        pa.scalar(None, type=pa.string()),
    )
    return pa.table(
        {
            "conv_id": conv,
            "turn_idx": pa.array(turn_idx),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": t.column("ts"),
        }
    )


_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "props"]


def transcripts_from_events(sf_dir: str, num_partitions: int = DEFAULT_NUM_PARTITIONS,
                            arrow: bool = False):
    """events.parquet -> canonical transcript Dataset (lazy).

    ``arrow=True`` keeps the derivation Arrow end-to-end (Arrow blocks
    out, zero Python-object strings) — the right mode when the
    transcript table itself is the product (write_parquet / count /
    Arrow-consuming downstream); the pandas mode feeds the fused
    per-partition kernels."""
    from dataflow_mm_ray.partition import partition_map_parquet
    from dataflow_mm_ray.sources.tables import table_path

    return partition_map_parquet(
        table_path(sf_dir, "events"), _EVENT_COLS, "user_id",
        _events_to_turns_arrow if arrow else _events_to_turns,
        num_partitions=num_partitions, arrow_output=arrow,
    )


def _events_to_turns_fast(part: pd.DataFrame) -> pd.DataFrame:
    """Derivation for TEXT-FREE kernels: same rows/order/values as
    ``_events_to_turns`` except the ``text`` column is replaced by an
    int64 ``text_len`` (NULL text -> 0, matching the SQL oracles' NULL-
    skipping sums). String columns are INTERNED — conv_id/tool strings
    are built once per distinct conversation / event type and fanned
    out by pointer fancy-indexing — so a 10M-row partition allocates
    ~n_convs strings instead of ~3*n_rows. Measured ~4x on the fused
    window/session/join reduce tasks (the scaling pipeline's hot
    path)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    part = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    n = len(part)
    if n == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int32),
                "role": pd.Series([], dtype=object),
                "text_len": pd.Series([], dtype=np.int64),
                "tool": pd.Series([], dtype=object),
                "ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
    uid = part["user_id"].to_numpy()
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    turn_idx = (np.arange(n) - starts[run_id]).astype(np.int32)
    mod4 = turn_idx % 4
    conv_unique = np.array(
        [f"conv-{str(int(u)).zfill(6)}" for u in uid[starts]], dtype=object
    )
    conv = conv_unique[run_id]
    # text_len = len(et) + len(' #') + len(id) + len(' ') + len(props);
    # NULL et/props -> 0 (the oracle's sum(length(text)) skips NULLs)
    et = pa.array(part["event_type"], type=pa.string())
    pr = pa.array(part["props"], type=pa.string())
    # utf8_length on the Arrow-cast ids (like the full derivation) —
    # a fixed-width numpy U-cast would silently truncate string-typed
    # ids longer than the width and report a wrong text_len
    ids_len = (
        pc.utf8_length(pc.cast(pa.array(part["event_id"]), pa.string()))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    etl = pc.fill_null(pc.utf8_length(et), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    prl = pc.fill_null(pc.utf8_length(pr), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    valid = (~np.asarray(pc.is_null(et))) & (~np.asarray(pc.is_null(pr)))
    text_len = np.where(valid, etl + ids_len + prl + 3, 0).astype(np.int64)
    # tool strings interned per distinct event_type
    denc = pc.dictionary_encode(et)
    codes = np.asarray(denc.indices.to_numpy(zero_copy_only=False))
    tool_unique = np.array(
        ["tool_" + s for s in denc.dictionary.to_pylist()], dtype=object
    )
    tool = np.full(n, None, dtype=object)
    tool_m = ((mod4 == 1) | (mod4 == 2)) & (~np.asarray(pc.is_null(et)))
    if tool_m.any():
        tool[tool_m] = tool_unique[codes[tool_m].astype(np.int64)]
    return pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": turn_idx,
            "role": _ROLE_CYCLE[mod4],
            "text_len": text_len,
            "tool": tool,
            "ts": part["ts"].to_numpy(),
        }
    )


def transcripts_partitioned(
    sf_dir: str,
    kernel,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    fast: bool = False,
):
    """Fused single-shuffle path: derive the transcript turns AND apply
    a per-partition ``kernel`` in the same reduce task, reading
    row-group ranges straight off the parquet file (no driver barrier).

    ``conv_id`` is 1:1 with ``user_id``, so any conv-keyed kernel
    (sessions, joins, digests, window aggregates) is exact on the
    user-hash partitions — this halves the shuffles of
    ``kernel(transcripts_from_events(...))``. The kernel receives the
    partition sorted by (conv_id, turn_idx).

    ``fast=True`` feeds the kernel the ``_events_to_turns_fast`` frame
    (interned strings, ``text_len`` instead of ``text``) — only for
    kernels that never read raw text.
    """
    from dataflow_mm_ray.partition import partition_map_parquet
    from dataflow_mm_ray.sources.tables import table_path

    derive = _events_to_turns_fast if fast else _events_to_turns

    def fused(part: pd.DataFrame) -> pd.DataFrame:
        t = derive(part)  # already (user, ts)-sorted = (conv, turn) order
        return kernel(t.reset_index(drop=True))

    return partition_map_parquet(
        table_path(sf_dir, "events"), _EVENT_COLS, "user_id", fused,
        num_partitions=num_partitions,
    )
