"""Canonical schemas and engine-wide constants.

The canonical input (per BASELINE.json ``input_hint``) is one Parquet
table of multi-turn conversation / agent transcript turns:

    conv_id: string, turn_idx: int32, role: string,
    text: string, tool: string, ts: timestamp[us]

This is the exploded (one row per turn) form of the reference's
``conversation`` list-of-structs column (see
``dataflow/operators/conversations/format/conversation_to_message.py:49-104``
in the reference for the grouped form).
"""
from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ROLES = ("user", "assistant", "tool", "system")

# Default hash-partition count for keyed stages. On a real cluster this
# should be ~2-4x the total core count; each partition must fit in one
# worker's heap (partition bytes ~ input_bytes / DEFAULT_NUM_PARTITIONS).
DEFAULT_NUM_PARTITIONS = 64

# Default vectorized batch size for map_batches stages over text rows.
DEFAULT_BATCH_SIZE = 16384
