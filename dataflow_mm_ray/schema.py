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

# Default hash-partition count for keyed stages. 0 = "auto": resolved
# at shuffle time by partition.resolve_num_partitions — cluster-CPU
# floor (every core gets a reduce task), rows-based target when the
# input size is known (~TARGET_ROWS_PER_PARTITION rows so a partition
# fits one worker's heap), GRAFT_NUM_PARTITIONS env override. Measured
# on this host: a fixed P=64 costs 4.5x vs P=CPUs at sf0.1 (tiny
# partitions -> B*P object soup); at 100 TB a fixed P would instead be
# far too SMALL, so the auto rule scales with input rows.
DEFAULT_NUM_PARTITIONS = 0

# Default vectorized batch size for map_batches stages over text rows.
DEFAULT_BATCH_SIZE = 16384
