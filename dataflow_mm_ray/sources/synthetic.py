"""Deterministic synthetic transcript generator (FIXTURES.md F1).

Seeded, wall-clock-free generator producing the canonical transcript
schema with the stress properties the engine must handle:

- **Zipf-skewed turn counts**: a few conversations are hot (exercises
  salted repartition / pre-aggregation);
- **rule-tripping texts**: a controlled fraction of turns engineered to
  trip each of the 15 RuleBaseFilter rules;
- **session gaps**: per-conversation ts increments straddle the
  session-gap threshold;
- **tool-call patterns**: assistant turns invoking tools with matching
  later ``role='tool'`` responses (and some dangling invocations);
- **late rows**: a fraction of turns carry event-times far behind the
  conversation's frontier (exercise watermark quarantine when replayed
  in arrival order).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

RULE_TRIP_TEXTS = [
    "This line ends with a colon:",
    "first...\nsecond…\nthird…",
    "a b c d e f g",
    "# # # ... … eight words total here now",
    "entity &nbsp; inline",
    "id number id number ID No identity",
    " ".join(["word"] * 120),
    "escape U+1F600 char",
    "Copyright notice",
    "{ } { } short",
    "ALL CAPS SHOUTING TEXT HERE",
    "lorem ipsum dolor",
    " ".join(["same"] * 40),
    "• one\n• two\n• three",
    "javascript a\njavascript b\njavascript c\njavascript d",
]

TOOLS = ("search", "calc", "browse", "exec")


def generate_transcripts(
    n_convs: int = 100,
    mean_turns: int = 20,
    seed: int = 42,
    gap_s: int = 1800,
    trip_fraction: float = 0.05,
    late_fraction: float = 0.02,
    zipf_a: float = 1.5,
) -> pd.DataFrame:
    """One deterministic pandas frame in the canonical schema."""
    rng = np.random.RandomState(seed)
    sizes = np.minimum(rng.zipf(zipf_a, size=n_convs) * mean_turns // 2 + 2, 50 * mean_turns)
    rows = []
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    for c in range(n_convs):
        conv = f"conv-{c:08d}"
        ts = base + int(rng.randint(0, 86_400)) * 1_000_000
        pending_tool = None
        for i in range(int(sizes[c])):
            # gaps: mostly small, sometimes > session gap
            step = rng.randint(5, 600) if rng.rand() > 0.1 else gap_s + rng.randint(60, 7200)
            ts += step * 1_000_000
            mod = i % 4
            role = ("user", "assistant", "tool", "assistant")[mod]
            tool = None
            if role == "assistant" and mod == 1 and rng.rand() < 0.7:
                tool = "tool_" + TOOLS[rng.randint(len(TOOLS))]
                pending_tool = tool
            elif role == "tool":
                tool = pending_tool or ("tool_" + TOOLS[rng.randint(len(TOOLS))])
                pending_tool = None
            if rng.rand() < trip_fraction:
                text = RULE_TRIP_TEXTS[rng.randint(len(RULE_TRIP_TEXTS))]
            else:
                text = f"turn {i} of {conv}: " + " ".join(
                    f"w{rng.randint(500)}" for _ in range(rng.randint(5, 25))
                )
            row_ts = ts
            if rng.rand() < late_fraction and i > 3:
                row_ts = ts - int(rng.randint(2, 48)) * 3600 * 1_000_000  # late event-time
            rows.append((conv, np.int32(i), role, text, tool, row_ts))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df
