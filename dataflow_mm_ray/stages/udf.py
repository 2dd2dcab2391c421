"""User-extension operators: the generic UDF hook and the MCTS tree
refiner.

``functional_refine`` reproduces ``FunctionalRefiner``
(``dataflow/operators/core_text/refine/functional_refiner.py:47-66``):
a user function is applied per row with keyword arguments mapped from
columns — any kwarg naming an existing column is fed that row's value,
any other kwarg value is passed through as a constant. Executed
vectorized-per-batch (list comprehension over numpy arrays inside
map_batches — the function itself is user Python, so per-row calls are
inherent; everything around them is batched).

``mcts_tree_refine`` reproduces ``MCTSTreeRefiner``
(``dataflow/operators/core_text/refine/mcts_tree_refiner.py:30-106``):
parse a JSON MCTS tree per row, extract reasoning chains
("wrong -> backtrack -> correct" and "direct-correct" paths), dedup
them, and downsample to ``max_chains`` with a *deterministic* per-row
seed (the reference seeds a global RNG at line 71-73; here the seed is
derived from the row id so results are stable under any partitioning).
"""
from __future__ import annotations

import json
from typing import Callable

import numpy as np
import pandas as pd

from dataflow_mm_ray.hashing import stable_hash_array
from dataflow_mm_ray.schema import DEFAULT_BATCH_SIZE


def functional_refine(ds, func: Callable, output_col: str, **input_keys):
    """Column-mapped row UDF: kwargs whose value names an existing
    column are bound per-row; others are constants."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        cols = {
            kw: batch[col].to_numpy() if isinstance(col, str) and col in batch.columns else None
            for kw, col in input_keys.items()
        }
        consts = {kw: v for kw, v in input_keys.items() if cols.get(kw) is None}
        n = len(batch)
        out = np.empty(n, dtype=object)
        for i in range(n):
            kwargs = dict(consts)
            for kw, arr in cols.items():
                if arr is not None:
                    kwargs[kw] = arr[i]
            out[i] = func(**kwargs)
        batch = batch.copy(deep=False)
        batch[output_col] = out
        return batch

    return ds.map_batches(fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE)


# ---------------------------------------------------------------------------
# MCTS tree refiner
# ---------------------------------------------------------------------------

BACKTRACK_MESSAGE = "Wait, this seems off. Let's try something else."


def _process_text_chain(chain: list[str]) -> tuple[str, str]:
    """(joined thought text, final answer) — mcts_tree_refiner.py:11-27:
    drop a leading <image> line, last element is the answer, strip
    think/answer tags from the body."""
    if not chain:
        return "", ""
    if chain[0].startswith("<image>") or chain[0].endswith("<image>"):
        chain = chain[1:]
    if not chain:
        return "", ""
    final_answer = chain[-1].replace("<answer>", "").replace("</answer>", "").strip()
    cleaned = []
    for line in chain[:-1]:
        line = line.replace("<think>", "").replace("</think>", "")
        line = line.replace("<answer>", "").replace("</answer>", "")
        cleaned.append(line.strip())
    return " ".join(cleaned), final_answer


def _build_chains(node: dict, backtrack: str = BACKTRACK_MESSAGE) -> list[str]:
    """mcts_tree_refiner.py:30-63: per node, pair every wrong rollout
    with every correct rollout ("wrong -> backtrack -> correct") and
    emit every correct rollout alone ("direct-correct"); recurse into
    children unless terminal."""
    rollouts = node.get("rollouts", [])
    correct = [r for r in rollouts if r.get("reward", 0.0) >= 1.0]
    wrong = [r for r in rollouts if r.get("reward", 0.0) < 1.0]
    chains: list[str] = []
    for wr in wrong:
        wc, _ = _process_text_chain(wr.get("ephemeral_texts", []))
        if not wc:
            continue
        wc += f"\n{backtrack}"
        for cr in correct:
            cc, ca = _process_text_chain(cr.get("ephemeral_texts", []))
            chains.append(f"<think>\n{wc}\n{cc}\n</think>\n<answer> {ca} </answer>")
    for cr in correct:
        cc, ca = _process_text_chain(cr.get("ephemeral_texts", []))
        chains.append(f"<think>\n{cc}\n</think>\n<answer> {ca} </answer>")
    if not node.get("is_terminal", False):
        for child in node.get("children", []):
            chains.extend(_build_chains(child, backtrack))
    return chains


def extract_chains(tree_json, max_chains: int, seed: int) -> list[str]:
    """Parse one MCTS tree; dedup chains and downsample to max_chains.

    Deviation from the reference (documented): the reference dedups via
    ``list(set(...))`` (nondeterministic order) and a shared RNG; the
    engine sorts the deduped chains and seeds per row, so output is
    stable under any partitioning/replay."""
    if not tree_json:
        return []
    try:
        tree = json.loads(tree_json) if isinstance(tree_json, str) else tree_json
    except (json.JSONDecodeError, TypeError):
        return []
    try:
        uniq = sorted(set(_build_chains(tree)))
    except (AttributeError, TypeError):
        return []
    if len(uniq) > max_chains:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        idx = np.sort(rng.choice(len(uniq), size=max_chains, replace=False))
        uniq = [uniq[i] for i in idx]
    return uniq


def mcts_tree_refine(ds, tree_col: str = "tree", id_col: str = "doc_id",
                     output_col: str = "chains", max_chains: int = 4):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        seeds = stable_hash_array(batch[id_col].to_numpy())
        out = [
            extract_chains(t, max_chains, int(s))
            for t, s in zip(batch[tree_col].to_numpy(), seeds)
        ]
        batch = batch.copy(deep=False)
        batch[output_col] = np.array([json.dumps(c) for c in out], dtype=object)
        return batch

    return ds.map_batches(fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE)
