"""Answer-reward evaluation stage + the deterministic evaluation
fixture derivation shared with the SQL oracle."""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.functions.rewards import calculate_reward
from dataflow_mm_ray.schema import DEFAULT_BATCH_SIZE

PROBLEM_TYPES = ["multiple choice", "numerical", "OCR", "free-form", "regression"]


def reward_eval(ds, model_output_col="model_output", solution_col="solution",
                type_col="problem_type", output_col="reward", round_to=6):
    """GeneralTextAnswerEvaluator.run semantics
    (general_text_answer_evaluator.py:152-206) as a vectorized batch
    stage; missing columns raise KeyError like the reference."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        for c in (model_output_col, solution_col, type_col):
            if c not in batch.columns:
                raise KeyError(f"Missing required column: {c}")
        rewards = np.array(
            [
                round(calculate_reward(s, m, t), round_to)
                for s, m, t in zip(batch[solution_col], batch[model_output_col], batch[type_col])
            ],
            dtype=np.float64,
        )
        batch = batch.copy(deep=False)
        batch[output_col] = rewards
        return batch

    return ds.map_batches(fn, batch_format="pandas", batch_size=DEFAULT_BATCH_SIZE)


def derive_eval_fixture(batch: pd.DataFrame, types: list[str] | None = None) -> pd.DataFrame:
    """Deterministic (doc_id, problem_type, solution, model_output)
    fixture from the documents table — mirrored exactly by
    ``EVAL_FIXTURE_SQL`` in queries_ops.py. doc_id % 3 == 0 rows are
    exact matches; % 3 == 1 near-misses that the metric forgives
    (numerical round-2) or partially scores; % 3 == 2 mismatches."""
    types = types or PROBLEM_TYPES
    doc_id = batch["doc_id"].to_numpy()
    words = [str(t).split()[:6] for t in batch["text"]]
    ptype = [types[int(i) % len(types)] for i in doc_id]
    sol, out = [], []
    for i, (d, w) in enumerate(zip(doc_id, words)):
        d = int(d)
        k = d % 3
        t = ptype[i]
        if t == "multiple choice":
            gt = chr(65 + d % 4)
            o = gt if k == 0 else chr(65 + (d + 1) % 4)
        elif t == "numerical":
            gt = f"{d % 1000}.25"
            o = gt if k == 0 else (f"{d % 1000}.254" if k == 1 else f"{d % 1000}.26")
        elif t == "OCR":
            gt = " ".join(w)
            o = gt if k == 0 else " ".join(w[:-1]) if k == 1 else " ".join(reversed(w))
        elif t == "free-form":
            gt = " ".join(w)
            o = gt if k == 0 else " ".join(w[:-2]) if k == 1 else "completely different answer text"
        else:  # regression
            gt = str((d % 100 + 1) * 10)
            o = gt if k == 0 else str((d % 100 + 1) * 11)
        sol.append(f"<answer>{gt}</answer>")
        out.append(f"<answer>{o}</answer>")
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "problem_type": np.array(ptype, dtype=object),
            "solution": np.array(sol, dtype=object),
            "model_output": np.array(out, dtype=object),
        }
    )
