"""Rollout -> verifier -> filter composition — the reference's
``FailRateFilter`` (``dataflow/operators/core_vision/filter/
failrate_filter.py:12-139``) and ``VisionDependentFilter``
(``vision_dependent_filter.py:12-137``): generate N rollouts per
sample with the serving, verify each against the gold answer with a
second model/rule, compute the fail rate, and keep samples whose fail
rate is within bounds (too-easy and too-hard samples are both
droppable; the reference keeps ``min_rate <= fail_rate <= max_rate``).

Both reference operators already accept Ray actor handles for the
servings (``failrate_filter.py:38``, ``vision_dependent_filter.py:86-90``)
— the engine inverts it fully: rollouts run inside the actor-pool
generator stage, verification is a vectorized kernel, and the filter is
a plain predicate.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

from dataflow_mm_ray.schema import DEFAULT_BATCH_SIZE


class RolloutVerifier:
    """Actor-pool callable: per row, produce ``n_rollouts`` answers via
    the serving and verify each with ``verify_fn(answer, gold) -> bool``.
    Emits ``n_correct`` and ``fail_rate``."""

    def __init__(self, backend_cls, backend_kwargs, verify_fn: Callable,
                 n_rollouts: int, prompt_col: str, gold_col: str):
        self.serving = backend_cls(**(backend_kwargs or {}))  # once per actor
        self.verify_fn = verify_fn
        self.n_rollouts = n_rollouts
        self.prompt_col = prompt_col
        self.gold_col = gold_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        correct = np.zeros(n, dtype=np.int64)
        prompts = batch[self.prompt_col].tolist()
        golds = batch[self.gold_col].tolist()
        for r in range(self.n_rollouts):
            # rollout r = serving on the seed-suffixed prompt (a real
            # model varies by sampling temperature; determinism here
            # comes from the suffix)
            answers = self.serving.generate([f"{p}\x1f{r}" for p in prompts])
            correct += np.fromiter(
                (bool(self.verify_fn(a, g)) for a, g in zip(answers, golds)),
                dtype=np.int64, count=n,
            )
        batch = batch.copy(deep=False)
        batch["n_correct"] = correct
        batch["fail_rate"] = (self.n_rollouts - correct) / self.n_rollouts
        return batch


def failrate_filter(ds, backend_cls, verify_fn: Callable, n_rollouts: int = 4,
                    prompt_col: str = "prompt", gold_col: str = "gold",
                    min_rate: float = 0.0, max_rate: float = 0.75,
                    backend_kwargs=None, concurrency=(1, 4)):
    """Keep rows with min_rate <= fail_rate <= max_rate (inclusive,
    failrate_filter.py semantics)."""
    scored = ds.map_batches(
        RolloutVerifier,
        fn_constructor_kwargs={
            "backend_cls": backend_cls,
            "backend_kwargs": backend_kwargs,
            "verify_fn": verify_fn,
            "n_rollouts": n_rollouts,
            "prompt_col": prompt_col,
            "gold_col": gold_col,
        },
        batch_format="pandas",
        batch_size=DEFAULT_BATCH_SIZE,
        concurrency=concurrency,
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["fail_rate"] >= min_rate) & (b["fail_rate"] <= max_rate)
        return b[m]

    return scored.map_batches(keep, batch_format="pandas")
