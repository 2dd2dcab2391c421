"""Per-op CLIP-family EVALUATORS — non-destructive score columns,
distinct from the destructive percentile cut of ``clipscore_filter``.

Reference semantics (reimplemented, not copied):

- ``ImageCLIPEvaluator`` — ``dataflow/operators/core_vision/eval/
  image_clip_evaluator.py:21-90``: per (image_path, text) row, a CLIP
  cosine similarity mapped to [0, 1]; a failed image load OR
  empty/whitespace text scores 0.0 (lines 60-66); the score is clamped
  into [0, 1]; appended as a new ``clip_score`` column (run(), 82-90).
- ``ImageLongCLIPEvaluator`` — ``image_longclip_evaluator.py:91-124``:
  same contract with the LongCLIP tokenizer (long-context text),
  output column ``longclip_score``.
- ``ImageVQAScoreEvaluator`` — ``image_vqascore_evaluator.py:13-86``:
  wraps the text in the question template "Does this image match the
  description: {text}? Answer yes or no." (line 63), converts the BLIP
  yes/no losses into a normalized yes-probability; same 0.0-on-missing
  rules; output column ``vqa_score``.

Ray-Data-native mapping: each evaluator is an actor-pool callable
(model load once per actor in ``__init__``, batched forward per block).
No model weights exist in this sandbox, so the backend is an md5 stub —
p = first 32 md5 bits of ``image_key + chr(31) + model_input`` over
2^32 (exact in float64), where ``model_input`` is the raw text for the
CLIP ops and the filled question template for VQAScore — which DuckDB
recomputes bit-for-bit, so all three queries carry full SQL oracles.
Image existence uses the shared every-31st-missing stub probe
(stages/nsfw.stub_image_meta convention).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.stages.nsfw import _u32

VQA_TEMPLATE = "Does this image match the description: {}? Answer yes or no."


class PairScoreBackend:
    """(image, text) -> score in [0, 1]; constructed once per pool
    actor. A real implementation loads CLIP / LongCLIP / BLIP here."""

    def scores(self, image_keys, model_inputs) -> np.ndarray:
        raise NotImplementedError


class StubPairScorer(PairScoreBackend):
    """p = md5-u32(key + chr(31) + model_input + chr(31) + op) / 2^32 —
    the op salt keeps the three models' scores distinct for identical
    inputs."""

    def __init__(self, op: str = "clip"):
        self.op = op

    def scores(self, image_keys, model_inputs):
        return np.fromiter(
            (
                _u32(str(k), t + "\x1f" + self.op) / 4294967296.0
                for k, t in zip(image_keys, model_inputs)
            ),
            dtype=np.float64,
            count=len(model_inputs),
        )


class ClipFamilyEvaluator:
    """Actor-pool callable emitting (id, <score_col>) for every row —
    non-destructive, the reference evaluators never drop rows."""

    def __init__(self, score_col: str, id_col: str = "doc_id",
                 text_col: str = "text", image_key_col: str = "image_key",
                 template: str | None = None, backend_cls=StubPairScorer,
                 backend_kwargs=None):
        self.backend = backend_cls(**(backend_kwargs or {}))  # once per actor
        self.score_col = score_col
        self.id_col = id_col
        self.text_col = text_col
        self.image_key_col = image_key_col
        self.template = template

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = ["" if pd.isna(v) else str(v) for v in batch[self.text_col]]
        keys = batch[self.image_key_col].tolist()
        inputs = [self.template.format(t) if self.template else t for t in texts]
        scores = self.backend.scores(keys, inputs)
        # 0.0 on failed load (STUB_MISSING_MOD probe / missing key) or
        # empty text — image_clip_evaluator.py:60-66
        from dataflow_mm_ray.stages.nsfw import STUB_MISSING_MOD

        ok = np.array(
            [
                k is not None and not (isinstance(k, float) and np.isnan(k))
                and _u32(str(k), "exists") % STUB_MISSING_MOD != 0 and bool(t.strip())
                for k, t in zip(keys, texts)
            ]
        )
        out = batch[[self.id_col]].copy(deep=False)
        out[self.score_col] = np.where(ok, scores, 0.0)
        return out


def clip_family_eval(ds, score_col: str, template: str | None = None,
                     concurrency=(1, 2), batch_size: int = 4096, **kwargs):
    return ds.map_batches(
        ClipFamilyEvaluator,
        fn_constructor_kwargs=dict(score_col=score_col, template=template, **kwargs),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
