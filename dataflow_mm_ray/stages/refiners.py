"""Serving-pool refine operators (SURVEY §2 refine family).

Reference semantics reimplemented Ray-Data-first — each operator is a
callable CLASS for ``map_batches(cls, concurrency=(1, n))``: the
serving backend is built once per pool actor, and the reference's
*global* flatten → batch-infer → unflatten loop becomes a *per-batch*
flatten → infer → unflatten (rows are independent, so the result is
identical — and no driver-side collect or extra shuffle ever happens).

- ``GroundingRefiner``   — VisualGroundingRefiner
  (``visual_grounding_refiner.py:64-150``): per-item Yes/No visual
  verification over a text-list column; keeps items whose model reply
  contains 'yes' (case-insensitive).
- ``DependencyRefiner``  — VisualDependencyRefiner
  (``visual_dependency_refiner.py:104-234``): per-MCQ rotate + dual
  visual/text-only blind test; keeps questions with high visual and low
  text-only accuracy. The reference's ``random.shuffle`` option
  permutation is made deterministic as a cyclic rotation (rotation r
  for the visual branch, r+1 mod n for the text branch) so any run —
  and the SQL oracle — reproduces identical keep decisions.
- ``SegCutoutRefiner``   — VisionSegCutoutRefiner
  (``vision_seg_cutout_refiner.py:37-82``): instance-seg cutout; the
  YOLO/cv2 probe is a deterministic stub (no model weights in this
  sandbox) but the path-rewrite semantics, skip branches and the
  optional idempotent media write are real.
"""
from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np
import pandas as pd

from dataflow_mm_ray.serving import StubJudgeServing, StubMCQServing

_LETTERS = "ABCDEF"
_LETTER_RE = re.compile(r"\b([A-Fa-f])\b")
_LETTER_RE2 = re.compile(r"(?:answer|option)\s*[:：]\s*([A-Fa-f])", re.I)


def extract_letter_only(model_out: str) -> str | None:
    """``visual_dependency_refiner.py:53-62``: first standalone A-F
    letter, else an 'answer:'/'option:'-prefixed letter, else None."""
    if not model_out:
        return None
    model_out = str(model_out)
    m = _LETTER_RE.search(model_out)
    if m:
        return m.group(1).upper()
    m2 = _LETTER_RE2.search(model_out)
    if m2:
        return m2.group(1).upper()
    return None


def _as_path_list(img) -> list[str]:
    """``visual_grounding_refiner.py:90-93`` path cleaning: str -> [str],
    falsy/NaN -> []."""
    if isinstance(img, str):
        return [img]
    if isinstance(img, (list, np.ndarray)) and len(img):
        return [p for p in img]
    return []


class GroundingRefiner:
    """Per-item Yes/No visual verification (visual_grounding_refiner.py:
    77-146, local-serving branch): rows with an empty item list or no
    image are skipped (refined = []); each item builds
    ``'<image>'*n + '\\n' + template.format(text=item)``; an item
    survives iff the reply contains 'yes' (line 143). Output is the
    kept items as a JSON array string (original order)."""

    def __init__(self, prompt_template: str,
                 system_prompt: str = "You are a helpful assistant.",
                 backend_cls=StubJudgeServing,
                 items_key: str = "items", image_key: str = "image",
                 output_key: str = "refined"):
        self.serving = backend_cls(system_prompt)  # once per actor
        self.template = prompt_template
        self.items_key = items_key
        self.image_key = image_key
        self.output_key = output_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        flat_prompts: list[str] = []
        rowmap: list[tuple[int, str]] = []
        for i, (items, img) in enumerate(
            zip(batch[self.items_key], batch[self.image_key])
        ):
            paths = _as_path_list(img)
            if not isinstance(items, (list, np.ndarray)) or not len(items) or not paths:
                continue
            img_tokens = "<image>" * len(paths)
            for item in items:
                s = item if isinstance(item, str) else str(item)
                prompt = self.template.format(text=s)
                flat_prompts.append(
                    f"{img_tokens}\n{prompt}" if img_tokens else prompt
                )
                rowmap.append((i, s))
        outs = self.serving.generate(flat_prompts)
        refined: list[list[str]] = [[] for _ in range(len(batch))]
        for (i, s), o in zip(rowmap, outs):
            if o and "yes" in str(o).lower():
                refined[i].append(s)
        out = batch.copy(deep=False)
        out[self.output_key] = [json.dumps(r, ensure_ascii=False) for r in refined]
        return out


def rotate_mcq(texts: list[str], correct_idx: int, r: int, title: str,
               add_none: bool) -> tuple[str, str]:
    """Deterministic stand-in for ``shuffle_options_logic``
    (visual_dependency_refiner.py:20-50): cyclic left-rotation by ``r``
    instead of ``random.shuffle`` — same question layout (title line +
    '   - X) text' option lines + optional 'None of the above'), same
    new-answer-letter bookkeeping, reproducible on any worker."""
    n = len(texts)
    order = [texts[(j + r) % n] for j in range(n)]
    lines = [title] + [f"   - {_LETTERS[j]}) {t}" for j, t in enumerate(order)]
    expected = _LETTERS[(correct_idx - r) % n]
    if add_none:
        lines.append(f"   - {_LETTERS[n]}) None of the above")
    return "\n".join(lines), expected


class DependencyRefiner:
    """Rotate + dual blind test (visual_dependency_refiner.py:104-234):
    for each MCQ of each row with an image, ``rotate_num`` visual
    variants (options rotated by r, 'None of the above' appended) and
    ``rotate_num`` text-only variants (rotated by r+1 mod n, no extra
    option); keep iff v_acc >= pass_visual_min and t_acc <=
    pass_textual_max. Emits one row per evaluated MCQ
    (doc-row key, qa_idx, v_correct, t_correct, keep) — the exploded
    relational form of the reference's nested kept-list."""

    def __init__(self, instruction_template: str, rotate_num: int = 4,
                 pass_visual_min: float = 0.25, pass_textual_max: float = 0.25,
                 system_prompt: str = "You are a helpful assistant.",
                 key_col: str = "doc_id", qas_key: str = "qas",
                 image_key: str = "image", n_options: int = 4):
        self.v_serving = StubMCQServing(system_prompt, n_letters=n_options + 1)
        self.t_serving = StubMCQServing(system_prompt, n_letters=n_options)
        self.template = instruction_template
        self.rotate_num = max(1, rotate_num)
        self.pass_visual_min = pass_visual_min
        self.pass_textual_max = pass_textual_max
        self.key_col = key_col
        self.qas_key = qas_key
        self.image_key = image_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vis_prompts, vis_exp = [], []
        txt_prompts, txt_exp = [], []
        slots: list[tuple] = []  # (key, qa_idx) per evaluated MCQ
        for key, qas, img in zip(
            batch[self.key_col], batch[self.qas_key], batch[self.image_key]
        ):
            paths = _as_path_list(img)
            if not isinstance(qas, (list, np.ndarray)) or not len(qas) or not paths:
                continue
            img_tokens = "<image>" * len(paths)
            for qa_idx, qa in enumerate(qas):
                texts = list(qa["options"])
                n = len(texts)
                # degenerate MCQs would kill the whole map task:
                # 0 options -> ZeroDivisionError in rotate_mcq's % n;
                # > len(_LETTERS)-1 options -> IndexError on the
                # 'None of the above' letter. Skip them (no row out).
                if n == 0 or n > len(_LETTERS) - 1:
                    continue
                ci = int(qa["answer_idx"])
                title = qa["question_title"]
                slots.append((key, qa_idx))
                for r in range(self.rotate_num):
                    q_v, e_v = rotate_mcq(texts, ci, r % n, title, add_none=True)
                    p_v = self.template.format(q_v)
                    vis_prompts.append(f"{img_tokens}\n{p_v}" if img_tokens else p_v)
                    vis_exp.append(e_v)
                    q_t, e_t = rotate_mcq(texts, ci, (r + 1) % n, title, add_none=False)
                    txt_prompts.append(self.template.format(q_t))
                    txt_exp.append(e_t)
        vis_out = self.v_serving.generate(vis_prompts)
        txt_out = self.t_serving.generate(txt_prompts)
        rows = []
        R = self.rotate_num
        for s_i, (key, qa_idx) in enumerate(slots):
            vc = sum(
                extract_letter_only(vis_out[s_i * R + r]) == vis_exp[s_i * R + r]
                for r in range(R)
            )
            tc = sum(
                extract_letter_only(txt_out[s_i * R + r]) == txt_exp[s_i * R + r]
                for r in range(R)
            )
            keep = (vc / R >= self.pass_visual_min) and (tc / R <= self.pass_textual_max)
            rows.append((key, qa_idx, vc, tc, keep))
        return pd.DataFrame(
            rows, columns=[self.key_col, "qa_idx", "v_correct", "t_correct", "keep"]
        ).astype({"qa_idx": np.int32, "v_correct": np.int64,
                  "t_correct": np.int64, "keep": bool})


class SegCutoutRefiner:
    """VisionSegCutoutRefiner (vision_seg_cutout_refiner.py:37-82): per
    image, run the seg model and replace the path column with
    ``<base>_seg.png`` when a cutout was produced; keep the original
    path when the file is missing / unreadable / has no masks (the
    reference's three None returns, lines 42-51).

    The probe is a deterministic stub — a 'file' exists unless its path
    starts with 'missing/', and it 'has masks' iff the first nibble of
    md5(path) < 12 — but the rewrite/skip semantics, the RGBA payload
    layout and the optional idempotent media write are real. Pass
    ``media_dir`` to actually stage the cutout PNGs (atomic tmp+rename
    via stages.multimodal.write_media_files semantics)."""

    def __init__(self, output_suffix: str = "_seg", image_key: str = "image",
                 media_dir: str | None = None):
        self.output_suffix = output_suffix
        self.image_key = image_key
        self.media_dir = media_dir

    def _derive_output_path(self, img_path: str) -> str:
        base, _ = os.path.splitext(img_path)
        return f"{base}{self.output_suffix}.png"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        paths = batch[self.image_key].astype(object)
        new_paths, processed, payloads = [], [], []
        for p in paths:
            if not isinstance(p, str) or p.startswith("missing/"):
                new_paths.append(p)
                processed.append(False)
                payloads.append(None)
                continue
            h = hashlib.md5(p.encode("utf-8")).hexdigest()
            if int(h[0], 16) >= 12:  # no masks -> keep original path
                new_paths.append(p)
                processed.append(False)
                payloads.append(None)
                continue
            new_paths.append(self._derive_output_path(p))
            processed.append(True)
            # stub RGBA cutout payload (deterministic, 1 KiB)
            payloads.append(hashlib.md5(("rgba:" + p).encode("utf-8")).digest() * 64)
        if self.media_dir is not None:
            for rel, data in zip(new_paths, payloads):
                if data is None:
                    continue
                dst = os.path.join(self.media_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                if not os.path.exists(dst):  # idempotent resume
                    tmp = dst + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    os.replace(tmp, dst)
        out = batch.copy(deep=False)
        out[self.image_key] = np.array(new_paths, dtype=object)
        out["processed"] = np.array(processed, dtype=bool)
        return out
