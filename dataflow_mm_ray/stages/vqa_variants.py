"""The §2.4 VQA prompt-variant generators, one actor-pool stage each.

Every class below is a ``map_batches`` callable whose serving backend is
constructed once per pool actor; the reference's global flatten →
batch-infer → unflatten loops become per-batch (rows are independent,
results identical). All prompt assembly is reference-exact for the
local-serving branch (ShareGPT ``<image>``-token injection); the stub
backends keep each pipeline SQL-oracle-able.

- ``FixPromptedVQA``   — fix_prompted_vqa_generator.py:46-132
- ``TemplatedVQA``     — prompt_templated_vqa_generator.py:63-176
- ``BatchVQA``         — batch_vqa_generator.py:61-132
- ``VLMBBox``          — vlm_bbox_generator.py:74-167
- ``VisualReasoning``  — visual_reasoning_generator.py:53-140
- PersQA prompt kernel — personalized_qa_generator.py:93-229
"""
from __future__ import annotations

import hashlib
import json
import re

import numpy as np
import pandas as pd

from dataflow_mm_ray.serving import (
    DeterministicStubServing,
    StubBBoxServing,
    build_prompt,
)
from dataflow_mm_ray.stages.refiners import _as_path_list


class FixPromptedVQA:
    """Fixed system+user prompt over a media column
    (fix_prompted_vqa_generator.py:89-117, image branch, local mode):
    content = '<image>' * n_valid_paths + user_prompt."""

    def __init__(self, user_prompt: str = "Please caption the media in detail.",
                 system_prompt: str = "You are a helpful assistant.",
                 backend_cls=DeterministicStubServing,
                 image_key: str = "image", output_key: str = "answer"):
        self.serving = backend_cls(system_prompt)  # once per actor
        self.user_prompt = user_prompt
        self.image_key = image_key
        self.output_key = output_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        prompts = []
        for img in batch[self.image_key]:
            paths = _as_path_list(img)
            n_valid = len([p for p in paths if p])
            prompts.append("<image>" * n_valid + self.user_prompt)
        out = batch.copy(deep=False)
        out[self.output_key] = np.array(self.serving.generate(prompts), dtype=object)
        return out


class TemplatedVQA:
    """Template-filled prompt + media tokens
    (prompt_templated_vqa_generator.py:94-149, image branch, local
    mode): prompt = build_prompt(template, fields); content =
    '<image>'*n + '\\n' + prompt when the row has media, bare prompt
    otherwise."""

    def __init__(self, template: str, field_map: dict[str, str],
                 system_prompt: str = "You are a helpful assistant.",
                 backend_cls=DeterministicStubServing,
                 image_key: str = "image", output_key: str = "answer"):
        self.serving = backend_cls(system_prompt)
        self.template = template
        self.field_map = field_map
        self.image_key = image_key
        self.output_key = output_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        need = list(self.field_map)
        cols = [batch[c].to_numpy() for c in self.field_map.values()]
        prompts = []
        for img, *vals in zip(batch[self.image_key], *cols):
            p = build_prompt(self.template, need, **dict(zip(need, vals)))
            n_valid = len([q for q in _as_path_list(img) if q])
            tokens = "<image>" * n_valid
            prompts.append(f"{tokens}\n{p}" if tokens else p)
        out = batch.copy(deep=False)
        out[self.output_key] = np.array(self.serving.generate(prompts), dtype=object)
        return out


class BatchVQA:
    """One image, many questions (batch_vqa_generator.py:71-128):
    flatten each row's question list to '<image>'*n + q prompts, infer,
    regroup answers back per row (a JSON array string, question
    order)."""

    def __init__(self, system_prompt: str = "You are a helpful assistant.",
                 backend_cls=DeterministicStubServing,
                 questions_key: str = "questions", image_key: str = "image",
                 output_key: str = "answers"):
        self.serving = backend_cls(system_prompt)
        self.questions_key = questions_key
        self.image_key = image_key
        self.output_key = output_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        flat, counts = [], []
        for qs, img in zip(batch[self.questions_key], batch[self.image_key]):
            if not isinstance(qs, (list, np.ndarray)):
                qs = []
            counts.append(len(qs))
            tokens = "<image>" * len(_as_path_list(img))
            flat.extend(tokens + str(q) for q in qs)
        outs = self.serving.generate(flat)
        nested, pos = [], 0
        for c in counts:
            nested.append(json.dumps(outs[pos : pos + c], ensure_ascii=False))
            pos += c
        out = batch.copy(deep=False)
        out[self.output_key] = np.array(nested, dtype=object)
        return out


_BBOX_RE = re.compile(
    r"\(\s*([0-9.]+)\s*,\s*([0-9.]+)\s*\)\s*,\s*\(\s*([0-9.]+)\s*,\s*([0-9.]+)\s*\)"
)


def parse_bbox_logic(text: str) -> list[list[float]]:
    """vlm_bbox_generator.py:18-42: all '(x1, y1), (x2, y2)' matches,
    0-1000 outputs normalized to 0-1, corners min/max-ordered."""
    if not text:
        return []
    bboxes = []
    for m in _BBOX_RE.finditer(text):
        try:
            coords = list(map(float, m.groups()))
        except Exception:
            continue
        x1, y1, x2, y2 = coords
        if any(c > 1.05 for c in coords):
            x1, y1, x2, y2 = x1 / 1000, y1 / 1000, x2 / 1000, y2 / 1000
        x1, x2 = min(x1, x2), max(x1, x2)
        y1, y2 = min(y1, y2), max(y1, y2)
        bboxes.append([x1, y1, x2, y2])
    return bboxes


class VLMBBox:
    """Keyword grounding (vlm_bbox_generator.py:96-167): rows without
    image or keywords are skipped ({} map); keywords are deduplicated —
    the reference's ``list(set(...))`` order is nondeterministic, this
    engine sorts (documented) — each builds 'Detect "<kw>".' with
    '<image>'*n + '\\n' tokens; replies containing 'not found' drop the
    keyword, others parse to at most 3 '[x1, y1, x2, y2]' strings.
    Output: JSON object string keyed by keyword (sorted)."""

    def __init__(self, prompt_template: str = 'Detect "{keyword}".',
                 system_prompt: str = "You are a helpful assistant capable of visual grounding.",
                 backend_cls=StubBBoxServing,
                 kws_key: str = "keywords", image_key: str = "image",
                 output_key: str = "bbox_map"):
        self.serving = backend_cls(system_prompt)
        self.prompt_tmpl = prompt_template
        self.kws_key = kws_key
        self.image_key = image_key
        self.output_key = output_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        flat, rowmap = [], []
        for i, (kws, img) in enumerate(zip(batch[self.kws_key], batch[self.image_key])):
            paths = _as_path_list(img)
            if not isinstance(kws, (list, np.ndarray)) or not paths:
                continue
            unique_kws = sorted({str(k) for k in kws if k})
            tokens = "<image>" * len(paths)
            for kw in unique_kws:
                safe_kw = kw.replace('"', '\\"')
                p = self.prompt_tmpl.format(keyword=safe_kw)
                flat.append(f"{tokens}\n{p}" if tokens else p)
                rowmap.append((i, kw))
        outs = self.serving.generate(flat)
        maps: list[dict] = [{} for _ in range(len(batch))]
        for (i, kw), o in zip(rowmap, outs):
            if not o or "not found" in str(o).lower():
                continue
            boxes = parse_bbox_logic(str(o))
            if boxes:
                maps[i][kw] = [
                    f"[{b[0]:.3f}, {b[1]:.3f}, {b[2]:.3f}, {b[3]:.3f}]" for b in boxes
                ][:3]
        out = batch.copy(deep=False)
        out[self.output_key] = [
            json.dumps(m, ensure_ascii=False, sort_keys=True) for m in maps
        ]
        return out


class VisualReasoning:
    """MCT reasoning chains with fallback
    (visual_reasoning_generator.py:75-135): rows with a non-empty
    cached chain pass through; empty/blank questions yield []; others
    run '<image>'*n + '\\n' + question through the pool. Output: JSON
    array string (the reference's list column)."""

    def __init__(self, system_prompt: str,
                 backend_cls=DeterministicStubServing,
                 question_key: str = "question", image_key: str = "image",
                 cached_key: str | None = "cached", output_key: str = "reasoning"):
        self.serving = backend_cls(system_prompt)
        self.question_key = question_key
        self.image_key = image_key
        self.cached_key = cached_key
        self.output_key = output_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        final: list = [None] * len(batch)
        flat, idxs = [], []
        cached_col = (
            batch[self.cached_key]
            if self.cached_key and self.cached_key in batch.columns
            else [None] * len(batch)
        )
        for i, (q, img, cached) in enumerate(
            zip(batch[self.question_key], batch[self.image_key], cached_col)
        ):
            if isinstance(cached, (list, np.ndarray)) and len(cached) > 0:
                final[i] = [str(c) for c in cached]
                continue
            if not isinstance(q, str) or not q.strip():
                final[i] = []
                continue
            valid = [p for p in _as_path_list(img) if p and isinstance(p, str)]
            tokens = "<image>" * len(valid)
            flat.append(f"{tokens}\n{q}" if tokens else q)
            idxs.append(i)
        outs = self.serving.generate(flat)
        for i, o in zip(idxs, outs):
            final[i] = [o] if o else []
        out = batch.copy(deep=False)
        out[self.output_key] = [
            json.dumps(r if r is not None else [], ensure_ascii=False) for r in final
        ]
        return out


# --- PersQAGenerator (personalized_qa_generator.py) ------------------------

# qa_template["human_qs"] — dataflow/prompts/image.py:50-61 (the match
# set IS the operator's spec; same adjudication as the cn_tn tables)
PERS_HUMAN_QS = [
    "What is <sks> hair color?",
    "What color are <sks> eyes?",
    "Would you describe <sks>'s physique as athletic, slim, or otherwise?",
    "What is <sks> skin tone?",
    "How would you describe <sks> hairstyle?",
    "Does <sks> wear glasses or any accessories?",
    "How would you describe <sks>'s attire?",
    "Does <sks> have any distinctive facial features?",
    "What is <sks> overall build or physique?",
    "What is <sks> general expression or demeanor?",
]

# prompt_template / system_prompt — dataflow/prompts/image.py:64-68
PERS_PROMPT_TEMPLATE = (
    "The name of the main character in the image is <{sks}>. You need to answer "
    "a question about <{sks}>.\nQuestion: {query} Please answer starting with "
    "<{sks}>!\nAnswer: "
)
PERS_SYSTEM_PROMPT = (
    "You are a personal question-answer generator. Your task is to generate a "
    "concise and informative answer for the given question about the main "
    "character in the image. The question should be related to the character's "
    "appearance or attributes, and the answer should be directly related to the "
    "character's features."
)


def pers_qa_kernel(part: pd.DataFrame, sks: str = "mam") -> pd.DataFrame:
    """Per-conversation PersQA prompt assembly
    (personalized_qa_generator.py:93-218, local branch): ShareGPT turns
    (user->human / assistant->gpt, tool turns excluded), query chosen
    from PERS_HUMAN_QS by the first md5(conv_id) nibble mod 10
    (replacing the reference's ``random.choice``), first turn's value
    replaced by the personalized prompt (regardless of role — the
    reference's ``_set_first_user_message`` checks only for a 'value'
    key), '<image>' token prepended when the first turn is human and
    the conversation has an image ('' join + value, line 214). Returns
    (conv_id, query, prompt) — prompt is the flattened 'from: value'
    conversation for the serving pool."""
    rows = []
    for conv, g in part.groupby("conv_id", sort=False):
        qi = int(hashlib.md5(conv.encode("utf-8")).hexdigest()[0], 16) % 10
        query = PERS_HUMAN_QS[qi].replace("<sks>", f"<{sks}>")
        first_value = PERS_PROMPT_TEMPLATE.format(sks=sks, query=query)
        uid = int(conv[5:])
        has_img = uid % 9 != 0
        turns = [
            ("human" if r == "user" else "gpt", t)
            for r, t in zip(g["role"], g["text"])
            if r in ("user", "assistant")
        ]
        lines = []
        for j, (frm, val) in enumerate(turns):
            if j == 0:
                val = first_value
                if frm == "human" and has_img:
                    val = "<image>" + val
            lines.append(f"{frm}: {val}")
        rows.append((conv, query, "\n".join(lines)))
    return pd.DataFrame(rows, columns=["conv_id", "query", "prompt"])
