"""The serving layer: model/LLM backends as actor-pool stages.

Reference shape (``dataflow/core/LLMServing.py:5-27`` ABC;
``dataflow/serving/api_llm_serving_request.py`` thread-pool API client;
``dataflow/serving/local_model_llm_serving.py`` vLLM engine loaded once
per process): a serving object exposes ``generate_from_input(prompts)``
and is expensive to construct.

Ray-Data-native mapping: the serving is built ONCE per actor in the
pool (``map_batches(cls, concurrency=N)`` — the reference's
process-pool-with-initializer pattern, ``audio_ctc...evaluator.py:46-53``);
each call handles one Arrow batch of prompts. The reference's single
global ThreadPoolExecutor with ``max_workers`` becomes ``concurrency``
actors x in-actor batching, and its None-on-error rows
(``api_llm_serving_request.py:71-75``) become an explicit ``error``
column (deterministic, resumable).

No model weights or network exist in this sandbox, so the shipped
backends are deterministic stubs with the real actor-pool plumbing;
a real backend only needs to subclass ``ServingBackend``.
"""
from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd

from dataflow_mm_ray.schema import DEFAULT_BATCH_SIZE


class ServingBackend:
    """Subclass and override ``generate``; construction happens once
    per pool actor."""

    def generate(self, prompts: Sequence[str]) -> list[str]:
        raise NotImplementedError


class DeterministicStubServing(ServingBackend):
    """Echo-digest stub: answer = 'ans-' + md5(system_prompt + prompt).
    SQL-expressible, so generator pipelines keep a DuckDB oracle."""

    def __init__(self, system_prompt: str = ""):
        self.system_prompt = system_prompt

    def generate(self, prompts: Sequence[str]) -> list[str]:
        return [
            "ans-" + hashlib.md5((self.system_prompt + str(p)).encode("utf-8")).hexdigest()
            for p in prompts
        ]


class PromptedGenerator:
    """Actor-pool callable reproducing ``PromptedQAGenerator``
    (``dataflow/operators/core_text/generate/prompted_qa_generator.py:44-84``):
    NaN prompts -> "" (lines 69-71), one answer column appended."""

    def __init__(self, backend_cls=DeterministicStubServing, backend_kwargs=None,
                 input_key: str = "prompt", output_key: str = "answer"):
        self.serving = backend_cls(**(backend_kwargs or {}))  # once per actor
        self.input_key = input_key
        self.output_key = output_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        prompts = [str(p) if pd.notna(p) else "" for p in batch[self.input_key]]
        answers, errors = self._generate_safe(prompts)
        batch = batch.copy(deep=False)
        batch[self.output_key] = answers
        if errors is not None:
            batch[self.output_key + "_error"] = errors
        return batch

    def _generate_safe(self, prompts):
        """Batch-first generation with per-row error quarantine: if the
        batch call raises, retry row-by-row and record per-row errors
        (the reference's None-on-error rows,
        api_llm_serving_request.py:71-75, made explicit)."""
        try:
            return np.array(self.serving.generate(prompts), dtype=object), None
        except Exception:
            answers = np.empty(len(prompts), dtype=object)
            errors = np.empty(len(prompts), dtype=object)
            for i, p in enumerate(prompts):
                try:
                    answers[i] = self.serving.generate([p])[0]
                    errors[i] = None
                except Exception as e:  # noqa: BLE001 - quarantining
                    answers[i] = None
                    errors[i] = f"{type(e).__name__}: {e}"
            return answers, errors


class APIServingBackend(ServingBackend):
    """The reference's OpenAI-style HTTP client semantics
    (``api_llm_serving_request.py``), reimplemented as a real
    ``ServingBackend`` — pure-CPU logic testable against a local HTTP
    stub (tests/test_serving_api.py); only the endpoint URL changes in
    production.

    Reproduced exactly:
    - key from a NAMED env var; missing key raises ValueError at
      construction (lines 27-31);
    - thread-pool fan-out of one POST per prompt with ORDER-RESTORED
      results — futures complete in any order, each carries its input
      index, ``responses[id] = result`` (lines 108-126);
    - None-on-error rows: non-200 status or any exception yields None
      for that prompt only (lines 101-107,71-75);
    - ``format_response`` (lines 34-48): content already shaped
      ``<think>...</think>...<answer>...</answer>`` passes through;
      else a non-empty ``reasoning_content`` wraps both as
      ``<think>r</think>\\n<answer>c</answer>``; else raw content.
    """

    def __init__(self, api_url: str, key_name_of_api_key: str = "DF_API_KEY",
                 model_name: str = "gpt-4o", max_workers: int = 10,
                 system_prompt: str = "You are a helpful assistant",
                 timeout_s: float = 1800.0):
        import os

        self.api_url = api_url
        self.model_name = model_name
        self.max_workers = max_workers
        self.system_prompt = system_prompt
        self.timeout_s = timeout_s
        self.api_key = os.environ.get(key_name_of_api_key)
        if self.api_key is None:
            raise ValueError(
                f"Lack of `{key_name_of_api_key}` in environment variables."
            )

    @staticmethod
    def format_response(response: dict) -> str:
        import re

        content = response["choices"][0]["message"]["content"]
        if re.search(r"<think>.*</think>.*<answer>.*</answer>", content):
            return content
        try:
            reasoning = response["choices"][0]["message"]["reasoning_content"]
        except Exception:
            reasoning = ""
        if reasoning != "":
            return f"<think>{reasoning}</think>\n<answer>{content}</answer>"
        return content

    def _chat_with_id(self, idx: int, prompt: str):
        import json

        import requests

        try:
            payload = json.dumps(
                {
                    "model": self.model_name,
                    "messages": [
                        {"role": "system", "content": self.system_prompt},
                        {"role": "user", "content": prompt},
                    ],
                }
            )
            headers = {
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            }
            resp = requests.post(
                self.api_url, headers=headers, data=payload, timeout=self.timeout_s
            )
            if resp.status_code == 200:
                return idx, self.format_response(resp.json())
            return idx, None
        except Exception:
            return idx, None

    def generate(self, prompts: Sequence[str]) -> list:
        from concurrent.futures import ThreadPoolExecutor, as_completed

        responses: list = [None] * len(prompts)
        with ThreadPoolExecutor(max_workers=self.max_workers) as executor:
            futures = [
                executor.submit(self._chat_with_id, i, p)
                for i, p in enumerate(prompts)
            ]
            for fut in as_completed(futures):
                idx, result = fut.result()
                responses[idx] = result
        return responses


class StubJudgeServing(ServingBackend):
    """Deterministic Yes/No judge stub (the shape VLM judge backends
    take in ``visual_grounding_refiner.py:122-128``): 'Yes, it is.' when
    the first nibble of md5(system + prompt) is < 8, else 'No.' —
    SQL-expressible, so refine pipelines keep a DuckDB oracle."""

    def __init__(self, system_prompt: str = ""):
        self.system_prompt = system_prompt

    def generate(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            h = hashlib.md5((self.system_prompt + str(p)).encode("utf-8")).hexdigest()
            out.append("Yes, it is." if int(h[0], 16) < 8 else "No.")
        return out


class StubMCQServing(ServingBackend):
    """Deterministic MCQ stub: 'Answer: <letter>' with the letter chosen
    by the first nibble of md5(system + prompt) mod n_letters — the
    answer distribution a real VLM would produce, collapsed to a
    SQL-expressible rule (``visual_dependency_refiner.py:166-183``)."""

    def __init__(self, system_prompt: str = "", n_letters: int = 4):
        self.system_prompt = system_prompt
        self.n_letters = n_letters

    def generate(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            h = hashlib.md5((self.system_prompt + str(p)).encode("utf-8")).hexdigest()
            out.append("Answer: " + "ABCDEF"[int(h[0], 16) % self.n_letters])
        return out


class StubBBoxServing(ServingBackend):
    """Deterministic visual-grounding stub (``vlm_bbox_generator.py:
    134-141`` response shape): 'not found' when the first nibble of
    md5(system + prompt) is 15, else one '(x1, y1), (x2, y2)' box whose
    per-mille coordinates derive from hash nibbles 2-9 (each coordinate
    ``(hi*16 + lo) * 3 / 1000`` — exactly reproducible in SQL)."""

    def __init__(self, system_prompt: str = ""):
        self.system_prompt = system_prompt

    def generate(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            h = hashlib.md5((self.system_prompt + str(p)).encode("utf-8")).hexdigest()
            if int(h[0], 16) == 15:
                out.append("The object was not found in the image.")
                continue
            n = [(int(h[1 + 2 * k], 16) * 16 + int(h[2 + 2 * k], 16)) * 3 for k in range(4)]
            out.append(
                "(0.%03d, 0.%03d), (0.%03d, 0.%03d)" % (n[0], n[1], n[2], n[3])
            )
        return out


def build_prompt(template: str, need_fields, join_list_with: str = "\n", **kwargs) -> str:
    """``NamedPlaceholderPromptTemplate.build_prompt``
    (``dataflow/prompts/prompt_template.py:20-57``): missing fields ->
    "", list/tuple values joined with ``join_list_with``."""
    values = {}
    for key in need_fields:
        v = kwargs.get(key, "")
        if isinstance(v, (list, tuple)):
            v = join_list_with.join(str(x) for x in v)
        else:
            v = str(v)
        values[key] = v
    return template.format(**values)


class TemplatedGenerator(PromptedGenerator):
    """``PromptTemplatedQAGenerator``: fill {field} placeholders from
    mapped columns, then generate."""

    def __init__(self, template: str, field_map: dict[str, str],
                 backend_cls=DeterministicStubServing, backend_kwargs=None,
                 output_key: str = "answer", join_list_with: str = "\n"):
        super().__init__(backend_cls, backend_kwargs, output_key=output_key)
        self.template = template
        self.field_map = field_map  # placeholder -> column
        self.join_list_with = join_list_with

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        need = list(self.field_map)
        cols = [batch[col].to_numpy() for col in self.field_map.values()]
        has_lists = any(
            isinstance(v, (list, tuple, np.ndarray)) for c in cols for v in c
        )
        import string

        parts = list(string.Formatter().parse(self.template))
        fields = {f for _, f, _, _ in parts if f is not None}
        # the vectorized path only handles plain {name} placeholders —
        # any format spec or conversion falls back to build_prompt so
        # its behavior (including errors) is identical per row
        plain = all((spec in (None, "")) and conv is None for _, f, spec, conv in parts
                    if f is not None)
        if not has_lists and plain and fields <= set(need):
            # vectorized prompt assembly: split the template once, then
            # one string-Series concatenation per placeholder — no
            # per-row iteration in the hot path
            out = pd.Series(np.full(len(batch), "", dtype=object))
            vals = dict(zip(need, cols))
            for literal, field, _spec, _conv in parts:
                out = out + literal
                if field is not None:
                    out = out + pd.Series(vals[field]).astype(str).to_numpy()
            prompts = out.tolist()
        else:
            # list-valued fields: per-row join semantics (rare path)
            prompts = [
                build_prompt(self.template, need, self.join_list_with,
                             **dict(zip(need, vs)))
                for vs in zip(*cols)
            ]
        answers, errors = self._generate_safe(prompts)
        batch = batch.copy(deep=False)
        batch[self.output_key] = answers
        if errors is not None:
            batch[self.output_key + "_error"] = errors
        return batch


def prompted_qa(ds, backend_cls=DeterministicStubServing, backend_kwargs=None,
                input_key: str = "prompt", output_key: str = "answer",
                concurrency=(1, 4), batch_size: int = DEFAULT_BATCH_SIZE):
    """The generator stage: an actor pool holding the serving.

    ``concurrency`` defaults to an autoscaling (1, 4) pool so the
    stage never reserves every CPU and starves its upstream read —
    size it to the node for real model backends."""
    return ds.map_batches(
        PromptedGenerator,
        fn_constructor_kwargs={
            "backend_cls": backend_cls,
            "backend_kwargs": backend_kwargs,
            "input_key": input_key,
            "output_key": output_key,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def templated_qa(ds, template: str, field_map: dict[str, str],
                 backend_cls=DeterministicStubServing, backend_kwargs=None,
                 output_key: str = "answer", concurrency=(1, 4),
                 batch_size: int = DEFAULT_BATCH_SIZE):
    return ds.map_batches(
        TemplatedGenerator,
        fn_constructor_kwargs={
            "template": template,
            "field_map": field_map,
            "backend_cls": backend_cls,
            "backend_kwargs": backend_kwargs,
            "output_key": output_key,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class Text2ImageBackend:
    """Diffusers-shaped text->image serving (``dataflow/serving``'s
    image-gen servings; ``dataflow/io/core_io/image_gen.py:26-50`` save
    layout). Construction (pipeline load) happens once per pool actor."""

    def generate_images(self, prompts: Sequence[str]) -> list[bytes]:
        raise NotImplementedError


class StubT2IServing(Text2ImageBackend):
    """Deterministic stand-in for a diffusers pipeline: the 'image' is a
    1 KiB payload derived from md5(prompt) — enough to exercise byte
    plumbing, sinks and manifests with SQL-expressible digests."""

    def generate_images(self, prompts: Sequence[str]) -> list[bytes]:
        return [hashlib.md5(str(p).encode("utf-8")).digest() * 64 for p in prompts]


class T2IGenerator:
    """Actor-pool callable reproducing ``PromptedImageGenerator``
    (``prompted_image_generator.py:30-95``): one image per non-empty
    prompt; emits the generated bytes plus manifest columns
    (``image_gen.py:33-41`` sanitized naming: non-alnum runs -> '_',
    strip '_', first 120 chars, '<safe>/<safe>_<idx>.png')."""

    def __init__(self, backend_cls=StubT2IServing, backend_kwargs=None,
                 prompt_key: str = "prompt", bytes_key: str = "image_bytes"):
        self.serving = backend_cls(**(backend_kwargs or {}))  # once per actor
        self.prompt_key = prompt_key
        self.bytes_key = bytes_key

    @staticmethod
    def safe_name(prompt: str) -> str:
        # Reference-exact sanitization (image_gen.py:33-40) — and its
        # reference-exact hazard: prompts sanitizing to the same string
        # ("a.b" vs "a b", or long shared 120-char prefixes) share one
        # rel_path and the later save overwrites the earlier, exactly
        # as the reference's {prompt_safe}/{prompt_safe}_{idx}.png does.
        # Parity beats fixing here; dedupe prompts upstream if needed.
        import re

        return re.sub(r"[^0-9a-zA-Z]+", "_", prompt).strip("_")[:120]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        prompts = [str(p) for p in batch[self.prompt_key]]
        images = self.serving.generate_images(prompts)
        safe = [self.safe_name(p) for p in prompts]
        out = batch.copy(deep=False)
        out[self.bytes_key] = images
        out["rel_path"] = [f"{s}/{s}_0.png" for s in safe]
        out["img_md5"] = [hashlib.md5(p.encode("utf-8")).hexdigest() for p in prompts]
        out["n_bytes"] = np.int64(1024)
        return out


def resolve_media_path(path: str, base_dir: str) -> str:
    """``PromptedImageEditGenerator._resolve_image_path``
    (``prompted_image_edit_generator.py:31-39``): absolute paths pass
    through, relative ones are normpath-joined to the dataset's base
    directory."""
    import os

    if os.path.isabs(path):
        return path
    return os.path.normpath(os.path.join(base_dir, path))


class ImageEditGenerator:
    """Actor-pool callable for ``PromptedImageEditGenerator``
    (``prompted_image_edit_generator.py:52-184``): one edited image per
    (source image, instruction) pair. The stub backend derives the
    edited payload from md5(rel_path + chr(31) + instruction) — keyed on
    the canonical RELATIVE path so outputs (and resume decisions) are
    mount-independent."""

    def __init__(self, backend_cls=StubT2IServing, backend_kwargs=None,
                 image_key: str = "src_rel", instruction_key: str = "instruction"):
        self.serving = backend_cls(**(backend_kwargs or {}))  # once per actor
        self.image_key = image_key
        self.instruction_key = instruction_key

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keys = [
            f"{p}\x1f{i}"
            for p, i in zip(batch[self.image_key], batch[self.instruction_key])
        ]
        out = batch.copy(deep=False)
        out["edited_bytes"] = self.serving.generate_images(keys)
        out["edit_md5"] = [hashlib.md5(k.encode("utf-8")).hexdigest() for k in keys]
        out["n_bytes"] = np.int64(1024)
        return out


# ``VideoCOTQAGeneratorPrompt`` (dataflow/prompts/video.py:57-86): the
# CoT body appended after the question, plus type-specific suffixes.
COT_PROMPT_BODY = (
    "Please think about this question as if you were a human pondering deeply. "
    "Engage in an internal dialogue using expressions such as 'let me think', 'wait', 'Hmm', "
    "'oh, I see', 'let's break it down', etc, or other natural language thought expressions "
    "It's encouraged to include self-reflection or verification in the reasoning process. "
    "Provide your detailed reasoning between the <think> and </think> tags, and then give your "
    "final answer between the <answer> and </answer> tags."
)

COT_TYPE_TEMPLATE = {
    "multiple choice": " Please provide only the single option letter (e.g., A, B, C, D, etc.) within the <answer> </answer> tags.",
    "numerical": " Please provide the numerical value (e.g., 42 or 3.14) within the <answer> </answer> tags.",
    "OCR": " Please transcribe text from the image/video clearly and provide your text answer within the <answer> </answer> tags.",
    "free-form": " Please provide your text answer within the <answer> </answer> tags.",
    "regression": " Please provide the numerical value (e.g., 42 or 3.14) within the <answer> </answer> tags.",
}


class StubCoTServing(ServingBackend):
    """Deterministic CoT stub: a <think>/<answer>-structured response
    derived from md5(prompt), with padding whitespace so the extraction
    regexes' \\s* strip is exercised."""

    def generate(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            h = hashlib.md5(str(p).encode("utf-8")).hexdigest()
            out.append(
                f"<think> thinking about {h[:8]} </think>\n<answer> {h[8:16]} </answer>"
            )
        return out


import re as _re

_THINK_RE = _re.compile(r"<think>\s*(.*?)\s*</think>", _re.DOTALL)
_ANSWER_RE = _re.compile(r"<answer>\s*(.*?)\s*</answer>", _re.DOTALL)


def extract_think(output_str: str) -> str:
    """``VideoCOTQAGenerator.extract_think`` (video_cotqa_generator.py:
    85-91): content between <think> tags, '' when absent."""
    m = _THINK_RE.search(output_str or "")
    return m.group(1).strip() if m else ""


def extract_answer(text: str) -> str:
    """``VideoCOTQAGenerator.extract_answer`` (video_cotqa_generator.py:
    93-99)."""
    m = _ANSWER_RE.search(text or "")
    return m.group(1).strip() if m else ""
