"""OpenAI-style VLM API client semantics, reimplemented pure-CPU.

Reference: ``dataflow/serving/api_vlm_serving_openai.py``
(APIVLMServing_openai). Everything here except the HTTP round-trip is
deterministic client logic — data-URL message construction, base64
media encoding, MIME/format guessing, multi-image canvas layout,
thread-pool fan-out with order-restored results — so it is implemented
for real and tested against a local HTTP stub
(tests/test_serving_vlm.py); only the endpoint URL changes in
production.

Reproduced exactly:

- key from a NAMED env var; missing key raises ``EnvironmentError`` at
  construction (reference lines 49-52 — note the text-LLM client in
  ``serving.APIServingBackend`` raises ``ValueError``; the two
  reference classes genuinely differ here);
- per-request error contract: any exception yields the STRING
  ``"Error: <msg>"`` for that row (lines 666-668, 866-868) — unlike
  the text client's None-on-error;
- content ordering inside one user message: images, then videos, then
  audios, then the text prompt LAST (lines 566-616);
- ext→MIME rules of the content builder: jpg/jpeg→jpeg, png→png,
  webp→webp, anything else DEFAULTS to jpeg (lines 574-585); the
  single-image chat path is stricter and raises on non-jpeg/png
  (lines 61-83, ``image_mime_strict``);
- audio format guess: wav/mp3/m4a/ogg/webm/flac/aac pass through,
  mpeg/mpga→mp3, mp4→mp4, unknown→wav (lines 532-549);
- video data-URLs are always ``data:video/mp4`` regardless of ext
  (lines 597-601);
- scalar-or-list normalization of per-sample media inputs
  (lines 718-731);
- conversation mode: system prompt first, then history verbatim,
  multimodal content attached ONLY to the final user turn
  (lines 741-830). Divergence, on purpose: the reference's audio
  branch appends to the text string instead of the content list
  (line 816 ``content.append`` where ``content`` is a str), so every
  conversation request with audio errors out; we attach audio to the
  message content as the surrounding code plainly intends;
- markdown-image extraction from a generation response: the
  ``![...](data:image/<fmt>;base64,...)`` regex and per-match
  decode-or-skip (lines 340-357; the URL-download half is
  network-bound and omitted);
- ``combine_images_to_base64`` canvas math (lines 85-182):
  horizontal/vertical concat at native size, ``grid`` on a 1024×1024
  white canvas with 40px padding, ceil-sqrt columns, aspect-preserving
  LANCZOS fit, centered paste; final half-size resize and PNG round-
  trip. PIL-gated like the rest of the image stack.
"""
from __future__ import annotations

import base64
import math
import os
import re
from typing import Any, Sequence

from .serving import ServingBackend

_IMAGE_MIME = {"jpg": "jpeg", "jpeg": "jpeg", "png": "png", "webp": "webp"}
_AUDIO_FORMATS = {"wav", "mp3", "m4a", "ogg", "webm", "flac", "aac"}

_MD_IMAGE_RE = re.compile(
    r"!\[.*?\]\(data:image/(png|jpg|jpeg|gif|bmp);base64,([A-Za-z0-9+/=]+)\)"
)
_B64_RE = re.compile(r"^[A-Za-z0-9+/]*={0,2}$")


def encode_file_base64(path: str) -> str:
    """Raw file bytes → base64 string (reference lines 502-530: the
    image/video/audio encoders are byte-identical)."""
    with open(path, "rb") as f:
        return base64.b64encode(f.read()).decode("utf-8")


def image_mime(path: str) -> str:
    """Content-builder MIME rule (lines 574-585): unknown exts default
    to jpeg rather than erroring."""
    ext = path.rsplit(".", 1)[-1].lower()
    return _IMAGE_MIME.get(ext, "jpeg")


def image_mime_strict(path: str) -> str:
    """Single-image chat rule (lines 61-83): only jpg/jpeg/png allowed."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext in ("jpg", "jpeg"):
        return "jpeg"
    if ext == "png":
        return "png"
    raise ValueError(f"Unsupported image format: {ext}")


def guess_audio_format(path: str) -> str:
    """input_audio.format guess (lines 532-549)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext in _AUDIO_FORMATS:
        return ext
    if ext in ("mpeg", "mpga"):
        return "mp3"
    if ext == "mp4":
        return "mp4"
    return "wav"


def is_base64(s: Any) -> bool:
    """Validity probe (lines 328-338)."""
    try:
        if isinstance(s, str):
            s = s.strip()
            if _B64_RE.match(s):
                base64.b64decode(s)
                return True
        return False
    except Exception:
        return False


def extract_markdown_images(content: str) -> list[bytes]:
    """Decode every ``![..](data:image/..;base64,..)`` match in a
    generation response to raw bytes, skipping undecodable matches
    (lines 340-357; the URL-fetch half is network-bound and omitted)."""
    out: list[bytes] = []
    for _fmt, b64 in _MD_IMAGE_RE.findall(content or ""):
        try:
            out.append(base64.b64decode(b64))
        except Exception:
            continue
    return out


def build_message_content(
    prompt: str,
    image_paths: Sequence[str] | None = None,
    video_paths: Sequence[str] | None = None,
    audio_paths: Sequence[str] | None = None,
) -> list[dict]:
    """One user message's content list: images → videos → audios →
    text, each media item a base64 data-URL (lines 551-617). Falsy
    paths inside a list are skipped (``if image_path:``)."""
    content: list[dict] = []
    for p in image_paths or []:
        if p:
            content.append({
                "type": "image_url",
                "image_url": {
                    "url": f"data:image/{image_mime(p)};base64,{encode_file_base64(p)}"
                },
            })
    for p in video_paths or []:
        if p:
            content.append({
                "type": "video_url",
                "video_url": {
                    "url": f"data:video/mp4;base64,{encode_file_base64(p)}"
                },
            })
    for p in audio_paths or []:
        if p:
            content.append({
                "type": "audio_url",
                "audio_url": {
                    "url": f"data:audio/{guess_audio_format(p)};base64,{encode_file_base64(p)}"
                },
            })
    content.append({"type": "text", "text": prompt})
    return content


def build_messages_from_conversation(
    conversation: Sequence[dict],
    image_paths: Sequence[str] | None = None,
    video_paths: Sequence[str] | None = None,
    audio_paths: Sequence[str] | None = None,
    system_prompt: str = "You are a helpful assistant.",
) -> list[dict]:
    """Conversation history → messages; media attaches to the final
    user turn via the reference's VALUE-equality is-last test
    (``turn == conversation[-1]``, line 771) — so an earlier user turn
    that is dict-equal to the last one (e.g. two identical 'continue'
    messages) also gets the media, exactly as the reference does.
    Audio is attached to the content list (intended behavior; the
    reference's line-816 str-append bug is not reproduced)."""
    messages: list[dict] = []
    if system_prompt:
        messages.append({"role": "system", "content": system_prompt})
    last = conversation[-1] if len(conversation) else None
    for turn in conversation:
        role = turn.get("role", "user")
        text = turn.get("content", "")
        if role == "user" and turn == last:
            messages.append({
                "role": role,
                "content": build_message_content(
                    text, image_paths, video_paths, audio_paths
                ),
            })
        else:
            messages.append({"role": role, "content": text})
    return messages


def _as_path_list(inputs, idx: int):
    """Per-sample scalar-or-list normalization (lines 718-731)."""
    if inputs is None or idx >= len(inputs) or inputs[idx] is None:
        return None
    v = inputs[idx]
    return v if isinstance(v, list) else [v]


def combine_images_to_base64(image_paths: Sequence[str], mode: str = "horizontal") -> str:
    """Multi-image canvas combine (lines 85-182). PIL-gated: raises
    ImportError where PIL is absent (tests skip, same gate as
    ImageDecoder's real branch)."""
    from io import BytesIO

    from PIL import Image

    images = [Image.open(p) for p in image_paths]
    if mode == "horizontal":
        width = sum(im.width for im in images)
        height = max(im.height for im in images)
        combined = Image.new("RGB", (width, height))
        off = 0
        for im in images:
            combined.paste(im, (off, 0))
            off += im.width
    elif mode == "vertical":
        width = max(im.width for im in images)
        height = sum(im.height for im in images)
        combined = Image.new("RGB", (width, height))
        off = 0
        for im in images:
            combined.paste(im, (0, off))
            off += im.height
    elif mode == "grid":
        canvas_size, padding = 1024, 40
        combined = Image.new("RGB", (canvas_size, canvas_size), (255, 255, 255))
        n = len(images)
        cols = math.ceil(math.sqrt(n))
        rows = math.ceil(n / cols)
        cell_w = (canvas_size - padding * (cols + 1)) // cols
        cell_h = (canvas_size - padding * (rows + 1)) // rows
        idx = 0
        for r in range(rows):
            for c in range(cols):
                if idx >= n:
                    break
                x = padding + c * (cell_w + padding)
                y = padding + r * (cell_h + padding)
                im = images[idx]
                w, h = im.size
                scale = min(cell_w / w, cell_h / h)
                resized = im.resize(
                    (int(w * scale), int(h * scale)), Image.Resampling.LANCZOS
                )
                pos = (x + (cell_w - resized.width) // 2,
                       y + (cell_h - resized.height) // 2)
                if resized.mode == "RGBA":
                    combined.paste(resized, pos, resized)
                else:
                    combined.paste(resized, pos)
                idx += 1
    else:
        raise ValueError("Mode must be 'horizontal', 'vertical', or 'combine'.")
    combined = combined.resize(
        (combined.width // 2, combined.height // 2), Image.Resampling.LANCZOS
    )
    buf = BytesIO()
    combined.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("utf-8")


class VLMServingBackend(ServingBackend):
    """The reference VLM client as a ``ServingBackend``: data-URL
    message construction + thread-pool fan-out with order-restored
    results + ``"Error: .."`` string rows on failure. The transport is
    a plain OpenAI-compatible chat-completions POST, so a local HTTP
    stub exercises the full path."""

    def __init__(self, api_url: str, key_name_of_api_key: str = "DF_API_KEY",
                 model_name: str = "o4-mini", max_workers: int = 10,
                 timeout_s: float = 1800.0):
        self.api_url = api_url
        self.model_name = model_name
        self.max_workers = max_workers
        self.timeout_s = timeout_s
        self.api_key = os.environ.get(key_name_of_api_key)
        if not self.api_key:
            raise EnvironmentError(
                f"Missing environment variable '{key_name_of_api_key}'"
            )

    def _post(self, messages: list[dict]) -> str:
        """One chat-completions round-trip; raises on any failure so
        the caller applies the per-row Error contract."""
        import json as _json

        import requests

        resp = requests.post(
            self.api_url,
            headers={
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
            data=_json.dumps({"model": self.model_name, "messages": messages}),
            timeout=self.timeout_s,
        )
        if resp.status_code != 200:
            raise RuntimeError(f"HTTP {resp.status_code}")
        return resp.json()["choices"][0]["message"]["content"]

    def _send_single_with_id(self, idx, prompt, image_paths, video_paths,
                             audio_paths, system_prompt):
        try:
            messages = [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": build_message_content(
                    prompt, image_paths, video_paths, audio_paths)},
            ]
            return idx, self._post(messages)
        except Exception as e:  # reference lines 666-668
            return idx, f"Error: {str(e)}"

    def _fan_out(self, jobs) -> list:
        from concurrent.futures import ThreadPoolExecutor, as_completed

        results: list = [None] * len(jobs)
        with ThreadPoolExecutor(max_workers=self.max_workers) as ex:
            futs = [ex.submit(fn, *args) for fn, *args in jobs]
            for fut in as_completed(futs):
                idx, text = fut.result()
                results[idx] = text
        return results

    def generate_from_input(
        self,
        user_inputs: Sequence[str],
        system_prompt: str = "You are a helpful assistant.",
        image_inputs=None, video_inputs=None, audio_inputs=None,
    ) -> list:
        """Batch text+media generation (lines 669-739)."""
        return self._fan_out([
            (self._send_single_with_id, i, p,
             _as_path_list(image_inputs, i), _as_path_list(video_inputs, i),
             _as_path_list(audio_inputs, i), system_prompt)
            for i, p in enumerate(user_inputs)
        ])

    def _send_conversation_with_id(self, idx, conversation, image_paths,
                                   video_paths, audio_paths, system_prompt):
        try:
            messages = build_messages_from_conversation(
                conversation, image_paths, video_paths, audio_paths,
                system_prompt)
            return idx, self._post(messages)
        except Exception as e:  # reference lines 866-868
            return idx, f"Error: {str(e)}"

    def generate_from_input_messages(
        self,
        conversations: Sequence[Sequence[dict]],
        image_list=None, video_list=None, audio_list=None,
        system_prompt: str = "You are a helpful assistant.",
    ) -> list:
        """Batch conversation-history generation (lines 869-930)."""
        return self._fan_out([
            (self._send_conversation_with_id, i, conv,
             _as_path_list(image_list, i), _as_path_list(video_list, i),
             _as_path_list(audio_list, i), system_prompt)
            for i, conv in enumerate(conversations)
        ])

    def generate(self, prompts: Sequence[str]) -> list:
        """ServingBackend interface: pure-text batch."""
        return self.generate_from_input(list(prompts))
