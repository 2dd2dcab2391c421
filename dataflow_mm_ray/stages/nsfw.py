"""Image half of the reference ``RuleBaseFilter`` — basic image checks +
NSFW-classifier threshold — composed with the 15-rule text half so the
engine covers the FULL operator, not just its text rules.

Reference semantics (reimplemented, not copied):

- ``dataflow/operators/core_vision/filter/rule_base_filter.py:204-222``
  (``_check_image_basic``): drop when the image format is outside the
  allowed set {JPEG, PNG, JPG, WEBP, BMP, GIF}, when width/height fall
  outside ``[min_image_*, max_image_*]`` (strict < min / > max), or when
  the aspect ratio ``width / height`` leaves
  ``[min_aspect_ratio, max_aspect_ratio]``.
- ``rule_base_filter.py:225-241`` (``_check_nsfw_content``): run the
  image-classification model; unsafe iff ANY emitted label containing
  ``nsfw`` / ``porn`` / ``explicit`` scores strictly above
  ``nsfw_threshold`` (default 0.5).
- ``rule_base_filter.py:357-378`` (``_filter_sample``): the text rules
  apply only when the text is non-empty after strip; a failed image
  LOAD drops the row; check order is text -> load -> basic -> NSFW.

No classifier weights or real image bytes exist in this sandbox, so the
shipped backend is an md5 stub (first 32 md5 bits of
``key + chr(31) + 'nsfw'`` over 2^32 — exact in float64) and the image
metadata probe (existence, width, height, format) is likewise
md5-derived from the image key. Both are exactly SQL-expressible, so
the composed filter keeps a bit-exact DuckDB oracle
(``queries_text.rule_filter_full``). A real deployment subclasses
``NSFWBackend`` (transformers pipeline loaded once per pool actor in
``__init__``, batched forward in ``scores``) and replaces
``stub_image_meta`` with a PIL probe — the decision rule is unchanged.
"""
from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd

from dataflow_mm_ray.functions.text_rules import rule_flags_batch

# rule_base_filter.py:131 — formats _check_image_basic accepts.
ALLOWED_FORMATS: tuple[str, ...] = ("JPEG", "PNG", "JPG", "WEBP", "BMP", "GIF")
# stub probe rotates through 8 formats so the format gate actually fires
STUB_FORMATS: tuple[str, ...] = ALLOWED_FORMATS + ("TIFF", "SVG")

_SEP = "\x1f"  # chr(31), matching the NLI stub separator

# Every STUB_MISSING_MOD-th md5-selected image key fails to load — the
# ONE definition of the stub missing-image rate. Every consumer (the
# clip-eval and phash stubs, and the DuckDB twins in queries_text /
# queries_ops) imports or formats this constant; a re-assumed literal
# would silently desynchronize engine and oracle (CLAUDE.md twin rule).
STUB_MISSING_MOD = 31

# The synthetic per-row image key every image-keyed query derives from
# the documents table, with its SQL twin expression kept adjacent so
# the convention can only change in one place.
IMAGE_KEY_SQL = "source || '/' || doc_id || '.img'"


def add_image_key(batch: pd.DataFrame) -> pd.DataFrame:
    """documents batch -> + image_key column (None when source is NULL);
    the pandas twin of IMAGE_KEY_SQL."""
    b = batch.copy(deep=False)
    b["image_key"] = b["source"].astype(str) + "/" + b["doc_id"].astype(str) + ".img"
    b.loc[b["source"].isna(), "image_key"] = None
    return b


def _u32(key: str, tag: str) -> int:
    return int(hashlib.md5((key + _SEP + tag).encode("utf-8")).hexdigest()[:8], 16)


def stub_image_meta(keys: Sequence[str]) -> pd.DataFrame:
    """Deterministic stand-in for the PIL open+probe: per image key,
    (exists, width, height, format). Every 31st key (md5-selected) fails
    to load, mirroring the video-probe stub convention; dims span
    [1, 20000] so the min=16 / max=8192 bounds AND the aspect-ratio
    bounds (e.g. 1/1500 < 0.001) are all reachable."""
    n = len(keys)
    exists = np.empty(n, dtype=bool)
    width = np.zeros(n, dtype=np.int64)
    height = np.zeros(n, dtype=np.int64)
    fmt = np.empty(n, dtype=object)
    for i, k in enumerate(keys):
        if k is None or (isinstance(k, float) and np.isnan(k)):
            exists[i] = False
            fmt[i] = ""
            continue
        k = str(k)
        exists[i] = _u32(k, "exists") % STUB_MISSING_MOD != 0
        width[i] = 1 + _u32(k, "w") % 20000
        height[i] = 1 + _u32(k, "h") % 20000
        fmt[i] = STUB_FORMATS[_u32(k, "fmt") % len(STUB_FORMATS)]
    return pd.DataFrame(
        {"exists": exists, "width": width, "height": height, "img_format": fmt}
    )


class NSFWBackend:
    """Image-classifier scorer; constructed once per pool actor. A real
    implementation loads ``Falconsai/nsfw_image_detection`` here and
    batches the forward pass, returning per-image ``{label: score}``."""

    def scores(self, keys: Sequence[str]) -> list[dict[str, float]]:
        raise NotImplementedError


class StubNSFWBackend(NSFWBackend):
    """One 'nsfw' label per image with p = md5-u32(key, 'nsfw') / 2^32
    (exact in float64; DuckDB recomputes it bit-for-bit)."""

    def scores(self, keys):
        return [
            {"nsfw": (_u32(str(k), "nsfw") / 4294967296.0) if k is not None else 0.0}
            for k in keys
        ]


def nsfw_unsafe_mask(
    results: list[dict[str, float]], threshold: float
) -> np.ndarray:
    """rule_base_filter.py:231-240: unsafe iff any label containing
    nsfw/porn/explicit scores strictly above the threshold."""
    out = np.zeros(len(results), dtype=bool)
    for i, labels in enumerate(results):
        for label, score in labels.items():
            ll = label.lower()
            if ("nsfw" in ll or "porn" in ll or "explicit" in ll) and score > threshold:
                out[i] = True
                break
    return out


class RuleBaseFullFilter:
    """Actor-pool callable for the COMPLETE RuleBaseFilter decision:
    15 text rules (skipped for empty text, rule_base_filter.py:359-362)
    AND image load AND basic dims/format/aspect AND NSFW threshold.

    Emits only kept rows (the reference run() drops failures,
    lines 420-425) with the probe evidence columns
    (width, height, img_format, nsfw_u32)."""

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        image_key_col: str = "image_key",
        min_image_width: int = 16,
        min_image_height: int = 16,
        max_image_width: int = 8192,
        max_image_height: int = 8192,
        min_aspect_ratio: float = 0.001,
        max_aspect_ratio: float = 1000.0,
        nsfw_threshold: float = 0.5,
        backend_cls=StubNSFWBackend,
        backend_kwargs=None,
    ):
        self.backend = backend_cls(**(backend_kwargs or {}))  # once per actor
        self.id_col = id_col
        self.text_col = text_col
        self.image_key_col = image_key_col
        self.min_w, self.min_h = min_image_width, min_image_height
        self.max_w, self.max_h = max_image_width, max_image_height
        self.min_ar, self.max_ar = min_aspect_ratio, max_aspect_ratio
        self.nsfw_threshold = nsfw_threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = ["" if pd.isna(v) else str(v) for v in batch[self.text_col]]
        nonempty = np.array([bool(t.strip()) for t in texts])
        text_keep = rule_flags_batch(texts)["keep"].to_numpy()
        # _filter_sample:359-362 — empty text skips the text rules
        text_pass = np.where(nonempty, text_keep, True)

        keys = batch[self.image_key_col].tolist()
        meta = stub_image_meta(keys)
        w = meta["width"].to_numpy()
        h = meta["height"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            ar = w / np.where(h == 0, 1, h)
        basic = (
            meta["exists"].to_numpy()
            & meta["img_format"].isin(ALLOWED_FORMATS).to_numpy()
            & (w >= self.min_w) & (w <= self.max_w)
            & (h >= self.min_h) & (h <= self.max_h)
            & (ar >= self.min_ar) & (ar <= self.max_ar)
        )
        # _filter_sample short-circuits text -> load -> basic -> NSFW:
        # only rows surviving the cheap gates reach the classifier (with
        # a real backend this halves inference on heavily-filtered data)
        keep = text_pass & basic
        cand = np.flatnonzero(keep)
        if len(cand):
            cand_keys = [keys[i] for i in cand]
            unsafe = nsfw_unsafe_mask(
                self.backend.scores(cand_keys), self.nsfw_threshold
            )
            keep[cand[unsafe]] = False

        out = batch.loc[keep, [self.id_col]].copy()
        out["width"] = w[keep]
        out["height"] = h[keep]
        out["img_format"] = meta["img_format"].to_numpy()[keep]
        out["nsfw_u32"] = np.array(
            [_u32(str(keys[i]), "nsfw") for i in np.flatnonzero(keep)],
            dtype=np.int64,
        )
        return out


def rule_base_full(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    image_key_col: str = "image_key",
    concurrency=(1, 4),
    batch_size: int = 4096,
    **params,
):
    """documents-with-image-keys -> kept rows under the full operator."""
    return ds.map_batches(
        RuleBaseFullFilter,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, image_key_col=image_key_col, **params
        ),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
