"""Video scorer family: aesthetic / OCR / motion (filter + evaluator).

Reference semantics (reimplemented, not copied):

- ``VideoAestheticEvaluator`` — ``dataflow/operators/core_vision/eval/
  video_aesthetic_evaluator.py:125-142``: per clip, sample ``load_num``
  frames, score each with the CLIP+MLP aesthetic head, clip score =
  **mean** of the frame scores. ``VideoAestheticFilter``
  (``filter/video_aesthetic_filter.py:32-86``) then updates
  ``clip["filtered"]`` in place: default True (pass), clips already
  False are SKIPPED (carry-through), a clip still passing is marked
  False when its score is missing or ``< aes_min``.
- ``VideoOCREvaluator`` — ``eval/video_ocr_evaluator.py:246-299``: per
  clip, per frame total text-bbox area / frame area, clip score =
  **max** over the frame ratios (0.0 when no frames).
  ``VideoOCRFilter`` (``filter/video_ocr_filter.py:32-96``): same
  carry-through update; a still-passing clip fails when the score is
  missing, ``< ocr_min`` or ``> ocr_max``.
- ``VideoMotionScoreFilter`` — ``filter/video_motion_score_filter.py:
  189-236,254-265``: row-level per video. Sample frames at
  ``step = max(min(round(fps / min(sampling_fps, fps)),
  total_frames - 1), 1)`` (positions 0, step, 2*step, ... <
  total_frames), compute Farneback optical flow between consecutive
  sampled frames, per-pair score = mean flow magnitude, video score =
  mean over pairs; ``-1.0`` when the video cannot be opened or yields
  no flow pairs; ``passed_filter = min_score <= score <= max_score``
  (so the -1.0 sentinel always fails); per-row exceptions also map to
  ``(-1.0, False)``.

The CLIP head / PaddleOCR / cv2 decoders are model- and codec-bound
state absent from this sandbox, so frame-level scores come from
deterministic integer stubs (modular arithmetic on the video's uid and
the clip/frame index — the same convention as the luminance probe in
``queries_cep.py``); every aggregate keeps a single final float
division so the DuckDB oracles are bit-exact. The aggregation and
filter DECISION logic above is reference-exact and differentially
tested against a transcription of the reference's row loops
(``tests/test_videoscore.py``).

Scale shape: all three are embarrassingly parallel per-clip/per-video
map_batches kernels over the conv-keyed scene-chunk blocks — no new
shuffle; the motion stub's flow-magnitude sum uses a closed-form
period-1200 decomposition so cost is O(1) per video regardless of
frame count.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

LOAD_NUM = 3  # frames sampled per clip (reference default load_num=3)

AES_MIN = 5.5
OCR_MIN, OCR_MAX = 0.01, 0.30
MOTION_MIN, MOTION_MAX = 5.0, 20.0
SAMPLING_FPS = 2.0

# stub periods / sentinels
_AES_MISSING_MOD = 17
_OCR_MISSING_MOD = 23
_MOTION_BROKEN_MOD = 29
_FLOW_PERIOD = 1200
_FLOW_PERIOD_SUM = _FLOW_PERIOD * (_FLOW_PERIOD - 1) // 2  # 719400


def aesthetic_frame_u(uid: np.ndarray, clip_idx: np.ndarray, j: int) -> np.ndarray:
    """Stub CLIP+MLP frame score (integer form): frame j of a clip."""
    return (uid * 7 + clip_idx * 13 + j * 29) % 60


def clip_aesthetic_score(uid: np.ndarray, clip_idx: np.ndarray) -> np.ndarray:
    """Clip aesthetic score = MEAN over LOAD_NUM frame scores
    (video_aesthetic_evaluator.py:125-142 ``preds.mean(dim=1)``),
    mapped into [3, 9); NaN for the deterministic missing sentinel.
    Integer sum then ONE division keeps DuckDB bit-exact."""
    s = sum(aesthetic_frame_u(uid, clip_idx, j) for j in range(LOAD_NUM))
    score = 3.0 + s.astype(np.float64) / (LOAD_NUM * 10.0)
    return np.where((uid + clip_idx) % _AES_MISSING_MOD == 0, np.nan, score)


def ocr_frame_u(uid: np.ndarray, clip_idx: np.ndarray, j: int) -> np.ndarray:
    """Stub total-text-area numerator (per-mille) for frame j."""
    return (uid * 11 + clip_idx * 7 + j * 31) % 400


def clip_ocr_score(uid: np.ndarray, clip_idx: np.ndarray) -> np.ndarray:
    """Clip OCR score = MAX over the frame text-area ratios
    (video_ocr_evaluator.py:276-299 ``max(area_list)``); NaN for the
    missing sentinel."""
    m = ocr_frame_u(uid, clip_idx, 0)
    for j in range(1, LOAD_NUM):
        m = np.maximum(m, ocr_frame_u(uid, clip_idx, j))
    score = m.astype(np.float64) / 1000.0
    return np.where((uid + clip_idx) % _OCR_MISSING_MOD == 0, np.nan, score)


def _flow_prefix_table() -> np.ndarray:
    """PREFIX[b, r] = sum_{q<r} (b + 7q) % 1200 — the flow-magnitude
    stub is periodic with period 1200 (gcd(7, 1200) = 1, so one period
    visits every residue once and sums to 719400)."""
    global _FLOW_PREFIX
    try:
        return _FLOW_PREFIX
    except NameError:
        pass
    b = np.arange(_FLOW_PERIOD, dtype=np.int64)[:, None]
    q = np.arange(_FLOW_PERIOD, dtype=np.int64)[None, :]
    vals = (b + 7 * q) % _FLOW_PERIOD
    _FLOW_PREFIX = np.concatenate(
        [np.zeros((_FLOW_PERIOD, 1), dtype=np.int64), np.cumsum(vals, axis=1)], axis=1
    )
    return _FLOW_PREFIX


def motion_flow_sum(uid: np.ndarray, n_flows: np.ndarray, salt: np.ndarray | int = 0) -> np.ndarray:
    """Sum of the stub per-pair flow magnitudes
    ``(uid % 7 + 1) * ((uid*13 + salt + 7p) % 1200)`` for p in
    [0, n_flows), via the closed-form period decomposition (O(1) per
    video). ``salt`` distinguishes clips of one video (clip_idx * 37)."""
    prefix = _flow_prefix_table()
    b = (uid * 13 + salt) % _FLOW_PERIOD
    n = np.maximum(n_flows, 0)
    raw = (n // _FLOW_PERIOD) * _FLOW_PERIOD_SUM + prefix[b, n % _FLOW_PERIOD]
    return (uid % 7 + 1) * raw


def motion_fps(uid: np.ndarray) -> np.ndarray:
    """Stub per-video fps — same 24/30/60 convention as the clip probe."""
    return np.choose(uid % 3, [24, 30, 60]).astype(np.int64)


def motion_score(uid: np.ndarray, duration_s: np.ndarray,
                 salt: np.ndarray | int = 0) -> tuple[np.ndarray, np.ndarray]:
    """(video_motion_score, passed_filter) per video — the sampling
    arithmetic of ``_compute_video_motion_score``
    (video_motion_score_filter.py:189-236): frames read at 0, step,
    2*step, ... < total_frames give ceil(total/step) reads and
    reads-1 flow pairs; no pairs (or an unopenable video) -> -1.0.
    ``run`` (lines 254-265): passed = min <= score <= max."""
    fps = motion_fps(uid)
    total = duration_s.astype(np.int64) * fps
    # sampling_fps = min(SAMPLING_FPS, fps); fps stubs are >= 24 so
    # round(fps / 2.0) is exact integer division here
    step_raw = np.round(fps / np.minimum(SAMPLING_FPS, fps)).astype(np.int64)
    step = np.maximum(np.minimum(step_raw, total - 1), 1)
    n_reads = np.where(total > 0, (total + step - 1) // step, 0)
    n_flows = n_reads - 1
    broken = (uid % _MOTION_BROKEN_MOD == 0) | (n_flows <= 0)
    n_safe = np.where(broken, 1, n_flows)
    score = motion_flow_sum(uid, n_safe, salt).astype(np.float64) / (n_safe * 100.0)
    score = np.where(broken, -1.0, score)
    passed = (~broken) & (score >= MOTION_MIN) & (score <= MOTION_MAX)
    return score, passed


# ---------------------------------------------------------------------------
# Reference filter-decision transcriptions (row loops over clip dicts) —
# the differential-test twins of the vectorized gates above.
# ---------------------------------------------------------------------------


def apply_aesthetic_filter_ref(clips: list[dict], aes_min: float | None) -> list[dict]:
    """Transcription of ``apply_aesthetic_filter``
    (video_aesthetic_filter.py:32-86): in-place carry-through update of
    clip['filtered'] (True = pass)."""
    for clip in clips:
        if "filtered" not in clip:
            clip["filtered"] = True
        if clip.get("filtered") is False:
            continue
        if aes_min is not None:
            s = clip.get("aesthetic_score")
            if s is None or (isinstance(s, float) and np.isnan(s)):
                clip["filtered"] = False
            elif s < aes_min:
                clip["filtered"] = False
    return clips


def apply_ocr_filter_ref(clips: list[dict], ocr_min: float | None,
                         ocr_max: float | None) -> list[dict]:
    """Transcription of ``apply_ocr_filter`` (video_ocr_filter.py:32-96):
    each bound independently fails a missing score."""
    for clip in clips:
        if "filtered" not in clip:
            clip["filtered"] = True
        if clip.get("filtered") is False:
            continue
        s = clip.get("ocr_score")
        missing = s is None or (isinstance(s, float) and np.isnan(s))
        if ocr_min is not None:
            if missing or s < ocr_min:
                clip["filtered"] = False
        if ocr_max is not None:
            if missing or s > ocr_max:
                clip["filtered"] = False
    return clips


def aesthetic_gate(prior_pass: np.ndarray, score: np.ndarray,
                   aes_min: float = AES_MIN) -> np.ndarray:
    """Vectorized twin of apply_aesthetic_filter_ref over clip arrays."""
    return prior_pass & ~np.isnan(score) & (score >= aes_min)


def ocr_gate(prior_pass: np.ndarray, score: np.ndarray,
             ocr_min: float = OCR_MIN, ocr_max: float = OCR_MAX) -> np.ndarray:
    """Vectorized twin of apply_ocr_filter_ref over clip arrays."""
    ok = ~np.isnan(score)
    return prior_pass & ok & ~(np.nan_to_num(score) < ocr_min) & ~(np.nan_to_num(score) > ocr_max)
