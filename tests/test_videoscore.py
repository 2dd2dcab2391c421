"""Differential tests for the video scorer family (stages/videoscore.py)
against direct transcriptions of the reference row loops:

- apply_aesthetic_filter (video_aesthetic_filter.py:32-86)
- apply_ocr_filter (video_ocr_filter.py:32-96)
- _compute_video_motion_score sampling arithmetic
  (video_motion_score_filter.py:189-236) simulated frame by frame
"""
from __future__ import annotations

import numpy as np
import pytest

from dataflow_mm_ray.stages import videoscore as vs


def _rand_clips(rng, n):
    """Random clip dicts incl. missing scores and pre-filtered marks."""
    clips = []
    for _ in range(n):
        c = {}
        r = rng.random()
        if r < 0.2:
            c["aesthetic_score"] = None
        else:
            c["aesthetic_score"] = float(rng.uniform(2.0, 9.0))
        r = rng.random()
        if r < 0.2:
            c["ocr_score"] = None
        else:
            c["ocr_score"] = float(rng.uniform(0.0, 0.5))
        r = rng.random()
        if r < 0.3:
            c["filtered"] = False  # marked by an earlier operator
        elif r < 0.6:
            c["filtered"] = True
        # else: field absent -> defaults to True
        clips.append(c)
    return clips


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_aesthetic_gate_matches_reference_loop(seed):
    rng = np.random.default_rng(seed)
    clips = _rand_clips(rng, 500)
    prior = np.array([c.get("filtered", True) for c in clips])
    score = np.array(
        [np.nan if c["aesthetic_score"] is None else c["aesthetic_score"] for c in clips]
    )
    got = vs.aesthetic_gate(prior, score, aes_min=vs.AES_MIN)
    ref = vs.apply_aesthetic_filter_ref([dict(c) for c in clips], aes_min=vs.AES_MIN)
    want = np.array([c["filtered"] for c in ref])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("bounds", [(vs.OCR_MIN, vs.OCR_MAX), (None, 0.3), (0.05, None)])
def test_ocr_gate_matches_reference_loop(seed, bounds):
    ocr_min, ocr_max = bounds
    rng = np.random.default_rng(seed)
    clips = _rand_clips(rng, 500)
    prior = np.array([c.get("filtered", True) for c in clips])
    score = np.array([np.nan if c["ocr_score"] is None else c["ocr_score"] for c in clips])
    lo = -np.inf if ocr_min is None else ocr_min
    hi = np.inf if ocr_max is None else ocr_max
    got = vs.ocr_gate(prior, score, ocr_min=lo, ocr_max=hi)
    ref = vs.apply_ocr_filter_ref([dict(c) for c in clips], ocr_min=ocr_min, ocr_max=ocr_max)
    want = np.array([c["filtered"] for c in ref])
    np.testing.assert_array_equal(got, want)


def _motion_ref(uid: int, duration_s: int, salt: int = 0):
    """Frame-by-frame simulation of _compute_video_motion_score
    (video_motion_score_filter.py:193-236) over the stub flow model:
    read frames at 0, step, 2*step, ... while position < total_frames;
    every read after the first yields one flow magnitude; mean them."""
    if uid % vs._MOTION_BROKEN_MOD == 0:
        return -1.0  # cap.isOpened() False -> return -1.0 (line 194-195)
    fps = [24, 30, 60][uid % 3]
    sampling_fps = min(vs.SAMPLING_FPS, fps)
    step = round(fps / sampling_fps)
    total = duration_s * fps
    step = max(min(step, total - 1), 1)
    mags = []
    pos, reads = 0, 0
    while pos < total:
        reads += 1
        if reads >= 2:
            p = reads - 2  # flow pair index
            mags.append((uid % 7 + 1) * ((uid * 13 + salt + 7 * p) % 1200))
        pos += step
    if not mags:
        return -1.0
    return float(np.sum(mags)) / (len(mags) * 100.0)


def test_motion_score_matches_frame_simulation():
    uids = np.array([0, 1, 2, 3, 29, 58, 7, 12, 100, 12345, 999983], dtype=np.int64)
    durs = np.array([0, 1, 2, 3, 10, 120, 1800, 86400, 604800, 5, 0], dtype=np.int64)
    score, passed = vs.motion_score(uids, durs)
    for i, (u, d) in enumerate(zip(uids, durs)):
        if d > 86400:
            # closed form only: simulate a truncated twin instead
            continue
        want = _motion_ref(int(u), int(d))
        assert score[i] == want, (u, d, score[i], want)
        assert passed[i] == (want != -1.0 and vs.MOTION_MIN <= want <= vs.MOTION_MAX)


def test_motion_flow_sum_closed_form_vs_bruteforce():
    rng = np.random.default_rng(7)
    uids = rng.integers(0, 10**6, size=40).astype(np.int64)
    ns = np.concatenate(
        [rng.integers(0, 5000, size=36), np.array([0, 1, 1200, 2401])]
    ).astype(np.int64)
    salts = rng.integers(0, 10**4, size=40).astype(np.int64)
    got = vs.motion_flow_sum(uids, ns, salts)
    for u, n, s, g in zip(uids, ns, salts, got):
        brute = (u % 7 + 1) * np.sum((u * 13 + s + 7 * np.arange(n, dtype=np.int64)) % 1200)
        assert g == brute


def test_clip_aggregation_rules():
    """Aesthetic = MEAN of frames, OCR = MAX of frames (reference
    aggregation; eval/video_aesthetic_evaluator.py:142,
    eval/video_ocr_evaluator.py:299)."""
    uid = np.arange(200, dtype=np.int64)
    idx = (uid * 3) % 11
    aes = vs.clip_aesthetic_score(uid, idx)
    frames = np.stack([vs.aesthetic_frame_u(uid, idx, j) for j in range(vs.LOAD_NUM)])
    want = 3.0 + frames.sum(axis=0).astype(np.float64) / (vs.LOAD_NUM * 10.0)
    m = ~np.isnan(aes)
    np.testing.assert_array_equal(aes[m], want[m])
    assert np.array_equal(np.isnan(aes), (uid + idx) % vs._AES_MISSING_MOD == 0)
    # mean really is the frame mean (integer-sum form avoids rounding drift)
    np.testing.assert_allclose(
        want, 3.0 + frames.astype(np.float64).mean(axis=0) / 10.0, rtol=0, atol=1e-12
    )

    ocr = vs.clip_ocr_score(uid, idx)
    oframes = np.stack([vs.ocr_frame_u(uid, idx, j) for j in range(vs.LOAD_NUM)])
    owant = oframes.max(axis=0).astype(np.float64) / 1000.0
    m = ~np.isnan(ocr)
    np.testing.assert_array_equal(ocr[m], owant[m])
