"""Bounding-box post-processing (ImageBBoxGenerator's pure math).

Reference: ``dataflow/operators/core_vision/generate/
image_bbox_generator.py`` — the detector and the cv2 box painter are
model/codec-bound, but its post-processing is pure numpy, reproduced
exactly:

- ``vp_normalize`` (``:23-40``): shift a point/box by the letterbox
  padding, normalize by image size, round to 3 dp; 2-tuples become
  ``[x, y, -1, -1]``, 4-tuples ``[x0, y0, x1, y1]`` (x1 = (x0+w)/W).
- ``non_max_suppression`` (``:77-112``): greedy NMS over ``(x, y, w,
  h)`` boxes in DESCENDING area order, suppressing boxes whose
  intersection with the kept box exceeds ``overlap_thresh`` of THEIR
  OWN area (not IoU — the reference divides by the candidate's area).
  Area ties follow numpy's ``argsort(...)[::-1]`` order — replicated
  exactly for determinism parity.
"""
from __future__ import annotations

import numpy as np


def vp_normalize(in_p, pad_x: float, pad_y: float, width: float, height: float) -> list:
    if len(in_p) == 2:
        x0, y0 = in_p
        x0 = x0 + pad_x
        y0 = y0 + pad_y
        return [round(x0 / width, 3), round(y0 / height, 3), -1, -1]
    if len(in_p) == 4:
        x0, y0, w, h = in_p
        x0 = x0 + pad_x
        y0 = y0 + pad_y
        return [
            round(x0 / width, 3), round(y0 / height, 3),
            round((x0 + w) / width, 3), round((y0 + h) / height, 3),
        ]
    raise ValueError(f"point/box must have 2 or 4 coords, got {len(in_p)}")


def non_max_suppression(boxes, overlap_thresh: float = 0.3) -> list:
    """Greedy area-ordered NMS, reference-exact (see module docstring)."""
    if len(boxes) == 0:
        return []
    b = np.asarray(boxes, dtype=np.float64)
    x1, y1 = b[:, 0], b[:, 1]
    x2, y2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    areas = b[:, 2] * b[:, 3]
    idxs = np.argsort(areas)[::-1]
    keep = []
    while len(idxs) > 0:
        i = idxs[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[idxs[1:]])
        yy1 = np.maximum(y1[i], y1[idxs[1:]])
        xx2 = np.minimum(x2[i], x2[idxs[1:]])
        yy2 = np.minimum(y2[i], y2[idxs[1:]])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        overlap = inter / areas[idxs[1:]]
        idxs = np.delete(idxs, np.concatenate(([0], np.where(overlap > overlap_thresh)[0] + 1)))
    return b[keep].tolist()


def stub_detect(doc_id: int, n_max: int = 6) -> np.ndarray:
    """Deterministic stand-in for the VLM detector: a few boxes derived
    from the id, including deliberate overlaps so NMS has work."""
    rng = np.random.RandomState(doc_id % (1 << 31))
    n = 2 + rng.randint(n_max - 1)
    x = rng.randint(0, 500, n).astype(np.float64)
    y = rng.randint(0, 400, n).astype(np.float64)
    w = rng.randint(20, 200, n).astype(np.float64)
    h = rng.randint(20, 160, n).astype(np.float64)
    boxes = np.stack([x, y, w, h], axis=1)
    # duplicate the first box slightly shifted: a guaranteed suppression
    dup = boxes[0].copy()
    dup[0] += 3
    return np.vstack([boxes, dup])


def bbox_pipeline(ds, overlap_thresh: float = 0.3,
                  img_w: float = 640.0, img_h: float = 480.0,
                  pad_x: float = 0.0, pad_y: float = 0.0):
    """doc rows -> stub detect -> NMS -> normalized boxes, exploded one
    row per kept box (doc_id, box_idx, x0, y0, x1, y1)."""
    import pandas as pd

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        ids, bidx, coords = [], [], []
        for i in b["doc_id"]:
            kept = non_max_suppression(stub_detect(int(i)), overlap_thresh)
            for j, box in enumerate(kept):
                ids.append(int(i))
                bidx.append(j)
                coords.append(vp_normalize(box, pad_x, pad_y, img_w, img_h))
        c = np.asarray(coords, dtype=np.float64) if coords else np.empty((0, 4))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "box_idx": np.asarray(bidx, dtype=np.int32),
                "x0": c[:, 0], "y0": c[:, 1], "x1": c[:, 2], "y1": c[:, 3],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")
