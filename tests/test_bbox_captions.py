"""BBox NMS/normalization + caption merge: differential vs
transcriptions of the reference loops."""
import numpy as np
import pandas as pd


def _ref_nms(boxes, overlap_thresh=0.3):
    """Transcription of image_bbox_generator.py:77-112."""
    if len(boxes) == 0:
        return []
    boxes = np.array(boxes)
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 0] + boxes[:, 2], boxes[:, 1] + boxes[:, 3]
    areas = boxes[:, 2] * boxes[:, 3]
    idxs = np.argsort(areas)[::-1]
    keep = []
    while len(idxs) > 0:
        i = idxs[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[idxs[1:]])
        yy1 = np.maximum(y1[i], y1[idxs[1:]])
        xx2 = np.minimum(x2[i], x2[idxs[1:]])
        yy2 = np.minimum(y2[i], y2[idxs[1:]])
        w = np.maximum(0, xx2 - xx1)
        h = np.maximum(0, yy2 - yy1)
        overlap = (w * h) / areas[idxs[1:]]
        idxs = np.delete(idxs, np.concatenate(([0], np.where(overlap > overlap_thresh)[0] + 1)))
    return boxes[keep].tolist()


def test_nms_matches_reference_loop():
    from dataflow_mm_ray.stages.bbox import non_max_suppression

    rng = np.random.RandomState(2)
    for _ in range(50):
        n = rng.randint(0, 12)
        boxes = np.stack(
            [rng.randint(0, 400, n), rng.randint(0, 300, n),
             rng.randint(10, 150, n), rng.randint(10, 150, n)], axis=1
        ).astype(float).tolist() if n else []
        for thr in (0.1, 0.3, 0.7):
            assert non_max_suppression(boxes, thr) == _ref_nms(boxes, thr)


def test_vp_normalize_reference_semantics():
    from dataflow_mm_ray.stages.bbox import vp_normalize

    # 2-tuple point -> [-1, -1] tail (image_bbox_generator.py:24-31)
    assert vp_normalize([64, 48], 0, 0, 640, 480) == [0.1, 0.1, -1, -1]
    # 4-tuple box: x1 = (x0+pad+w)/W, 3dp rounding
    assert vp_normalize([10, 20, 30, 40], 5, 5, 100, 200) == [
        round(15 / 100, 3), round(25 / 200, 3), round(45 / 100, 3), round(65 / 200, 3)
    ]


def test_merge_clip_captions_reference_semantics():
    from dataflow_mm_ray.stages.scenes import extract_video_name, merge_clip_captions

    # name extraction rules (video_merged_caption_generator.py:24-37)
    assert extract_video_name("trailer_0") == "trailer"
    assert extract_video_name("video_name_5") == "video_name"
    assert extract_video_name("plain") == "plain"
    assert extract_video_name("clip_final") == "clip_final"  # non-int tail kept

    clips = pd.DataFrame(
        {
            "clip_id": ["v_1", "v_0", "w_0", "v_2", "w_1"],
            "timestamp_start": [30.0, 5.0, 1.0, np.nan, 7.0],
            "timestamp_end": [40.0, 12.0, 3.0, 50.0, 9.0],
            "caption": ["Second scene", "First scene\nwith newline", "Only w", "skipped", ""],
        }
    )
    out = merge_clip_captions(clips).sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == ["v", "w"]
    assert out.loc[0, "num_clips"] == 2  # NaN start and empty caption dropped
    assert out.loc[0, "captions"] == (
        "From 5 to 12, first scene with newline\nFrom 30 to 40, second scene"
    )
    assert out.loc[1, "captions"] == "From 1 to 3, only w"


def test_bbox_query_runs(ray_session):
    from tests.conftest import SF_TINY

    from dataflow_mm_ray.queries import registry

    out = registry()["bbox_nms"].fn(SF_TINY).to_pandas()
    assert len(out) > 0
    assert ((out["x1"] >= out["x0"]) | (out["x1"] == -1)).all()
    # normalized coords in [0, ~1.4] (padding can exceed 1 slightly)
    assert out[["x0", "y0"]].ge(0).all().all()
