"""Multimodal plumbing: binary columns through actor-pool stages,
deterministic stub decode, real stats/VAD/sampling logic, registry."""
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.stages.multimodal import (
    AudioVAD,
    ImageDecoder,
    VideoFrameSampler,
    fake_image_bytes,
    image_aesthetic_stats,
    sample_frame_indices,
    vad_segments,
)


def _img_df(n=6):
    return pd.DataFrame(
        {"doc_id": range(n), "image": [fake_image_bytes(f"img{i}") for i in range(n)]}
    )


def test_image_decode_deterministic_and_quarantine():
    dec = ImageDecoder()
    df = _img_df(3)
    df.loc[1, "image"] = b""  # broken payload
    out = dec(df.copy())
    assert list(out["decode_ok"]) == [True, False, True]
    out2 = ImageDecoder()(df.copy())
    assert np.array_equal(out["pixels"].iloc[0], out2["pixels"].iloc[0])
    assert len(out["pixels"].iloc[0]) == 64 * 64


def test_image_aesthetic_stats_thresholds():
    dec = ImageDecoder()
    out = dec(_img_df(4))
    stats = image_aesthetic_stats(out)
    assert {"sharpness", "brightness", "contrast", "extreme_ratio", "quality"} <= set(stats.columns)
    assert stats["quality"].any()  # structured stub images pass
    # an all-black image must fail brightness/sharpness
    flat = out.copy()
    flat["pixels"] = pd.Series([np.zeros(64 * 64, dtype=np.uint8)] * len(flat), index=flat.index)
    s2 = image_aesthetic_stats(flat)
    assert not s2["quality"].any()


def test_image_pipeline_through_ray(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.stages.multimodal import image_pipeline

    out = image_pipeline(rd.from_pandas(_img_df(8))).to_pandas()
    assert len(out) == 8
    assert "pixels" not in out.columns  # payload dropped from output layout
    out2 = image_pipeline(rd.from_pandas(_img_df(8))).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_vad_segment_rules():
    frame = 0.1
    # speech 0-0.5s, short gap (1 frame < min_silence 0.25), speech to 1.0
    probs = np.array([1, 1, 1, 1, 1, 0, 1, 1, 1, 1], dtype=float)
    segs = vad_segments(probs, frame, threshold=0.5, min_silence_duration_s=0.25,
                        min_speech_duration_s=0.2, pad_s=0.0)
    assert segs == [(0.0, 1.0)]  # gap too short to close
    # long gap closes; second segment too short -> dropped
    probs = np.array([1, 1, 1, 0, 0, 0, 1, 0, 0, 0], dtype=float)
    segs = vad_segments(probs, frame, threshold=0.5, min_silence_duration_s=0.2,
                        min_speech_duration_s=0.2, pad_s=0.0)
    assert len(segs) == 1
    assert segs[0][0] == 0.0 and abs(segs[0][1] - 0.3) < 1e-6
    # max duration splits
    probs = np.ones(20)
    segs = vad_segments(probs, frame, max_speech_duration_s=0.5, pad_s=0.0)
    assert len(segs) == 4 and segs[0] == (0.0, 0.5)


def test_audio_vad_stage(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.stages.multimodal import audio_vad_pipeline

    df = pd.DataFrame({"doc_id": [0, 1], "audio": [fake_image_bytes("a0"), fake_image_bytes("a1")]})
    out = audio_vad_pipeline(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert (out["n_segments"] > 0).all()
    assert all(len(s) == n for s, n in zip(out["seg_starts"], out["n_segments"]))


def test_frame_sampling():
    assert list(sample_frame_indices(5, 8)) == [0, 1, 2, 3, 4]
    idx = sample_frame_indices(100, 8)
    assert len(idx) == 8 and idx[0] == 0 and idx[-1] == 99
    s = VideoFrameSampler()
    out = s(pd.DataFrame({"video": [fake_image_bytes("v0")]}))
    assert out["n_frames"].iloc[0] > 0 and len(out["frame_digests"].iloc[0]) <= 8


def test_registry_lookup_and_fuzzy():
    from dataflow_mm_ray.registry import get_operator, list_operators

    ops = list_operators()
    assert len(ops) >= 15
    assert get_operator("rule_base_filter").kind == "filter"
    assert get_operator("RULE_BASE_FILTER").name == "rule_base_filter"
    assert get_operator("mcts").name == "mcts_tree_refine"  # unique substring
    with pytest.raises(KeyError):
        get_operator("nonexistent_op")
    # stateful ops are marked (actor pools)
    assert get_operator("prompted_qa").stateful


def test_media_sideeffect_sink_atomic_idempotent(ray_session, tmp_path):
    import os

    import pandas as pd
    import ray.data as rd

    from dataflow_mm_ray.stages.multimodal import media_sideeffect_sink

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [b"aa", b"bbbb", b"cccccc"]}
    )
    out = media_sideeffect_sink(
        rd.from_pandas(df), str(tmp_path / "media"), ext="wav"
    ).to_pandas().sort_values("doc_id")
    assert not out["skipped"].any()
    for _, r in out.iterrows():
        assert os.path.getsize(r["path"]) == r["n_bytes"]
    # rerun: all skipped, same manifest
    again = media_sideeffect_sink(
        rd.from_pandas(df), str(tmp_path / "media"), ext="wav"
    ).to_pandas().sort_values("doc_id")
    assert again["skipped"].all()
    assert list(again["path"]) == list(out["path"])
    # no stray temp files
    assert all(not p.endswith(".tmp") for p in os.listdir(tmp_path / "media"))


def test_real_wav_decode_drives_vad():
    """The REAL decode path: a PCM WAV built with the stdlib wave module
    (speech burst then silence) must decode to its true samples and
    produce a VAD segment covering the burst."""
    import io
    import wave as wavmod

    import numpy as np
    import pandas as pd

    from dataflow_mm_ray.stages.multimodal import AudioVAD, decode_wav_bytes

    sr = 16000
    t = np.arange(sr * 2, dtype=np.float64) / sr
    sig = np.where(t < 1.0, 0.5 * np.sin(2 * np.pi * 220 * t), 0.0)
    pcm = (sig * 32767).astype("<i2")
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    data = buf.getvalue()

    decoded = decode_wav_bytes(data)
    assert decoded is not None
    wave_arr, got_sr = decoded
    assert got_sr == sr and len(wave_arr) == sr * 2
    np.testing.assert_allclose(wave_arr[:100], pcm[:100] / 32768.0, atol=1e-6)

    vad = AudioVAD()
    out = vad(pd.DataFrame({"audio": [data]}))
    assert out["n_segments"].iloc[0] >= 1
    # the detected speech covers roughly the first second only
    assert out["seg_starts"].iloc[0][0] < 0.2
    assert out["seg_ends"].iloc[0][-1] < 1.6

    # stereo mean-mix + failure quarantine
    buf2 = io.BytesIO()
    with wavmod.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.stack([pcm, -pcm], axis=1).tobytes())
    stereo = decode_wav_bytes(buf2.getvalue())
    assert stereo is not None and abs(float(stereo[0][:sr].mean())) < 1e-3
    assert decode_wav_bytes(b"RIFFgarbage") is None


def test_real_pil_decode_when_available():
    """Availability-gated: when PIL exists, ImageDecoder must decode
    real PNG bytes into the fixed stats layout (skipped where absent)."""
    import pytest

    pytest.importorskip("PIL")
    import io

    import numpy as np
    import pandas as pd
    from PIL import Image

    from dataflow_mm_ray.stages.multimodal import ImageDecoder

    img = Image.new("RGB", (100, 40), (200, 30, 90))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    dec = ImageDecoder(width=64, height=64)
    out = dec(pd.DataFrame({"image": [buf.getvalue(), b"not an image"]}))
    assert bool(out["decode_ok"].iloc[0]) is True
    assert bool(out["decode_ok"].iloc[1]) is False
    assert out["pixels"].iloc[0].shape == (64 * 64,)
    assert out["pixels"].iloc[0].dtype == np.uint8


def test_compute_frame_indices_matches_reference_rules():
    # transcription of video_frame_filter.py:113-128 _compute_indices
    from dataflow_mm_ray.stages.multimodal import compute_frame_indices

    def ref(num_frames, fps, interval_sec):
        if num_frames <= 0:
            return []
        if interval_sec is not None and fps and fps > 0:
            stride = max(1, int(round(interval_sec * fps)))
            return [i for i in range(0, num_frames, stride)]
        if num_frames == 1:
            return [0]
        if num_frames == 2:
            return [0, 1]
        return list({0, num_frames // 2, num_frames - 1})

    for n in list(range(0, 12)) + [25, 240, 241]:
        for fps in (None, 0, 24, 25, 29.97, 30):
            for iv in (None, 0.04, 0.5, 2.0, 1000.0):
                got = compute_frame_indices(n, fps, iv)
                assert got == sorted(ref(n, fps, iv)), (n, fps, iv)
                assert got == sorted(set(got))  # unique, ordered


def test_frame_export_plan_vectorized_equals_row_loop():
    # the vectorized planner in queries_ops is pinned to the per-row
    # compute_frame_indices loop over the same stub probe
    from dataflow_mm_ray.queries_ops import _frame_export_plan
    from dataflow_mm_ray.stages.multimodal import compute_frame_indices

    ids = np.concatenate([np.arange(0, 500), np.array([19 * 7, 19 * 12, 9973])])
    got = _frame_export_plan(pd.DataFrame({"doc_id": ids}))

    rows = []
    for d in ids:
        n = 0 if d % 19 == 0 else 1 + int((d * 7) % 240)
        fps = (24, 25, 30)[d % 3]
        interval = 2.0 if d % 2 == 0 else None
        for i in compute_frame_indices(n, fps, interval):
            rows.append((int(d), n, i))
    want = pd.DataFrame(rows, columns=["doc_id", "n_frames", "frame_idx"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(np.int64), check_exact=True
    )
