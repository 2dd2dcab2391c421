"""Multimodal stages: image / audio / video as opaque binary columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no PIL/OpenCV/torchaudio, so DECODE IS STUBBED: each
decoder actor tries the real library in ``__init__`` and falls back to
a deterministic fake decoder (pixel/sample arrays derived from the
byte content via stable hashing). Everything around the decode — the
binary-column schema, actor signatures, batch sizing for large
payloads, output layout (flat arrays + shape metadata, Arrow-friendly)
— is real and tested; swapping in the real library changes no
interface.

Reference analogs:
- image load path/bytes/PIL -> RGB: ``dataflow/utils/utils.py:27-50``
  (load failure -> row quarantined, not silently dropped);
- ``ImageAestheticFilter`` grayscale stats (Laplacian-variance
  sharpness, brightness range, contrast, near-black/white ratios; keep
  iff all pass): ``dataflow/operators/core_vision/filter/
  image_aesthetic_filter.py:53-109`` — the stats math here is REAL
  (numpy), only pixels come from the stub;
- Silero VAD speech-timestamp post-processing (threshold /
  min_speech_duration_s / min_silence_duration_s / max_speech_duration_s
  / padding): ``dataflow/operators/core_audio/generate/
  audio_silero_voice_activity_detection_timestamps_generator.py:29-68``
  — the segmentation logic is REAL over a stubbed energy curve;
- video frame sampling (``video_frame_filter.py:304-374``): uniform
  frame-index sampling over stubbed frames.

Batch sizing: binary payloads are large — these stages default to
small batches (256) so batch x concurrency stays within worker heap.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

MM_BATCH = 256


# ---------------------------------------------------------------------------
# deterministic fake media (STUB decode)
# ---------------------------------------------------------------------------

def fake_image_bytes(key: str, width: int = 64, height: int = 64) -> bytes:
    """Deterministic pseudo-'encoded image': a seeded byte payload.
    Stands in for real JPEG/PNG bytes in fixtures."""
    seed = int.from_bytes(hashlib.md5(str(key).encode()).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.bytes(width * height)


def _stub_decode_image(data: bytes, width: int, height: int) -> np.ndarray:
    """STUB: derive a grayscale uint8 image deterministically from the
    byte payload (replace with PIL.Image.open in production)."""
    seed = int.from_bytes(hashlib.md5(data).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, size=(height, width)).astype(np.uint8)
    # add structure so sharpness/contrast stats vary between images
    yy, xx = np.mgrid[0:height, 0:width]
    wave = (127 + 100 * np.sin(xx / (3 + seed % 13) + yy / (2 + seed % 7))).astype(np.uint8)
    return ((base.astype(np.int32) + wave) // 2).astype(np.uint8)


def decode_wav_bytes(data: bytes) -> tuple[np.ndarray, int] | None:
    """REAL decode for RIFF/WAV payloads via the stdlib ``wave`` module
    (the dependency-free slice of the reference's librosa loaders,
    ``dataflow/utils/audio.py:15-33``; like their ``DEFAULT_SR = None``
    no resampling happens): PCM 16/32-bit or 8-bit unsigned -> float32
    in [-1, 1), channels mean-mixed to mono. None on any parse failure
    (callers quarantine, like the reference's None rows)."""
    import io
    import wave as wavmod

    try:
        with wavmod.open(io.BytesIO(data)) as w:
            sr = w.getframerate()
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif width == 1:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            return None
        if n_ch > 1:
            x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
        return x.astype(np.float32), sr
    except Exception:
        return None


def _stub_decode_audio(data: bytes, sr: int = 16000, seconds: float = 4.0) -> np.ndarray:
    """STUB: deterministic waveform with speech-like energy bursts."""
    seed = int.from_bytes(hashlib.md5(data).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    n = int(sr * seconds)
    wave = rng.randn(n) * 0.01
    pos = 0
    while pos < n:
        burst = rng.randint(sr // 4, sr)
        gap = rng.randint(sr // 4, sr)
        end = min(pos + burst, n)
        wave[pos:end] += np.sin(np.arange(end - pos) * 0.3) * 0.5
        pos += burst + gap
    return wave.astype(np.float32)


# ---------------------------------------------------------------------------
# image pipeline
# ---------------------------------------------------------------------------

class ImageDecoder:
    """Actor-pool decoder: real library probed once per actor, stub
    otherwise. Output layout: flat uint8 pixels + (height, width)."""

    def __init__(self, image_col: str = "image", width: int = 64, height: int = 64):
        self.image_col = image_col
        self.width = width
        self.height = height
        try:  # pragma: no cover - library absent in this container
            from PIL import Image  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False

    def _decode(self, data: bytes) -> np.ndarray | None:
        if data is None or len(data) == 0:
            return None  # quarantined by caller (utils.py:27-50 returns None)
        if self._real:  # pragma: no cover - PIL absent in this container
            # the reference's _load_image (utils.py:27-50): bytes ->
            # RGB PIL image, None on any failure; the stats layout here
            # is single-channel, so luminance + fixed resize follow
            import io

            from PIL import Image

            try:
                img = Image.open(io.BytesIO(data)).convert("RGB")
            except Exception:
                return None
            img = img.convert("L").resize((self.width, self.height))
            return np.asarray(img, dtype=np.uint8)
        return _stub_decode_image(data, self.width, self.height)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pixels, oks = [], []
        for data in batch[self.image_col]:
            img = self._decode(data)
            pixels.append(img.ravel() if img is not None else np.empty(0, dtype=np.uint8))
            oks.append(img is not None)
        batch = batch.drop(columns=[self.image_col]).copy(deep=False)
        batch["pixels"] = pixels
        batch["img_h"] = np.int32(self.height)
        batch["img_w"] = np.int32(self.width)
        batch["decode_ok"] = np.asarray(oks, dtype=bool)
        return batch


def image_aesthetic_stats(batch: pd.DataFrame,
                          min_brightness=10.0, max_brightness=245.0,
                          min_sharpness=100.0, min_contrast=10.0,
                          max_extreme_ratio=0.8) -> pd.DataFrame:
    """ImageAestheticFilter stats (image_aesthetic_filter.py:53-109),
    vectorized numpy: Laplacian-variance sharpness, mean brightness in
    range, std contrast, near-black/near-white pixel ratios; quality =
    all checks pass."""
    n = len(batch)
    sharp = np.zeros(n)
    bright = np.zeros(n)
    contrast = np.zeros(n)
    extreme = np.zeros(n)
    lap = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float64)
    for i, (px, h, w, ok) in enumerate(
        zip(batch["pixels"], batch["img_h"], batch["img_w"], batch["decode_ok"])
    ):
        if not ok:
            continue
        img = np.asarray(px, dtype=np.float64).reshape(int(h), int(w))
        # 2D Laplacian via shifted sums (no scipy dependency)
        core = (
            img[:-2, 1:-1] + img[2:, 1:-1] + img[1:-1, :-2] + img[1:-1, 2:]
            - 4 * img[1:-1, 1:-1]
        )
        sharp[i] = core.var()
        bright[i] = img.mean()
        contrast[i] = img.std()
        extreme[i] = ((img < 10) | (img > 245)).mean()
    quality = (
        batch["decode_ok"].to_numpy()
        & (sharp >= min_sharpness)
        & (bright >= min_brightness)
        & (bright <= max_brightness)
        & (contrast >= min_contrast)
        & (extreme <= max_extreme_ratio)
    )
    out = batch.copy(deep=False)
    out["sharpness"] = sharp.round(6)
    out["brightness"] = bright.round(6)
    out["contrast"] = contrast.round(6)
    out["extreme_ratio"] = extreme.round(6)
    out["quality"] = quality
    return out


def image_pipeline(ds, image_col: str = "image", concurrency=(1, 4)):
    """binary images -> decode (actor pool) -> aesthetic stats/filter."""
    decoded = ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"image_col": image_col},
        batch_format="pandas",
        batch_size=MM_BATCH,
        concurrency=concurrency,
    )
    stats = decoded.map_batches(image_aesthetic_stats, batch_format="pandas", batch_size=MM_BATCH)
    return stats.map_batches(
        lambda b: b.drop(columns=["pixels"]), batch_format="pandas", batch_size=MM_BATCH
    )


# ---------------------------------------------------------------------------
# audio pipeline (VAD)
# ---------------------------------------------------------------------------

def vad_segments(
    probs: np.ndarray,
    frame_s: float,
    threshold: float = 0.5,
    min_speech_duration_s: float = 0.25,
    min_silence_duration_s: float = 0.1,
    max_speech_duration_s: float = float("inf"),
    pad_s: float = 0.03,
) -> list[tuple[float, float]]:
    """Speech-segment extraction from a per-frame speech-probability
    curve — the Silero parameter semantics
    (audio_silero...generator.py:29-68): frames above ``threshold``
    open a segment; a silence gap shorter than ``min_silence_duration_s``
    does NOT close it; closed segments shorter than
    ``min_speech_duration_s`` are dropped; segments longer than
    ``max_speech_duration_s`` are split; ``pad_s`` padding applied."""
    EPS = 1e-9  # frame-time arithmetic is float; compare with tolerance
    speech = probs >= threshold
    segs: list[list[float]] = []
    start = None
    silence_start = None
    for i, s in enumerate(speech):
        t = i * frame_s
        if s:
            if start is None:
                start = t
            silence_start = None
        else:
            if start is not None:
                if silence_start is None:
                    silence_start = t
                elif t - silence_start >= min_silence_duration_s - EPS:
                    segs.append([start, silence_start])
                    start, silence_start = None, None
    if start is not None:
        end = len(speech) * frame_s if silence_start is None else silence_start
        segs.append([start, end])
    out: list[tuple[float, float]] = []
    for s, e in segs:
        if e - s < min_speech_duration_s - EPS:
            continue
        while e - s > max_speech_duration_s + EPS:
            out.append((max(0.0, s - pad_s), s + max_speech_duration_s + pad_s))
            s += max_speech_duration_s
        out.append((max(0.0, s - pad_s), e + pad_s))
    return out


class AudioVAD:
    """Actor-pool VAD: stub 'model' = frame RMS energy; real Silero
    would replace ``_frame_probs`` only."""

    def __init__(self, audio_col: str = "audio", sr: int = 16000, frame_s: float = 0.032,
                 threshold: float = 0.5, min_speech_duration_s: float = 0.25,
                 min_silence_duration_s: float = 0.1, max_speech_duration_s: float = 10.0,
                 seg_lists: bool = False):
        self.audio_col = audio_col
        self.sr = sr
        self.frame_s = frame_s
        # seg_lists: emit seg_starts/seg_ends as PYTHON lists so the
        # Arrow block type is plain list<double> — numpy-array cells
        # become Ray's variable-shaped tensor EXTENSION type, which
        # this pyarrow/pandas combination cannot convert back to pandas
        # for a downstream map_batches stage (the composed audio chain
        # needs the handoff; the standalone query keeps arrays)
        self.seg_lists = seg_lists
        self.params = dict(
            threshold=threshold,
            min_speech_duration_s=min_speech_duration_s,
            min_silence_duration_s=min_silence_duration_s,
            max_speech_duration_s=max_speech_duration_s,
        )

    def _frame_probs(self, wave: np.ndarray) -> np.ndarray:
        n = int(self.sr * self.frame_s)
        usable = len(wave) - len(wave) % n
        frames = wave[:usable].reshape(-1, n)
        rms = np.sqrt((frames**2).mean(axis=1))
        return np.clip(rms / 0.2, 0, 1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        starts, ends, counts = [], [], []
        for data in batch[self.audio_col]:
            # REAL decode for RIFF/WAV payloads (stdlib, no resample);
            # synthetic non-WAV payloads keep the deterministic stub
            sr = self.sr
            if isinstance(data, bytes) and data[:4] == b"RIFF":
                decoded = decode_wav_bytes(data)
            else:
                decoded = None
            if decoded is not None:
                wave, sr = decoded
                n = int(sr * self.frame_s)
                usable = len(wave) - len(wave) % n
                frames = wave[:usable].reshape(-1, n) if usable else wave[:0].reshape(0, n)
                probs = np.clip(np.sqrt((frames**2).mean(axis=1)) / 0.2, 0, 1)
            else:
                wave = _stub_decode_audio(data, self.sr)
                probs = self._frame_probs(wave)
            segs = vad_segments(probs, self.frame_s, **self.params)
            if self.seg_lists:
                starts.append([float(s) for s, _ in segs])
                ends.append([float(e) for _, e in segs])
            else:
                starts.append(np.asarray([s for s, _ in segs], dtype=np.float64))
                ends.append(np.asarray([e for _, e in segs], dtype=np.float64))
            counts.append(len(segs))
        batch = batch.drop(columns=[self.audio_col]).copy(deep=False)
        batch["seg_starts"] = starts
        batch["seg_ends"] = ends
        batch["n_segments"] = np.asarray(counts, dtype=np.int32)
        return batch


def audio_vad_pipeline(ds, audio_col: str = "audio", concurrency=(1, 4), **vad_params):
    return ds.map_batches(
        AudioVAD,
        fn_constructor_kwargs={"audio_col": audio_col, **vad_params},
        batch_format="pandas",
        batch_size=MM_BATCH,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# video pipeline (frame sampling)
# ---------------------------------------------------------------------------

def sample_frame_indices(n_frames: int, k: int) -> np.ndarray:
    """Uniform representative-frame sampling
    (video_frame_filter.py:304-374 semantics): k indices evenly spread,
    all frames when n <= k."""
    if n_frames <= k:
        return np.arange(n_frames)
    return np.linspace(0, n_frames - 1, k).astype(np.int64)


def compute_frame_indices(num_frames: int, fps: float | None,
                          interval_sec: float | None) -> list[int]:
    """Reference-exact ``_compute_indices``
    (video_frame_filter.py:113-128): which local clip indices to save.
    With ``interval_sec`` and a positive fps, stride by
    ``max(1, round(interval_sec * fps))``; otherwise 3 evenly spaced
    frames — the set {0, n//2, n-1} (which also reproduces the n==1 /
    n==2 special cases)."""
    if num_frames <= 0:
        return []
    if interval_sec is not None and fps and fps > 0:
        stride = max(1, int(round(interval_sec * fps)))
        return list(range(0, num_frames, stride))
    if num_frames == 1:
        return [0]
    if num_frames == 2:
        return [0, 1]
    return sorted({0, num_frames // 2, num_frames - 1})


class VideoFrameSampler:
    """STUB video decode: frame count derived from payload; emits the
    sampled frame indices + fake per-frame digests (plumbing only)."""

    def __init__(self, video_col: str = "video", k: int = 8):
        self.video_col = video_col
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        idx_col, digest_col, nf_col = [], [], []
        for data in batch[self.video_col]:
            n_frames = 10 + int(hashlib.md5(data).digest()[0])  # stub probe
            idx = sample_frame_indices(n_frames, self.k)
            idx_col.append(idx)
            digest_col.append(
                [hashlib.md5(data + bytes([int(i) % 256])).hexdigest()[:8] for i in idx]
            )
            nf_col.append(n_frames)
        batch = batch.drop(columns=[self.video_col]).copy(deep=False)
        batch["n_frames"] = np.asarray(nf_col, dtype=np.int32)
        batch["frame_indices"] = idx_col
        batch["frame_digests"] = digest_col
        return batch


# ---------------------------------------------------------------------------
# media side-effect sink (per-row wav/mp4/png writes)
# ---------------------------------------------------------------------------

def media_sideeffect_sink(ds, out_dir: str, id_col: str = "doc_id",
                          bytes_col: str = "payload", ext: str = "png",
                          batch_size: int = MM_BATCH):
    """Side-effect file sink: the reference's operators write media
    outputs per row (wav via soundfile, mp4/png via cv2/PIL —
    ``video_clip_generator.py:274-311`` clip cutting,
    ``audio_silero...generator.py`` wav exports). Codec encoding is
    payload-agnostic here (the bytes column is written verbatim); the
    SINK semantics are real and distributed:

    - each map task writes its own rows (no driver funnel);
    - every file lands via write-temp + ``os.replace`` (atomic on
      POSIX — readers never see partial files);
    - a re-run skips rows whose file already exists with the right
      size (idempotent resume, the 2PC-sink philosophy per row);
    - returns the manifest Dataset (id, path, n_bytes, skipped).
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(b: pd.DataFrame) -> pd.DataFrame:
        paths, sizes, skipped = [], [], []
        for i, data in zip(b[id_col], b[bytes_col]):
            final = os.path.join(out_dir, f"{i}.{ext}")
            data = bytes(data)
            if os.path.exists(final) and os.path.getsize(final) == len(data):
                paths.append(final)
                sizes.append(len(data))
                skipped.append(True)
                continue
            tmp = final + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, final)
            paths.append(final)
            sizes.append(len(data))
            skipped.append(False)
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), "path": paths,
             "n_bytes": np.asarray(sizes, dtype=np.int64), "skipped": skipped}
        )

    return ds.map_batches(write_batch, batch_format="pandas", batch_size=batch_size)
