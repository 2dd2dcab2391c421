"""CEP / streaming-shaped queries over the canonical transcript stream,
with DuckDB oracles. See sources/transcripts.py for the derivation."""
from __future__ import annotations

import pandas as pd

from dataflow_mm_ray.queries import register
from dataflow_mm_ray.sources.transcripts import (
    TRANSCRIPTS_CTE,
    transcripts_from_events,
    transcripts_partitioned,
)
from dataflow_mm_ray.sources.tables import read_table
from dataflow_mm_ray.stages import dedup, filters, join, stats, windows

def _scratch_dir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit: the end-to-end
    streaming queries return lazy Datasets over files in this dir, so
    eager cleanup would break the caller's read — but without any
    cleanup a full correctness run leaked a 13-stream engine output
    plus the prepared transcript copy into /tmp per query per run
    (r4 ADVICE)."""
    import atexit
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    return out


TUMBLING_WIDTH_S = 3600
SLIDING_WIDTH_S = 7200
SLIDING_SLIDE_S = 3600
SESSION_GAP_S = 1800
LATENESS_S = 604800  # 7 days
SCORE_MIN, SCORE_MAX = 50.0, 150.0


@register(
    "transcripts",
    TRANSCRIPTS_CTE + "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
)
def q_transcripts(sf_dir: str):
    """The canonical derivation, Arrow end-to-end (sources/transcripts
    _events_to_turns_arrow): the full 6-column transcript table is the
    product here, so blocks stay Arrow — zero Python-object strings."""
    return transcripts_from_events(sf_dir, arrow=True)


@register(
    "tumbling_window",
    TRANSCRIPTS_CTE
    + f"""
SELECT conv_id,
       make_timestamp(epoch_us(ts) // (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000)
                      * (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000)) AS window_start,
       count(*) AS n_turns,
       count(*) FILTER (WHERE role = 'user') AS n_user_turns,
       count(*) FILTER (WHERE role = 'assistant' AND tool IS NOT NULL) AS n_tool_calls,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM transcripts
GROUP BY 1, 2
""",
)
def q_tumbling(sf_dir: str):
    return transcripts_partitioned(
        sf_dir, lambda t: windows.tumbling_window_kernel(t, TUMBLING_WIDTH_S), fast=True
    )


@register(
    "lambda_repair",
    TRANSCRIPTS_CTE
    + f"""
SELECT conv_id,
       epoch_us(ts) // (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000)
       * (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000) AS window_start_us,
       count(*) AS n_turns,
       count(*) FILTER (WHERE role = 'user') AS n_user_turns,
       count(*) FILTER (WHERE role = 'assistant' AND tool IS NOT NULL) AS n_tool_calls,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM transcripts
GROUP BY 1, 2
""",
)
def q_lambda_repair(sf_dir: str):
    """End-to-end lambda repair (streaming/reprocess.py): run the
    streaming engine at ZERO lateness — the adversarial regime where
    most rows are quarantined rather than aggregated — then replay the
    quarantine into the additive ``windows_fix`` correction stream and
    return the merged on-time ⊕ corrections view. The oracle is the
    plain batch tumbling aggregate: the repair must restore it
    bit-for-bit no matter how much the watermark quarantined."""
    import os

    from dataflow_mm_ray.streaming.engine import (
        StreamingEngine, prepare_transcripts)
    from dataflow_mm_ray.streaming.reprocess import repair, repaired_windows

    out = _scratch_dir("graft-lambda-")
    tpath = prepare_transcripts(
        sf_dir, os.path.join(out, "transcripts"), n_epochs=4)
    eng = StreamingEngine(tpath, out, n_epochs=4, n_shards=4,
                          width_s=TUMBLING_WIDTH_S, gap_s=SESSION_GAP_S,
                          lateness_s=0)
    eng.run()
    repair(out)
    return repaired_windows(out)


@register(
    "bounded_state_stream",
    TRANSCRIPTS_CTE
    + f"""
SELECT conv_id,
       epoch_us(ts) // (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000)
       * (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000) AS window_start_us,
       count(*) AS n_turns,
       count(*) FILTER (WHERE role = 'user') AS n_user_turns,
       count(*) FILTER (WHERE role = 'assistant' AND tool IS NOT NULL) AS n_tool_calls,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM transcripts
GROUP BY 1, 2
""",
)
def q_bounded_state_stream(sf_dir: str):
    """The production streaming shape end-to-end (the 10^12-turn
    operating mode, streaming/engine.py prepare_transcripts
    arrival='by_ts'): event-time-ordered arrival epochs + a FINITE
    lateness, so nothing is quarantined, windows settle progressively
    and shard state stays bounded by the disorder horizon instead of
    the stream length (measured at 100M turns / 1.006B committed rows —
    BASELINE.md). Returns the committed exactly-once ``windows`` stream;
    the oracle is the plain batch tumbling aggregate, which the settled
    stream must equal bit-for-bit. Complements ``lambda_repair`` (the
    adversarial hash-arrival zero-lateness regime + quarantine replay)."""
    import os

    from dataflow_mm_ray.streaming.engine import (
        StreamingEngine, prepare_transcripts)
    from dataflow_mm_ray.streaming.sink import EpochSink

    out = _scratch_dir("graft-byts-")
    tpath = prepare_transcripts(
        sf_dir, os.path.join(out, "transcripts"), n_epochs=4,
        arrival="by_ts")
    eng = StreamingEngine(tpath, out, n_epochs=4, n_shards=4,
                          width_s=TUMBLING_WIDTH_S, gap_s=SESSION_GAP_S,
                          lateness_s=TUMBLING_WIDTH_S)
    eng.run()
    return EpochSink(out, ["windows"]).read_committed_ds("windows")


@register(
    "sliding_window",
    TRANSCRIPTS_CTE
    + f"""
, slid AS (
  SELECT conv_id, text,
         make_timestamp(epoch_us(ts) // (CAST({SLIDING_SLIDE_S} AS BIGINT) * 1000000)
                        * (CAST({SLIDING_SLIDE_S} AS BIGINT) * 1000000)
                        - off.i * CAST({SLIDING_SLIDE_S} AS BIGINT) * 1000000) AS window_start
  FROM transcripts CROSS JOIN (SELECT unnest(range({SLIDING_WIDTH_S // SLIDING_SLIDE_S})) AS i) off
)
SELECT conv_id, window_start, count(*) AS n_turns, CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM slid GROUP BY 1, 2
""",
)
def q_sliding(sf_dir: str):
    return transcripts_partitioned(
        sf_dir, lambda t: windows.sliding_window_kernel(t, SLIDING_WIDTH_S, SLIDING_SLIDE_S),
        fast=True,
    )


@register(
    "session_window",
    TRANSCRIPTS_CTE
    + f"""
, gaps AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST({SESSION_GAP_S} AS BIGINT) * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), sess AS (
  SELECT conv_id, ts,
         sum(new_s) OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS sid
  FROM gaps
)
SELECT conv_id, CAST(sid AS INTEGER) AS session_id, count(*) AS n_turns,
       min(ts) AS session_start, max(ts) AS session_end,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM sess GROUP BY 1, 2
""",
)
def q_session(sf_dir: str):
    return transcripts_partitioned(
        sf_dir, lambda t: windows.session_window_kernel(t, SESSION_GAP_S), fast=True
    )


SCENE_SR_S, SCENE_ER_S = 60, 60
SCENE_MIN_S, SCENE_MAX_S = 120, 1800
_US = 1_000_000


CLIP_FRAMES_MIN = 100
CLIP_RES_MAX = 1920 * 1080

_SCENE_CHUNKS_SQL = TRANSCRIPTS_CTE + f"""
, gaps AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST({SESSION_GAP_S} AS BIGINT) * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), sess AS (
  SELECT conv_id, ts,
         sum(new_s) OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS sid
  FROM gaps
), seg AS (
  SELECT conv_id, CAST(sid AS INTEGER) AS session_id,
         epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
  FROM sess GROUP BY 1, 2
), t AS (
  SELECT conv_id, session_id,
         s + {SCENE_SR_S * _US} AS ns, e - {SCENE_ER_S * _US} AS ne
  FROM seg
  WHERE e > s AND (e - s) >= {(SCENE_SR_S + SCENE_ER_S) * _US}
    AND (e - {SCENE_ER_S * _US}) > (s + {SCENE_SR_S * _US})
), c AS (
  SELECT conv_id, session_id, ns, ne, ne - ns AS nd,
         CASE WHEN ne - ns > {SCENE_MAX_S * _US}
              THEN (ne - ns) // {SCENE_MAX_S * _US} ELSE 0 END AS n_full
  FROM t
), n AS (
  SELECT *,
         CASE WHEN nd <= {SCENE_MAX_S * _US}
              THEN CASE WHEN nd >= {SCENE_MIN_S * _US} THEN 1 ELSE 0 END
              ELSE n_full + CASE WHEN ne - (ns + n_full * {SCENE_MAX_S * _US})
                                      >= {SCENE_MIN_S * _US} THEN 1 ELSE 0 END
         END AS n_chunks
  FROM c
), chunks AS (
  SELECT conv_id, session_id, CAST(i AS INTEGER) AS chunk_id,
         ns + i * {SCENE_MAX_S * _US} AS chunk_start_us,
         CASE WHEN nd <= {SCENE_MAX_S * _US} THEN ne
              WHEN i < n_full THEN ns + (i + 1) * {SCENE_MAX_S * _US}
              ELSE ne END AS chunk_end_us
  FROM n, unnest(range(n_chunks)) AS u(i)
)
"""


@register(
    "video_clip_filter",
    _SCENE_CHUNKS_SQL
    + f"""
, probe AS (
  SELECT *, CAST(substr(conv_id, 6) AS BIGINT) AS uid,
         row_number() OVER (PARTITION BY conv_id ORDER BY session_id, chunk_id) - 1 AS clip_idx
  FROM chunks
), m AS (
  SELECT conv_id, clip_idx,
         CAST(320 + (uid % 10) * 160 AS BIGINT) AS width,
         CAST(240 + (uid % 7) * 120 AS BIGINT) AS height,
         CAST(CASE uid % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS BIGINT) AS fps,
         chunk_start_us // 1000000 AS s_sec,
         chunk_end_us // 1000000 AS e_sec
  FROM probe
), f AS (
  SELECT conv_id, clip_idx, width, height, fps, s_sec, e_sec,
         s_sec * fps AS frame_start, e_sec * fps AS frame_end,
         (e_sec - s_sec) * fps AS num_frames
  FROM m
)
SELECT conv_id, conv_id || '_' || CAST(clip_idx AS VARCHAR) AS clip_id,
       num_frames, height, width, fps,
       s_sec AS timestamp_start, e_sec AS timestamp_end, frame_start, frame_end
FROM f
WHERE num_frames >= {CLIP_FRAMES_MIN} AND width * height <= {CLIP_RES_MAX}
""",
)
def q_video_clip_filter(sf_dir: str):
    """VideoClipFilter (video_clip_filter.py:80-170): clip metadata
    construction (integer-second timecodes, frame = floor(sec*fps),
    clip ids over ALL scenes) + frames/fps/resolution filters, fused
    with the scene trim/split in one conv-keyed shuffle."""
    from dataflow_mm_ray.stages.scenes import video_clip_filter

    return video_clip_filter(
        sf_dir, gap_s=SESSION_GAP_S, start_remove_s=SCENE_SR_S, end_remove_s=SCENE_ER_S,
        min_s=SCENE_MIN_S, max_s=SCENE_MAX_S,
        frames_min=CLIP_FRAMES_MIN, resolution_max=CLIP_RES_MAX,
    )


_MERGED_CAPTIONS_CTE = _SCENE_CHUNKS_SQL + f"""
, probe AS (
  SELECT conv_id, CAST(substr(conv_id, 6) AS BIGINT) AS uid,
         row_number() OVER (PARTITION BY conv_id ORDER BY session_id, chunk_id) - 1 AS clip_idx,
         chunk_start_us // 1000000 AS s_sec, chunk_end_us // 1000000 AS e_sec
  FROM chunks
), f AS (
  SELECT conv_id, clip_idx, s_sec, e_sec,
         CAST(320 + (uid % 10) * 160 AS BIGINT) * CAST(240 + (uid % 7) * 120 AS BIGINT) AS px,
         (e_sec - s_sec) * CAST(CASE uid % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS BIGINT)
           AS num_frames
  FROM probe
), kept AS (
  SELECT * FROM f
  WHERE num_frames >= {CLIP_FRAMES_MIN} AND px <= {CLIP_RES_MAX}
), merged AS (
  SELECT conv_id AS id,
         string_agg('From ' || CAST(s_sec AS VARCHAR) || ' to ' || CAST(e_sec AS VARCHAR)
                    || ', clip ' || CAST(clip_idx AS VARCHAR) || ' shows tool use',
                    chr(10) ORDER BY s_sec, clip_idx) AS captions,
         count(*) AS num_clips
  FROM kept GROUP BY conv_id
)
"""


@register(
    "merged_clip_captions",
    _MERGED_CAPTIONS_CTE + "SELECT id, captions, num_clips FROM merged",
)
def q_merged_clip_captions(sf_dir: str):
    """VideoMergedCaptionGenerator (video_merged_caption_generator.py:
    13-124): clips + stub per-clip captions -> per-video time-ordered
    merged caption text with first-char lowercasing and integer-second
    timestamps. See stages/scenes.py merged_clip_captions."""
    from dataflow_mm_ray.stages.scenes import merged_clip_captions

    return merged_clip_captions(
        sf_dir, gap_s=SESSION_GAP_S, start_remove_s=SCENE_SR_S, end_remove_s=SCENE_ER_S,
        min_s=SCENE_MIN_S, max_s=SCENE_MAX_S,
        frames_min=CLIP_FRAMES_MIN, resolution_max=CLIP_RES_MAX,
    )


# VideoQAGeneratorPrompt.build_prompt (dataflow/prompts/video.py:25-54):
# the caption is appended after "Description: ".
VIDEO_QA_PROMPT_PREFIX = (
    "### Task:\n"
    "Given a detailed description that summarizes the content of a video, generate question-answer pairs "
    "based on the description to help humans better understand the video.\n"
    "The question-answer pairs should be faithful to the content of the video description and developed "
    "from different dimensions to promote comprehensive understanding of the video.\n\n"
    "#### Guidelines For Question-Answer Pairs Generation:\n"
    "- Read the provided video description carefully. Pay attention to the scene, main characters, "
    "their behaviors, and the development of events.\n"
    "- Generate appropriate question-answer pairs based on the description. The pairs should cover "
    "as many question dimensions as possible and not deviate from the content.\n"
    "- Generate 5 to 10 question-answer pairs across different dimensions.\n\n"
    "### Output Format:\n"
    "1. Your output should be formatted as a JSON list.\n"
    "2. Only provide the Python dictionary string.\n"
    "Your response should look like:\n"
    "[\n"
    '  {"Dimension": <dimension-1>, "Question": <question-1>, "Answer": <answer-1>},\n'
    '  {"Dimension": <dimension-2>, "Question": <question-2>, "Answer": <answer-2>},\n'
    "  ...\n"
    "]\n\n"
    "Please generate question-answer pairs for the following video description:\n"
    "Description: "
)

_VCQA_SYS = "You are a helpful assistant."


@register(
    "video_caption_qa",
    _MERGED_CAPTIONS_CTE
    + "SELECT id, 'ans-' || md5('system: " + _VCQA_SYS + "' || chr(10) || 'user: ' || '"
    + VIDEO_QA_PROMPT_PREFIX.replace("'", "''")
    + "' || captions) AS answer FROM merged",
)
def q_video_caption_qa(sf_dir: str):
    """VideoCaptionToQAGenerator (video_qa_generator.py:16-132): build a
    QA-generation prompt from each video's merged caption via
    VideoQAGeneratorPrompt (video.py:25-54), rewrite the (default,
    single-human-turn) conversation's first user message to it
    (lines 100-110), then delegate to the PromptedVQAGenerator serving
    path (lines 117-128) — here the caption chain (scene split -> clip
    filter -> merged captions) feeds the same serving actor pool."""
    from dataflow_mm_ray.serving import prompted_qa
    from dataflow_mm_ray.stages.scenes import merged_clip_captions

    caps = merged_clip_captions(
        sf_dir, gap_s=SESSION_GAP_S, start_remove_s=SCENE_SR_S, end_remove_s=SCENE_ER_S,
        min_s=SCENE_MIN_S, max_s=SCENE_MAX_S,
        frames_min=CLIP_FRAMES_MIN, resolution_max=CLIP_RES_MAX,
    )

    def build(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": b["id"].to_numpy(),
                "prompt": [
                    f"system: {_VCQA_SYS}\nuser: {VIDEO_QA_PROMPT_PREFIX}{c}"
                    for c in b["captions"]
                ],
            }
        )

    out = prompted_qa(caps.map_batches(build, batch_format="pandas"),
                      concurrency=(1, 2), batch_size=2048)
    return out.map_batches(lambda b: b[["id", "answer"]], batch_format="pandas")


LUM_MIN, LUM_MAX = 20.0, 235.0


@register(
    "video_luminance_filter",
    _SCENE_CHUNKS_SQL
    + f"""
, probe AS (
  SELECT conv_id, CAST(substr(conv_id, 6) AS BIGINT) AS uid,
         row_number() OVER (PARTITION BY conv_id ORDER BY session_id, chunk_id) - 1 AS clip_idx
  FROM chunks
), lum AS (
  SELECT conv_id, conv_id || '_' || CAST(clip_idx AS VARCHAR) AS clip_id,
         CASE WHEN (uid + clip_idx) % 19 = 0 THEN NULL
              ELSE CAST((uid * 31 + clip_idx * 17) % 256 AS DOUBLE) END AS luminance_mean
  FROM probe
)
SELECT conv_id, clip_id, luminance_mean,
       (luminance_mean IS NULL OR luminance_mean < {LUM_MIN}
        OR luminance_mean > {LUM_MAX}) AS filtered
FROM lum
""",
)
def q_video_luminance_filter(sf_dir: str):
    """VideoLuminanceFilter (video_luminance_filter.py:32-99): per-clip
    luminance_mean (decoder-bound -> deterministic stub) and the
    NON-DESTRUCTIVE filtered flag — clips with missing luminance or
    outside [lum_min, lum_max] are MARKED, never dropped (the
    reference updates clip['filtered'] in place)."""
    import numpy as np

    from dataflow_mm_ray.stages.scenes import scene_segments

    chunks = scene_segments(
        sf_dir, gap_s=SESSION_GAP_S, start_remove_s=SCENE_SR_S, end_remove_s=SCENE_ER_S,
        min_s=SCENE_MIN_S, max_s=SCENE_MAX_S,
    )

    def mark(b):
        import pandas as pd

        idx = b.groupby("conv_id", sort=False).cumcount().to_numpy().astype(np.int64)
        uid = pd.Series(b["conv_id"]).str[5:].astype(np.int64).to_numpy()
        missing = (uid + idx) % 19 == 0
        lum = np.where(missing, np.nan, ((uid * 31 + idx * 17) % 256).astype(np.float64))
        filtered = missing | (lum < LUM_MIN) | (lum > LUM_MAX)
        return pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(),
                "clip_id": pd.Series(b["conv_id"]).astype(str) + "_" + pd.Series(idx).astype(str),
                "luminance_mean": lum,
                "filtered": filtered,
            }
        )

    # the per-conv clip index must see ALL of a conv's chunks — chunks
    # come out of the conv-keyed reduce, so each output BLOCK holds
    # whole conversations; batch_size=None keeps batches == blocks so
    # the stateless cumcount is exact
    return chunks.map_batches(mark, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Video scorer family (aesthetic / OCR / motion) — stages/videoscore.py.
# Frame-level stub scores with reference-exact aggregation + filter rules;
# the SQL fragments below are generated from the SAME constants.
# ---------------------------------------------------------------------------
from dataflow_mm_ray.stages import videoscore as _vsc

_CLIP_PROBE_SQL = """
, probe AS (
  SELECT conv_id, CAST(substr(conv_id, 6) AS BIGINT) AS uid,
         row_number() OVER (PARTITION BY conv_id ORDER BY session_id, chunk_id) - 1 AS clip_idx,
         chunk_start_us // 1000000 AS s_sec, chunk_end_us // 1000000 AS e_sec
  FROM chunks
)
"""

# clip aesthetic = MEAN of LOAD_NUM frame scores (integer sum, one division)
_AES_SCORE_SQL = (
    f"CASE WHEN (uid + clip_idx) % {_vsc._AES_MISSING_MOD} = 0 THEN NULL ELSE 3.0 + CAST(("
    + " + ".join(f"(uid*7 + clip_idx*13 + {j * 29}) % 60" for j in range(_vsc.LOAD_NUM))
    + f") AS DOUBLE) / {_vsc.LOAD_NUM * 10.0} END"
)

# clip OCR = MAX of LOAD_NUM frame text-area ratios
_OCR_SCORE_SQL = (
    f"CASE WHEN (uid + clip_idx) % {_vsc._OCR_MISSING_MOD} = 0 THEN NULL ELSE CAST(greatest("
    + ", ".join(f"(uid*11 + clip_idx*7 + {j * 31}) % 400" for j in range(_vsc.LOAD_NUM))
    + ") AS DOUBLE) / 1000.0 END"
)

# prior clip mark carried into the per-op filters: the VideoClipFilter
# frames/resolution gate (same stub metadata as q_video_clip_filter)
_PRIOR_PASS_SQL = f"""
((e_sec - s_sec) * CAST(CASE uid % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS BIGINT)
   >= {CLIP_FRAMES_MIN}
 AND CAST(320 + (uid % 10) * 160 AS BIGINT) * CAST(240 + (uid % 7) * 120 AS BIGINT)
   <= {CLIP_RES_MAX})
"""


def _motion_sum_sql(n_expr: str, salt_expr: str = "0") -> str:
    """SQL twin of stages.videoscore.motion_flow_sum (closed-form
    period-1200 decomposition; remainder < 1200 terms)."""
    b = f"((uid*13 + {salt_expr}) % 1200)"
    return (
        f"(uid % 7 + 1) * ((({n_expr}) // 1200) * 719400"
        f" + coalesce(list_sum(list_transform(range(({n_expr}) % 1200),"
        f" q -> ({b} + 7*q) % 1200)), 0))"
    )


# per-clip motion pipeline: total frames -> sampling step -> flow pairs
_CLIP_MOTION_CTES = f"""
, mf AS (
  SELECT *, (e_sec - s_sec)
            * CAST(CASE uid % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS BIGINT) AS total_frames,
         CAST(CASE uid % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS BIGINT) // 2 AS step_raw
  FROM probe
), mn AS (
  SELECT *, CASE WHEN total_frames <= 0 THEN 0
                 ELSE (total_frames + greatest(least(step_raw, total_frames - 1), 1) - 1)
                      // greatest(least(step_raw, total_frames - 1), 1) - 1 END AS n_flows
  FROM mf
), ms AS (
  SELECT *, CASE WHEN uid % {_vsc._MOTION_BROKEN_MOD} = 0 OR n_flows <= 0 THEN -1.0
                 ELSE CAST({_motion_sum_sql("n_flows", "clip_idx*37")} AS DOUBLE)
                      / (n_flows * 100.0) END AS motion_score
  FROM mn
)
"""


def _clip_probe(b: pd.DataFrame):
    """(conv_id, uid, clip_idx, s_sec, e_sec) arrays for a scene-chunk
    block. Blocks come out of the conv-keyed reduce holding WHOLE
    conversations (batch_size=None), so the per-conv cumcount equals
    the oracle's row_number() over (session_id, chunk_id)."""
    import numpy as np

    idx = b.groupby("conv_id", sort=False).cumcount().to_numpy().astype(np.int64)
    uid = pd.Series(b["conv_id"]).str[5:].astype(np.int64).to_numpy()
    s_sec = b["chunk_start_us"].to_numpy(dtype=np.int64) // 1_000_000
    e_sec = b["chunk_end_us"].to_numpy(dtype=np.int64) // 1_000_000
    return b["conv_id"].to_numpy(), uid, idx, s_sec, e_sec


def _scene_chunks(sf_dir: str):
    from dataflow_mm_ray.stages.scenes import scene_segments

    return scene_segments(
        sf_dir, gap_s=SESSION_GAP_S, start_remove_s=SCENE_SR_S, end_remove_s=SCENE_ER_S,
        min_s=SCENE_MIN_S, max_s=SCENE_MAX_S,
    )


def _prior_pass(uid, s_sec, e_sec):
    """VideoClipFilter frames/resolution mark (the carry-through input
    of the per-op aesthetic/OCR filters)."""
    import numpy as np

    fps = np.choose(uid % 3, [24, 30, 60]).astype(np.int64)
    px = (320 + (uid % 10) * 160) * (240 + (uid % 7) * 120)
    return ((e_sec - s_sec) * fps >= CLIP_FRAMES_MIN) & (px <= CLIP_RES_MAX)


@register(
    "video_aesthetic_filter",
    _SCENE_CHUNKS_SQL + _CLIP_PROBE_SQL
    + f"""
, scored AS (
  SELECT conv_id, conv_id || '_' || CAST(clip_idx AS VARCHAR) AS clip_id,
         {_PRIOR_PASS_SQL} AS prior_pass,
         {_AES_SCORE_SQL} AS aesthetic_score
  FROM probe
)
SELECT conv_id, clip_id, aesthetic_score,
       prior_pass AND coalesce(aesthetic_score >= {_vsc.AES_MIN}, FALSE) AS passed
FROM scored
""",
)
def q_video_aesthetic_filter(sf_dir: str):
    """VideoAestheticFilter (video_aesthetic_filter.py:32-86 +
    eval/video_aesthetic_evaluator.py:125-142): clip score = MEAN of
    load_num frame scores from the CLIP+MLP head (deterministic stub
    here); carry-through filtering — clips already marked by the
    upstream VideoClipFilter stay marked, still-passing clips fail on a
    missing score or score < aes_min. Non-destructive (every clip kept,
    ``passed`` marks the decision)."""
    import numpy as np

    def mark(b):
        conv, uid, idx, s_sec, e_sec = _clip_probe(b)
        aes = _vsc.clip_aesthetic_score(uid, idx)
        passed = _vsc.aesthetic_gate(_prior_pass(uid, s_sec, e_sec), aes)
        return pd.DataFrame(
            {
                "conv_id": conv,
                "clip_id": pd.Series(conv).astype(str) + "_" + pd.Series(idx).astype(str),
                "aesthetic_score": aes,
                "passed": passed,
            }
        )

    return _scene_chunks(sf_dir).map_batches(mark, batch_format="pandas", batch_size=None)


@register(
    "video_ocr_filter",
    _SCENE_CHUNKS_SQL + _CLIP_PROBE_SQL
    + f"""
, scored AS (
  SELECT conv_id, conv_id || '_' || CAST(clip_idx AS VARCHAR) AS clip_id,
         {_PRIOR_PASS_SQL} AS prior_pass,
         {_OCR_SCORE_SQL} AS ocr_score
  FROM probe
)
SELECT conv_id, clip_id, ocr_score,
       prior_pass AND coalesce(ocr_score >= {_vsc.OCR_MIN} AND ocr_score <= {_vsc.OCR_MAX}, FALSE)
         AS passed
FROM scored
""",
)
def q_video_ocr_filter(sf_dir: str):
    """VideoOCRFilter (video_ocr_filter.py:32-96 +
    eval/video_ocr_evaluator.py:246-299): clip score = MAX over frames
    of (total text-bbox area / frame area) (PaddleOCR stubbed);
    carry-through filtering — still-passing clips fail on a missing
    score, score < ocr_min or score > ocr_max."""
    import numpy as np

    def mark(b):
        conv, uid, idx, s_sec, e_sec = _clip_probe(b)
        ocr = _vsc.clip_ocr_score(uid, idx)
        passed = _vsc.ocr_gate(_prior_pass(uid, s_sec, e_sec), ocr)
        return pd.DataFrame(
            {
                "conv_id": conv,
                "clip_id": pd.Series(conv).astype(str) + "_" + pd.Series(idx).astype(str),
                "ocr_score": ocr,
                "passed": passed,
            }
        )

    return _scene_chunks(sf_dir).map_batches(mark, batch_format="pandas", batch_size=None)


@register(
    "video_motion_filter",
    TRANSCRIPTS_CTE
    + f"""
, conv AS (
  SELECT conv_id, CAST(substr(conv_id, 6) AS BIGINT) AS uid,
         (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
  FROM transcripts GROUP BY 1, 2
), mf AS (
  SELECT *, duration_s * CAST(CASE uid % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS BIGINT)
              AS total_frames,
         CAST(CASE uid % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS BIGINT) // 2 AS step_raw
  FROM conv
), mn AS (
  SELECT *, CASE WHEN total_frames <= 0 THEN 0
                 ELSE (total_frames + greatest(least(step_raw, total_frames - 1), 1) - 1)
                      // greatest(least(step_raw, total_frames - 1), 1) - 1 END AS n_flows
  FROM mf
), ms AS (
  SELECT conv_id, uid, n_flows,
         CASE WHEN uid % {_vsc._MOTION_BROKEN_MOD} = 0 OR n_flows <= 0 THEN -1.0
              ELSE CAST({_motion_sum_sql("n_flows")} AS DOUBLE) / (n_flows * 100.0)
         END AS video_motion_score
  FROM mn
)
SELECT conv_id, video_motion_score,
       CASE WHEN uid % {_vsc._MOTION_BROKEN_MOD} = 0 OR n_flows <= 0 THEN FALSE
            ELSE video_motion_score >= {_vsc.MOTION_MIN}
                 AND video_motion_score <= {_vsc.MOTION_MAX} END AS passed_filter
FROM ms
""",
)
def q_video_motion_filter(sf_dir: str):
    """VideoMotionScoreFilter (video_motion_score_filter.py:189-236,
    254-265): row-level per video — frames sampled at round(fps /
    min(sampling_fps, fps)) clamped to [1, total_frames-1], per-pair
    Farneback flow magnitude mean (stubbed, closed-form O(1) sum),
    video score = mean over pairs, -1.0 sentinel for unopenable /
    zero-pair videos, passed_filter = min <= score <= max. Exceptions
    map to (-1.0, False) like the reference row loop."""
    import numpy as np

    def kernel(t: pd.DataFrame) -> pd.DataFrame:
        g = t.groupby("conv_id", sort=False)["ts"]
        mn, mx = g.min(), g.max()
        conv = mn.index.to_numpy()
        uid = pd.Series(conv).str[5:].astype(np.int64).to_numpy()
        dur = (mx.to_numpy() - mn.to_numpy()).astype("timedelta64[us]").astype(np.int64) // 1_000_000
        score, passed = _vsc.motion_score(uid, dur)
        return pd.DataFrame(
            {"conv_id": conv, "video_motion_score": score, "passed_filter": passed}
        )

    return transcripts_partitioned(sf_dir, kernel, fast=True)


@register(
    "video_score_filter",
    _SCENE_CHUNKS_SQL + _CLIP_PROBE_SQL + _CLIP_MOTION_CTES
    + f"""
, m AS (
  SELECT conv_id, conv_id || '_' || CAST(clip_idx AS VARCHAR) AS clip_id,
         total_frames AS num_frames,
         CASE WHEN (uid + clip_idx) % 19 = 0 THEN NULL
              ELSE CAST((uid * 31 + clip_idx * 17) % 256 AS DOUBLE) END AS luminance_mean,
         {_AES_SCORE_SQL} AS aesthetic_score,
         {_OCR_SCORE_SQL} AS ocr_score,
         motion_score
  FROM ms
)
SELECT conv_id, clip_id, num_frames, luminance_mean, aesthetic_score,
       ocr_score, motion_score,
       coalesce(luminance_mean >= {LUM_MIN} AND luminance_mean <= {LUM_MAX}, FALSE)
       AND num_frames >= {CLIP_FRAMES_MIN}
       AND coalesce(aesthetic_score >= {_vsc.AES_MIN}, FALSE)
       AND coalesce(ocr_score >= {_vsc.OCR_MIN} AND ocr_score <= {_vsc.OCR_MAX}, FALSE)
       AND motion_score >= {_vsc.MOTION_MIN} AND motion_score <= {_vsc.MOTION_MAX} AS passed
FROM m
""",
)
def q_video_score_filter(sf_dir: str):
    """VideoScoreFilter (video_score_filter.py:9-160): the multi-metric
    clip gate — frames / luminance / aesthetic / OCR / motion range
    thresholds over the metric columns produced by the per-op
    evaluators (clip aesthetic = frame MEAN, clip OCR = frame MAX,
    clip motion = sampled-flow mean with the -1.0 sentinel — the same
    kernels as video_aesthetic_filter / video_ocr_filter /
    video_motion_filter, stages/videoscore.py). Missing scores fail
    their check; the gate is one conjunction."""
    import numpy as np

    def gate(b):
        conv, uid, idx, s_sec, e_sec = _clip_probe(b)
        fps = _vsc.motion_fps(uid)
        num_frames = (e_sec - s_sec) * fps
        missing = (uid + idx) % 19 == 0
        lum = np.where(missing, np.nan, ((uid * 31 + idx * 17) % 256).astype(np.float64))
        aes = _vsc.clip_aesthetic_score(uid, idx)
        ocr = _vsc.clip_ocr_score(uid, idx)
        motion, _ = _vsc.motion_score(uid, e_sec - s_sec, salt=idx * 37)
        lum_ok = ~missing & (np.nan_to_num(lum) >= LUM_MIN) & (np.nan_to_num(lum) <= LUM_MAX)
        passed = (
            lum_ok
            & (num_frames >= CLIP_FRAMES_MIN)
            & _vsc.aesthetic_gate(np.ones(len(uid), dtype=bool), aes)
            & _vsc.ocr_gate(np.ones(len(uid), dtype=bool), ocr)
            & (motion >= _vsc.MOTION_MIN)
            & (motion <= _vsc.MOTION_MAX)
        )
        return pd.DataFrame(
            {
                "conv_id": conv,
                "clip_id": pd.Series(conv).astype(str) + "_" + pd.Series(idx).astype(str),
                "num_frames": num_frames,
                "luminance_mean": lum,
                "aesthetic_score": aes,
                "ocr_score": ocr,
                "motion_score": motion,
                "passed": passed,
            }
        )

    return _scene_chunks(sf_dir).map_batches(gate, batch_format="pandas", batch_size=None)


@register(
    "scene_segments",
    _SCENE_CHUNKS_SQL
    + "SELECT conv_id, session_id, chunk_id, chunk_start_us, chunk_end_us FROM chunks",
)
def q_scene_segments(sf_dir: str):
    """VideoSceneFilter trim/split segment math
    (video_scene_filter.py:155-203) over sessions-as-scenes; see
    stages/scenes.py."""
    from dataflow_mm_ray.stages.scenes import scene_segments

    return scene_segments(
        sf_dir, gap_s=SESSION_GAP_S, start_remove_s=SCENE_SR_S, end_remove_s=SCENE_ER_S,
        min_s=SCENE_MIN_S, max_s=SCENE_MAX_S,
    )


@register(
    "tool_join",
    TRANSCRIPTS_CTE
    + """
, inv AS (
  SELECT conv_id, turn_idx, tool, ts FROM transcripts
  WHERE role = 'assistant' AND tool IS NOT NULL
), resp AS (
  SELECT conv_id, turn_idx, ts FROM transcripts WHERE role = 'tool'
)
SELECT i.conv_id, i.turn_idx AS invoke_idx, i.tool,
       CAST(r.turn_idx AS DOUBLE) AS response_idx,
       CAST(epoch_us(r.ts) - epoch_us(i.ts) AS DOUBLE) AS latency_us
FROM inv i LEFT JOIN resp r
  ON r.conv_id = i.conv_id AND r.turn_idx > i.turn_idx
QUALIFY row_number() OVER (PARTITION BY i.conv_id, i.turn_idx ORDER BY r.turn_idx NULLS LAST) = 1
""",
)
def q_tool_join(sf_dir: str):
    return transcripts_partitioned(sf_dir, join.join_kernel, fast=True)


@register(
    "window_dedup_first",
    TRANSCRIPTS_CTE
    + f"""
, keyed AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         (epoch_us(ts) // {TUMBLING_WIDTH_S * _US}) * {TUMBLING_WIDTH_S * _US} AS window_start_us,
         regexp_replace(text, ' #[0-9]+ ', ' ', 'g') AS k
  FROM transcripts
)
SELECT window_start_us, conv_id, turn_idx, ts_us, n_copies FROM (
  SELECT window_start_us, conv_id, turn_idx, ts_us,
         row_number() OVER (PARTITION BY window_start_us, k
                            ORDER BY ts_us, conv_id, turn_idx) AS rn,
         count(*) OVER (PARTITION BY window_start_us, k) AS n_copies
  FROM keyed
) WHERE rn = 1
""",
)
def q_window_dedup_first(sf_dir: str):
    """Windowed exact dedup (dropDuplicates-within-watermark, batch
    twin): within each tumbling window keep the first occurrence per
    content key (event-id-stripped text) under (ts, conv_id, turn_idx)
    order, with the window-local copy count. ONE content-key-hashed
    exchange — the bounded-state production shape of `dedup_exact`
    (whose global key state a stream cannot hold); the streamed twin is
    the `wdedup` output stream (key-hash-routed shard state)."""
    import numpy as np

    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.stages.dedup import _EVENT_ID_RE

    width_us = TUMBLING_WIDTH_S * _US

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        ts_us = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                "window_start_us": (ts_us // width_us) * width_us,
                "k": b["text"].str.replace(_EVENT_ID_RE, " ", regex=True).to_numpy(),
                "conv_id": b["conv_id"].to_numpy(),
                "turn_idx": b["turn_idx"].to_numpy(dtype=np.int32),
                "ts_us": ts_us,
            }
        )

    rows = transcripts_from_events(sf_dir).map_batches(prep, batch_format="pandas")

    def winner(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame(
                {"window_start_us": pd.Series([], dtype=np.int64),
                 "conv_id": pd.Series([], dtype=object),
                 "turn_idx": pd.Series([], dtype=np.int32),
                 "ts_us": pd.Series([], dtype=np.int64),
                 "n_copies": pd.Series([], dtype=np.int64)}
            )
        part = part.sort_values(["ts_us", "conv_id", "turn_idx"], kind="mergesort")
        counts = part.groupby(["window_start_us", "k"], sort=False).size()
        win = part.drop_duplicates(subset=["window_start_us", "k"], keep="first")
        return pd.DataFrame(
            {
                "window_start_us": win["window_start_us"].to_numpy(dtype=np.int64),
                "conv_id": win["conv_id"].to_numpy(),
                "turn_idx": win["turn_idx"].to_numpy(dtype=np.int32),
                "ts_us": win["ts_us"].to_numpy(dtype=np.int64),
                "n_copies": counts.loc[
                    pd.MultiIndex.from_frame(win[["window_start_us", "k"]])
                ].to_numpy(dtype=np.int64),
            }
        ).sort_values(["conv_id", "turn_idx"], kind="mergesort")

    return partition_map(rows, "k", winner)


@register(
    "window_latency_pctl",
    TRANSCRIPTS_CTE
    + f"""
, inv AS (
  SELECT conv_id, turn_idx, ts FROM transcripts
  WHERE role = 'assistant' AND tool IS NOT NULL
), resp AS (
  SELECT conv_id, turn_idx, ts FROM transcripts WHERE role = 'tool'
), m AS (
  SELECT epoch_us(r.ts) AS rts, epoch_us(r.ts) - epoch_us(i.ts) AS lat
  FROM inv i JOIN resp r
    ON r.conv_id = i.conv_id AND r.turn_idx > i.turn_idx
  QUALIFY row_number() OVER (PARTITION BY i.conv_id, i.turn_idx ORDER BY r.turn_idx) = 1
), ranked AS (
  SELECT (rts // {TUMBLING_WIDTH_S * _US}) * {TUMBLING_WIDTH_S * _US} AS window_start_us,
         lat,
         row_number() OVER (PARTITION BY rts // {TUMBLING_WIDTH_S * _US} ORDER BY lat) AS rn,
         count(*) OVER (PARTITION BY rts // {TUMBLING_WIDTH_S * _US}) AS n
  FROM m
)
SELECT window_start_us, max(n) AS n_matched,
       max(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1 THEN lat END) AS p50_lo_us,
       max(CASE WHEN rn = CAST(ceil((n - 1) * 0.5) AS BIGINT) + 1 THEN lat END) AS p50_hi_us,
       max(CASE WHEN rn = CAST(floor((n - 1) * 0.95) AS BIGINT) + 1 THEN lat END) AS p95_lo_us,
       max(CASE WHEN rn = CAST(ceil((n - 1) * 0.95) AS BIGINT) + 1 THEN lat END) AS p95_hi_us
FROM ranked GROUP BY 1 ORDER BY 1
""",
)
def q_window_latency_pctl(sf_dir: str):
    """Per-tumbling-window EXACT latency percentiles of matched
    tool-join pairs, keyed by the RESPONSE timestamp's window (the
    same watermark-aligned keying as the streamed wlat sketch).
    Percentiles are order statistics (the floor/ceil elements straddling
    (n-1)*q) — pure int64 picks, no interpolation float to flap. The
    per-invocation latency rows ship through ONE window-keyed exchange;
    the streamed histogram sketch is the no-row-shipping scale twin."""
    import numpy as np

    from dataflow_mm_ray.partition import partition_map

    width_us = TUMBLING_WIDTH_S * _US

    def lat_rows(part: pd.DataFrame) -> pd.DataFrame:
        j = join._join_partition(part, with_response_ts=True)
        lat = j["latency_us"].to_numpy()
        m = np.isfinite(lat)
        if not m.any():
            return pd.DataFrame({"window_start_us": pd.Series([], dtype=np.int64),
                                 "lat": pd.Series([], dtype=np.int64)})
        rts = j["ts_response_us"].to_numpy()[m].astype(np.int64)
        return pd.DataFrame(
            {"window_start_us": (rts // width_us) * width_us,
             "lat": lat[m].astype(np.int64)}
        )

    def pctl(p: pd.DataFrame) -> pd.DataFrame:
        cols = ["window_start_us", "n_matched", "p50_lo_us", "p50_hi_us",
                "p95_lo_us", "p95_hi_us"]
        if not len(p):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
        rows = []
        for w, g in p.groupby("window_start_us", sort=True):
            lat = np.sort(g["lat"].to_numpy(dtype=np.int64))
            n = len(lat)
            rows.append((
                int(w), n,
                int(lat[int(np.floor((n - 1) * 0.5))]), int(lat[int(np.ceil((n - 1) * 0.5))]),
                int(lat[int(np.floor((n - 1) * 0.95))]), int(lat[int(np.ceil((n - 1) * 0.95))]),
            ))
        return pd.DataFrame(rows, columns=cols).astype(np.int64)

    part = transcripts_partitioned(sf_dir, lat_rows, fast=True)
    return partition_map(part, "window_start_us", pctl, num_partitions=8)


@register(
    "dedup_exact",
    TRANSCRIPTS_CTE
    + """
, keyed AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         regexp_replace(text, ' #[0-9]+ ', ' ') AS dedup_key
  FROM transcripts
)
SELECT conv_id, turn_idx, role, text, tool, ts, dedup_key
FROM keyed
QUALIFY row_number() OVER (PARTITION BY dedup_key ORDER BY conv_id, turn_idx) = 1
""",
)
def q_dedup_exact(sf_dir: str):
    """Arrow end-to-end: Arrow transcript source -> pyarrow regex key ->
    Arrow exchange -> Arrow winner pick (no pandas object frame is ever
    built on this string-heavy path)."""
    ds = dedup.add_dedup_key(transcripts_from_events(sf_dir, arrow=True),
                             arrow=True)
    return dedup.dedup_first_wins(ds, "dedup_key",
                                  order_by=("conv_id", "turn_idx"), arrow=True)


@register(
    "dedup_first_event_time",
    TRANSCRIPTS_CTE
    + """
, keyed AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         regexp_replace(text, ' #[0-9]+ ', ' ') AS dedup_key
  FROM transcripts
)
SELECT conv_id, turn_idx, role, text, tool, ts, dedup_key
FROM keyed
QUALIFY row_number() OVER (PARTITION BY dedup_key ORDER BY ts, conv_id, turn_idx) = 1
""",
)
def q_dedup_first_event_time(sf_dir: str):
    """Event-time-first exact dedup: the winner per content key is the
    minimum (ts, conv_id, turn_idx) — the order a watermark can settle,
    so this is the batch twin of the streamed ``GlobalDedupFirst``
    processor (streaming/processor.py; pinned frame-equal in
    tests/test_processors.py). Same one-shuffle plan as ``dedup_exact``,
    different tie rule."""
    ds = dedup.add_dedup_key(transcripts_from_events(sf_dir, arrow=True),
                             arrow=True)
    return dedup.dedup_first_wins(
        ds, "dedup_key", order_by=("ts", "conv_id", "turn_idx"), arrow=True
    )


@register(
    "score_filter",
    f"""
SELECT event_id, value AS score,
       value >= {SCORE_MIN} AND value <= {SCORE_MAX} AS "select"
FROM events
""",
)
def q_score_filter(sf_dir: str):
    ev = read_table(sf_dir, "events", columns=["event_id", "value"])

    def ren(b):
        return b.rename_columns(["event_id", "score"])

    ev = ev.map_batches(ren, batch_format="pyarrow")
    return filters.score_filter(ev, "score", min_score=SCORE_MIN, max_score=SCORE_MAX)


@register(
    "hot_conversations",
    TRANSCRIPTS_CTE
    + """
SELECT conv_id, count(*) AS n_turns FROM transcripts
GROUP BY 1 ORDER BY n_turns DESC, conv_id LIMIT 10
""",
)
def q_hot_conversations(sf_dir: str):
    # per-partition counts fused with a local top-k (each partition holds
    # all turns of its convs): the driver only sees P*10 candidate rows
    local = transcripts_partitioned(
        sf_dir, lambda t: stats.topk_counts(stats.conv_count_kernel(t), 10), fast=True
    )
    return stats.topk_counts(local.to_pandas(), k=10)


@register(
    "late_events",
    f"""
WITH a AS (
  SELECT user_id, event_id, ts, md5(CAST(event_id AS VARCHAR)) AS ak FROM events
), b AS (
  SELECT *, max(ts) OVER (PARTITION BY user_id ORDER BY ak
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM a
)
SELECT 'conv-' || printf('%06d', user_id) AS conv_id,
       event_id, ts,
       epoch_us(pm) - epoch_us(ts) - CAST({LATENESS_S} AS BIGINT) * 1000000 AS late_by_us
FROM b
WHERE pm IS NOT NULL
  AND epoch_us(pm) - epoch_us(ts) - CAST({LATENESS_S} AS BIGINT) * 1000000 > 0
""",
)
def q_late_events(sf_dir: str):
    return stats.late_events(sf_dir, lateness_s=LATENESS_S)


@register(
    "conversation_digest",
    TRANSCRIPTS_CTE
    + """
SELECT conv_id, count(*) AS n_turns,
       string_agg(role, '|' ORDER BY turn_idx) AS roles_str,
       md5(string_agg(text, chr(31) ORDER BY turn_idx)) AS text_md5
FROM transcripts GROUP BY 1
""",
)
def q_conversation_digest(sf_dir: str):
    return transcripts_partitioned(sf_dir, stats.digest_kernel)


@register(
    "top_turns_per_conv",
    TRANSCRIPTS_CTE
    + """
SELECT conv_id, turn_idx, length(text) AS n_chars
FROM transcripts
QUALIFY row_number() OVER (PARTITION BY conv_id ORDER BY length(text) DESC, turn_idx) <= 3
""",
)
def q_top_turns_per_conv(sf_dir: str):
    """Per-key windowed rank (top-3 longest turns per conversation) —
    the grouped-rank primitive behind per-source sequence numbering
    (SURVEY.md §2.8), one fused shuffle."""
    import numpy as np

    def kernel(t):
        out = t[["conv_id", "turn_idx"]].copy(deep=False)
        out["n_chars"] = (t["text_len"].astype(np.int64) if "text_len" in t.columns
                          else t["text"].str.len().astype(np.int64))
        out = out.sort_values(
            ["conv_id", "n_chars", "turn_idx"], ascending=[True, False, True], kind="mergesort"
        )
        return out.groupby("conv_id", sort=False, group_keys=False).head(3)

    return transcripts_partitioned(sf_dir, kernel)


# --- temporal non-equi operators (as-of join, range join) -----------------

_ASOF_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


@register(
    "asof_enrich",
    """
WITH s AS (
  SELECT 'conv-' || printf('%06d', user_id) AS conv_id,
         CAST(row_number() OVER w - 1 AS INTEGER) AS turn_idx,
         -- one struct per prior click so id and value always come from
         -- the SAME row even when a click's value is NULL (a bare
         -- last_value(...value... IGNORE NULLS) would skip back to an
         -- earlier click's value while id still points at the later one)
         last_value(CASE WHEN event_type = 'click'
                         THEN {'id': event_id, 'v': value} END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT conv_id, turn_idx,
       CAST(pc.id AS DOUBLE) AS prior_click_event_id,
       CAST(pc.v AS DOUBLE) AS prior_click_value
FROM s
""",
)
def q_asof_enrich(sf_dir: str):
    """As-of join: every turn enriched with the latest strictly-prior
    'click' event of the same conversation (stages/temporal.py —
    segmented running-max kernel, one user-keyed shuffle)."""
    from dataflow_mm_ray.partition import partition_map_parquet
    from dataflow_mm_ray.sources.tables import table_path
    from dataflow_mm_ray.stages.temporal import asof_enrich_kernel

    return partition_map_parquet(
        table_path(sf_dir, "events"), _ASOF_EVENT_COLS, "user_id", asof_enrich_kernel
    )


@register(
    "range_join_incidents",
    """
WITH inc AS (
  SELECT user_id, ts AS start_ts, ts + INTERVAL 1800 SECOND AS end_ts
  FROM events WHERE event_type = 'error'
), t AS (
  SELECT user_id, ts,
         'conv-' || printf('%06d', user_id) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER)
           AS turn_idx
  FROM events
)
SELECT t.conv_id, t.turn_idx, CAST(count(i.start_ts) AS BIGINT) AS n_open_incidents
FROM t LEFT JOIN inc i
  ON i.user_id = t.user_id AND i.start_ts <= t.ts AND t.ts < i.end_ts
GROUP BY 1, 2
""",
)
def q_range_join_incidents(sf_dir: str):
    """Range join: count of open per-conversation incident intervals
    [error_ts, error_ts + 30 min) containing each turn's ts
    (stages/temporal.py — merged ±1 boundary sweep, one shuffle)."""
    from dataflow_mm_ray.partition import partition_map_parquet
    from dataflow_mm_ray.sources.tables import table_path
    from dataflow_mm_ray.stages.temporal import incident_count_kernel

    return partition_map_parquet(
        table_path(sf_dir, "events"), _ASOF_EVENT_COLS, "user_id", incident_count_kernel
    )


# --- windowed distinct counting: exact (oracled) + HLL sketch twin --------

@register(
    "window_distinct_convs_exact",
    TRANSCRIPTS_CTE
    + f"""
SELECT make_timestamp(epoch_us(ts) // (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000)
                      * (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000)) AS window_start,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM transcripts GROUP BY 1
""",
)
def q_window_distinct_convs_exact(sf_dir: str):
    """Exact distinct conversations per tumbling window. conv_id is the
    shuffle key, so per-partition (window, conv) distinct counts are
    over DISJOINT conv sets — the second exchange just sums partials."""
    import numpy as np

    from dataflow_mm_ray.partition import partition_map

    us = TUMBLING_WIDTH_S * 1_000_000

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        ts = t["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        w = (ts // us) * us
        pairs = pd.DataFrame({"w": w, "c": t["conv_id"].to_numpy()}).drop_duplicates()
        agg = pairs.groupby("w", sort=False).size()
        return pd.DataFrame({"window_start_us": agg.index.to_numpy(),
                             "n_convs": agg.to_numpy().astype(np.int64)})

    parts = transcripts_partitioned(sf_dir, partial, fast=True)

    def total(p: pd.DataFrame) -> pd.DataFrame:
        agg = p.groupby("window_start_us", sort=False)["n_convs"].sum()
        return pd.DataFrame(
            {"window_start": agg.index.to_numpy().astype("datetime64[us]"),
             "n_convs": agg.to_numpy().astype(np.int64)}
        )

    return partition_map(parts, "window_start_us", total, num_partitions=8)


def _hll_md5_sql() -> str:
    """SQL reproducing the md5-backed HLL over tumbling windows
    (functions/hll_sql.py — register/rank/exact-sum construction
    matching stages/sketch.py hll_estimate_sqlexact)."""
    from dataflow_mm_ray.functions.hll_sql import hll_md5_estimate_sql
    from dataflow_mm_ray.state.store import _DCOUNT_P

    us = TUMBLING_WIDTH_S * 1_000_000
    pairs = (
        f"SELECT DISTINCT epoch_us(ts) // {us} * {us} AS g, conv_id AS v FROM transcripts"
    )
    return TRANSCRIPTS_CTE + ", " + hll_md5_estimate_sql(
        pairs, "make_timestamp(g)", "window_start", "approx_distinct_convs",
        p=_DCOUNT_P,
    )


@register("window_distinct_convs_md5", _hll_md5_sql())
def q_window_distinct_convs_md5(sf_dir: str):
    """The HLL windowed distinct-count sketch under a FULL SQL oracle:
    md5-derived 64-bit hashes (SQL-recomputable) feed the same p=14
    register/rank pipeline, and the estimate uses the exact-integer
    register sum so DuckDB reproduces the double bit-for-bit
    (stages/sketch.py md5_hash64 / hll_estimate_sqlexact). The SipHash
    twin below stays the production path; this one proves the sketch
    math end-to-end against count(DISTINCT)-free SQL."""
    import numpy as np

    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events
    from dataflow_mm_ray.stages.sketch import (
        _ranks,
        hll_estimate_sqlexact,
        md5_hash64,
        merge_register_frames,
        registers_from_triples,
    )
    from dataflow_mm_ray.state.store import _DCOUNT_P

    us = TUMBLING_WIDTH_S * 1_000_000

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        w = (ts // us) * us
        pairs = pd.DataFrame({"w": w, "c": b["conv_id"].to_numpy()}).drop_duplicates()
        idx, rank = _ranks(md5_hash64(pairs["c"].to_numpy()), _DCOUNT_P)
        gs, regs = registers_from_triples(
            pairs["w"].to_numpy(), idx.astype(np.int32), rank.astype(np.uint8), _DCOUNT_P
        )
        return pd.DataFrame({"window_start_us": np.asarray(gs, dtype=np.int64), "__regs": regs})

    part = transcripts_from_events(sf_dir).map_batches(partials, batch_format="pandas")

    def merge(p: pd.DataFrame) -> pd.DataFrame:
        wk, wr = merge_register_frames(
            p["window_start_us"].to_numpy(dtype=np.int64), p["__regs"], _DCOUNT_P
        )
        return pd.DataFrame(
            {"window_start": wk.astype(np.int64).astype("datetime64[us]"),
             "approx_distinct_convs": np.asarray(
                 [hll_estimate_sqlexact(np.frombuffer(r, dtype=np.uint8)) for r in wr],
                 dtype=np.int64)}
        )

    return partition_map(part, "window_start_us", merge, num_partitions=8)


@register("window_distinct_convs", None)  # HLL sketch: pytest-oracled
def q_window_distinct_convs(sf_dir: str):
    """HLL sketch of distinct conversations per tumbling window — the
    batch twin of the engine's streamed 'wdistinct' output (identical
    registers at infinite lateness: max-merge is order-free), accuracy
    pinned vs the exact oracled twin in tests/test_sketch.py."""
    import numpy as np

    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events
    from dataflow_mm_ray.stages.sketch import (
        hll_estimate,
        hll_partials_by_group,
        merge_register_frames,
    )
    from dataflow_mm_ray.state.store import _DCOUNT_P

    us = TUMBLING_WIDTH_S * 1_000_000

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        w = (ts // us) * us
        gs, regs = hll_partials_by_group(w, b["conv_id"].to_numpy(), _DCOUNT_P)
        return pd.DataFrame({"window_start_us": np.asarray(gs, dtype=np.int64), "__regs": regs})

    part = transcripts_from_events(sf_dir).map_batches(partials, batch_format="pandas")

    def merge(p: pd.DataFrame) -> pd.DataFrame:
        wk, wr = merge_register_frames(
            p["window_start_us"].to_numpy(dtype=np.int64), p["__regs"], _DCOUNT_P
        )
        return pd.DataFrame(
            {"window_start_us": wk.astype(np.int64),
             "approx_distinct_convs": np.asarray(
                 [hll_estimate(np.frombuffer(r, dtype=np.uint8)) for r in wr], dtype=np.int64)}
        )

    return partition_map(part, "window_start_us", merge, num_partitions=8)


# ---------------------------------------------------------------------------
# CEP pattern matching (stages/cep.py): tool invocation -> first tool
# response -> first user follow-up, within ROUNDTRIP_WITHIN_S.
# ---------------------------------------------------------------------------

_CEP_NXT = """
, nxt AS (
  SELECT conv_id, turn_idx, role, tool, ts,
     MIN(CASE WHEN role = 'assistant' AND tool IS NOT NULL THEN turn_idx END)
        OVER (PARTITION BY conv_id ORDER BY turn_idx
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS inv_here,
     MIN(CASE WHEN role = 'assistant' AND tool IS NOT NULL THEN turn_idx END)
        OVER wf AS next_inv,
     MIN(CASE WHEN role = 'tool' THEN turn_idx END) OVER wf AS next_resp,
     MIN(CASE WHEN role = 'user' THEN turn_idx END) OVER wf AS next_user
  FROM transcripts
  WINDOW wf AS (PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
"""


def _cep_within_us() -> int:
    from dataflow_mm_ray.stages.cep import ROUNDTRIP_WITHIN_S

    return ROUNDTRIP_WITHIN_S * 1_000_000


def _cep_all_sql() -> str:
    # first-next-occurrence chaining as window mins; every invoke is an
    # independent candidate (policy 'all' — overlaps allowed)
    return TRANSCRIPTS_CTE + _CEP_NXT + f"""
, cand AS (
  SELECT a.conv_id, a.turn_idx AS i, a.tool, a.ts AS ts_start,
         a.next_resp AS j, b.next_user AS k
  FROM nxt a JOIN nxt b ON b.conv_id = a.conv_id AND b.turn_idx = a.next_resp
  WHERE a.role = 'assistant' AND a.tool IS NOT NULL
    AND a.next_resp IS NOT NULL AND b.next_user IS NOT NULL
), m AS (
  SELECT c.conv_id, c.i, c.j, c.k, c.tool, c.ts_start, t.ts AS ts_end,
         epoch_us(t.ts) - epoch_us(c.ts_start) AS span_us
  FROM cand c JOIN transcripts t
    ON t.conv_id = c.conv_id AND t.turn_idx = c.k
  WHERE epoch_us(t.ts) - epoch_us(c.ts_start) <= {_cep_within_us()}
)
SELECT conv_id,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY i) - 1 AS BIGINT)
         AS match_seq,
       CAST(i AS BIGINT) AS invoke_turn_idx,
       CAST(j AS BIGINT) AS response_turn_idx,
       CAST(k AS BIGINT) AS followup_turn_idx,
       tool, ts_start, ts_end, span_us
FROM m
"""


def _cep_chain_all_sql() -> str:
    # invoke -> first response -> NEXT invoke, every invoke a candidate
    return TRANSCRIPTS_CTE + _CEP_NXT + f"""
, cand AS (
  SELECT a.conv_id, a.turn_idx AS i, a.tool, a.ts AS ts_start,
         a.next_resp AS j, b.next_inv AS k
  FROM nxt a JOIN nxt b ON b.conv_id = a.conv_id AND b.turn_idx = a.next_resp
  WHERE a.role = 'assistant' AND a.tool IS NOT NULL
    AND a.next_resp IS NOT NULL AND b.next_inv IS NOT NULL
), m AS (
  SELECT c.conv_id, c.i, c.j, c.k, c.tool, c.ts_start, t.ts AS ts_end,
         epoch_us(t.ts) - epoch_us(c.ts_start) AS span_us
  FROM cand c JOIN transcripts t
    ON t.conv_id = c.conv_id AND t.turn_idx = c.k
  WHERE epoch_us(t.ts) - epoch_us(c.ts_start) <= {_cep_within_us()}
)
SELECT conv_id,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY i) - 1 AS BIGINT)
         AS match_seq,
       CAST(i AS BIGINT) AS invoke_turn_idx,
       CAST(j AS BIGINT) AS response_turn_idx,
       CAST(k AS BIGINT) AS reinvoke_turn_idx,
       tool, ts_start, ts_end, span_us
FROM m
"""


def _cep_chain_skip_past_sql() -> str:
    # AFTER MATCH SKIP PAST LAST ROW: the scan automaton as a recursive
    # CTE — state (conv, pointer p, seq); each iteration chains the
    # three first-next lookups via self-joins on nxt, emits on success
    # (pointer -> k+1) and retries from the next row after a timed-out
    # invoke (pointer -> i+1). Inner joins terminate a conversation as
    # soon as any step has no occurrence in the remaining suffix —
    # exactly the kernel's deactivation rule.
    w = _cep_within_us()
    return "WITH RECURSIVE _ev_ranked AS (" + TRANSCRIPTS_CTE.split("WITH _ev_ranked AS (", 1)[1] + _CEP_NXT + f"""
, rec AS (
  SELECT conv_id, 0 AS p, 0 AS seq, FALSE AS emit,
         CAST(NULL AS INTEGER) AS i, CAST(NULL AS INTEGER) AS j,
         CAST(NULL AS INTEGER) AS k, CAST(NULL AS VARCHAR) AS tool,
         CAST(NULL AS TIMESTAMP) AS ts_i, CAST(NULL AS TIMESTAMP) AS ts_k
  FROM (SELECT DISTINCT conv_id FROM transcripts)
  UNION ALL
  SELECT r.conv_id,
         CASE WHEN epoch_us(ka.ts) - epoch_us(ia.ts) <= {w}
              THEN ka.turn_idx + 1 ELSE ia.turn_idx + 1 END AS p,
         CASE WHEN epoch_us(ka.ts) - epoch_us(ia.ts) <= {w}
              THEN r.seq + 1 ELSE r.seq END AS seq,
         epoch_us(ka.ts) - epoch_us(ia.ts) <= {w} AS emit,
         ia.turn_idx AS i, ja.turn_idx AS j, ka.turn_idx AS k,
         ia.tool, ia.ts AS ts_i, ka.ts AS ts_k
  FROM rec r
  JOIN nxt pa ON pa.conv_id = r.conv_id AND pa.turn_idx = r.p
  JOIN nxt ia ON ia.conv_id = r.conv_id AND ia.turn_idx = pa.inv_here
  JOIN nxt ja ON ja.conv_id = r.conv_id AND ja.turn_idx = ia.next_resp
  JOIN nxt ka ON ka.conv_id = r.conv_id AND ka.turn_idx = ja.next_inv
)
SELECT conv_id, CAST(seq - 1 AS BIGINT) AS match_seq,
       CAST(i AS BIGINT) AS invoke_turn_idx,
       CAST(j AS BIGINT) AS response_turn_idx,
       CAST(k AS BIGINT) AS reinvoke_turn_idx,
       tool, ts_i AS ts_start, ts_k AS ts_end,
       epoch_us(ts_k) - epoch_us(ts_i) AS span_us
FROM rec WHERE emit
"""


@register("cep_tool_roundtrip", _cep_all_sql())
def q_cep_tool_roundtrip(sf_dir: str):
    """Every tool invocation's roundtrip (policy 'all'): fused into the
    transcript shuffle, text-free fast derivation."""
    from dataflow_mm_ray.stages.cep import tool_roundtrip_kernel

    return transcripts_partitioned(
        sf_dir, lambda t: tool_roundtrip_kernel(t, "all"), fast=True
    )


@register("cep_tool_chain", _cep_chain_all_sql())
def q_cep_tool_chain(sf_dir: str):
    """Multi-tool chains, every invoke a candidate (overlaps allowed)."""
    from dataflow_mm_ray.stages.cep import tool_chain_kernel

    return transcripts_partitioned(
        sf_dir, lambda t: tool_chain_kernel(t, "all"), fast=True
    )


@register("cep_tool_chain_nonoverlap", _cep_chain_skip_past_sql())
def q_cep_tool_chain_nonoverlap(sf_dir: str):
    """Non-overlapping chains (AFTER MATCH SKIP PAST LAST ROW) — on the
    chain pattern the two policies genuinely diverge (each invoke ends
    one chain and starts the next), unlike the roundtrip whose matches
    never overlap in the fixture's role cycle."""
    from dataflow_mm_ray.stages.cep import tool_chain_kernel

    return transcripts_partitioned(
        sf_dir, lambda t: tool_chain_kernel(t, "skip_past"), fast=True
    )


FUNNEL_WITHIN_S = 150_000


def _cep_funnel_sql() -> str:
    # the same recursive scan automaton as the chain oracle, over the
    # RAW events table: view -> first click -> first purchase per user,
    # ordered by (ts, event_id), non-overlapping episodes
    w = FUNNEL_WITHIN_S * 1_000_000
    return f"""
WITH RECURSIVE ev AS (
  SELECT event_id, ts, user_id, event_type,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
              AS INTEGER) AS pos
  FROM events
), nxt AS (
  SELECT user_id, pos, event_id, ts,
     MIN(CASE WHEN event_type = 'view' THEN pos END)
        OVER (PARTITION BY user_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS view_here,
     MIN(CASE WHEN event_type = 'click' THEN pos END) OVER wf AS next_click,
     MIN(CASE WHEN event_type = 'purchase' THEN pos END) OVER wf AS next_purchase
  FROM ev
  WINDOW wf AS (PARTITION BY user_id ORDER BY pos
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
), rec AS (
  SELECT user_id, 0 AS p, 0 AS seq, FALSE AS emit,
         CAST(NULL AS BIGINT) AS i_id, CAST(NULL AS BIGINT) AS j_id,
         CAST(NULL AS BIGINT) AS k_id,
         CAST(NULL AS TIMESTAMP) AS ts_i, CAST(NULL AS TIMESTAMP) AS ts_k
  FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL
  SELECT r.user_id,
         CASE WHEN epoch_us(ka.ts) - epoch_us(ia.ts) <= {w}
              THEN ka.pos + 1 ELSE ia.pos + 1 END AS p,
         CASE WHEN epoch_us(ka.ts) - epoch_us(ia.ts) <= {w}
              THEN r.seq + 1 ELSE r.seq END AS seq,
         epoch_us(ka.ts) - epoch_us(ia.ts) <= {w} AS emit,
         ia.event_id AS i_id, ja.event_id AS j_id, ka.event_id AS k_id,
         ia.ts AS ts_i, ka.ts AS ts_k
  FROM rec r
  JOIN nxt pa ON pa.user_id = r.user_id AND pa.pos = r.p
  JOIN nxt ia ON ia.user_id = r.user_id AND ia.pos = pa.view_here
  JOIN nxt ja ON ja.user_id = r.user_id AND ja.pos = ia.next_click
  JOIN nxt ka ON ka.user_id = r.user_id AND ka.pos = ja.next_purchase
)
SELECT user_id, CAST(seq - 1 AS BIGINT) AS match_seq,
       i_id AS view_event_id, j_id AS click_event_id,
       k_id AS purchase_event_id,
       ts_i AS ts_start, ts_k AS ts_end,
       epoch_us(ts_k) - epoch_us(ts_i) AS span_us
FROM rec WHERE emit
"""


@register("cep_funnel", _cep_funnel_sql())
def q_cep_funnel(sf_dir: str):
    """Conversion funnel over the RAW events table (view -> first
    click -> first purchase per user, within FUNNEL_WITHIN_S,
    non-overlapping episodes) — the generic match_pattern operator on a
    non-transcript stream, ordered by (ts, event_id)."""
    import numpy as np

    from dataflow_mm_ray.stages.cep import match_pattern

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    def typ(name):
        return lambda df: df["event_type"].to_numpy() == name

    return match_pattern(
        ev,
        (("view", typ("view")), ("click", typ("click")),
         ("purchase", typ("purchase"))),
        within_us=FUNNEL_WITHIN_S * 1_000_000,
        policy="skip_past",
        conv_col="user_id",
        idx_col="event_id",
        order_by=("ts", "event_id"),
    )


def _cep_burst_sql() -> str:
    # view -> click+ -> purchase (policy 'all'): the Kleene-collect is
    # two prefix-sum windows — clicks-in-(v,k) = cum_click[k] -
    # cum_click[v] (neither endpoint is a click), last collected =
    # last-click-at-or-before row k
    w = FUNNEL_WITHIN_S * 1_000_000
    return f"""
WITH ev AS (
  SELECT event_id, ts, user_id, event_type,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
              AS INTEGER) AS pos
  FROM events
), agg AS (
  SELECT user_id, pos, event_id, ts, event_type,
     COUNT(CASE WHEN event_type = 'click' THEN 1 END)
        OVER (PARTITION BY user_id ORDER BY pos) AS cum_click,
     MAX(CASE WHEN event_type = 'click' THEN pos END)
        OVER (PARTITION BY user_id ORDER BY pos) AS lc_pos,
     MIN(CASE WHEN event_type = 'click' THEN pos END) OVER wf AS next_click,
     MIN(CASE WHEN event_type = 'purchase' THEN pos END) OVER wf AS next_purchase
  FROM ev
  WINDOW wf AS (PARTITION BY user_id ORDER BY pos
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
), cand AS (
  SELECT a.user_id, a.pos AS vp, a.event_id AS view_event_id,
         a.ts AS ts_start, a.cum_click AS cv,
         a.next_click AS b1, b.next_purchase AS kp
  FROM agg a JOIN agg b ON b.user_id = a.user_id AND b.pos = a.next_click
  WHERE a.event_type = 'view' AND a.next_click IS NOT NULL
    AND b.next_purchase IS NOT NULL
), m AS (
  SELECT c.user_id, c.vp, c.view_event_id, c.ts_start,
         jb.event_id AS click_event_id,
         jk.cum_click - c.cv AS click_count,
         jl.event_id AS click_last_event_id,
         jk.event_id AS purchase_event_id,
         jk.ts AS ts_end,
         epoch_us(jk.ts) - epoch_us(c.ts_start) AS span_us
  FROM cand c
  JOIN agg jb ON jb.user_id = c.user_id AND jb.pos = c.b1
  JOIN agg jk ON jk.user_id = c.user_id AND jk.pos = c.kp
  JOIN agg jl ON jl.user_id = c.user_id AND jl.pos = jk.lc_pos
  WHERE epoch_us(jk.ts) - epoch_us(c.ts_start) <= {w}
)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY vp) - 1 AS BIGINT)
         AS match_seq,
       view_event_id,
       click_event_id, CAST(click_count AS BIGINT) AS click_count,
       click_last_event_id, purchase_event_id,
       ts_start, ts_end, span_us
FROM m
"""


@register("cep_view_click_burst", _cep_burst_sql())
def q_cep_view_click_burst(sf_dir: str):
    """view -> click+ -> purchase per user: the Kleene-collect
    quantifier (first click anchors, every click before the purchase is
    collected — count and last emitted)."""
    from dataflow_mm_ray.stages.cep import match_pattern

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    def typ(name):
        return lambda df: df["event_type"].to_numpy() == name

    return match_pattern(
        ev,
        (("view", typ("view")), ("click", typ("click"), "+"),
         ("purchase", typ("purchase"))),
        within_us=FUNNEL_WITHIN_S * 1_000_000,
        policy="all",
        conv_col="user_id",
        idx_col="event_id",
        order_by=("ts", "event_id"),
    )


def _neg_within_s() -> int:
    from dataflow_mm_ray.stages.cep import ALERT_DEADLINE_S

    return ALERT_DEADLINE_S


def _cep_unanswered_sql() -> str:
    # absence detection: invocations with NO tool response within the
    # deadline (LEFT JOIN on the first-next response; NULL or late both
    # count as unanswered)
    w = _neg_within_s() * 1_000_000
    return TRANSCRIPTS_CTE + _CEP_NXT + f"""
SELECT a.conv_id,
       CAST(row_number() OVER (PARTITION BY a.conv_id ORDER BY a.turn_idx) - 1
            AS BIGINT) AS match_seq,
       CAST(a.turn_idx AS BIGINT) AS invoke_turn_idx,
       a.tool, a.ts AS ts_start
FROM nxt a
LEFT JOIN transcripts t
  ON t.conv_id = a.conv_id AND t.turn_idx = a.next_resp
WHERE a.role = 'assistant' AND a.tool IS NOT NULL
  AND (a.next_resp IS NULL OR epoch_us(t.ts) - epoch_us(a.ts) > {w})
"""


@register("cep_unanswered_invocations", _cep_unanswered_sql())
def q_cep_unanswered_invocations(sf_dir: str):
    """Absence detection ('!' marker): tool invocations whose first
    response does not arrive within ALERT_DEADLINE_S — the
    timeout-alert shape of CEP negation; the streamed twin is the
    engine's 'alerts' stream."""
    from dataflow_mm_ray.stages.cep import (
        ALERT_DEADLINE_S,
        TOOL_ROUNDTRIP_STEPS,
        US,
        match_pattern_kernel,
    )

    steps = (TOOL_ROUNDTRIP_STEPS[0],
             (TOOL_ROUNDTRIP_STEPS[1][0], TOOL_ROUNDTRIP_STEPS[1][1], "!"))

    def kern(t):
        out = match_pattern_kernel(
            t, steps, within_us=ALERT_DEADLINE_S * US, policy="all",
            carry=("tool",),
        )
        # single-positive pattern: ts_end/span are degenerate (== start)
        return out.drop(columns=["ts_end", "span_us"])

    return transcripts_partitioned(sf_dir, kern, fast=True)


from dataflow_mm_ray.stages.stats import TOP_TOOLS_K


@register(
    "windowed_top_tools",
    TRANSCRIPTS_CTE
    + f"""
, wt AS (
  SELECT make_timestamp(epoch_us(ts) // (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000)
                        * (CAST({TUMBLING_WIDTH_S} AS BIGINT) * 1000000)) AS window_start,
         tool, count(*) AS n_invocations
  FROM transcripts
  WHERE role = 'assistant' AND tool IS NOT NULL
  GROUP BY 1, 2
)
SELECT window_start, tool, CAST(n_invocations AS BIGINT) AS n_invocations,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY n_invocations DESC, tool) AS rank
  FROM wt
)
WHERE rank <= {TOP_TOOLS_K}
""",
)
def q_windowed_top_tools(sf_dir: str):
    """Hot tools per tumbling window (windowed top-k): the partial
    (window, tool) counts are FUSED into the transcript-derivation
    shuffle (fast=True — raw text never materializes), then ONE tiny
    window-keyed exchange applies a vectorized per-window rank cut
    (count desc, tool asc tie-break)."""
    import numpy as np
    import pandas as pd

    from dataflow_mm_ray.groupsum import group_sum, group_sum_df
    from dataflow_mm_ray.partition import partition_map

    width_us = TUMBLING_WIDTH_S * 1_000_000

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        inv = b[(b["role"].to_numpy() == "assistant") & b["tool"].notna().to_numpy()]
        if not len(inv):
            return pd.DataFrame({"window_start_us": pd.Series([], dtype=np.int64),
                                 "tool": pd.Series([], dtype=object),
                                 "n_invocations": pd.Series([], dtype=np.int64)})
        us = inv["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return group_sum(
            {"window_start_us": (us // width_us) * width_us,
             "tool": inv["tool"].to_numpy()},
            {"n_invocations": np.ones(len(inv), dtype=np.int64)},
        )

    def topk(p: pd.DataFrame) -> pd.DataFrame:
        from dataflow_mm_ray.stages.stats import window_topk_cut

        cut = window_topk_cut(
            group_sum_df(p, ["window_start_us", "tool"], ["n_invocations"])
            if len(p) else p,
            TOP_TOOLS_K,
        )
        return pd.DataFrame(
            {"window_start": cut["window_start_us"].to_numpy(dtype=np.int64).astype("datetime64[us]"),
             "tool": cut["tool"].to_numpy(),
             "n_invocations": cut["n_invocations"].to_numpy(dtype=np.int64),
             "rank": cut["rank"].to_numpy(dtype=np.int64)}
        )

    part = transcripts_partitioned(sf_dir, partials, fast=True)
    return partition_map(part, "window_start_us", topk, num_partitions=8)


@register(
    "window_role_counts",
    TRANSCRIPTS_CTE
    + f"""
SELECT (epoch_us(ts) // {TUMBLING_WIDTH_S * _US}) * {TUMBLING_WIDTH_S * _US} AS window_start_us,
       role, count(*) AS n_turns
FROM transcripts
GROUP BY 1, 2
""",
)
def q_window_role_counts(sf_dir: str):
    """Global per-(tumbling window, role) turn counts — the batch twin
    of the shipped ``WindowRoleCounts`` stateful processor
    (streaming/processor.py): per-batch combiner fused into the
    transcript shuffle, then one tiny window-keyed exchange."""
    import numpy as np

    from dataflow_mm_ray.groupsum import group_sum, group_sum_df
    from dataflow_mm_ray.partition import partition_map

    width_us = TUMBLING_WIDTH_S * _US

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return group_sum(
            {"window_start_us": (us // width_us) * width_us,
             "role": b["role"].to_numpy()},
            {"n_turns": np.ones(len(b), dtype=np.int64)},
        )

    def total(p: pd.DataFrame) -> pd.DataFrame:
        return group_sum_df(p, ["window_start_us", "role"], ["n_turns"])

    part = transcripts_partitioned(sf_dir, partials, fast=True)
    return partition_map(part, "window_start_us", total, num_partitions=8)


@register(
    "conv_span",
    TRANSCRIPTS_CTE
    + """
SELECT conv_id, min(epoch_us(ts)) AS first_ts_us, max(epoch_us(ts)) AS last_ts_us,
       count(*) AS n_turns,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us
FROM transcripts GROUP BY conv_id
""",
)
def q_conv_span(sf_dir: str):
    """Per-conversation lifetime span (first/last event-time, turn
    count) — the batch twin of the shipped ``ConvSpan`` stateful
    processor (streaming/processor.py). The min/max/sum partials fuse
    into the transcript shuffle; the conv-keyed exchange is the same
    one every transcript query rides."""
    import numpy as np

    from dataflow_mm_ray.partition import partition_map

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame(
                {"conv_id": b["conv_id"].to_numpy(),
                 "first_ts_us": us, "last_ts_us": us,
                 "n_turns": np.ones(len(b), dtype=np.int64)}
            )
            .groupby("conv_id", sort=False)
            .agg(first_ts_us=("first_ts_us", "min"),
                 last_ts_us=("last_ts_us", "max"),
                 n_turns=("n_turns", "sum"))
            .reset_index()
        )

    def total(p: pd.DataFrame) -> pd.DataFrame:
        agg = (
            p.groupby("conv_id", sort=False)
            .agg(first_ts_us=("first_ts_us", "min"),
                 last_ts_us=("last_ts_us", "max"),
                 n_turns=("n_turns", "sum"))
            .reset_index()
        )
        agg["span_us"] = (agg["last_ts_us"].to_numpy(dtype=np.int64)
                          - agg["first_ts_us"].to_numpy(dtype=np.int64))
        return agg

    part = transcripts_partitioned(sf_dir, partials, fast=True)
    return partition_map(part, "conv_id", total)


# ---------------------------------------------------------------------------
# the reference's COMPOSED video pipeline as a declarative-runner chain
# (VideoFilteredClipGenerator, video_clip_and_filter_pipeline.py:126-216:
# info/scene -> clip -> frames -> aesthetic -> luminance -> OCR -> cut) —
# stages/videochain.py ops resolved through the registry and chained by
# pipelines/runner.py; one composed SQL oracle over the same stub
# universe (shares the scene-chunk CTE and the scorer SQL fragments)
# ---------------------------------------------------------------------------

from dataflow_mm_ray.stages import videochain as _vchain  # noqa: E402

VIDEO_CHAIN_STEPS = [
    ("events_to_transcripts", {}),
    ("video_scene_chunks", {"gap_s": SESSION_GAP_S, "start_remove_s": SCENE_SR_S,
                            "end_remove_s": SCENE_ER_S, "min_s": SCENE_MIN_S,
                            "max_s": SCENE_MAX_S}),
    ("video_clip_metadata", {"frames_min": CLIP_FRAMES_MIN,
                             "resolution_max": CLIP_RES_MAX}),
    ("video_frame_plan", {}),
    ("video_aesthetic_score", {}),
    ("video_luminance_score", {}),
    ("video_ocr_score", {}),
    ("video_cut_plan", {}),
]


@register(
    "video_chain_pipeline",
    _SCENE_CHUNKS_SQL + f"""
, probe AS (
  SELECT conv_id, CAST(substr(conv_id, 6) AS BIGINT) AS uid,
         row_number() OVER (PARTITION BY conv_id ORDER BY session_id, chunk_id) - 1 AS clip_idx,
         chunk_start_us // 1000000 AS s_sec, chunk_end_us // 1000000 AS e_sec
  FROM chunks
), meta AS (
  SELECT conv_id, uid, clip_idx, s_sec, e_sec,
         CAST(320 + (uid % 10) * 160 AS BIGINT) AS width,
         CAST(240 + (uid % 7) * 120 AS BIGINT) AS height,
         CAST(CASE uid % 3 WHEN 0 THEN 24 WHEN 1 THEN 30 ELSE 60 END AS BIGINT) AS fps
  FROM probe
), clips AS (
  SELECT * FROM meta
  WHERE (e_sec - s_sec) * fps >= {CLIP_FRAMES_MIN}
    AND width * height <= {CLIP_RES_MAX}
), scored AS (
  SELECT conv_id,
         conv_id || '_' || CAST(clip_idx AS VARCHAR) AS clip_id,
         s_sec, e_sec, width, height,
         {_AES_SCORE_SQL} AS aesthetic_score,
         CASE WHEN (uid + clip_idx) % {_vchain._LUM_MISSING_MOD} = 0 THEN NULL
              ELSE CAST((uid * 31 + clip_idx * 17) % 256 AS DOUBLE) END AS luminance_mean,
         {_OCR_SCORE_SQL} AS ocr_score
  FROM clips
)
SELECT conv_id, clip_id,
       s_sec AS timestamp_start, e_sec AS timestamp_end,
       aesthetic_score, luminance_mean, ocr_score,
       least(height, width) > 480 AS scaled,
       'clips/' || clip_id || '.mp4' AS video_path
FROM scored
WHERE coalesce(aesthetic_score >= {_vsc.AES_MIN}, FALSE)
  AND coalesce(luminance_mean >= {_vchain.LUM_MIN}
               AND luminance_mean <= {_vchain.LUM_MAX}, FALSE)
  AND coalesce(ocr_score >= {_vsc.OCR_MIN}
               AND ocr_score <= {_vsc.OCR_MAX}, FALSE)
""",
)
def q_video_chain_pipeline(sf_dir: str):
    """The eight reference steps as ONE lazy runner chain (registry
    ops, no per-step IR); `jobs/specs/video_chain.json` is the same
    chain as a CLI spec with cache/resume. The oracle recomputes the
    whole composition in SQL from the shared fragments."""
    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline
    from dataflow_mm_ray.sources.transcripts import _EVENT_COLS

    steps = [Step(op, kw) for op, kw in VIDEO_CHAIN_STEPS]
    return run_pipeline(read_table(sf_dir, "events", columns=list(_EVENT_COLS)),
                        steps)
