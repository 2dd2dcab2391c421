"""Operator-parity queries: conversation formatting, generators
(stub serving), reward evaluation, chunking, UDF hook, corpus stats,
percentile filters."""
from __future__ import annotations

import json

import numpy as np
import pandas as pd

from dataflow_mm_ray.queries import register
from dataflow_mm_ray.sources.tables import read_table
from dataflow_mm_ray.sources.transcripts import TRANSCRIPTS_CTE, transcripts_partitioned

KEEP_RATIO = 0.3  # CLIPScoreFilter-style top-fraction keep


def _documents(sf_dir: str):
    return read_table(sf_dir, "documents", columns=["doc_id", "text"])


# ---------------------------------------------------------------------------
# conversation formatting (Conversation2Message)
# ---------------------------------------------------------------------------

_CONV_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
# braces below are JSON literals — splice _CONV_WS by replace, not f-string
_CONV_MESSAGE_SQL = TRANSCRIPTS_CTE + """
, turns AS (
  SELECT conv_id, turn_idx,
         CASE role WHEN 'user' THEN 'user' ELSE 'assistant' END AS mrole,
         trim(regexp_replace(trim(text, <WS>), '\\n+', chr(10), 'g'), <WS>)
           AS cleaned
  FROM transcripts WHERE role IN ('user', 'assistant')
), frag AS (
  SELECT conv_id, turn_idx,
         CASE WHEN cleaned <> '' THEN
           '{"role": "' || mrole || '", "content": [{"type": "text", "text": '
             || to_json(cleaned) || '}]}'
         END AS f
  FROM turns
), convs AS (SELECT DISTINCT conv_id FROM transcripts)
SELECT c.conv_id,
       '[{"role": "system", "content": "You are a helpful assistant."}'
         || coalesce(', ' || string_agg(f, ', ' ORDER BY turn_idx) FILTER (WHERE f IS NOT NULL), '')
         || ']' AS message,
       CAST(NULL AS VARCHAR) AS error
FROM convs c LEFT JOIN frag USING (conv_id)
GROUP BY c.conv_id
""".replace("<WS>", _CONV_WS)


@register("conversation_message", _CONV_MESSAGE_SQL)
def q_conversation_message(sf_dir: str):
    """Conversation2Message (conversation_to_message.py:49-104) over
    re-assembled transcript conversations. The nested message list is
    a deterministic JSON string, so the oracle rebuilds it byte-exactly
    in SQL (to_json string escaping == json.dumps ensure_ascii=False
    for these texts; both trims strip the ASCII whitespace set — texts
    edged with exotic Unicode whitespace would differ, as Python
    str.strip() is Unicode-aware; media-token branches are
    pytest-oracled in tests/test_operators.py since the transcript
    stream carries no modal tokens)."""
    from dataflow_mm_ray.stages.conversations import _assemble_kernel

    return transcripts_partitioned(
        sf_dir, lambda p: _assemble_kernel(p, "You are a helpful assistant.")
    )


# ---------------------------------------------------------------------------
# generators with deterministic stub serving
# ---------------------------------------------------------------------------

@register(
    "prompted_qa",
    "SELECT doc_id, text AS prompt, 'ans-' || md5(text) AS answer FROM documents",
)
def q_prompted_qa(sf_dir: str):
    """PromptedQAGenerator (prompted_qa_generator.py:44-84) with the
    md5-echo stub serving in a concurrency-4 actor pool."""
    from dataflow_mm_ray.serving import prompted_qa

    docs = _documents(sf_dir).map_batches(
        lambda b: b.rename_columns(["doc_id", "prompt"]), batch_format="pyarrow"
    )
    return prompted_qa(docs, concurrency=(1, 2), batch_size=2048)


_TEMPLATE = "Q: {text}\nSrc: {source}"


@register(
    "templated_qa",
    "SELECT doc_id, text, source, "
    "'ans-' || md5('Q: ' || text || chr(10) || 'Src: ' || source) AS answer FROM documents",
)
def q_templated_qa(sf_dir: str):
    """PromptTemplatedQAGenerator + NamedPlaceholderPromptTemplate
    (prompt_template.py:20-57)."""
    from dataflow_mm_ray.serving import templated_qa

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return templated_qa(
        docs, _TEMPLATE, {"text": "text", "source": "source"}, concurrency=(1, 2), batch_size=2048
    )


_VQA_SYS = "You are a helpful assistant."
_WS_STRIP = " " + "".join(chr(c) for c in (9, 10, 13, 11, 12))


from dataflow_mm_ray.sources.transcripts import TRANSCRIPTS_CTE as _TCTE  # noqa: E402


@register(
    "prompted_vqa",
    # mirror of the engine's deterministic prompt assembly: system line +
    # role-mapped turns (human->user / gpt->assistant; tool turns are not
    # conversation turns), empty turns dropped, then the md5-echo stub
    _TCTE
    + f"""
, cl AS (
  SELECT conv_id, turn_idx,
         trim(regexp_replace(trim(text, '{_WS_STRIP}'), '\\n+', chr(10), 'g'), '{_WS_STRIP}') AS cleaned,
         role
  FROM transcripts WHERE role IN ('user', 'assistant')
)
SELECT conv_id, 'ans-' || md5(
  'system: {_VQA_SYS}' || coalesce(chr(10) || string_agg(role || ': ' || cleaned, chr(10)
     ORDER BY turn_idx) FILTER (WHERE length(cleaned) > 0), '')) AS answer
FROM cl GROUP BY conv_id
""",
)
def q_prompted_vqa(sf_dir: str):
    """PromptedVQAGenerator composition (prompted_vqa_generator.py:39-130):
    transcript turns -> conversation re-assembly -> message format with
    human->user / gpt->assistant role mapping (the API-mode branch,
    lines 106-130) -> deterministic prompt -> serving actor pool."""
    from dataflow_mm_ray.serving import prompted_qa
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events
    from dataflow_mm_ray.stages.conversations import conversation_to_message_stage

    msgs = conversation_to_message_stage(transcripts_from_events(sf_dir), system_prompt=_VQA_SYS)

    def build_prompts(b: pd.DataFrame) -> pd.DataFrame:
        prompts = []
        for m in b["message"]:
            ms = json.loads(m)
            lines = []
            for msg in ms:
                if isinstance(msg["content"], str):
                    lines.append(f"{msg['role']}: {msg['content']}")
                else:
                    texts = [c["text"] for c in msg["content"] if c.get("type") == "text"]
                    lines.append(f"{msg['role']}: " + "\n".join(texts))
            prompts.append("\n".join(lines))
        return pd.DataFrame({"conv_id": b["conv_id"].to_numpy(), "prompt": prompts})

    prompted = msgs.map_batches(build_prompts, batch_format="pandas")
    out = prompted_qa(prompted, concurrency=(1, 2), batch_size=2048)
    return out.map_batches(lambda b: b[["conv_id", "answer"]], batch_format="pandas")


@register(
    "prompted_aqa",
    # the audio variant: every conversation carries one audio attachment
    # consumed by an <audio> token on its first turn; the message
    # builder places modal items BEFORE the text item, so the first
    # line is "user: <audio:path> text"
    _TCTE
    + f"""
, cl AS (
  SELECT conv_id, turn_idx, role,
         trim(regexp_replace(trim(text, '{_WS_STRIP}'), '\\n+', chr(10), 'g'), '{_WS_STRIP}') AS cleaned
  FROM transcripts WHERE role IN ('user', 'assistant')
), lines AS (
  SELECT conv_id, turn_idx,
         role || ': ' ||
         CASE WHEN turn_idx = 0
              THEN '<audio:/data/audio/' || conv_id || '.wav>' ||
                   CASE WHEN length(cleaned) > 0 THEN ' ' || cleaned ELSE '' END
              ELSE cleaned END AS line,
         CASE WHEN turn_idx = 0 THEN 1 ELSE CAST(length(cleaned) > 0 AS INTEGER) END AS keep
  FROM cl
)
SELECT conv_id, 'ans-' || md5(
  'system: {_VQA_SYS}' || coalesce(chr(10) || string_agg(line, chr(10)
     ORDER BY turn_idx) FILTER (WHERE keep = 1), '')) AS answer
FROM lines GROUP BY conv_id
""",
)
def q_prompted_aqa(sf_dir: str):
    """Audio-QA variant (the core_audio prompted generators' shape —
    same composition as prompted_vqa_generator.py:39-130 with audio
    attachments): each conversation gets one audio path consumed by an
    ``<audio>`` token on its first turn; the media branch of
    conversation_to_messages (modal items precede text) feeds the
    serving pool."""
    from dataflow_mm_ray.serving import prompted_qa
    from dataflow_mm_ray.sources.transcripts import transcripts_partitioned
    from dataflow_mm_ray.stages.conversations import conversation_to_messages

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv, g in part.groupby("conv_id", sort=False):
            turns = [
                {"from": "human" if r == "user" else "gpt", "value": t}
                for r, t in zip(g["role"], g["text"])
                if r in ("user", "assistant")
            ]
            if turns:
                turns[0] = {"from": turns[0]["from"], "value": "<audio>" + turns[0]["value"]}
            media = {"audio": [f"/data/audio/{conv}.wav"]}
            msgs = conversation_to_messages(turns, media=media, system_prompt=_VQA_SYS)
            lines = []
            for m in msgs:
                if isinstance(m["content"], str):
                    lines.append(f"{m['role']}: {m['content']}")
                else:
                    segs = []
                    for c in m["content"]:
                        if c["type"] == "text":
                            segs.append(c["text"])
                        else:
                            segs.append(f"<{c['type']}:{c[c['type']]}>")
                    lines.append(f"{m['role']}: " + " ".join(segs))
            rows.append((conv, "\n".join(lines)))
        return pd.DataFrame(rows, columns=["conv_id", "prompt"])

    prompted = transcripts_partitioned(sf_dir, kernel)
    out = prompted_qa(prompted, concurrency=(1, 2), batch_size=2048)
    return out.map_batches(lambda b: b[["conv_id", "answer"]], batch_format="pandas")


# ---------------------------------------------------------------------------
# reward evaluation
# ---------------------------------------------------------------------------

_EVAL_FIXTURE_SQL = """
_fix AS (
  SELECT doc_id,
    ['multiple choice', 'numerical', 'OCR', 'free-form', 'regression'][(doc_id % 5) + 1] AS problem_type,
    doc_id % 3 AS k,
    chr(65 + CAST(doc_id % 4 AS INTEGER)) AS mc_gt,
    chr(65 + CAST((doc_id + 1) % 4 AS INTEGER)) AS mc_alt,
    CAST(doc_id % 1000 AS VARCHAR) AS numbase,
    CAST((doc_id % 100 + 1) * 10 AS VARCHAR) AS reg_gt,
    CAST((doc_id % 100 + 1) * 11 AS VARCHAR) AS reg_alt
  FROM documents
), _ans AS (
  SELECT doc_id, problem_type, k,
    CASE problem_type
      WHEN 'multiple choice' THEN mc_gt
      WHEN 'numerical' THEN numbase || '.25'
      WHEN 'regression' THEN reg_gt
    END AS gt_ans,
    CASE problem_type
      WHEN 'multiple choice' THEN CASE WHEN k = 0 THEN mc_gt ELSE mc_alt END
      WHEN 'numerical' THEN CASE k WHEN 0 THEN numbase || '.25' WHEN 1 THEN numbase || '.254' ELSE numbase || '.26' END
      WHEN 'regression' THEN CASE WHEN k = 0 THEN reg_gt ELSE reg_alt END
    END AS out_ans
  FROM _fix
  WHERE problem_type IN ('multiple choice', 'numerical', 'regression')
)
"""

_EVAL_REWARD_SQL = """
SELECT doc_id, problem_type,
  round(CASE problem_type
    WHEN 'multiple choice' THEN CASE WHEN out_ans = gt_ans THEN 1.0 ELSE 0.0 END
    WHEN 'numerical' THEN CASE
        WHEN (contains(gt_ans, '.') OR contains(gt_ans, ',')) <> (contains(out_ans, '.') OR contains(out_ans, ','))
          THEN 0.0
        WHEN round(CAST(replace(gt_ans, ',', '') AS DOUBLE), 2) = round(CAST(replace(out_ans, ',', '') AS DOUBLE), 2)
          THEN 1.0 ELSE 0.0 END
    WHEN 'regression' THEN
        1 - least(1.0, greatest(0.0,
            (abs(CAST(out_ans AS DOUBLE) - CAST(gt_ans AS DOUBLE)) + 1e-9)
            / (abs(CAST(gt_ans AS DOUBLE)) + 1e-9)))
  END, 6) AS reward
FROM _ans
"""


@register("answer_reward_exact", "WITH " + _EVAL_FIXTURE_SQL + _EVAL_REWARD_SQL)
def q_answer_reward_exact(sf_dir: str):
    """GeneralTextAnswerEvaluator — SQL-expressible branches (multiple
    choice / numerical / regression) on the shared deterministic
    fixture; the WER/ROUGE branches are covered by ``answer_reward``
    (rows-only) + pytest."""
    from dataflow_mm_ray.stages.rewards import derive_eval_fixture, reward_eval

    fixture = _documents(sf_dir).map_batches(derive_eval_fixture, batch_format="pandas")
    scored = reward_eval(fixture)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        m = b["problem_type"].isin(["multiple choice", "numerical", "regression"])
        return b.loc[m, ["doc_id", "problem_type", "reward"]]

    return scored.map_batches(keep, batch_format="pandas")


_RW_WS = "' \t\n\r\f' || chr(11)"  # Python str.split() whitespace (ASCII)


def _answer_reward_sql() -> str:
    """Full-evaluator oracle incl. the WER and ROUGE branches:

    - WER: word-level edit distance via ``levenshtein`` over sequences
      char-mapped through the pair's word vocabulary (<= 12 words ->
      one ASCII letter each), divided by max(1, len(ref));
    - ROUGE-1/2: clipped n-gram counter intersections via grouped
      joins; ROUGE-L: LCS by maximizing bit_count over all (ref mask,
      hyp mask) subsequence pairs that extract equal word lists (every
      sequence is <= 6 words, so <= 4096 mask pairs per row);
    - float composition mirrors functions/rewards.py op-for-op
      (2*p*r/(p+r), (r1+r2+rl)/3, clamp, round 6) so the doubles are
      bit-equal.
    """
    return f"""
WITH f0 AS (
  SELECT doc_id,
    ['multiple choice', 'numerical', 'OCR', 'free-form', 'regression'][(doc_id % 5) + 1] AS problem_type,
    doc_id % 3 AS k,
    list_filter(string_split_regex(text, '[' || {_RW_WS} || ']+'), w -> w <> '')[1:6] AS w6,
    chr(65 + CAST(doc_id % 4 AS INTEGER)) AS mc_gt,
    chr(65 + CAST((doc_id + 1) % 4 AS INTEGER)) AS mc_alt,
    CAST(doc_id % 1000 AS VARCHAR) AS numbase,
    CAST((doc_id % 100 + 1) * 10 AS VARCHAR) AS reg_gt,
    CAST((doc_id % 100 + 1) * 11 AS VARCHAR) AS reg_alt
  FROM documents
), fx AS (
  SELECT doc_id, problem_type, k, w6,
    CASE problem_type
      WHEN 'multiple choice' THEN mc_gt
      WHEN 'numerical' THEN numbase || '.25'
      WHEN 'regression' THEN reg_gt
      ELSE coalesce(array_to_string(w6, ' '), '')
    END AS gt_ans,
    CASE problem_type
      WHEN 'multiple choice' THEN CASE WHEN k = 0 THEN mc_gt ELSE mc_alt END
      WHEN 'numerical' THEN CASE k WHEN 0 THEN numbase || '.25' WHEN 1 THEN numbase || '.254' ELSE numbase || '.26' END
      WHEN 'regression' THEN CASE WHEN k = 0 THEN reg_gt ELSE reg_alt END
      WHEN 'OCR' THEN CASE k WHEN 0 THEN coalesce(array_to_string(w6, ' '), '')
                             WHEN 1 THEN coalesce(array_to_string(list_slice(w6, 1, greatest(len(w6) - 1, 0)), ' '), '')
                             ELSE coalesce(array_to_string(list_reverse(w6), ' '), '') END
      ELSE CASE k WHEN 0 THEN coalesce(array_to_string(w6, ' '), '')
                  WHEN 1 THEN coalesce(array_to_string(list_slice(w6, 1, greatest(len(w6) - 2, 0)), ' '), '')
                  ELSE 'completely different answer text' END
    END AS out_ans
  FROM f0
), seqs AS (
  SELECT doc_id, problem_type, gt_ans, out_ans,
    list_filter(string_split_regex(gt_ans, '[' || {_RW_WS} || ']+'), w -> w <> '') AS ref,
    list_filter(string_split_regex(out_ans, '[' || {_RW_WS} || ']+'), w -> w <> '') AS hyp
  FROM fx
), wer AS (
  SELECT doc_id,
    CAST(levenshtein(
      coalesce(array_to_string(list_transform(ref, w -> chr(64 + list_position(list_distinct(ref || hyp), w))), ''), ''),
      coalesce(array_to_string(list_transform(hyp, w -> chr(64 + list_position(list_distinct(ref || hyp), w))), ''), '')
    ) AS DOUBLE) / greatest(1, len(ref)) AS wv
  FROM seqs WHERE problem_type = 'OCR'
), ug AS (
  SELECT doc_id, side, g, count(*) AS c FROM (
    SELECT doc_id, 'r' AS side, unnest(ref) AS g FROM seqs WHERE problem_type = 'free-form'
    UNION ALL
    SELECT doc_id, 'h' AS side, unnest(hyp) AS g FROM seqs WHERE problem_type = 'free-form'
  ) GROUP BY 1, 2, 3
), bg AS (
  SELECT doc_id, side, g, count(*) AS c FROM (
    SELECT doc_id, 'r' AS side,
           unnest(list_transform(range(1, len(ref)), i -> ref[i] || chr(31) || ref[i + 1])) AS g
    FROM seqs WHERE problem_type = 'free-form'
    UNION ALL
    SELECT doc_id, 'h' AS side,
           unnest(list_transform(range(1, len(hyp)), i -> hyp[i] || chr(31) || hyp[i + 1])) AS g
    FROM seqs WHERE problem_type = 'free-form'
  ) GROUP BY 1, 2, 3
), m1 AS (
  SELECT a.doc_id, sum(least(a.c, b.c)) AS m
  FROM (SELECT * FROM ug WHERE side = 'r') a
  JOIN (SELECT * FROM ug WHERE side = 'h') b USING (doc_id, g) GROUP BY 1
), m2 AS (
  SELECT a.doc_id, sum(least(a.c, b.c)) AS m
  FROM (SELECT * FROM bg WHERE side = 'r') a
  JOIN (SELECT * FROM bg WHERE side = 'h') b USING (doc_id, g) GROUP BY 1
), lcs AS (
  SELECT s.doc_id, max(bit_count(ma)) AS l
  FROM seqs s,
       unnest(range(0, 1 << len(s.ref))) AS ta(ma),
       unnest(range(0, 1 << len(s.hyp))) AS tb(mb)
  WHERE s.problem_type = 'free-form'
    AND list_transform(list_filter(range(1, len(s.ref) + 1), i -> ((ma >> (i - 1)) & 1) = 1), i -> s.ref[i])
      = list_transform(list_filter(range(1, len(s.hyp) + 1), i -> ((mb >> (i - 1)) & 1) = 1), i -> s.hyp[i])
  GROUP BY 1
), rouge AS (
  SELECT s.doc_id,
    CASE WHEN len(s.ref) = 0 OR len(s.hyp) = 0 THEN 0.0 ELSE (
      CASE WHEN coalesce(m1.m, 0) = 0 THEN 0.0
           ELSE 2 * (CAST(m1.m AS DOUBLE) / len(s.hyp)) * (CAST(m1.m AS DOUBLE) / len(s.ref))
                / ((CAST(m1.m AS DOUBLE) / len(s.hyp)) + (CAST(m1.m AS DOUBLE) / len(s.ref))) END
      +
      CASE WHEN len(s.ref) < 2 OR len(s.hyp) < 2 OR coalesce(m2.m, 0) = 0 THEN 0.0
           ELSE 2 * (CAST(m2.m AS DOUBLE) / (len(s.hyp) - 1)) * (CAST(m2.m AS DOUBLE) / (len(s.ref) - 1))
                / ((CAST(m2.m AS DOUBLE) / (len(s.hyp) - 1)) + (CAST(m2.m AS DOUBLE) / (len(s.ref) - 1))) END
      +
      CASE WHEN coalesce(lcs.l, 0) = 0 THEN 0.0
           ELSE 2 * (CAST(lcs.l AS DOUBLE) / len(s.hyp)) * (CAST(lcs.l AS DOUBLE) / len(s.ref))
                / ((CAST(lcs.l AS DOUBLE) / len(s.hyp)) + (CAST(lcs.l AS DOUBLE) / len(s.ref))) END
    ) / 3 END AS rv
  FROM seqs s LEFT JOIN m1 USING (doc_id) LEFT JOIN m2 USING (doc_id) LEFT JOIN lcs USING (doc_id)
  WHERE s.problem_type = 'free-form'
)
SELECT s.doc_id, s.problem_type,
  '<answer>' || s.gt_ans || '</answer>' AS solution,
  '<answer>' || s.out_ans || '</answer>' AS model_output,
  round(CASE s.problem_type
    WHEN 'multiple choice' THEN CASE WHEN s.out_ans = s.gt_ans THEN 1.0 ELSE 0.0 END
    WHEN 'numerical' THEN CASE
        WHEN (contains(s.gt_ans, '.') OR contains(s.gt_ans, ',')) <> (contains(s.out_ans, '.') OR contains(s.out_ans, ','))
          THEN 0.0
        WHEN round(CAST(replace(s.gt_ans, ',', '') AS DOUBLE), 2) = round(CAST(replace(s.out_ans, ',', '') AS DOUBLE), 2)
          THEN 1.0 ELSE 0.0 END
    WHEN 'regression' THEN
        1 - least(1.0, greatest(0.0,
            (abs(CAST(s.out_ans AS DOUBLE) - CAST(s.gt_ans AS DOUBLE)) + 1e-9)
            / (abs(CAST(s.gt_ans AS DOUBLE)) + 1e-9)))
    WHEN 'OCR' THEN greatest(0.0, least(1.0, 1 - wer.wv))
    ELSE greatest(0.0, least(1.0, rouge.rv))
  END, 6) AS reward
FROM seqs s LEFT JOIN wer USING (doc_id) LEFT JOIN rouge USING (doc_id)
"""


@register("answer_reward", _answer_reward_sql())
def q_answer_reward(sf_dir: str):
    """GeneralTextAnswerEvaluator, ALL five branches under one SQL
    oracle (general_text_answer_evaluator.py:152-206): the WER branch
    oracled as char-mapped levenshtein, ROUGE-1/2 as clipped gram
    joins, ROUGE-L as a mask-enumeration LCS (see _answer_reward_sql).
    """
    from dataflow_mm_ray.stages.rewards import derive_eval_fixture, reward_eval

    fixture = _documents(sf_dir).map_batches(derive_eval_fixture, batch_format="pandas")
    return reward_eval(fixture)


# ---------------------------------------------------------------------------
# chunk merge (TimestampChunkRowGenerator, merge mode)
# ---------------------------------------------------------------------------

CHUNK_MAX_DURATION_S = 6 * 3600

# The greedy capped merge is a sequential per-key scan; SQL expresses
# it as a recursive CTE stepping one session segment at a time (state =
# (sequence_num, current chunk duration)). Sessions are disjoint and
# ordered per conv, so min(start)/max(end) per chunk equal the
# engine's first/last-segment timecodes; single-turn sessions have
# start_us == end_us and are skipped as invalid on both sides.
_CHUNK_MERGE_SQL = TRANSCRIPTS_CTE.replace(
    "WITH _ev_ranked", "WITH RECURSIVE _ev_ranked", 1
) + f"""
, gaps AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST(1800 AS BIGINT) * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), sess AS (
  SELECT conv_id, ts,
         sum(new_s) OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS sid
  FROM gaps
), seg0 AS (
  SELECT conv_id, epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
  FROM sess GROUP BY conv_id, sid
), segs AS (
  SELECT conv_id, start_us, end_us, end_us - start_us AS d,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY start_us) AS BIGINT) AS r
  FROM seg0 WHERE start_us < end_us
), rec AS (
  SELECT conv_id, r, CAST(1 AS INTEGER) AS seq, d AS cur_dur, d, start_us, end_us
  FROM segs WHERE r = 1
  UNION ALL
  SELECT s.conv_id, s.r,
         rec.seq + CASE WHEN rec.cur_dur + s.d > {CHUNK_MAX_DURATION_S * 1_000_000}
                             AND rec.cur_dur > 0 THEN 1 ELSE 0 END,
         CASE WHEN rec.cur_dur + s.d > {CHUNK_MAX_DURATION_S * 1_000_000}
                   AND rec.cur_dur > 0 THEN s.d ELSE rec.cur_dur + s.d END,
         s.d, s.start_us, s.end_us
  FROM rec JOIN segs s ON s.conv_id = rec.conv_id AND s.r = rec.r + 1
)
SELECT conv_id, seq AS sequence_num, CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(d) AS BIGINT) AS total_duration_us,
       CAST(min(start_us) AS BIGINT) AS chunk_start_us,
       CAST(max(end_us) AS BIGINT) AS chunk_end_us
FROM rec GROUP BY 1, 2
"""


@register("chunk_merge", _CHUNK_MERGE_SQL)
def q_chunk_merge(sf_dir: str):
    """Sessions -> segments -> greedy duration-capped merge
    (audio_timestamp_chunk_row_generator.py:297-346 semantics)."""
    from dataflow_mm_ray.stages.chunks import chunk_rows
    from dataflow_mm_ray.stages.windows import session_window_kernel

    def to_segments(part: pd.DataFrame) -> pd.DataFrame:
        s = session_window_kernel(part, 1800)
        return pd.DataFrame(
            {
                "conv_id": s["conv_id"],
                "start_us": s["session_start"].astype("datetime64[us]").astype(np.int64),
                "end_us": s["session_end"].astype("datetime64[us]").astype(np.int64),
            }
        )

    segments = transcripts_partitioned(sf_dir, to_segments)
    return chunk_rows(segments, mode="merge", max_duration_s=CHUNK_MAX_DURATION_S)


# ---------------------------------------------------------------------------
# UDF hook (FunctionalRefiner)
# ---------------------------------------------------------------------------

def _udf_head_tag(text: str, tag: str) -> str:
    return text[:10] + tag


@register(
    "udf_refine",
    "SELECT doc_id, text, substr(text, 1, 10) || '-x' AS refined FROM documents",
)
def q_udf_refine(sf_dir: str):
    """FunctionalRefiner (functional_refiner.py:47-66): kwargs mapped
    column-or-constant."""
    from dataflow_mm_ray.stages.udf import functional_refine

    return functional_refine(
        _documents(sf_dir), _udf_head_tag, "refined", text="text", tag="-x"
    )


# ---------------------------------------------------------------------------
# corpus stats (IDF dictionary — utils.py:161-181)
# ---------------------------------------------------------------------------

@register(
    "token_doc_freq",
    """
SELECT token, count(DISTINCT doc_id) AS df FROM (
  SELECT doc_id,
         unnest(list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> ''))) AS token
  FROM documents
) GROUP BY 1
""",
)
def q_token_doc_freq(sf_dir: str):
    """Document-frequency dictionary: per-batch partial (doc-unique
    tokens -> counts), one hash shuffle on token, merge-sum."""
    from dataflow_mm_ray.partition import partition_map

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in b["text"]:
            for w in set(str(t).lower().split()):
                counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame({"token": list(counts), "df": np.fromiter(counts.values(), dtype=np.int64, count=len(counts))})

    partials = _documents(sf_dir).map_batches(partial, batch_format="pandas", batch_size=2048)
    return partition_map(
        partials, "token",
        lambda p: p.groupby("token", as_index=False, sort=False)["df"].sum(),
        num_partitions=16,
    )


# ---------------------------------------------------------------------------
# global top-fraction percentile keep (CLIPScoreFilter keep_ratio)
# ---------------------------------------------------------------------------

@register(
    "value_percentile",
    f"""
SELECT event_id, value FROM events
WHERE value > (SELECT quantile_cont(value, 1 - {KEEP_RATIO}) FROM events)
""",
)
def q_value_percentile(sf_dir: str):
    """CLIPScoreFilter-style global keep_ratio cut (clipscore_filter.py
    keep_ratio; knn_similarity_filter.py:194-196 percentile pattern):
    keep the top KEEP_RATIO fraction by score. The threshold comes from
    the distributed exact-quantile pass (stages/percentile.py) over a
    column-pruned read; the filter itself is a streamed map_batches —
    the events table never lands on the driver."""
    from dataflow_mm_ray.stages.percentile import exact_quantile

    vals = read_table(sf_dir, "events", columns=["value"])
    thr = exact_quantile(vals, "value", 1 - KEEP_RATIO)
    ev = read_table(sf_dir, "events", columns=["event_id", "value"])
    return ev.map_batches(
        lambda b, thr=thr: b[b["value"] > thr], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MCTS tree chains (MCTSTreeRefiner)
# ---------------------------------------------------------------------------

def _synth_tree(doc_id: int, text: str) -> str:
    """Deterministic MCTS-tree fixture: rollouts built from the doc's
    words; every third doc has a wrong rollout too."""
    words = str(text).split()[:8]
    body = " ".join(words)
    rollouts = [
        {"reward": 1.0, "ephemeral_texts": [f"<think>{body}</think>", f"<answer>{doc_id}</answer>"]}
    ]
    if doc_id % 3 == 0:
        rollouts.append(
            {"reward": 0.0, "ephemeral_texts": [f"<think>wrong {body}</think>", "<answer>bad</answer>"]}
        )
    node = {"rollouts": rollouts, "is_terminal": doc_id % 2 == 0,
            "children": [] if doc_id % 2 == 0 else [
                {"rollouts": [{"reward": 1.0, "ephemeral_texts": [f"child {words[0] if words else ''}",
                                                                  f"<answer>{doc_id + 1}</answer>"]}],
                 "is_terminal": True, "children": []}
            ]}
    return json.dumps(node)


@register("mcts_chains", None)  # recursive JSON tree walk: pytest-oracled
def q_mcts_chains(sf_dir: str):
    from dataflow_mm_ray.stages.udf import mcts_tree_refine

    def add_tree(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["tree"] = [_synth_tree(int(i), t) for i, t in zip(b["doc_id"], b["text"])]
        return b

    with_trees = _documents(sf_dir).map_batches(add_tree, batch_format="pandas")
    out = mcts_tree_refine(with_trees, max_chains=3)
    return out.map_batches(
        lambda b: b[["doc_id", "chains"]], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# multimodal plumbing (stub decode; see stages/multimodal.py)
# ---------------------------------------------------------------------------

@register("image_quality", None)  # stubbed decode: pytest-oracled plumbing
def q_image_quality(sf_dir: str):
    """Binary image column -> actor-pool decode (STUB) -> real
    ImageAestheticFilter stats (image_aesthetic_filter.py:53-109)."""
    from dataflow_mm_ray.stages.multimodal import fake_image_bytes, image_pipeline

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["doc_id"]].copy(deep=False)
        b["image"] = [fake_image_bytes(f"doc-{i}") for i in b["doc_id"]]
        return b

    docs = _documents(sf_dir).map_batches(attach, batch_format="pandas")
    return image_pipeline(docs, concurrency=(1, 2))


@register("audio_vad", None)  # stubbed decode: pytest-oracled plumbing
def q_audio_vad(sf_dir: str):
    """Binary audio column -> actor-pool VAD with the Silero parameter
    semantics (audio_silero...generator.py:29-68) over a stub energy
    curve; list<float> segment columns out."""
    from dataflow_mm_ray.stages.multimodal import audio_vad_pipeline, fake_image_bytes

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["doc_id"]].copy(deep=False)
        b["audio"] = [fake_image_bytes(f"aud-{i}") for i in b["doc_id"]]
        return b

    docs = _documents(sf_dir).map_batches(attach, batch_format="pandas")
    return audio_vad_pipeline(docs, concurrency=(1, 2))


AUDIO_CHAIN_STEPS = [
    ("attach_stub_audio", {}),
    ("audio_vad", {"threshold": 0.5, "min_speech_duration_s": 0.25,
                   "min_silence_duration_s": 0.1,
                   "max_speech_duration_s": 30.0, "seg_lists": True}),
    ("vad_segments_to_rows", {}),
    ("chunk_rows", {"mode": "split"}),
]


@register("audio_chain_pipeline", None)  # VAD state machine: pytest-oracled
def q_audio_chain_pipeline(sf_dir: str):
    """The reference's composed audio VAD pipeline
    (audio_voice_activity_detection_pipeline.py:18-50 — Silero VAD ->
    timestamp chunk split) as ONE lazy runner chain (registry ops,
    stages/audiochain.py glue); `jobs/specs/audio_chain.json` is the
    same chain as a CLI spec with cache/resume. Frame-equality to the
    manual stage composition + partition invariance are pytest-pinned
    (tests/test_runner.py)."""
    from dataflow_mm_ray.pipelines.runner import Step, run_pipeline

    steps = [Step(op, kw) for op, kw in AUDIO_CHAIN_STEPS]
    return run_pipeline(read_table(sf_dir, "documents", columns=["doc_id"]),
                        steps)


# ---------------------------------------------------------------------------
# sequential diversity filter (ImageDiversityFilter scan)
# ---------------------------------------------------------------------------

@register("diversity_filter", None)  # order-dependent sequential scan
def q_diversity_filter(sf_dir: str):
    """ImageDiversityFilter TF-cosine first-wins scan
    (image_diversity_filter.py:100-119); distributed vectorization +
    driver-side sequential decision in stable doc_id order."""
    from dataflow_mm_ray.stages.diversity import diversity_filter

    return diversity_filter(_documents(sf_dir), threshold=0.8)


# ---------------------------------------------------------------------------
# clip-cut planning (VideoClipGenerator)
# ---------------------------------------------------------------------------

CLIP_SHORTER_SIZE = 480


@register(
    "video_clip_cut",
    f"""
WITH probe AS (
  SELECT doc_id,
         360 + CAST(doc_id % 5 AS BIGINT) * 180 AS height,
         640 + CAST(doc_id % 4 AS BIGINT) * 320 AS width,
         1 + CAST(doc_id % 3 AS BIGINT) AS n_clips
  FROM documents
), clips AS (
  SELECT doc_id, height, width, CAST(unnest(range(0, n_clips)) AS BIGINT) AS i
  FROM probe
)
SELECT doc_id,
       doc_id * 10 + i AS clip_id,
       CAST(i * 10 + doc_id % 7 AS BIGINT) AS ts_start_s,
       CAST(i * 10 + doc_id % 7 + 5 + (doc_id + i) % 9 AS BIGINT) AS ts_end_s,
       least(height, width) > {CLIP_SHORTER_SIZE} AS scaled,
       'clips/' || (doc_id * 10 + i) || '.mp4' AS video_path
FROM clips
WHERE (doc_id + i) % 4 <> 0
""",
)
def q_video_clip_cut(sf_dir: str):
    """VideoClipGenerator cut planning (video_clip_generator.py:42-117
    _process_single_clip_row, 131-157 _flatten_video_clips, 159-238
    process_video_cutting_from_list): flatten per-video clip lists,
    cut ONLY clips with filtered == False (lines 50-52,178), no-upscale
    rule — the scale filter applies only when min(height, width) >
    shorter_size (lines 57-59), save path = save_dir/{{id}}.mp4 with
    idempotent reuse (lines 73-76; the engine's media_sideeffect_sink
    implements the same atomic reuse). The ffmpeg subprocess is the
    sandbox-absent part; the plan (which clips, bounds, scaling, path)
    is the semantics and is fully SQL-oracled. Stub probe: dims +
    clip list derived from doc_id; every (doc_id+i)%4==0 clip is
    pre-filtered."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def plan(b: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy(dtype=np.int64)
        # ragged expansion: doc d emits clip indices 0..n_clips-1
        n_clips = 1 + ids % 3
        total = int(n_clips.sum())
        rep = np.repeat(np.arange(len(ids)), n_clips)
        starts = np.cumsum(n_clips) - n_clips
        i = np.arange(total, dtype=np.int64) - np.repeat(starts, n_clips)
        d = ids[rep]
        keep = (d + i) % 4 != 0  # filtered == True -> skipped (lines 50-52)
        d, i = d[keep], i[keep]
        h = 360 + (d % 5) * 180
        w = 640 + (d % 4) * 320
        cid = d * 10 + i
        ts0 = i * 10 + d % 7
        paths = pc.binary_join_element_wise(
            "clips/", pc.cast(pa.array(cid), pa.string()), ".mp4", ""
        )
        return pd.DataFrame(
            {
                "doc_id": d,
                "clip_id": cid,
                "ts_start_s": ts0,
                "ts_end_s": ts0 + 5 + (d + i) % 9,
                # no-upscale: scaling disabled when min(h,w) <= shorter
                "scaled": np.minimum(h, w) > CLIP_SHORTER_SIZE,
                "video_path": paths.to_pandas().to_numpy(dtype=object),
            }
        )

    return docs.map_batches(plan, batch_format="pandas")


# ---------------------------------------------------------------------------
# per-clip frame-export planning (VideoFrameFilter)
# ---------------------------------------------------------------------------

@register(
    "video_frame_export",
    """
WITH probe AS (
  SELECT doc_id,
         CASE WHEN doc_id % 19 = 0 THEN 0
              ELSE 1 + CAST((doc_id * 7) % 240 AS BIGINT) END AS num_frames,
         CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END AS fps,
         doc_id % 2 = 0 AS use_interval
  FROM documents
)
SELECT doc_id, num_frames AS n_frames,
       CAST(unnest(
         CASE WHEN num_frames <= 0 THEN CAST([] AS BIGINT[])
              WHEN use_interval
                THEN range(0, num_frames,
                           greatest(1, CAST(round(2.0 * fps) AS BIGINT)))
              ELSE list_distinct([0, num_frames // 2, num_frames - 1])
         END) AS BIGINT) AS frame_idx
FROM probe
""",
)
def q_video_frame_export(sf_dir: str):
    """VideoFrameFilter frame-index planning (video_frame_filter.py:
    113-128 _compute_indices, 131-172 per-clip worker): per clip,
    either stride-by-round(interval_sec*fps) sampling or the 3-evenly
    {0, n//2, n-1} default; zero-frame clips export nothing. The cv2
    seek/read/imwrite loop is the sandbox-absent part; the planner
    (which indices, how many saved) is the semantics and is fully
    SQL-oracled. Stub probe: num_frames/fps derived from doc_id,
    alternating interval (2.0 s) and default mode."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    return docs.map_batches(_frame_export_plan, batch_format="pandas")


def _frame_export_plan(b: pd.DataFrame) -> pd.DataFrame:
    """Vectorized twin of stages.multimodal.compute_frame_indices over
    the stub probe (pinned equal to the per-row loop in
    tests/test_multimodal.py): interval mode strides by
    max(1, round(2.0*fps)); default mode emits the sorted distinct set
    {0, n//2, n-1} (1 frame at n==1, 2 at n==2, else 3)."""
    ids = b["doc_id"].to_numpy(dtype=np.int64)
    n = np.where(ids % 19 == 0, 0, 1 + (ids * 7) % 240)
    fps = np.choose(ids % 3, [24, 25, 30]).astype(np.int64)
    stride = np.maximum(1, np.rint(2.0 * fps).astype(np.int64))
    use_interval = ids % 2 == 0
    counts = np.where(use_interval, -(-n // stride), np.minimum(n, 3))
    total = int(counts.sum())
    rep = np.repeat(np.arange(len(ids)), counts)
    starts = np.cumsum(counts) - counts
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    n_out = n[rep]
    dflt = np.select([pos == 1, pos == 2], [n_out // 2, n_out - 1], 0)
    frame = np.where(use_interval[rep], pos * stride[rep], dflt)
    return pd.DataFrame(
        {"doc_id": ids[rep], "n_frames": n_out, "frame_idx": frame}
    )


@register("diversity_filter_full", None)  # order-dependent sequential scan
def q_diversity_filter_full(sf_dir: str):
    """BOTH ImageDiversityFilter gates (image_diversity_filter.py:
    100-104): TF-cosine text uniqueness AND phash-Hamming image
    uniqueness (min distance vs kept images strictly > 5) with
    independently-updating caches; phash computed distributed over the
    stub decode. Differential-tested vs a transcription of the
    reference scan in tests/test_refiners.py."""
    from dataflow_mm_ray.sources.tables import read_table
    from dataflow_mm_ray.stages.diversity import diversity_filter_full
    from dataflow_mm_ray.stages.nsfw import add_image_key

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return diversity_filter_full(docs.map_batches(add_image_key, batch_format="pandas"))


@register("image_phash_dedup", None)  # order-dependent sequential scan
def q_image_phash_dedup(sf_dir: str):
    """Standalone ImageDuplicateFilter (image_diversity_filter.py:
    43-62): the image phash gate alone, registered as its own operator
    by the reference — first-wins keep on min phash Hamming distance
    strictly > 5 vs previously-kept images, min_dist carried through
    (NaN for missing images and the first keep). Differential-tested vs
    a transcription of the reference scan in tests/test_refiners.py."""
    from dataflow_mm_ray.sources.tables import read_table
    from dataflow_mm_ray.stages.diversity import image_duplicate_filter
    from dataflow_mm_ray.stages.nsfw import add_image_key

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return image_duplicate_filter(docs.map_batches(add_image_key, batch_format="pandas"))


# ---------------------------------------------------------------------------
# WikiQA structure parser (WikiQARefiner)
# ---------------------------------------------------------------------------

@register("wiki_qa_parse", None)  # nested parse output: pytest-oracled
def q_wiki_qa_parse(sf_dir: str):
    """WikiQARefiner (wiki_qa_refiner.py:8-78) over a deterministic
    article+QA fixture synthesized from document texts."""
    from dataflow_mm_ray.functions.wiki_qa import parse_wiki_qa

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for i, t in zip(b["doc_id"], b["text"]):
            words = str(t).split()[:12]
            fixture = (
                "Wikipedia Article: " + " ".join(words) + "\n---\n"
                "Question Answer Pairs:\n"
                f"Question: what is word {int(i) % 7}?\nAnswer: {words[int(i) % len(words)] if words else 'n/a'}\n"
                f"Q: how many words?\nA: {len(words)}\n"
            )
            parsed = parse_wiki_qa(fixture)
            out_rows.append((i, parsed["context"], len(parsed["qas"]), json.dumps(parsed["qas"])))
        return pd.DataFrame(out_rows, columns=["doc_id", "context", "n_qas", "qas_json"])

    return _documents(sf_dir).map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# text normalization (TextNormalizer, basic mode with punct strip)
# ---------------------------------------------------------------------------

@register(
    "text_normalize",
    """
SELECT doc_id,
       regexp_replace(trim(lower(regexp_replace(text, '[\\x21-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7e]', '', 'g')),
                      ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                      '\\s+', ' ', 'g') AS norm_text
FROM documents
""",
)
def q_text_normalize(sf_dir: str):
    """TextNormalizer basic mode + punctuation strip
    (audio_text_normalizer.py:145-160)."""
    from dataflow_mm_ray.stages.normalize import text_normalize

    out = text_normalize(_documents(sf_dir), mode="basic", remove_punct=True)
    return out.map_batches(lambda b: b[["doc_id", "norm_text"]], batch_format="pandas")


@register("text_normalize_en", None)  # whisper-English algorithm: pytest-oracled
def q_text_normalize_en(sf_dir: str):
    """Whisper EnglishTextNormalizer mode (audio_text_normalizer.py:30-31;
    functions/en_text_norm.py)."""
    from dataflow_mm_ray.stages.normalize import text_normalize

    out = text_normalize(_documents(sf_dir), mode="english")
    return out.map_batches(lambda b: b[["doc_id", "norm_text"]], batch_format="pandas")


@register("text_normalize_zh", None)  # cn_tn pipeline: differential-pinned
def q_text_normalize_zh(sf_dir: str):
    """Chinese cn_tn TextNorm mode (audio_text_normalizer.py:33-41;
    functions/cn_text_norm.py, parity vs the reference module in
    tests/test_cn_norm.py). Numbers in the synthetic docs get spoken
    Chinese readings; ASCII text passes through the punct/space rules."""
    from dataflow_mm_ray.stages.normalize import text_normalize

    out = text_normalize(
        _documents(sf_dir), mode="zh", to_banjiao=True, remove_fillers=True,
        remove_erhua_flag=True,
    )
    return out.map_batches(lambda b: b[["doc_id", "norm_text"]], batch_format="pandas")


# ---------------------------------------------------------------------------
# forced-alignment quality filter (CTCForcedAlignmentFilter)
# ---------------------------------------------------------------------------

ALIGN_THRESHOLD = 0.35


@register(
    "alignment_filter",
    f"""
WITH _w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')[1:8] AS words
  FROM documents WHERE doc_id % 17 <> 0
), _s AS (
  SELECT doc_id,
         list_transform(range(length(words)),
                        i -> CAST((length(words[i+1]) * 37 + i * 11) % 100 AS DOUBLE) / 100.0) AS scores
  FROM _w WHERE length(words) > 0
)
SELECT doc_id, round(list_aggregate(scores, 'avg'), 6) AS align_score
FROM _s
WHERE list_aggregate(scores, 'avg') >= {ALIGN_THRESHOLD}
""",
)
def q_alignment_filter(sf_dir: str):
    """CTCForcedAlignmentFilter (threshold_mode=mean): drop error rows
    and rows below the aggregate-score threshold
    (audio_ctc_forced_alignment_transcription_quality_filter.py:12-44)."""
    from dataflow_mm_ray.stages.alignment import alignment_quality_filter, synthesize_alignment

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        al, err = [], []
        for i, t in zip(b["doc_id"], b["text"]):
            a, e = synthesize_alignment(int(i), t)
            al.append(a)
            err.append(e)
        out = b[["doc_id"]].copy(deep=False)
        out["alignment"] = al
        out["align_error"] = err
        return out

    fixture = _documents(sf_dir).map_batches(attach, batch_format="pandas")
    filtered = alignment_quality_filter(fixture, threshold=ALIGN_THRESHOLD, threshold_mode="mean")
    return filtered.map_batches(lambda b: b[["doc_id", "align_score"]], batch_format="pandas")


# ---------------------------------------------------------------------------
# generic partitioned hash join (large x large)
# ---------------------------------------------------------------------------

@register(
    "docs_embeddings_join",
    """
SELECT d.doc_id, d.n_chars, e.label,
       length(e.embedding) AS dim
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def q_docs_embeddings_join(sf_dir: str):
    """Partitioned hash join (both sides hash-split by the key, paired
    merges per partition) — the large x large join shape the reference
    lacks (SURVEY.md §2.7)."""
    from dataflow_mm_ray.partition import hash_join

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["vec_id"].to_numpy(),
                "label": b["label"].to_numpy(),
                "dim": np.asarray([len(v) for v in b["embedding"]], dtype=np.int64),
            }
        )

    emb2 = emb.map_batches(prep, batch_format="pandas")
    joined = hash_join(docs, emb2, "doc_id", how="inner")
    return joined.map_batches(
        lambda b: b[["doc_id", "n_chars", "label", "dim"]], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# rollout -> verifier -> fail-rate filter (FailRateFilter)
# ---------------------------------------------------------------------------

N_ROLLOUTS = 4


def _digest_verify(answer: str, gold: str) -> bool:
    """Deterministic verifier for the stub serving: the first digest
    hex char must be in the gold set (stands in for answer==gold with a
    real model)."""
    return answer[len("ans-")] in gold


@register(
    "failrate_filter",
    f"""
WITH _r AS (
  SELECT doc_id, text, unnest(range({N_ROLLOUTS})) AS i FROM documents
), _v AS (
  SELECT doc_id,
         CASE WHEN substr(md5(text || chr(31) || CAST(i AS VARCHAR)), 1, 1) IN ('0', '1')
              THEN 1 ELSE 0 END AS ok
  FROM _r
), _s AS (SELECT doc_id, sum(ok) AS n_correct FROM _v GROUP BY 1)
SELECT doc_id, CAST(n_correct AS BIGINT) AS n_correct,
       CAST({N_ROLLOUTS} - n_correct AS DOUBLE) / {N_ROLLOUTS} AS fail_rate
FROM _s
WHERE CAST({N_ROLLOUTS} - n_correct AS DOUBLE) / {N_ROLLOUTS} <= 0.75
""",
)
def q_failrate_filter(sf_dir: str):
    """FailRateFilter / VisionDependentFilter composition
    (failrate_filter.py:12-139): N stub rollouts per doc in the serving
    actor pool, digest-verify each, keep fail_rate <= 0.75."""
    from dataflow_mm_ray.serving import DeterministicStubServing
    from dataflow_mm_ray.stages.failrate import failrate_filter

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["doc_id"]].copy(deep=False)
        out["prompt"] = b["text"]
        out["gold"] = "01"
        return out

    docs = _documents(sf_dir).map_batches(prep, batch_format="pandas")
    kept = failrate_filter(
        docs, DeterministicStubServing, _digest_verify,
        n_rollouts=N_ROLLOUTS, min_rate=0.0, max_rate=0.75, concurrency=(1, 2),
    )
    return kept.map_batches(
        lambda b: b[["doc_id", "n_correct", "fail_rate"]], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# LLM-judge scorer (EvalImageGenerationGenerator)
# ---------------------------------------------------------------------------

@register(
    "llm_judge_score",
    """
SELECT doc_id,
       (CAST(('0x' || substr(md5('judge: ' || text), 1, 2)) AS INTEGER) % 5) + 1 AS score
FROM documents
""",
)
def q_llm_judge_score(sf_dir: str):
    """LLM-judge scoring (image_evaluator.py:11-75 shape): prompt
    builder -> serving -> numeric score parse. The stub judge's answer
    digest is parsed into a 1-5 score identically in SQL."""
    import hashlib

    from dataflow_mm_ray.serving import prompted_qa

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["doc_id"]].copy(deep=False)
        out["prompt"] = "judge: " + b["text"]
        return out

    docs = _documents(sf_dir).map_batches(prep, batch_format="pandas")
    judged = prompted_qa(docs, concurrency=(1, 2), batch_size=2048)

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        # answer = 'ans-' + md5 hex; score = first byte mod 5 + 1
        scores = [int(a[len("ans-"):len("ans-") + 2], 16) % 5 + 1 for a in b["answer"]]
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "score": np.asarray(scores, dtype=np.int32)})

    return judged.map_batches(parse, batch_format="pandas")


@register("bbox_nms", None)  # greedy NMS loop: pytest-differential oracle
def q_bbox_nms(sf_dir: str):
    """ImageBBoxGenerator post-processing (image_bbox_generator.py:
    23-40, 77-112): stub detector -> reference-exact greedy NMS (area
    order, overlap = intersection / candidate area) -> padded
    normalization to 3 dp, exploded one row per kept box."""
    from dataflow_mm_ray.stages.bbox import bbox_pipeline

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    return bbox_pipeline(docs)


# ---------------------------------------------------------------------------
# CLIP-score percentile filter (CLIPScoreFilter)
# ---------------------------------------------------------------------------

CLIP_KEEP_RATIO = 0.8


class _StubClipScorer:
    """Actor-pool scorer: the model load happens once per actor
    (clipscore_filter.py loads CLIP in __init__); scoring here is a
    deterministic md5-derived float in [0, 1) with an exact float64
    representation (24-bit mantissa fraction), so the SQL twin is
    bit-exact."""

    def __init__(self):
        import hashlib

        self._md5 = hashlib.md5  # stands in for the CLIP checkpoint load

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scores = np.fromiter(
            (int(self._md5(str(t).encode()).hexdigest()[:6], 16) / 16777216.0
             for t in batch["text"]),
            dtype=np.float64, count=len(batch),
        )
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "clip_score": scores})


@register(
    "clipscore_filter",
    f"""
WITH s AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(text), 1, 6)) AS INTEGER) AS DOUBLE) / 16777216.0
           AS clip_score
  FROM documents
)
SELECT doc_id, clip_score FROM s
WHERE clip_score >= (SELECT quantile_cont(clip_score, {1 - CLIP_KEEP_RATIO}) FROM s)
""",
)
def q_clipscore_filter(sf_dir: str):
    """CLIPScoreFilter (clipscore_filter.py:29,192-199): actor-pool
    scorer (stub model) -> keep rows with score >= the
    (1-keep_ratio)-quantile (INCLUSIVE — the reference uses >=, unlike
    the strict > of value_percentile). Threshold from the distributed
    exact quantile; the filter streams in map_batches."""
    from dataflow_mm_ray.stages.percentile import exact_quantile

    scored = _documents(sf_dir).map_batches(
        _StubClipScorer, batch_format="pandas", batch_size=2048, concurrency=(1, 2)
    ).materialize()
    thr = exact_quantile(scored, "clip_score", 1 - CLIP_KEEP_RATIO)
    return scored.map_batches(
        lambda b, thr=thr: b[b["clip_score"] >= thr], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# CLIP-family EVALUATORS (non-destructive score columns)
# ---------------------------------------------------------------------------

_CE_WS = " " + "".join(chr(c) for c in (9, 10, 13, 11, 12))


def _clip_eval_sql(score_col: str, op: str, template_sql: str = "text") -> str:
    """SQL twin of ClipFamilyEvaluator over the synthetic image key."""
    from dataflow_mm_ray.stages.nsfw import IMAGE_KEY_SQL, STUB_MISSING_MOD

    return f"""
WITH ik AS (
  SELECT doc_id, text, {IMAGE_KEY_SQL} AS k FROM documents
)
SELECT doc_id,
  CASE WHEN k IS NULL
         OR (('0x'||substr(md5(k||chr(31)||'exists'),1,8))::BIGINT % {STUB_MISSING_MOD}) = 0
         OR text IS NULL OR length(trim(text, '{_CE_WS}')) = 0
       THEN 0.0
       ELSE ('0x'||substr(md5(k||chr(31)||{template_sql}||chr(31)||'{op}'),1,8))::BIGINT
            / 4294967296.0
  END AS {score_col}
FROM ik
"""


def _clip_eval_query(sf_dir: str, score_col: str, op: str, template=None):
    from dataflow_mm_ray.stages.clip_eval import clip_family_eval
    from dataflow_mm_ray.stages.nsfw import add_image_key

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return clip_family_eval(
        docs.map_batches(add_image_key, batch_format="pandas"),
        score_col=score_col,
        template=template,
        backend_kwargs={"op": op},
    )


@register("image_clip_eval", _clip_eval_sql("clip_score", "clip"))
def q_image_clip_eval(sf_dir: str):
    """ImageCLIPEvaluator (image_clip_evaluator.py:21-90): per-row CLIP
    alignment score in [0,1], 0.0 on failed load / empty text,
    NON-destructive clip_score column (distinct from clipscore_filter's
    percentile cut)."""
    return _clip_eval_query(sf_dir, "clip_score", "clip")


CLIP_FILTER_THRESHOLD = 0.25


@register(
    "image_clip_filter",
    f"SELECT * FROM ({_clip_eval_sql('clip_score', 'clip')})"
    f" WHERE clip_score >= {CLIP_FILTER_THRESHOLD}",
)
def q_image_clip_filter(sf_dir: str):
    """ImageClipFilter (image_clip_filter.py:48-86): the THRESHOLD cut —
    keep rows whose [0,1]-clamped CLIP similarity is >= threshold
    (default 0.25), destructive, 0.0 on failed load / empty text (so
    those rows always drop at any positive threshold). Distinct from
    clipscore_filter's global keep_ratio PERCENTILE cut: this one is a
    pure per-row predicate — no global pass, streams in map_batches."""
    ds = _clip_eval_query(sf_dir, "clip_score", "clip")
    return ds.map_batches(
        lambda b: b[b["clip_score"] >= CLIP_FILTER_THRESHOLD],
        batch_format="pandas",
    )


@register("image_longclip_eval", _clip_eval_sql("longclip_score", "longclip"))
def q_image_longclip_eval(sf_dir: str):
    """ImageLongCLIPEvaluator (image_longclip_evaluator.py:91-124):
    long-context variant, longclip_score column, same 0.0 rules."""
    return _clip_eval_query(sf_dir, "longclip_score", "longclip")


from dataflow_mm_ray.stages.clip_eval import VQA_TEMPLATE  # noqa: E402

_VQA_PRE, _VQA_POST = VQA_TEMPLATE.split("{}")


@register(
    "image_vqascore_eval",
    _clip_eval_sql(
        "vqa_score", "vqa", f"('{_VQA_PRE}' || text || '{_VQA_POST}')"
    ),
)
def q_image_vqascore_eval(sf_dir: str):
    """ImageVQAScoreEvaluator (image_vqascore_evaluator.py:13-86): the
    yes-probability of the filled question template (line 63), 0.0 on
    failed load / empty text, vqa_score column."""
    return _clip_eval_query(sf_dir, "vqa_score", "vqa", template=VQA_TEMPLATE)


# ---------------------------------------------------------------------------
# video metadata probe -> resolution range filter (VideoResolutionFilter)
# ---------------------------------------------------------------------------

VR_MIN_W, VR_MAX_W = 640, 1920
VR_MIN_H, VR_MAX_H = 360, 1080


@register(
    "video_resolution_filter",
    f"""
WITH probe AS (
  SELECT doc_id,
         CASE WHEN doc_id % 23 = 0 THEN -1
              ELSE 320 + CAST(doc_id % 10 AS INTEGER) * 160 END AS width,
         CASE WHEN doc_id % 23 = 0 THEN -1
              ELSE 240 + CAST(doc_id % 7 AS INTEGER) * 120 END AS height
  FROM documents
)
SELECT doc_id, width, height FROM probe
WHERE width > 0 AND height > 0
  AND width BETWEEN {VR_MIN_W} AND {VR_MAX_W}
  AND height BETWEEN {VR_MIN_H} AND {VR_MAX_H}
""",
)
def q_video_resolution_filter(sf_dir: str):
    """VideoResolutionFilter (video_resolution_filter.py:21-51,83-118):
    per-row metadata probe (cv2-bound -> deterministic stub standing in
    for CAP_PROP_FRAME_WIDTH/HEIGHT; failed probes return (-1,-1) and
    are dropped), then the min/max range predicate. The probe runs in
    the same stateless map_batches as the filter — the media-path ->
    metadata enrichment shape (SURVEY.md §2.7)."""

    def probe_and_filter(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        bad = ids % 23 == 0
        w = np.where(bad, -1, 320 + (ids % 10) * 160).astype(np.int64)
        h = np.where(bad, -1, 240 + (ids % 7) * 120).astype(np.int64)
        keep = (w > 0) & (h > 0) & (w >= VR_MIN_W) & (w <= VR_MAX_W) \
            & (h >= VR_MIN_H) & (h <= VR_MAX_H)
        return pd.DataFrame({"doc_id": ids[keep], "width": w[keep], "height": h[keep]})

    return _documents(sf_dir).map_batches(probe_and_filter, batch_format="pandas")


# ---------------------------------------------------------------------------
# broadcast semi / anti join + distinct
# ---------------------------------------------------------------------------

from dataflow_mm_ray.sources.transcripts import TRANSCRIPTS_CTE as _CTE  # noqa: E402

_HOT_CTE = """
, hot AS (
  SELECT conv_id FROM transcripts GROUP BY 1 ORDER BY count(*) DESC, conv_id LIMIT 10
)
"""


def _hot_conv_set(sf_dir: str):
    """Small side: the top-10 hot conversations, broadcast as a set."""
    from dataflow_mm_ray.stages import stats

    local = transcripts_partitioned(
        sf_dir, lambda t: stats.topk_counts(stats.conv_count_kernel(t), 10)
    )
    return frozenset(stats.topk_counts(local.to_pandas(), 10)["conv_id"])


@register(
    "semi_join_hot",
    _CTE + _HOT_CTE
    + "SELECT conv_id, turn_idx, role FROM transcripts WHERE conv_id IN (SELECT conv_id FROM hot)",
)
def q_semi_join_hot(sf_dir: str):
    """Broadcast semi join (guide pattern: small key set via ray.put +
    filter inside the partition kernel — no extra shuffle): turns of
    the hot conversations."""
    import ray

    hot_ref = ray.put(_hot_conv_set(sf_dir))

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        return b.loc[b["conv_id"].isin(hot), ["conv_id", "turn_idx", "role"]]

    return transcripts_partitioned(sf_dir, filt)


@register(
    "anti_join_hot",
    _CTE + _HOT_CTE
    + "SELECT conv_id, count(*) AS n_turns FROM transcripts "
      "WHERE conv_id NOT IN (SELECT conv_id FROM hot) GROUP BY 1",
)
def q_anti_join_hot(sf_dir: str):
    """Broadcast anti join: per-conv turn counts excluding the hot set."""
    import ray

    hot_ref = ray.put(_hot_conv_set(sf_dir))

    def kernel(t: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        kept = t[~t["conv_id"].isin(hot)]
        return (
            kept.groupby("conv_id", as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n_turns"})
        )

    return transcripts_partitioned(sf_dir, kernel)


@register(
    "distinct_tools",
    _CTE + "SELECT DISTINCT tool FROM transcripts WHERE tool IS NOT NULL",
)
def q_distinct_tools(sf_dir: str):
    """Distinct values (dedup_and_sort helper, utils.py:292-295):
    per-partition uniques, then a tiny global dedup."""

    def kernel(t: pd.DataFrame) -> pd.DataFrame:
        u = t.loc[t["tool"].notna(), "tool"].unique()
        return pd.DataFrame({"tool": u})

    partials = transcripts_partitioned(sf_dir, kernel)
    return partials.to_pandas().drop_duplicates().reset_index(drop=True)


# ---------------------------------------------------------------------------
# Caption-as-Teacher filter (CatFilter)
# ---------------------------------------------------------------------------

_CAT_WS = " " + "".join(chr(c) for c in (9, 10, 13, 11, 12))

_CAT_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z'']+') AS cap_toks,
         regexp_extract_all(lower(substr(text, 1, 40)), '[a-z'']+') AS ocr_toks
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text, '{_CAT_WS}')) > 0
), scored AS (
  SELECT doc_id,
    len(list_distinct(list_transform(
      CASE WHEN len(cap_toks) >= 3 THEN range(CAST(len(cap_toks)/3 AS BIGINT)) ELSE [] END,
      i -> cap_toks[3*i+1] || chr(31) || cap_toks[3*i+2] || chr(31) || cap_toks[3*i+3]
    ))) AS triple_cnt,
    len(list_distinct(ocr_toks)) AS n_ocr,
    len(list_intersect(list_distinct(ocr_toks), list_distinct(cap_toks))) AS n_inter,
    len(list_distinct(ocr_toks || cap_toks)) AS n_union
  FROM toks
)
SELECT doc_id, CAST(triple_cnt AS BIGINT) AS triple_cnt
FROM scored
WHERE triple_cnt >= 2 AND (n_ocr = 0 OR n_inter * 1.0 / n_union < 0.2)
"""


@register("cat_filter", _CAT_SQL)
def q_cat_filter(sf_dir: str):
    """CatFilter (cat_filter.py:36-111): SVO-triple complexity gate +
    action-verb gate + OCR-overlap Jaccard gate. The stub grammar makes
    each disjoint token 3-gram an (nsubj, VERB, obj) group, so the
    reference extraction reduces to distinct 3-grams and the whole
    decision stays SQL-oracled; OCR text is surrogated by the first 40
    chars of the caption (a prefix "transcription")."""
    from dataflow_mm_ray.stages.cat import CatFilterStage

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_ocr(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["ocr_text"] = b["text"].astype(str).str.slice(0, 40)
        return b

    kept = docs.map_batches(add_ocr, batch_format="pandas").map_batches(
        CatFilterStage,
        fn_constructor_kwargs={"caption_key": "text", "ocr_key": "ocr_text"},
        batch_format="pandas",
        concurrency=(1, 2),
        batch_size=4096,
    )
    return kept.map_batches(lambda b: b[["doc_id", "triple_cnt"]], batch_format="pandas")


# ---------------------------------------------------------------------------
# video metadata probe table (VideoInfoFilter)
# ---------------------------------------------------------------------------

@register(
    "video_info_probe",
    """
WITH present AS (
  SELECT doc_id FROM documents WHERE doc_id % 31 <> 0
), probe AS (
  SELECT doc_id, (doc_id % 19 <> 0) AS success,
         CASE WHEN doc_id % 19 <> 0 THEN 30 + (doc_id % 50) * 24 END AS nf,
         CASE WHEN doc_id % 19 <> 0 THEN 320 + (doc_id % 10) * 160 END AS w,
         CASE WHEN doc_id % 19 <> 0 THEN 240 + (doc_id % 7) * 120 END AS h,
         CASE WHEN doc_id % 19 <> 0 THEN
              CASE WHEN doc_id % 2 = 0 THEN 30.0 ELSE 24.0 END END AS fps
  FROM present
)
SELECT doc_id, success,
       CAST(nf AS DOUBLE) AS num_frames,
       CAST(w AS DOUBLE) AS width,
       CAST(h AS DOUBLE) AS height,
       CAST(w AS DOUBLE) / CAST(h AS DOUBLE) AS aspect_ratio,
       CAST(w * h AS DOUBLE) AS resolution,
       fps,
       CAST(nf AS DOUBLE) / fps AS duration_sec
FROM probe
""",
)
def q_video_info_probe(sf_dir: str):
    """VideoInfoFilter (video_info_filter.py:265-345,347-400): optional
    existence pre-filter (``ext=True``, lines 290-304 — stub: every 31st
    path is missing), per-video metadata probe (cv2-bound -> stub; a
    failed probe keeps the row with success=false and NULL fields,
    lines 324-336), then a global ascending sort by num_frames with
    failures last (None -> inf, lines 338-343). NULL-able numerics are
    float64-with-NaN on both sides (CLAUDE.md dtype rule)."""

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        ids = ids[ids % 31 != 0]  # ext=True existence pre-filter
        ok = ids % 19 != 0
        nf = np.where(ok, 30 + (ids % 50) * 24, 1).astype(np.float64)
        w = np.where(ok, 320 + (ids % 10) * 160, 1).astype(np.float64)
        h = np.where(ok, 240 + (ids % 7) * 120, 1).astype(np.float64)
        fps = np.where(ids % 2 == 0, 30.0, 24.0)
        nan = np.float64("nan")
        out = pd.DataFrame(
            {
                "doc_id": ids,
                "success": ok,
                "num_frames": np.where(ok, nf, nan),
                "width": np.where(ok, w, nan),
                "height": np.where(ok, h, nan),
                "aspect_ratio": np.where(ok, w / h, nan),
                "resolution": np.where(ok, w * h, nan),
                "fps": np.where(ok, fps, nan),
                "duration_sec": np.where(ok, nf / fps, nan),
                # None -> inf sort key (video_info_filter.py:338-341)
                "sort_key": np.where(ok, nf, np.inf),
            }
        )
        return out

    probed = _documents(sf_dir).map_batches(probe, batch_format="pandas")
    return probed.sort("sort_key").map_batches(
        lambda b: b.drop(columns=["sort_key"]), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# text -> image generation (PromptedImageGenerator, diffusers-shaped)
# ---------------------------------------------------------------------------

@register(
    "prompted_image_gen",
    _CTE + f"""
SELECT 'sample' || conv_id || '_condition' || turn_idx AS sample_id,
       safe || '/' || safe || '_0.png' AS rel_path,
       md5(text) AS img_md5,
       CAST(1024 AS BIGINT) AS n_bytes
FROM (
  SELECT conv_id, turn_idx, text,
         substr(trim(regexp_replace(text, '[^0-9a-zA-Z]+', '_', 'g'), '_'), 1, 120) AS safe
  FROM transcripts
  WHERE text IS NOT NULL AND length(trim(text, '{_CAT_WS}')) > 0
)
""",
)
def q_prompted_image_gen(sf_dir: str):
    """PromptedImageGenerator (prompted_image_generator.py:30-95): every
    non-empty conversation message becomes one t2i prompt with a unique
    sample id; the diffusers serving is an actor pool (stub backend)
    emitting image bytes + the reference's sanitized save layout
    (image_gen.py:33-41). The reference's positional
    ``sample{row}_condition{msg}`` id becomes the stable
    ``sample{conv_id}_condition{turn_idx}`` (a positional index is not
    reproducible under distribution). Bytes flow to
    ``media_sideeffect_sink`` in the pytest composition; the query
    returns the manifest."""
    from dataflow_mm_ray.serving import T2IGenerator
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    t = transcripts_from_events(sf_dir)

    def to_prompts(b: pd.DataFrame) -> pd.DataFrame:
        mask = b["text"].notna() & (b["text"].astype(str).str.strip() != "")
        b = b[mask]
        return pd.DataFrame(
            {
                "sample_id": "sample" + b["conv_id"].astype(str)
                + "_condition" + b["turn_idx"].astype(str),
                "prompt": b["text"].astype(str),
            }
        )

    gen = t.map_batches(to_prompts, batch_format="pandas").map_batches(
        T2IGenerator, batch_format="pandas", concurrency=(1, 2), batch_size=1024
    )
    return gen.map_batches(
        lambda b: b[["sample_id", "rel_path", "img_md5", "n_bytes"]],
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# image editing (PromptedImageEditGenerator, diffusers-shaped)
# ---------------------------------------------------------------------------

@register(
    "image_edit_gen",
    _CTE + """
, instr AS (
  SELECT conv_id, arg_min(text, turn_idx) AS instruction
  FROM transcripts WHERE role = 'user' GROUP BY conv_id
)
SELECT conv_id,
       'images/' || conv_id || '.png' AS src_rel,
       md5('images/' || conv_id || '.png' || chr(31) || instruction) AS edit_md5,
       CAST(1024 AS BIGINT) AS n_bytes
FROM instr
""",
)
def q_image_edit_gen(sf_dir: str):
    """PromptedImageEditGenerator (prompted_image_edit_generator.py:
    52-184): per conversation, the FIRST user message is the editing
    instruction for that conversation's source image; relative source
    paths resolve against the dataset base dir
    (resolve_media_path / lines 31-39 — unit-tested; the digest keys on
    the canonical relative path so output is mount-independent). The
    edit serving is an actor pool; bytes flow to media_sideeffect_sink
    in the pytest composition."""
    from dataflow_mm_ray.serving import ImageEditGenerator
    from dataflow_mm_ray.sources.transcripts import transcripts_partitioned

    def first_instruction(part: pd.DataFrame) -> pd.DataFrame:
        u = part[part["role"] == "user"]
        u = u.sort_values(["conv_id", "turn_idx"], kind="mergesort").drop_duplicates("conv_id")
        return pd.DataFrame(
            {
                "conv_id": u["conv_id"].to_numpy(),
                "src_rel": "images/" + u["conv_id"].astype(str) + ".png",
                "instruction": u["text"].astype(str).to_numpy(),
            }
        )

    pairs = transcripts_partitioned(sf_dir, first_instruction)
    gen = pairs.map_batches(
        ImageEditGenerator, batch_format="pandas", concurrency=(1, 2), batch_size=2048
    )
    return gen.map_batches(
        lambda b: b[["conv_id", "src_rel", "edit_md5", "n_bytes"]], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# CoT QA generation (VideoCOTQAGenerator)
# ---------------------------------------------------------------------------

def _cot_sql() -> str:
    from dataflow_mm_ray.serving import COT_PROMPT_BODY, COT_TYPE_TEMPLATE

    body = COT_PROMPT_BODY.replace("'", "''")
    suffix = "CASE problem_type " + " ".join(
        f"WHEN '{k}' THEN '{v.replace(chr(39), chr(39) * 2)}'"
        for k, v in COT_TYPE_TEMPLATE.items()
    ) + " END"
    return f"""
WITH fix AS (
  SELECT doc_id,
    ['multiple choice', 'numerical', 'OCR', 'free-form', 'regression'][(doc_id % 5) + 1]
      AS problem_type
  FROM documents
), q AS (
  SELECT doc_id, problem_type,
    'Q' || doc_id || ': determine the correct output.' ||
    CASE WHEN problem_type = 'multiple choice'
         THEN 'Options:' || chr(10) || 'A. first' || chr(10) || 'B. second' || chr(10)
              || 'C. third' || chr(10) || 'D. fourth' || chr(10)
         ELSE '' END AS question
  FROM fix
), p AS (
  SELECT doc_id, problem_type,
         md5(question || chr(10) || '{body}' || {suffix}) AS h
  FROM q
)
SELECT doc_id, problem_type,
       'thinking about ' || substr(h, 1, 8) AS process,
       substr(h, 9, 8) AS answer
FROM p
"""


@register("cot_qa", _cot_sql())
def q_cot_qa(sf_dir: str):
    """VideoCOTQAGenerator (video_cotqa_generator.py:17-194): per-row
    problem -> CoT prompt (multiple-choice options appended, lines
    52-61; type-specific answer-format suffix, lines 63-67 of
    prompts/video.py) -> serving pool -> <think>/<answer> extraction
    (lines 85-99). The stub CoT backend emits a structured response so
    the extraction regexes run for real."""
    from dataflow_mm_ray.serving import (
        COT_PROMPT_BODY,
        COT_TYPE_TEMPLATE,
        PromptedGenerator,
        StubCoTServing,
        extract_answer,
        extract_think,
    )

    TYPES = ["multiple choice", "numerical", "OCR", "free-form", "regression"]
    OPTIONS = "Options:\nA. first\nB. second\nC. third\nD. fourth\n"

    def build(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        ptype = pd.Series([TYPES[i % 5] for i in ids])
        base = "Q" + pd.Series(ids).astype(str) + ": determine the correct output."
        question = base + np.where(ptype == "multiple choice", OPTIONS, "")
        prompt = (
            question + "\n" + COT_PROMPT_BODY + ptype.map(COT_TYPE_TEMPLATE).to_numpy()
        )
        return pd.DataFrame(
            {"doc_id": ids, "problem_type": ptype.to_numpy(), "prompt": prompt.to_numpy()}
        )

    gen = _documents(sf_dir).map_batches(build, batch_format="pandas").map_batches(
        PromptedGenerator,
        fn_constructor_kwargs={"backend_cls": StubCoTServing, "output_key": "full_response"},
        batch_format="pandas",
        concurrency=(1, 2),
        batch_size=2048,
    )

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "problem_type": b["problem_type"].to_numpy(),
                "process": [extract_think(r) for r in b["full_response"]],
                "answer": [extract_answer(r) for r in b["full_response"]],
            }
        )

    return gen.map_batches(extract, batch_format="pandas")


# ---------------------------------------------------------------------------
# distinct counting: exact (oracled) + HyperLogLog sketch (engine addition)
# ---------------------------------------------------------------------------

@register(
    "distinct_props_exact",
    """
SELECT event_type, CAST(count(DISTINCT props) AS BIGINT) AS n_distinct
FROM events GROUP BY 1
""",
)
def q_distinct_props_exact(sf_dir: str):
    """Exact per-group distinct count: per-batch partial distinct
    (combiner) then a keyed exchange of the distinct values only."""
    from dataflow_mm_ray.partition import partition_map

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])
    partial = ev.map_batches(
        lambda b: b.drop_duplicates(), batch_format="pandas"
    )

    def count_distinct(part: pd.DataFrame) -> pd.DataFrame:
        agg = part.drop_duplicates().groupby("event_type", sort=False).size()
        return pd.DataFrame(
            {"event_type": agg.index.to_numpy(dtype=object),
             "n_distinct": agg.to_numpy(dtype=np.int64)}
        )

    return partition_map(partial, "event_type", count_distinct, num_partitions=8)


def _approx_props_md5_sql() -> str:
    from dataflow_mm_ray.functions.hll_sql import hll_md5_estimate_sql
    from dataflow_mm_ray.stages.sketch import HLL_P

    return "WITH " + hll_md5_estimate_sql(
        "SELECT DISTINCT event_type AS g, props AS v FROM events",
        "g", "event_type", "approx_distinct", p=HLL_P,
    )


@register("approx_distinct_props_md5", _approx_props_md5_sql())
def q_approx_distinct_props_md5(sf_dir: str):
    """The generic approx-COUNT(DISTINCT) sketch under a FULL SQL
    oracle: md5 hashes + the exact-integer-register-sum estimate
    (stages/sketch.py approx_distinct(hasher=md5_hash64,
    estimator=hll_estimate_sqlexact); SQL twin functions/hll_sql.py).
    The SipHash twin below stays the production path."""
    from dataflow_mm_ray.stages.sketch import (
        approx_distinct,
        hll_estimate_sqlexact,
        md5_hash64,
    )

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])
    return approx_distinct(
        ev, "event_type", "props", hasher=md5_hash64, estimator=hll_estimate_sqlexact
    )


@register("approx_distinct_props", None)  # sketch: pytest error-bound oracle
def q_approx_distinct_props(sf_dir: str):
    """HyperLogLog distinct-count sketch per event_type (p=14, ~0.8%
    standard error) — mergeable registers, one combiner pass + a tiny
    keyed exchange; never a shuffle of the raw values. The engine
    addition SURVEY §2.8 notes the reference lacks; accuracy pinned in
    tests/test_sketch.py against the exact oracled twin."""
    from dataflow_mm_ray.stages.sketch import approx_distinct

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])
    return approx_distinct(ev, "event_type", "props")


# ---------------------------------------------------------------------------
# guaranteed-exact heavy hitters (stages/heavyhitters.py)
# ---------------------------------------------------------------------------

HH_NUM, HH_DEN = 7, 200  # phi = 3.5% of all token occurrences


@register(
    "heavy_hitters",
    f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS token
  FROM documents
)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM toks GROUP BY 1
HAVING count(*) * {HH_DEN} > {HH_NUM} * (SELECT count(*) FROM toks)
""",
)
def q_heavy_hitters(sf_dir: str):
    """Every token above phi of all occurrences, EXACT counts: MG
    candidate sketch (bounded counters per batch) -> broadcast -> exact
    verify pass. Output is batch/partition invariant even though the
    intermediate candidate set is not (superset guarantee)."""
    from dataflow_mm_ray.stages.heavyhitters import heavy_hitters, whitespace_tokens

    docs = _documents(sf_dir)
    return heavy_hitters(docs, whitespace_tokens, HH_NUM, HH_DEN)
