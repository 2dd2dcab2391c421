"""§2.4 VQA prompt-variant generators + §2.2/2.3 refine operators as
registered queries with DuckDB oracles.

Each query synthesizes its media/question fixture deterministically
from the ``documents`` (or transcript) tables — image paths, question
lists, MCQ options — with the SAME derivation in the engine kernel and
the SQL oracle, so the *operator semantics* (prompt assembly, token
injection, flatten/unflatten, keep rules) are what the oracle checks.

Fixture conventions (shared across queries):
- ``image`` = 'img/<doc_id>.png', NULL for doc_id % 7 == 0 (exercises
  every operator's no-media skip branch);
- stub servings hash ``system_prompt + content`` (serving.py) so every
  reply is reproducible in SQL via ``md5()`` + nibble arithmetic.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_mm_ray.queries import register
from dataflow_mm_ray.schema import DEFAULT_BATCH_SIZE
from dataflow_mm_ray.sources.tables import read_table
from dataflow_mm_ray.sources.transcripts import TRANSCRIPTS_CTE

_SYS = "You are a helpful assistant."
_CAPTION_PROMPT = "Please caption the media in detail."
_BBOX_SYS = "You are a helpful assistant capable of visual grounding."


def _sq(s: str) -> str:
    """Escape a Python string for splicing into a SQL single-quoted
    literal (newlines stay literal — DuckDB accepts them)."""
    return s.replace("'", "''")


def _nib(expr: str, i: int) -> str:
    """SQL for the value of 0-based hex digit ``i`` of ``expr``."""
    return f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"


_IMG_SQL = "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE 'img/' || doc_id || '.png' END"


def _add_image(b: pd.DataFrame) -> pd.DataFrame:
    ids = b["doc_id"].to_numpy()
    img = np.array([f"img/{i}.png" for i in ids], dtype=object)
    img[ids % 7 == 0] = None
    b = b.copy(deep=False)
    b["image"] = img
    return b


def _pool(ds, cls, **kwargs):
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pandas",
        batch_size=DEFAULT_BATCH_SIZE,
        concurrency=(1, 2),
    )


def _select(ds, cols):
    return ds.map_batches(lambda b: b[cols], batch_format="pandas")


# ---------------------------------------------------------------------------
# FixPromptedVQAGenerator
# ---------------------------------------------------------------------------

@register(
    "fix_prompted_vqa",
    f"""
WITH d AS (SELECT doc_id, {_IMG_SQL} AS image FROM documents)
SELECT doc_id, image,
       'ans-' || md5('{_sq(_SYS)}' ||
         CASE WHEN image IS NULL THEN '{_sq(_CAPTION_PROMPT)}'
              ELSE '<image>{_sq(_CAPTION_PROMPT)}' END) AS answer
FROM d
""",
)
def q_fix_prompted_vqa(sf_dir: str):
    """FixPromptedVQAGenerator (fix_prompted_vqa_generator.py:46-132,
    image branch, local serving): content = '<image>'*n_valid +
    user_prompt, one answer per row."""
    from dataflow_mm_ray.stages.vqa_variants import FixPromptedVQA

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    ds = docs.map_batches(_add_image, batch_format="pandas")
    return _select(_pool(ds, FixPromptedVQA), ["doc_id", "image", "answer"])


# ---------------------------------------------------------------------------
# PromptTemplatedVQAGenerator
# ---------------------------------------------------------------------------

_TVQA_TEMPLATE = "Describe the {source} document:\n{text}"


@register(
    "prompt_templated_vqa",
    f"""
WITH d AS (SELECT doc_id, {_IMG_SQL} AS image,
                  'Describe the ' || source || ' document:' || chr(10) || text AS p
           FROM documents)
SELECT doc_id,
       'ans-' || md5('{_sq(_SYS)}' ||
         CASE WHEN image IS NULL THEN p ELSE '<image>' || chr(10) || p END) AS answer
FROM d
""",
)
def q_prompt_templated_vqa(sf_dir: str):
    """PromptTemplatedVQAGenerator (prompt_templated_vqa_generator.py:
    94-149, image branch, local serving): template-filled prompt with
    '<image>'*n + newline prefix when the row has media."""
    from dataflow_mm_ray.stages.vqa_variants import TemplatedVQA

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    ds = docs.map_batches(_add_image, batch_format="pandas")
    out = _pool(ds, TemplatedVQA, template=_TVQA_TEMPLATE,
                field_map={"source": "source", "text": "text"})
    return _select(out, ["doc_id", "answer"])


# ---------------------------------------------------------------------------
# BatchVQAGenerator
# ---------------------------------------------------------------------------

def _add_questions(b: pd.DataFrame) -> pd.DataFrame:
    b = _add_image(b)
    b["questions"] = [
        [f"What does document {i} say about topic {j}?" for j in range(i % 3)]
        for i in b["doc_id"].to_numpy()
    ]
    return b


@register(
    "batch_vqa",
    f"""
WITH d AS (SELECT doc_id, {_IMG_SQL} AS image, doc_id % 3 AS n_q FROM documents),
q AS (SELECT doc_id, image, unnest(range(n_q)) AS i FROM d),
a AS (
  SELECT doc_id, i,
    'ans-' || md5('{_sq(_SYS)}' ||
      CASE WHEN image IS NULL THEN '' ELSE '<image>' END ||
      'What does document ' || doc_id || ' say about topic ' || i || '?') AS ans
  FROM q
), agg AS (
  SELECT doc_id, string_agg('"' || ans || '"', ', ' ORDER BY i) AS s FROM a GROUP BY doc_id
)
SELECT d.doc_id, coalesce('[' || agg.s || ']', '[]') AS answers
FROM d LEFT JOIN agg USING (doc_id)
""",
)
def q_batch_vqa(sf_dir: str):
    """BatchVQAGenerator (batch_vqa_generator.py:71-128): per-row
    question list flattened to '<image>'*n + q prompts, answers
    regrouped per row in question order (JSON array string)."""
    from dataflow_mm_ray.stages.vqa_variants import BatchVQA

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    ds = docs.map_batches(_add_questions, batch_format="pandas")
    return _select(_pool(ds, BatchVQA), ["doc_id", "answers"])


# ---------------------------------------------------------------------------
# VLMBBoxGenerator
# ---------------------------------------------------------------------------

@register(
    "vlm_bbox",
    f"""
WITH d AS (SELECT doc_id, {_IMG_SQL} AS image FROM documents),
kw AS (
  SELECT doc_id, image, unnest(['obj-' || (doc_id % 10), 'obj-' || ((doc_id + 1) % 10)]) AS kw
  FROM d WHERE image IS NOT NULL
), h AS (
  SELECT doc_id, kw,
    md5('{_sq(_BBOX_SYS)}' || '<image>' || chr(10) || 'Detect "' || kw || '".') AS hh
  FROM kw
), px AS (
  SELECT doc_id, kw,
    ({_nib('hh', 1)} * 16 + {_nib('hh', 2)}) * 3 AS a,
    ({_nib('hh', 3)} * 16 + {_nib('hh', 4)}) * 3 AS b,
    ({_nib('hh', 5)} * 16 + {_nib('hh', 6)}) * 3 AS c,
    ({_nib('hh', 7)} * 16 + {_nib('hh', 8)}) * 3 AS e
  FROM h WHERE {_nib('hh', 0)} <> 15
), boxes AS (
  SELECT doc_id, kw,
    printf('[%.3f, %.3f, %.3f, %.3f]',
           least(a, c) / 1000.0, least(b, e) / 1000.0,
           greatest(a, c) / 1000.0, greatest(b, e) / 1000.0) AS box
  FROM px
), agg AS (
  SELECT doc_id, string_agg('"' || kw || '": ["' || box || '"]', ', ' ORDER BY kw) AS s
  FROM boxes GROUP BY doc_id
)
SELECT d.doc_id, coalesce('{{' || agg.s || '}}', '{{}}') AS bbox_map
FROM d LEFT JOIN agg USING (doc_id)
""",
)
def q_vlm_bbox(sf_dir: str):
    """VLMBBoxGenerator (vlm_bbox_generator.py:74-167): per-keyword
    'Detect "<kw>".' grounding prompts with '<image>'*n + newline
    tokens, 'not found' replies dropped, boxes parsed/normalized/
    corner-ordered into a keyword->['[x1, y1, x2, y2]'] JSON map.
    Keyword dedup is sorted (the reference's list(set()) order is
    nondeterministic)."""
    from dataflow_mm_ray.stages.vqa_variants import VLMBBox

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def add_kws(b: pd.DataFrame) -> pd.DataFrame:
        b = _add_image(b)
        # third keyword repeats the first: exercises the dedup
        b["keywords"] = [
            [f"obj-{i % 10}", f"obj-{(i + 1) % 10}", f"obj-{i % 10}"]
            for i in b["doc_id"].to_numpy()
        ]
        return b

    ds = docs.map_batches(add_kws, batch_format="pandas")
    return _select(_pool(ds, VLMBBox), ["doc_id", "bbox_map"])


# ---------------------------------------------------------------------------
# VisualReasoningGenerator
# ---------------------------------------------------------------------------

# MCTReasoningPrompt().build_prompt()['web_grounding'] —
# dataflow/prompts/image.py:95-109 (prompt text IS the operator spec)
MCT_WEB_GROUNDING_SYS = (
    "A conversation between User and Assistant. The User asks a question, and the Assistant solves it. "
    "The Assistant systematically reasons through the problem step by step, verifying each step and grounding every step to a specific point in the image.\n\n"
    "All reasoning processes must be enclosed within a single set of '<think>' tags, with each reasoning step explicitly referencing a coordinate:\n\n"
    "<think>\n[Reasoning text with grounded points inline] (x1, y1). [Further reasoning] (x2, y2), [Final refinement] (x3, y3).\n</think>\n\n"
    "The final answer should be enclosed in '<answer>' tags in the format:\n<answer> (xf, yf) </answer>\n\n"
    "Your task is to help the user identify the precise coordinates (x, y) of a specific area/element/object on the screen based on a description.\n"
    "- Aim to point to the center or a representative point within the described area/element/object as accurately as possible.\n"
    "- If the description is unclear or ambiguous, infer the most relevant area or element based on its likely context or purpose.\n"
    "- The final output should be the single most precise coordinate for the requested element.\n"
    "- The Assistant should verify each step and check multiple possible solutions before selecting the final answer."
)


@register(
    "visual_reasoning",
    f"""
WITH d AS (SELECT doc_id, {_IMG_SQL} AS image,
    CASE WHEN doc_id % 13 = 0 THEN ''
         ELSE 'Point to the main object in document ' || doc_id END AS q,
    doc_id % 11 = 0 AS cached
  FROM documents)
SELECT doc_id, q AS question,
  CASE WHEN cached THEN '["cached-' || doc_id || '"]'
       WHEN q = '' THEN '[]'
       ELSE '["ans-' || md5('{_sq(MCT_WEB_GROUNDING_SYS)}' ||
              CASE WHEN image IS NULL THEN q
                   ELSE '<image>' || chr(10) || q END) || '"]' END AS reasoning
FROM d
""",
)
def q_visual_reasoning(sf_dir: str):
    """VisualReasoningGenerator (visual_reasoning_generator.py:53-140):
    cached-chain fallback rows pass through untouched, blank questions
    yield [], the rest run '<image>'*n + '\\n' + question under the MCT
    web_grounding system prompt (dataflow/prompts/image.py:95-109)."""
    from dataflow_mm_ray.stages.vqa_variants import VisualReasoning

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def add_fix(b: pd.DataFrame) -> pd.DataFrame:
        b = _add_image(b)
        ids = b["doc_id"].to_numpy()
        b["question"] = [
            "" if i % 13 == 0 else f"Point to the main object in document {i}" for i in ids
        ]
        b["cached"] = [[f"cached-{i}"] if i % 11 == 0 else [] for i in ids]
        return b

    ds = docs.map_batches(add_fix, batch_format="pandas")
    out = _pool(ds, VisualReasoning, system_prompt=MCT_WEB_GROUNDING_SYS)
    return _select(out, ["doc_id", "question", "reasoning"])


# ---------------------------------------------------------------------------
# MultimodalMathGenerator
# ---------------------------------------------------------------------------

_MATH_SIMPLE_EXPRS = "['f(x) = 2x + 1', 'f(x) = x²', 'f(x) = sin(x)', 'f(x) = exp(x/2)']"
_MATH_COMPLEX_EXPRS = "['f(x) = x²', 'f(x) = sin(x)', 'f(x) = exp(x/2)']"


def _mm_math_sql() -> str:
    nib = lambda i: _nib("h", i)  # noqa: E731
    return f"""
WITH d AS (
  SELECT doc_id, doc_id % 2 = 0 AS simple, md5('math-' || doc_id) AS h FROM documents
), n AS (
  SELECT doc_id, simple, h,
    {nib(1)} AS n1, {nib(2)} AS n2, {nib(3)} AS n3, {nib(4)} AS n4,
    {nib(5)} AS n5, {nib(6)} AS n6, {nib(7)} AS n7, {nib(8)} AS n8
  FROM d
), s AS (
  SELECT doc_id, n1 % 4 AS fi, (10 + (n2 * 16 + n3) % 31) / 10.0 AS x FROM n WHERE simple
), s2 AS (
  SELECT doc_id, {_MATH_SIMPLE_EXPRS}[fi + 1] AS expr, x,
    CASE fi WHEN 0 THEN 2 * x + 1 WHEN 1 THEN x * x WHEN 2 THEN sin(x) ELSE exp(x / 2) END AS y
  FROM s
), sq AS (
  SELECT doc_id,
    'The function plot represents ' || expr || '. What is the function value at x=' || CAST(x AS VARCHAR) || '?' AS question,
    CAST(round(y, 3) AS VARCHAR) AS answer,
    'According to the function expression ' || expr || ', substitute x=' || CAST(x AS VARCHAR) || ' to get y=' || CAST(round(y, 3) AS VARCHAR) || '.' AS solution
  FROM s2
), c AS (
  SELECT doc_id, n1 % 3 AS ci, n4 % 3 AS qt, n5, n6, n7, n8,
    {_MATH_COMPLEX_EXPRS}[n1 % 3 + 1] AS expr,
    CASE n1 % 3 WHEN 1 THEN 6 ELSE 5 END AS hi
  FROM n WHERE NOT simple
), cd AS (
  SELECT doc_id, expr, ci, ((n5 * 16 + n6) % (10 * hi + 1)) / 10.0 AS x FROM c WHERE qt = 0
), cd2 AS (
  SELECT doc_id, expr, x,
    CASE ci WHEN 0 THEN (x + 0.01) * (x + 0.01) - (x - 0.01) * (x - 0.01)
            WHEN 1 THEN sin(x + 0.01) - sin(x - 0.01)
            ELSE exp((x + 0.01) / 2) - exp((x - 0.01) / 2) END AS dd
  FROM cd
), cdq AS (
  SELECT doc_id,
    'The function plot represents ' || expr || '. Is the rate of change (derivative) at x=' || CAST(x AS VARCHAR) || ' positive or negative?' AS question,
    CASE WHEN dd > 0 THEN 'positive' WHEN dd < 0 THEN 'negative' ELSE 'zero' END AS answer,
    'By observing the slope of the plot near x=' || CAST(x AS VARCHAR) || ', the rate of change is ' ||
      CASE WHEN dd > 0 THEN 'positive' WHEN dd < 0 THEN 'negative' ELSE 'zero' END || '.' AS solution
  FROM cd2
), ce AS (
  SELECT doc_id, expr, ci,
    list_transform(range(0, 100), i -> CASE WHEN i = 99 THEN hi * 1.0 ELSE i * (hi / 99.0) END) AS xs
  FROM c WHERE qt = 1
), ce2 AS (
  SELECT doc_id, expr, xs,
    list_transform(xs, x -> CASE ci WHEN 0 THEN x * x WHEN 1 THEN sin(x) ELSE exp(x / 2) END) AS ys
  FROM ce
), ce3 AS (
  SELECT doc_id, expr,
    round(xs[list_position(ys, list_min(ys))], 2) AS xm,
    round(ys[list_position(ys, list_min(ys))], 2) AS ym
  FROM ce2
), ceq AS (
  SELECT doc_id,
    'The function plot represents ' || expr || '. At which x-value does the function reach its minimum value in the shown domain?' AS question,
    CAST(xm AS VARCHAR) AS answer,
    'From the plot, the minimum occurs at x=' || CAST(xm AS VARCHAR) || ', with y=' || CAST(ym AS VARCHAR) AS solution
  FROM ce3
), cm AS (
  SELECT doc_id, expr, ci,
    least(((n5 * 16 + n6) % (10 * hi + 1)) / 10.0, ((n7 * 16 + n8) % (10 * hi + 1)) / 10.0) AS a,
    greatest(((n5 * 16 + n6) % (10 * hi + 1)) / 10.0, ((n7 * 16 + n8) % (10 * hi + 1)) / 10.0) AS b
  FROM c WHERE qt = 2
), cm2 AS (
  SELECT doc_id, expr, a, b,
    list_transform(
      list_transform(range(0, 50), i -> CASE WHEN i = 49 THEN b ELSE i * ((b - a) / 49.0) + a END),
      x -> CASE ci WHEN 0 THEN x * x WHEN 1 THEN sin(x) ELSE exp(x / 2) END) AS ys
  FROM cm
), cm3 AS (
  SELECT doc_id, expr, a, b,
    CASE WHEN list_aggregate(list_transform(range(1, 50), i -> ys[i + 1] > ys[i]), 'bool_and') THEN 'increasing'
         WHEN list_aggregate(list_transform(range(1, 50), i -> ys[i + 1] < ys[i]), 'bool_and') THEN 'decreasing'
         ELSE 'not monotonic' END AS mono
  FROM cm2
), cmq AS (
  SELECT doc_id,
    'The function plot represents ' || expr || '. Is the function monotonically increasing or decreasing in the interval [' || CAST(a AS VARCHAR) || ', ' || CAST(b AS VARCHAR) || ']?' AS question,
    mono AS answer,
    'By observing the function value trend in the interval [' || CAST(a AS VARCHAR) || ', ' || CAST(b AS VARCHAR) || '], the function is ' || mono || '.' AS solution
  FROM cm3
), allq AS (
  SELECT * FROM sq UNION ALL SELECT * FROM cdq
  UNION ALL SELECT * FROM ceq UNION ALL SELECT * FROM cmq
)
SELECT doc_id, 'plots/plot_' || doc_id || '.png' AS image_path, question, answer, solution
FROM allq
"""


@register("multimodal_math", _mm_math_sql())
def q_multimodal_math(sf_dir: str):
    """MultimodalMathGenerator (multimodal_math_generator.py:117-233):
    simple (value substitution) and complex (derivative sign /
    extremum / monotonicity) question synthesis, every random draw
    replaced by md5('math-'+doc_id) nibbles and all scalar math routed
    through platform libm (stages/mathgen.py) so the SQL oracle rounds
    identical doubles. mode = 'simple' for even doc_ids."""
    from dataflow_mm_ray.stages.mathgen import math_samples_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["mode"] = np.where(b["doc_id"].to_numpy() % 2 == 0, "simple", "complex")
        return math_samples_batch(b)

    return docs.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# PersQAGenerator
# ---------------------------------------------------------------------------

def _pers_sql() -> str:
    from dataflow_mm_ray.stages.vqa_variants import (
        PERS_HUMAN_QS,
        PERS_SYSTEM_PROMPT,
    )

    qs_list = "[" + ", ".join("'" + _sq(q) + "'" for q in PERS_HUMAN_QS) + "]"
    return TRANSCRIPTS_CTE + f"""
, t AS (
  SELECT conv_id, turn_idx,
         CASE role WHEN 'user' THEN 'human' ELSE 'gpt' END AS frm, text,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM transcripts WHERE role IN ('user', 'assistant')
), meta AS (
  SELECT conv_id,
         CAST(substr(conv_id, 6) AS BIGINT) % 9 <> 0 AS has_img,
         {_nib('md5(conv_id)', 0)} % 10 AS qi
  FROM (SELECT DISTINCT conv_id FROM transcripts)
), q AS (
  SELECT conv_id, has_img,
         replace({qs_list}[qi + 1], '<sks>', '<mam>') AS query
  FROM meta
), lines AS (
  SELECT t.conv_id, t.rn, t.frm || ': ' ||
    CASE WHEN t.rn = 1 THEN
      CASE WHEN t.frm = 'human' AND q.has_img THEN '<image>' ELSE '' END ||
      'The name of the main character in the image is <mam>. You need to answer a question about <mam>.' || chr(10) ||
      'Question: ' || q.query || ' Please answer starting with <mam>!' || chr(10) || 'Answer: '
    ELSE t.text END AS line
  FROM t JOIN q USING (conv_id)
), flat AS (
  SELECT conv_id, string_agg(line, chr(10) ORDER BY rn) AS fl FROM lines GROUP BY conv_id
)
SELECT q.conv_id, q.query,
       'ans-' || md5('{_sq(PERS_SYSTEM_PROMPT)}' || coalesce(flat.fl, '')) AS answer
FROM q LEFT JOIN flat USING (conv_id)
"""


@register("pers_qa", _pers_sql())
def q_pers_qa(sf_dir: str):
    """PersQAGenerator (personalized_qa_generator.py:93-229, local
    branch): per-conversation personalized prompt — query drawn from
    the reference's human_qs template set by md5(conv_id) nibble
    (replacing random.choice), first turn's value replaced, '<image>'
    token injected when the first turn is human and the conversation
    has an image — flattened and run through the serving pool under
    the PersQA system prompt."""
    from dataflow_mm_ray.serving import prompted_qa
    from dataflow_mm_ray.sources.transcripts import transcripts_partitioned
    from dataflow_mm_ray.stages.vqa_variants import PERS_SYSTEM_PROMPT, pers_qa_kernel

    prompts = transcripts_partitioned(sf_dir, pers_qa_kernel)
    out = prompted_qa(
        prompts,
        backend_kwargs={"system_prompt": PERS_SYSTEM_PROMPT},
        concurrency=(1, 2),
        batch_size=2048,
    )
    return _select(out, ["conv_id", "query", "answer"])


# ---------------------------------------------------------------------------
# VisualGroundingRefiner
# ---------------------------------------------------------------------------

_GROUND_TMPL = 'Is "{text}" visible in the image? Answer Yes or No.'

# md5 of the judged content: sys + '<image>' + '\n' + template-filled item
_GROUND_MD5 = (
    "md5('" + _sq(_SYS) + "' || '<image>' || chr(10) || 'Is \"' || item"
    + " || '\" visible in the image? Answer Yes or No.')"
)


@register(
    "visual_grounding_refine",
    f"""
WITH d AS (SELECT doc_id, {_IMG_SQL} AS image, string_split(text, '. ') AS items
           FROM documents),
it AS (
  SELECT doc_id, u.i AS idx, u.s AS item
  FROM d, unnest(list_transform(range(1, len(items) + 1),
                                i -> {{'i': i, 's': items[i]}})) AS t(u)
  WHERE image IS NOT NULL
), j AS (
  SELECT doc_id, idx, item
  FROM it
  WHERE {_nib(_GROUND_MD5, 0)} < 8
), agg AS (
  SELECT doc_id, string_agg(to_json(item), ', ' ORDER BY idx) AS s FROM j GROUP BY doc_id
)
SELECT d.doc_id, coalesce('[' || agg.s || ']', '[]') AS refined
FROM d LEFT JOIN agg USING (doc_id)
""",
)
def q_visual_grounding_refine(sf_dir: str):
    """VisualGroundingRefiner (visual_grounding_refiner.py:64-150):
    items = the document's '. '-split sentences, each visually verified
    Yes/No against the row's image; rows without an image are skipped
    (refined = []); kept items returned as a JSON array in original
    order."""
    from dataflow_mm_ray.stages.refiners import GroundingRefiner

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_items(b: pd.DataFrame) -> pd.DataFrame:
        b = _add_image(b)
        b["items"] = [t.split(". ") if isinstance(t, str) else [] for t in b["text"]]
        return b

    ds = docs.map_batches(add_items, batch_format="pandas")
    out = _pool(ds, GroundingRefiner, prompt_template=_GROUND_TMPL)
    return _select(out, ["doc_id", "refined"])


# ---------------------------------------------------------------------------
# VisualDependencyRefiner
# ---------------------------------------------------------------------------

_MCQ_TMPL = "Please answer the following multiple-choice question.\n{0}"
_DEP_PASS_VISUAL_MIN = 0.25
_DEP_PASS_TEXTUAL_MAX = 0.25


def _dep_sql() -> str:
    def q_lines(rot_expr: str, with_none: bool) -> str:
        lines = "title"
        for j in range(4):
            lines += f" || chr(10) || '   - {'ABCD'[j]}) ' || ts[({j} + {rot_expr}) % 4 + 1]"
        if with_none:
            lines += " || chr(10) || '   - E) None of the above'"
        return lines

    pre = f"'{_sq(_SYS)}' || '<image>' || chr(10) || 'Please answer the following multiple-choice question.' || chr(10) || "
    pre_t = f"'{_sq(_SYS)}' || 'Please answer the following multiple-choice question.' || chr(10) || "
    return f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 0),
qa AS (SELECT doc_id, unnest([0, 1]) AS qa_idx FROM d),
base AS (
  SELECT doc_id, qa_idx, md5('mcq-' || doc_id || '-' || qa_idx) AS hq,
         'Which code belongs to document ' || doc_id || '? (item ' || qa_idx || ')' AS title
  FROM qa
), opt AS (
  SELECT doc_id, qa_idx, title,
         [substr(hq, 1, 4), substr(hq, 5, 4), substr(hq, 9, 4), substr(hq, 13, 4)] AS ts
  FROM base
), rot AS (SELECT *, unnest([0, 1, 2, 3]) AS r FROM opt),
pv AS (
  SELECT doc_id, qa_idx, r,
    {q_lines("r", True)} AS q_v,
    {q_lines("(r + 1)", False)} AS q_t,
    substr('ABCD', (4 - r) % 4 + 1, 1) AS exp_v,
    substr('ABCD', (7 - r) % 4 + 1, 1) AS exp_t
  FROM rot
), pred AS (
  SELECT doc_id, qa_idx,
    substr('ABCDE', {_nib("md5(" + pre + "q_v)", 0)} % 5 + 1, 1) = exp_v AS ok_v,
    substr('ABCD', {_nib("md5(" + pre_t + "q_t)", 0)} % 4 + 1, 1) = exp_t AS ok_t
  FROM pv
), scores AS (
  SELECT doc_id, CAST(qa_idx AS INTEGER) AS qa_idx,
         CAST(sum(CASE WHEN ok_v THEN 1 ELSE 0 END) AS BIGINT) AS v_correct,
         CAST(sum(CASE WHEN ok_t THEN 1 ELSE 0 END) AS BIGINT) AS t_correct
  FROM pred GROUP BY 1, 2
)
SELECT doc_id, qa_idx, v_correct, t_correct,
       (v_correct / 4.0 >= {_DEP_PASS_VISUAL_MIN}
        AND t_correct / 4.0 <= {_DEP_PASS_TEXTUAL_MAX}) AS keep
FROM scores
"""


@register("visual_dependency_refine", _dep_sql())
def q_visual_dependency_refine(sf_dir: str):
    """VisualDependencyRefiner (visual_dependency_refiner.py:104-234):
    2 fixture MCQs per doc (skipped for doc_id%5==0 or imageless rows),
    4 deterministic option rotations x {visual + 'None of the above',
    text-only} blind branches, letter-extraction scoring, keep iff
    v_acc >= 0.25 and t_acc <= 0.25. Output is the exploded relational
    form: one row per evaluated MCQ."""
    from dataflow_mm_ray.stages.refiners import DependencyRefiner

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def add_qas(b: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        b = _add_image(b)
        qas = []
        for i in b["doc_id"].to_numpy():
            if i % 5 == 0:
                qas.append([])
                continue
            row = []
            for qa_idx in range(2):
                hq = hashlib.md5(f"mcq-{i}-{qa_idx}".encode()).hexdigest()
                row.append(
                    {
                        "question_title": f"Which code belongs to document {i}? (item {qa_idx})",
                        "options": [hq[0:4], hq[4:8], hq[8:12], hq[12:16]],
                        "answer_idx": 0,
                    }
                )
            qas.append(row)
        b["qas"] = qas
        return b

    ds = docs.map_batches(add_qas, batch_format="pandas")
    return _pool(
        ds,
        DependencyRefiner,
        instruction_template=_MCQ_TMPL,
        pass_visual_min=_DEP_PASS_VISUAL_MIN,
        pass_textual_max=_DEP_PASS_TEXTUAL_MAX,
    )


# ---------------------------------------------------------------------------
# VisionSegCutoutRefiner
# ---------------------------------------------------------------------------

@register(
    "seg_cutout_refine",
    f"""
WITH d AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN 'missing/' || doc_id || '.png'
         ELSE 'img/' || doc_id || '.png' END AS img
  FROM documents
)
SELECT doc_id,
  CASE WHEN doc_id % 7 <> 0 AND {_nib('md5(img)', 0)} < 12
       THEN 'img/' || doc_id || '_seg.png' ELSE img END AS image,
  (doc_id % 7 <> 0 AND {_nib('md5(img)', 0)} < 12) AS processed
FROM d
""",
)
def q_seg_cutout_refine(sf_dir: str):
    """VisionSegCutoutRefiner (vision_seg_cutout_refiner.py:37-82):
    path column rewritten to '<base>_seg.png' for images whose (stub)
    segmentation produced masks; missing files and mask-less images
    keep the original path. The RGBA payload staging is exercised by
    pytest via media_dir."""
    from dataflow_mm_ray.stages.refiners import SegCutoutRefiner

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def add_img(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["image"] = [
            f"missing/{i}.png" if i % 7 == 0 else f"img/{i}.png"
            for i in b["doc_id"].to_numpy()
        ]
        return b

    ds = docs.map_batches(add_img, batch_format="pandas")
    return _select(_pool(ds, SegCutoutRefiner), ["doc_id", "image", "processed"])
