"""Operator-semantics oracles for the non-SQL-expressible operators:
conversation formatting, chunk merge, rewards, MCTS chains, UDF hook,
stub serving."""
import json

import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.functions.rewards import calculate_reward, rouge_avg_f, wer
from dataflow_mm_ray.serving import DeterministicStubServing, build_prompt
from dataflow_mm_ray.stages.chunks import merge_chunks_kernel, split_chunks_kernel
from dataflow_mm_ray.stages.conversations import (
    conversation_to_messages,
    parse_multimodal_tokens,
)
from dataflow_mm_ray.stages.udf import extract_chains


# -- conversation formatting -------------------------------------------------

def test_parse_multimodal_tokens():
    counts, cleaned = parse_multimodal_tokens("<image>look at this\n\n<image> twice")
    assert counts == {"image": 2, "video": 0, "audio": 0}
    # token removal keeps inner spacing; blank lines collapse (reference
    # conversation_to_message.py:39-41)
    assert cleaned == "look at this\n twice"


def test_conversation_to_messages_roles_and_media():
    turns = [
        {"from": "human", "value": "<image>what is this?"},
        {"from": "gpt", "value": "a cat"},
    ]
    msgs = conversation_to_messages(turns, media={"image": ["img0.jpg"]})
    assert msgs[0]["role"] == "system"
    assert msgs[1]["role"] == "user"
    assert msgs[1]["content"][0] == {"type": "image", "image": "img0.jpg"}
    assert msgs[1]["content"][1] == {"type": "text", "text": "what is this?"}
    assert msgs[2] == {"role": "assistant", "content": [{"type": "text", "text": "a cat"}]}


def test_conversation_to_messages_media_mismatch_raises():
    turns = [{"from": "human", "value": "<image><image>two tokens"}]
    with pytest.raises(ValueError):
        conversation_to_messages(turns, media={"image": ["only-one.jpg"]})


def test_conversation_empty_turn_skipped():
    turns = [{"from": "human", "value": "   "}, {"from": "gpt", "value": "hi"}]
    msgs = conversation_to_messages(turns)
    assert len(msgs) == 2  # system + assistant only


# -- chunk merge (reference loop transcription as oracle) --------------------

def _reference_merge(segments, max_duration):
    """Straight transcription of audio_timestamp_chunk_row_generator.py
    lines 297-346 (duration accumulation + flush rule)."""
    out = []
    cur, cur_dur, seq = [], 0, 1
    for s, e in segments:
        if s >= e:
            continue
        d = e - s
        if cur_dur + d > max_duration and cur:
            out.append((seq, len(cur), cur_dur, cur[0][0], cur[-1][1]))
            cur, cur_dur = [], 0
            seq += 1
        cur.append((s, e))
        cur_dur += d
    if cur:
        out.append((seq, len(cur), cur_dur, cur[0][0], cur[-1][1]))
    return out


def test_merge_chunks_matches_reference_loop():
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(1, 15)
        starts = np.sort(rng.randint(0, 1000, size=n))
        ends = starts + rng.randint(-2, 50, size=n)  # some invalid
        segs = list(zip(starts.tolist(), ends.tolist()))
        part = pd.DataFrame(
            {"conv_id": ["c"] * n, "start_us": starts, "end_us": ends}
        )
        got = merge_chunks_kernel(part, 100)
        want = _reference_merge(segs, 100)
        assert len(got) == len(want)
        for row, (seq, n_seg, dur, cs, ce) in zip(got.itertuples(index=False), want):
            assert (row.sequence_num, row.n_segments, row.total_duration_us,
                    row.chunk_start_us, row.chunk_end_us) == (seq, n_seg, dur, cs, ce)


def test_split_chunks_sequence_restarts_per_conv():
    part = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b"],
            "start_us": [0, 10, 5, 0],
            "end_us": [5, 20, 5, 3],  # third is invalid
        }
    )
    got = split_chunks_kernel(part)
    assert list(got["sequence_num"]) == [1, 2, 1]
    assert list(got["conv_id"]) == ["a", "a", "b"]


# -- rewards -----------------------------------------------------------------

def test_reward_multiple_choice_and_numerical():
    assert calculate_reward("<answer>A</answer>", "<answer> A </answer>", "multiple choice") == 1.0
    assert calculate_reward("<answer>A</answer>", "<answer>B</answer>", "multiple choice") == 0.0
    # decimal-presence mismatch -> 0 even when numerically equal
    assert calculate_reward("<answer>5</answer>", "<answer>5.0</answer>", "numerical") == 0.0
    assert calculate_reward("<answer>5.254</answer>", "<answer>5.25</answer>", "numerical") == 1.0
    assert calculate_reward("<answer>1,234.5</answer>", "<answer>1234.5</answer>", "numerical") == 1.0


def test_reward_ocr_wer():
    assert wer("a b c d", "a b c d") == 0.0
    assert wer("a b c d", "a b c") == 0.25
    assert calculate_reward("<answer>a b c d</answer>", "<answer>a b c</answer>", "OCR") == 0.75
    # hypothesis much longer than reference -> clamped at 0
    assert calculate_reward("<answer>a</answer>", "<answer>x y z w</answer>", "OCR") == 0.0


def test_reward_free_form_rouge():
    r = rouge_avg_f("the cat sat on the mat", "the cat sat on the mat")
    assert r == pytest.approx(1.0)
    partial = calculate_reward(
        "<answer>the cat sat on the mat</answer>",
        "<answer>the cat sat</answer>",
        "free-form",
    )
    assert 0.3 < partial < 1.0
    assert calculate_reward("<answer>x</answer>", "<answer></answer>", "free-form") == 0.0


def test_reward_regression_and_unknown():
    assert calculate_reward("<answer>100</answer>", "<answer>110</answer>", "regression") == pytest.approx(0.9)
    assert calculate_reward("<answer>1</answer>", "<answer>1</answer>", "weird type") == 0.0
    assert calculate_reward("no tags", "no tags", "multiple choice") == 1.0  # both extract ""


# -- MCTS chains -------------------------------------------------------------

def _tree(rollouts, children=None, terminal=False):
    return {"rollouts": rollouts, "children": children or [], "is_terminal": terminal}


def test_extract_chains_wrong_backtrack_correct():
    t = _tree(
        [
            {"reward": 1.0, "ephemeral_texts": ["<think>good path</think>", "<answer>42</answer>"]},
            {"reward": 0.0, "ephemeral_texts": ["<think>bad path</think>", "<answer>0</answer>"]},
        ]
    )
    chains = extract_chains(json.dumps(t), max_chains=10, seed=1)
    assert len(chains) == 2  # one backtrack chain + one direct chain
    back = [c for c in chains if "Wait, this seems off" in c]
    assert len(back) == 1
    assert "bad path" in back[0] and "good path" in back[0]
    assert all(c.endswith("<answer> 42 </answer>") for c in chains)


def test_extract_chains_recurses_unless_terminal():
    child = _tree([{"reward": 1.0, "ephemeral_texts": ["deep", "<answer>7</answer>"]}], terminal=True)
    t = _tree([], children=[child], terminal=False)
    assert len(extract_chains(json.dumps(t), 10, 0)) == 1
    t_term = _tree([], children=[child], terminal=True)
    assert extract_chains(json.dumps(t_term), 10, 0) == []


def test_extract_chains_downsample_deterministic():
    rollouts = [
        {"reward": 1.0, "ephemeral_texts": [f"path {i}", f"<answer>{i}</answer>"]}
        for i in range(10)
    ]
    t = json.dumps(_tree(rollouts))
    a = extract_chains(t, 3, seed=123)
    b = extract_chains(t, 3, seed=123)
    assert a == b and len(a) == 3
    assert extract_chains(t, 3, seed=456) != a or True  # different seed may differ


def test_extract_chains_bad_json():
    assert extract_chains("not json{", 5, 0) == []
    assert extract_chains(None, 5, 0) == []


# -- serving / templates -----------------------------------------------------

def test_build_prompt_lists_and_missing():
    out = build_prompt("D:\n{descriptions}\nfor {type}", ["descriptions", "type"],
                       descriptions=["a", "b"], type="cats")
    assert out == "D:\na\nb\nfor cats"
    assert build_prompt("{x}|{y}", ["x", "y"], x="v") == "v|"


def test_stub_serving_deterministic():
    s = DeterministicStubServing()
    assert s.generate(["p"]) == s.generate(["p"])
    assert s.generate(["p"])[0].startswith("ans-")


# -- UDF hook through Ray ----------------------------------------------------

def test_functional_refine_column_and_constant(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.stages.udf import functional_refine

    # defined inside the test so cloudpickle serializes it by value
    # (ray workers can't import the tests package)
    def suffix_udf(text, tag):
        return str(text) + tag

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["aa", "bb"]})
    out = functional_refine(rd.from_pandas(df), suffix_udf, "out", text="text", tag="!").to_pandas()
    assert list(out["out"]) == ["aa!", "bb!"]


def test_conversation_cleaned_matches_oracle_trim_on_ascii_ws():
    """The oracle's trim(…, ws-set) equals the engine's strip for texts
    edged with ASCII whitespace (the reviewed divergence case)."""
    import duckdb

    from dataflow_mm_ray.stages.conversations import parse_multimodal_tokens

    WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    con = duckdb.connect()
    for t in ["hi there\n", "\ttabbed lead", "mid\n\n\nlines\n", "  spaces  ", "x\r\n"]:
        _, cleaned = parse_multimodal_tokens(t)
        sql = con.execute(
            f"SELECT trim(regexp_replace(trim(?, {WS}), '\\n+', chr(10), 'g'), {WS})", [t]
        ).fetchone()[0]
        assert cleaned == sql, (repr(t), repr(cleaned), repr(sql))
