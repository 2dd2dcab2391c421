"""CatFilter: differential triple extraction vs the reference's own
loop (exec'd from /root/reference), OCR-overlap gate semantics, and the
stub-grammar bridge that keeps the query SQL-oracled."""
import ast
import os
import random
from types import SimpleNamespace

import pandas as pd
import pytest

from dataflow_mm_ray.stages.cat import (
    CatFilterStage,
    ocr_only_gate,
    stub_token_parse,
    triples_and_has_verb,
)

REFERENCE_CAT = "/root/reference/dataflow/operators/core_vision/filter/cat_filter.py"


def _reference_triples():
    """Compile the reference's ``_triples_and_has_verb`` method standalone."""
    tree = ast.parse(open(REFERENCE_CAT).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "_triples_and_has_verb":
            mod = ast.Module(body=[node], type_ignores=[])
            ns: dict = {}
            exec(compile(mod, REFERENCE_CAT, "exec"), ns)
            return ns["_triples_and_has_verb"]
    raise AssertionError("method not found")


def _to_stanza_doc(sentences):
    """dict-token parse -> attribute-style fake stanza doc."""
    return SimpleNamespace(
        sentences=[
            SimpleNamespace(words=[SimpleNamespace(**w) for w in words])
            for words in sentences
        ]
    )


DEPRELS = ["nsubj", "nsubj:pass", "obj", "iobj", "xcomp", "obl", "attr",
           "ccomp", "root", "dep", "amod", "det"]
UPOS = ["VERB", "NOUN", "ADJ", "PRON", "ADP"]


@pytest.mark.skipif(not os.path.exists(REFERENCE_CAT), reason="reference tree absent")
def test_triples_match_reference_on_fuzzed_parses():
    ref = _reference_triples()
    rng = random.Random(7)
    for _ in range(300):
        n_sent = rng.randint(0, 3)
        sentences = []
        for _s in range(n_sent):
            n = rng.randint(0, 8)
            words = [
                {
                    "id": i + 1,
                    "text": rng.choice(["cat", "dog", "ate", "saw", "it", "ran"]),
                    "lemma": rng.choice(["eat", "see", "run", None]),
                    "upos": rng.choice(UPOS),
                    "head": rng.randint(0, n),
                    "deprel": rng.choice(DEPRELS),
                }
                for i in range(n)
            ]
            sentences.append(words)
        got = triples_and_has_verb(sentences)
        want = ref(None, _to_stanza_doc(sentences))
        assert got == want


@pytest.mark.skipif(not os.path.exists(REFERENCE_CAT), reason="reference tree absent")
def test_stub_grammar_through_reference_loop():
    """The stub grammar must be a valid stanza-shaped parse: the
    reference loop extracts exactly the distinct disjoint 3-grams."""
    ref = _reference_triples()
    for text, want in [
        ("the cat ate the cat ate a dog barks", 2),
        ("one two three four", 1),  # trailing incomplete group ignored
        ("one two", 0),
        ("", 0),
    ]:
        parse = stub_token_parse(text)
        cnt, has_verb = ref(None, _to_stanza_doc(parse))
        assert cnt == want
        assert has_verb == (len(text.split()) >= 3)
        assert (cnt, has_verb) == triples_and_has_verb(parse)


def test_ocr_gate():
    # empty OCR passes trivially (cat_filter.py:84-85)
    assert ocr_only_gate("", "any caption", 0.2)
    assert ocr_only_gate("12345 !!", "caption", 0.2)  # no alpha tokens
    # identical token sets -> jaccard 1.0 -> fails any threshold <= 1
    assert not ocr_only_gate("street sign", "STREET sign", 1.0)
    # disjoint -> jaccard 0 -> passes any positive threshold
    assert ocr_only_gate("stop sign", "a red octagon", 0.01)
    # boundary: 1 shared of 3 union = 0.333..
    assert ocr_only_gate("a b", "b c", 0.34)
    assert not ocr_only_gate("a b", "b c", 0.33)


def test_stage_drops_empty_and_counts():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["", "sub verb obj sub verb obj", "x y z a b c"],
            "ocr": ["", "unrelated words here", "x y z a b c"],
        }
    )
    out = CatFilterStage("text", "ocr", min_triples=1)(df)
    # doc 1: empty caption; doc 3: OCR == caption -> jaccard 1 -> dropped
    assert list(out["doc_id"]) == [2]
    assert list(out["triple_cnt"]) == [1]  # duplicate 3-gram collapses
