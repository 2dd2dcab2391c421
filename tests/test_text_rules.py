"""Python kernel vs DuckDB SQL parity for the 15-rule filter and the
textstats kernel on adversarial fixtures (each rule tripped at least
once; empty/None/unicode edge cases)."""
import duckdb
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.functions.text_rules import RULE_NAMES, rule_flags_batch
from dataflow_mm_ray.functions.text_rules_sql import rule_filter_sql
from dataflow_mm_ray.functions.textstats import textstats_batch
from dataflow_mm_ray.functions.textstats_sql import textstats_sql

ADVERSARIAL = [
    "A normal sentence with decent words and structure.",
    "",
    "   \t  ",
    "This line ends with a colon:",
    "first line...\nsecond line…\nthird ok",
    "a b c d e f",
    "supercalifragilisticexpialidociousword " * 3,
    "# # # ... … eight words here total now",
    "text with &nbsp; entity",
    "＆amp broken entity",
    "id number id number ID No identity mention",
    " ".join(["word"] * 113) + ".",
    "emoji escape U+1F600 mentioned",
    "contains ? : pattern",
    "Copyright 2024 all rights reserved",
    "{ } { } short",
    "THIS IS MOSTLY CAPS text",
    "lorem ipsum dolor sit amet",
    " ".join(["same"] * 50),
    "• bullet one\n• bullet two\n• bullet three",
    "javascript required\njavascript needed\nenable javascript now\njavascript here",
    "ok line\njavascript\nok two\nok three",
    "multi\nline\ntext with normal stuff",
    None,
    "Ends with ellipsis only on one of four lines...\nok\nok\nok",
    "I.D. Number here and IDNumber and identification identity",
    "word " * 200,
    "‎ direct char vs literal u200e text",
    "der die das und ist nicht ein",  # german stopwords
    "le la et les des est une",       # french
    "一些中文文本 with cjk",            # zh
    "xyzzy qwfp zzz",                 # und
]


@pytest.fixture(scope="module")
def adversarial_df():
    return pd.DataFrame({"doc_id": range(len(ADVERSARIAL)), "text": ADVERSARIAL})


def test_rule_flags_match_sql(adversarial_df):
    con = duckdb.connect()
    con.register("docs", adversarial_df)
    want = con.sql(rule_filter_sql(source="docs")).df().sort_values("doc_id").reset_index(drop=True)
    got = rule_flags_batch(adversarial_df["text"].tolist())
    got.insert(0, "doc_id", adversarial_df["doc_id"])
    for c in RULE_NAMES + ["keep"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), f"rule {c} diverges"


def test_every_rule_fires_somewhere(adversarial_df):
    got = rule_flags_batch(adversarial_df["text"].tolist())
    for c in RULE_NAMES:
        assert got[c].any(), f"fixture never trips {c}"


def test_textstats_match_sql(adversarial_df):
    # textstats kernel treats None as ""; drop the None row for the SQL side
    df = adversarial_df[adversarial_df["text"].notna()].reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", df)
    want = con.sql(textstats_sql(source="docs")).df().sort_values("doc_id").reset_index(drop=True)
    got = textstats_batch(df["text"].tolist())
    got.insert(0, "doc_id", df["doc_id"])
    for c in ("mean_word_len", "stopword_ratio", "punct_ratio"):
        got[c] = got[c].round(6)
    for c in want.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if got[c].dtype == np.float64:
            assert np.allclose(g.astype(float), w.astype(float), atol=1e-9), f"{c} diverges"
        else:
            assert (g == w).all(), f"{c} diverges: {list(zip(df['text'], g, w))}"


def test_lang_id_deterministic_tiebreak():
    from dataflow_mm_ray.functions.textstats import lang_id

    assert lang_id("xyzzy qwfp") == "und"
    assert lang_id("一些中文") == "zh"
    assert lang_id("the der") == "en"  # tie -> priority order
