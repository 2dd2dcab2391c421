"""Differential parity: the engine's clean-room Chinese normalizer vs
the reference cn_tn.py module exec'd standalone (it is stdlib-only —
the test_refiners.py pattern)."""
import importlib.util
import sys

import pytest

REF = "/root/reference/dataflow/operators/core_audio/refine/cn_tn.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("cn_tn_ref", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["cn_tn_ref"] = mod
    spec.loader.exec_module(mod)
    return mod


NUMBERS = [
    "0", "5", "10", "11", "19", "20", "25", "100", "105", "110", "123",
    "200", "250", "1000", "1005", "1050", "2000", "2500", "10000", "10500",
    "20000", "12345", "100000", "1000000", "20000000", "100000001",
    "123456789", "1234567890123", "0.5", "3.14", "12.25", "200.08", "0.001",
    "007", "0001000",
]


def test_num2chn_parity(ref):
    from dataflow_mm_ray.functions.cn_text_norm import num_to_chn

    for n in NUMBERS:
        assert num_to_chn(n) == ref.num2chn(n), n


def test_digit_parity(ref):
    from dataflow_mm_ray.functions.cn_text_norm import digits_to_chn

    for n in ["2024", "0755", "13912345678", "007", "19491001"]:
        assert digits_to_chn(n) == ref.num2chn(n, alt_two=False, use_units=False), n


SENTENCES = [
    "我有250块钱",
    "今天是2024年3月15日",
    "1998年出生",
    "他的电话是13912345678这个",
    "固话是010-62345678这个",
    "比例是3/4左右",
    "增长了12.5%",
    "买了3个苹果和20张纸",
    "编号123456",
    "P2P和B2B模式",
    "温度是36.5度",
    "距离2.5千米",
    "花了1000元买了2本书",
    "99年的事",
    "共3.14亿元",
    "这里有25只猫90条狗",
    "大概100多个人",
    "No numbers here at all",
    "",
    "2月14号见",
]


def test_normalize_nsw_parity(ref):
    from dataflow_mm_ray.functions.cn_text_norm import normalize_nsw

    for s in SENTENCES:
        assert normalize_nsw(s) == ref.normalize_nsw(s), s


def test_textnorm_pipeline_parity(ref):
    from dataflow_mm_ray.functions.cn_text_norm import cn_text_norm

    cases = [
        ("我有２５０块钱！", dict(to_banjiao=True)),
        ("呃这个啊就是250块", dict(remove_fillers=True)),
        ("他女儿在那边儿玩呢", dict(remove_erhua=True)),
        ("hello World 123 你好", dict(to_lower=True, remove_space=True)),
        ("百分之50的概率，3/4的人", dict()),
    ]
    for text, kw in cases:
        ref_norm = ref.TextNorm(**kw)
        ours = cn_text_norm(
            text,
            to_banjiao=kw.get("to_banjiao", False),
            to_upper=kw.get("to_upper", False),
            to_lower=kw.get("to_lower", False),
            remove_fillers=kw.get("remove_fillers", False),
            remove_erhua_flag=kw.get("remove_erhua", False),
            remove_space_flag=kw.get("remove_space", False),
        )
        assert ours == ref_norm(text), (text, kw)


def test_fuzz_numbers_parity(ref):
    import numpy as np

    from dataflow_mm_ray.functions.cn_text_norm import num_to_chn

    rng = np.random.RandomState(5)
    for _ in range(300):
        n_digits = rng.randint(1, 15)
        s = "".join(rng.choice(list("0123456789"), n_digits))
        if rng.rand() < 0.3:
            s = s + "." + "".join(rng.choice(list("0123456789"), rng.randint(1, 5)))
        assert num_to_chn(s) == ref.num2chn(s), s


def test_en_text_norm_whisper_algorithm():
    from dataflow_mm_ray.functions.en_text_norm import en_text_norm

    assert en_text_norm("Mr. Smith won't go, he's [sighs] (quietly) leaving!") == \
        "mister smith will not go he is leaving"
    assert en_text_norm("Um, I'll pay $3,000 and 1.5% interest.") == \
        "i will pay $3000 and 1.5% interest"
    assert en_text_norm("they're y'all gonna do it") == "they are you all going to do it"
    assert en_text_norm("Dr. Who, Sen. Smith and Col. Mustard") == \
        "doctor who senator smith and colonel mustard"
    # periods not followed by digits die; decimal points survive
    assert en_text_norm("version 2.5. done.") == "version 2.5 done"
    # deterministic
    s = "He said: can't, shouldn't've... whatever [laughs]."
    assert en_text_norm(s) == en_text_norm(s)


def test_normalize_queries_run(ray_session):
    from tests.conftest import SF_TINY

    from dataflow_mm_ray.queries import registry

    for name in ("text_normalize_en", "text_normalize_zh"):
        out = registry()[name].fn(SF_TINY).to_pandas()
        assert len(out) == 500
        assert set(out.columns) == {"doc_id", "norm_text"}


def test_fuzz_sentences_parity(ref):
    """Generated sentences mixing numbers, dates, money, percent,
    fractions, measure words and filler text — engine normalize_nsw
    must match the exec'd reference byte-for-byte."""
    import numpy as np

    from dataflow_mm_ray.functions.cn_text_norm import normalize_nsw

    rng = np.random.RandomState(17)
    fillers = ["今天", "大概", "他说", "总共", "可能", "结果是", "价格", "距离",
               "the value is", "approx", "了", "个人认为"]
    makers = [
        lambda: str(rng.randint(0, 10**6)),
        lambda: f"{rng.randint(0, 1000)}.{rng.randint(0, 99)}",
        lambda: f"{rng.randint(1, 100)}%",
        lambda: f"{rng.randint(1, 20)}/{rng.randint(2, 30)}",
        lambda: f"{rng.randint(1990, 2029)}年{rng.randint(1, 12)}月{rng.randint(1, 28)}日",
        lambda: f"{rng.randint(1, 9999)}元",
        lambda: f"{rng.randint(1, 500)}个",
        lambda: f"{rng.randint(1, 31)}号",
        lambda: f"{rng.randint(0, 100)}块",
        lambda: str(rng.randint(10**7, 10**9)),  # phone-shaped digit runs
    ]
    for _ in range(200):
        parts = []
        for _ in range(rng.randint(1, 6)):
            parts.append(fillers[rng.randint(len(fillers))])
            if rng.rand() < 0.8:
                parts.append(makers[rng.randint(len(makers))]())
        s = "".join(parts) if rng.rand() < 0.5 else " ".join(parts)
        assert normalize_nsw(s) == ref.normalize_nsw(s), repr(s)
