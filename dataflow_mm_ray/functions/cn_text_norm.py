"""Chinese text normalization (the reference's ``cn_tn.py`` semantics,
re-implemented from scratch).

Reference: ``dataflow/operators/core_audio/refine/cn_tn.py`` (1,196 LoC,
itself derived from the public Qwen2-Audio eval script). The engine
reproduces the full ``TextNorm`` rule pipeline (cn_tn.py:1058-1115) and
``normalize_nsw`` rewrite passes (cn_tn.py:928-1017) with original
code; the small rule-data constants (filler chars, measure-word and
currency alternations, punctuation classes) are semantic data shared
with the reference and are cited inline. Differential parity against
the reference module (exec'd standalone — it is stdlib-only) is pinned
in ``tests/test_cn_norm.py``.

Pipeline (TextNorm.__call__, cn_tn.py:1082-1115):
  [opencc] -> [quanjiao->banjiao] -> [upper/lower] -> [fillers] ->
  [erhua] -> normalize_nsw -> punctuation->space -> [remove_space]

``normalize_nsw`` rewrites non-standard words to spoken Chinese, in
this exact pass order (cn_tn.py:928-1017): dates, money, mobile then
fixed phone numbers, fractions, percentages, number+measure-word,
4..32-digit digit strings, remaining cardinals, then restores
letter-2-letter forms (P2P). Number rendering follows the 'mid'
numbering system (万-grouped; 亿 = 10^8, 兆 = 10^12, ...).

Unsupported options: ``cc_mode`` (needs OpenCC — absent) and
``check_chars`` (needs the full CJK validity table) raise.
"""
from __future__ import annotations

import re
import string

CN_DIGITS = "零一二三四五六七八九"
CN_POINT = "点"
CN_LIANG = "两"
# 'mid' numbering system: small units 十百千万 then 亿-and-up spaced 10^4
_UNIT_BY_POWER = {1: "十", 2: "百", 3: "千", 4: "万"}
for _i, _u in enumerate("亿兆京垓秭穰沟涧正载"):
    _UNIT_BY_POWER[8 + 4 * _i] = _u
_POWERS_DESC = sorted(_UNIT_BY_POWER, reverse=True)

# rule data shared with the reference (cn_tn.py:30,44-52) — the match
# sets ARE the semantics
FILLER_CHARS = ["呃", "啊"]
CURRENCY_UNITS = "((亿|千万|百万|万|千|百)|(亿|千万|百万|万|千|百|)元|(亿|千万|百万|万|千|百|)块|角|毛|分)"
COM_QUANTIFIERS = (
    "(匹|张|座|回|场|尾|条|个|首|阙|阵|网|炮|顶|丘|棵|只|支|袭|辆|挑|担|颗|壳|窠|曲|墙|群|腔|"
    "砣|座|客|贯|扎|捆|刀|令|打|手|罗|坡|山|岭|江|溪|钟|队|单|双|对|出|口|头|脚|板|跳|枝|件|贴|"
    "针|线|管|名|位|身|堂|课|本|页|家|户|层|丝|毫|厘|分|钱|两|斤|担|铢|石|钧|锱|忽|(千|毫|微)克|"
    "毫|厘|分|寸|尺|丈|里|寻|常|铺|程|(千|分|厘|毫|微)米|撮|勺|合|升|斗|石|盘|碗|碟|叠|桶|笼|盆|"
    "盒|杯|钟|斛|锅|簋|篮|盘|桶|罐|瓶|壶|卮|盏|箩|箱|煲|啖|袋|钵|年|月|日|季|刻|时|周|天|秒|分|旬|"
    "纪|岁|世|更|夜|春|夏|秋|冬|代|伏|辈|丸|泡|粒|颗|幢|堆|条|根|支|道|面|片|张|颗|块)"
)
ER_WHITELIST = (
    "(儿女|儿子|儿孙|女儿|儿媳|妻儿|"
    "胎儿|婴儿|新生儿|婴幼儿|幼儿|少儿|小儿|儿歌|儿童|儿科|托儿所|孤儿|"
    "儿戏|儿化|台儿庄|鹿儿岛|正儿八经|吊儿郎当|生儿育女|托儿带女|养儿防老|痴儿呆女|"
    "佳儿佳妇|儿怜兽扰|儿无常父|儿不嫌母丑|儿行千里母担忧|儿大不由爷|苏乞儿)"
)
_ER_WHITELIST_RE = re.compile(ER_WHITELIST)

# CJK + fullwidth punctuation classes (cn_tn.py:54-59): replaced by a
# space after NSW rewriting
CN_PUNCS_STOP = "！？｡。"
CN_PUNCS_NONSTOP = (
    "＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃《》「」『』【】〔〕〖〗"
    "〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏·〈〉-"
)
PUNCS = CN_PUNCS_STOP + CN_PUNCS_NONSTOP + string.punctuation
_PUNCS_TRANSFORM = str.maketrans(PUNCS, " " * len(PUNCS))

# quanjiao -> banjiao: the standard fullwidth block U+FF01..U+FF5E maps
# onto ASCII U+21..U+7E; ideographic space U+3000 -> space
_QJ2BJ_TRANSFORM = str.maketrans(
    "　" + "".join(chr(c) for c in range(0xFF01, 0xFF5F)),
    " " + "".join(chr(c) for c in range(0x21, 0x7F)),
)

_EN_CHARS = set(string.ascii_letters + string.digits)


# ---------------------------------------------------------------------------
# number rendering (num2chn semantics, cn_tn.py:651-744)
# ---------------------------------------------------------------------------

def _int_symbols(value_string: str, use_zeros: bool = True) -> list:
    """Tokenize an integer digit string into digit/unit symbols.
    Tokens: ('d', n) digit, ('u', power) unit."""
    stripped = value_string.lstrip("0")
    if not stripped:
        return []
    if len(stripped) == 1:
        if use_zeros and len(value_string) != len(stripped):
            return [("d", 0), ("d", int(stripped))]
        return [("d", int(stripped))]
    power = next(p for p in _POWERS_DESC if p < len(stripped))
    left = value_string[:-power]
    return _int_symbols(left) + [("u", power)] + _int_symbols(stripped[-power:])


def num_to_chn(number_string: str, use_units: bool = True,
               alt_two: bool = True, use_zeros: bool = True) -> str:
    """Render a decimal digit string as spoken Chinese ('mid' system,
    simplified). ``use_units=False`` reads digit-by-digit."""
    parts = number_string.split(".")
    if len(parts) == 1:
        int_string, dec_string = parts[0], ""
    elif len(parts) == 2:
        int_string, dec_string = parts
    else:
        raise ValueError(f"more than one dot in {number_string!r}")

    if use_units and len(int_string) > 1:
        syms = _int_symbols(int_string, use_zeros)
    else:
        syms = [("d", int(c)) for c in int_string]
    if dec_string:
        syms = syms + [("p",)] + [("d", int(c)) for c in dec_string]

    if alt_two:
        # 二 -> 两 before a non-十 unit when not directly after a 十
        # (cn_tn.py:694-706)
        for i, s in enumerate(syms):
            if s == ("d", 2):
                nxt = syms[i + 1] if i < len(syms) - 1 else None
                prv = syms[i - 1] if i > 0 else None
                if (
                    nxt is not None and nxt[0] == "u" and nxt[1] != 1
                    and (prv is None or (prv[0] == "u" and prv[1] != 1))
                ):
                    syms[i] = ("liang",)

    def render(s) -> str:
        if s[0] == "d":
            return CN_DIGITS[s[1]]
        if s[0] == "u":
            return _UNIT_BY_POWER[s[1]]
        if s[0] == "liang":
            return CN_LIANG
        return CN_POINT

    result = "".join(render(s) for s in syms)
    if result.startswith(CN_POINT):
        return CN_DIGITS[0] + result
    # 一十X -> 十X (cn_tn.py:737-742)
    if len(result) >= 2 and result[1] == "十" and result[0] == "一":
        result = result[1:]
    return result


def digits_to_chn(s: str) -> str:
    """Digit-by-digit reading (Digit/TelePhone, cn_tn.py:776,795-810)."""
    return num_to_chn(s, use_units=False, alt_two=False)


# ---------------------------------------------------------------------------
# rewriters (cn_tn.py:753-925)
# ---------------------------------------------------------------------------

def _date_to_chn(date: str) -> str:
    """YYYY年M月D日 with every part optional (Date.date2chntext)."""
    if "年" in date:
        year, other = date.strip().split("年", 1)
        year = digits_to_chn(year) + "年"
    else:
        year, other = "", date
    month = day = ""
    if other:
        if "月" in other:
            month, day = other.strip().split("月", 1)
            month = num_to_chn(month) + "月"
        else:
            day = date
        if day:
            day = num_to_chn(day[:-1]) + day[-1]
    return year + month + day


def _money_to_chn(money: str) -> str:
    for m in re.findall(r"(\d+(\.\d+)?)", money):
        money = money.replace(m[0], num_to_chn(m[0]))
    return money


def _phone_to_chn(phone: str, fixed: bool = False) -> str:
    if fixed:
        return "".join(digits_to_chn(p) for p in phone.split("-"))
    return "".join(digits_to_chn(p) for p in phone.strip("+").split())


def _fraction_to_chn(f: str) -> str:
    num, den = f.split("/")
    return num_to_chn(den) + "分之" + num_to_chn(num)


def _percentage_to_chn(p: str) -> str:
    return "百分之" + num_to_chn(p.strip().strip("%"))


def normalize_nsw(raw_text: str) -> str:
    """Ordered NSW rewrite passes (cn_tn.py:928-1017, same order and
    patterns — the order IS the disambiguation rule)."""
    text = "^" + raw_text + "$"

    for m in re.findall(r"\D+((([089]\d|(19|20)\d{2})年)?(\d{1,2}月(\d{1,2}[日号])?)?)", text):
        text = text.replace(m[0], _date_to_chn(m[0]), 1)

    for m in re.findall(
        r"\D+((\d+(\.\d+)?)[多余几]?" + CURRENCY_UNITS + r"(\d" + CURRENCY_UNITS + r"?)?)", text
    ):
        text = text.replace(m[0], _money_to_chn(m[0]), 1)

    for m in re.findall(r"\D((\+?86 ?)?1([38]\d|5[0-35-9]|7[678]|9[89])\d{8})\D", text):
        text = text.replace(m[0], _phone_to_chn(m[0]), 1)
    for m in re.findall(r"\D((0(10|2[1-3]|[3-9]\d{2})-?)?[1-9]\d{6,7})\D", text):
        text = text.replace(m[0], _phone_to_chn(m[0], fixed=True), 1)

    for m in re.findall(r"(\d+/\d+)", text):
        text = text.replace(m, _fraction_to_chn(m), 1)

    text = text.replace("％", "%")
    for m in re.findall(r"(\d+(\.\d+)?%)", text):
        text = text.replace(m[0], _percentage_to_chn(m[0]), 1)

    for m in re.findall(r"(\d+(\.\d+)?)[多余几]?" + COM_QUANTIFIERS, text):
        text = text.replace(m[0], num_to_chn(m[0]), 1)

    for m in re.findall(r"(\d{4,32})", text):
        text = text.replace(m, digits_to_chn(m), 1)

    for m in re.findall(r"(\d+(\.\d+)?)", text):
        text = text.replace(m[0], num_to_chn(m[0]), 1)

    for m in re.findall(r"(([a-zA-Z]+)二([a-zA-Z]+))", text):
        text = text.replace(m[0], m[1] + "2" + m[2], 1)

    return text.lstrip("^").rstrip("$")


def remove_erhua(text: str) -> str:
    """Strip 儿 except inside whitelist words (cn_tn.py:1020-1044)."""
    out = ""
    while "儿" in text:
        a = text.index("儿")
        wl = _ER_WHITELIST_RE.search(text)
        if wl is not None and wl.span()[0] <= a:
            b = wl.span()
            out += text[: b[1]]
            text = text[b[1] :]
        else:
            out += text[:a]
            text = text[a + 1 :]
    return out + text


def remove_space(text: str) -> str:
    """Drop inter-token spaces except between latin/digit tokens
    (cn_tn.py:1047-1055)."""
    tokens = text.split()
    new: list[str] = []
    for k, t in enumerate(tokens):
        if k != 0 and tokens[k - 1][-1] in _EN_CHARS and t[0] in _EN_CHARS:
            new.append(" ")
        new.append(t)
    return "".join(new)


def cn_text_norm(text: str, to_banjiao: bool = False, to_upper: bool = False,
                 to_lower: bool = False, remove_fillers: bool = False,
                 remove_erhua_flag: bool = False, remove_space_flag: bool = False,
                 cc_mode: str = "", check_chars: bool = False) -> str:
    """The full TextNorm pipeline (cn_tn.py:1082-1115)."""
    if cc_mode:
        raise NotImplementedError("cc_mode needs OpenCC (not in this sandbox)")
    if check_chars:
        raise NotImplementedError("check_chars needs the full CJK validity table")
    if to_banjiao:
        text = text.translate(_QJ2BJ_TRANSFORM)
    if to_upper:
        text = text.upper()
    if to_lower:
        text = text.lower()
    if remove_fillers:
        for c in FILLER_CHARS:
            text = text.replace(c, "")
    if remove_erhua_flag:
        text = remove_erhua(text)
    text = normalize_nsw(text)
    text = text.translate(_PUNCS_TRANSFORM)
    if remove_space_flag:
        text = remove_space(text)
    return text
