"""English number-word normalization (whisper
``EnglishNumberNormalizer`` core semantics, clean-room).

The reference's ``language="en"`` branch uses whisper's
EnglishTextNormalizer, whose number stage rewrites spelled-out numbers
to digits before symbol stripping. This implements the core of that
published algorithm over already-lowercased text:

- cardinals: units/teens/tens (with hyphenation), ``hundred`` /
  ``thousand`` / ``million`` / ``billion`` / ``trillion`` scale words,
  multi-group composition ("three hundred and twenty one thousand");
- "and" inside a number group is absorbed ("one hundred and five" ->
  105) but a leading/solitary "and" is left alone;
- decimals: "<number> point <digit words...>" -> "N.DDD";
- ordinals: "twentieth" -> "20th", "third" -> "3rd", "twenty-first"
  -> "21st";
- "percent" after a number -> "%"; "dollars"/"pounds"/"euros" after a
  number -> "$"/"£"/"€" prefix (whisper's postfix-currency handling);
- standalone "one" is kept as a word unless part of a larger number or
  followed by a unit word (whisper keeps pronoun-ish "one" textual);
  "a hundred" -> 100.

Out of scope (documented): fractions ("two thirds"), "double/triple"
digit spelling, cents recombination, roman numerals.
"""
from __future__ import annotations

import re

_UNITS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
_SCALES = {"hundred": 100, "thousand": 10**3, "million": 10**6,
           "billion": 10**9, "trillion": 10**12}
_ORD_UNITS = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12, "thirteenth": 13, "fourteenth": 14,
    "fifteenth": 15, "sixteenth": 16, "seventeenth": 17, "eighteenth": 18,
    "nineteenth": 19,
}
_ORD_TENS = {
    "twentieth": 20, "thirtieth": 30, "fortieth": 40, "fiftieth": 50,
    "sixtieth": 60, "seventieth": 70, "eightieth": 80, "ninetieth": 90,
}
_ORD_SCALES = {"hundredth": 100, "thousandth": 10**3, "millionth": 10**6,
               "billionth": 10**9, "trillionth": 10**12}
_CURRENCY = {"dollars": "$", "dollar": "$", "pounds": "£", "pound": "£",
             "euros": "€", "euro": "€"}

_NUMBER_WORDS = (
    set(_UNITS) | set(_TENS) | set(_SCALES) | {"and", "point", "a"}
    | set(_ORD_UNITS) | set(_ORD_TENS) | set(_ORD_SCALES)
)


def _ordinal_suffix(n: int) -> str:
    if 10 <= n % 100 <= 20:
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")


def _parse_group(tokens: list[str]) -> tuple[int | None, int, int | None]:
    """Parse a cardinal (possibly with a trailing ordinal word) from
    the front of ``tokens``. Returns (value, n_consumed, ordinal_value)
    — ordinal_value set when the LAST consumed word was ordinal."""
    total = 0
    current = 0
    i = 0
    content_end = 0  # index just past the last numeric-content token
    consumed_any = False
    ordinal: int | None = None
    # grammar slots within the current sub-hundred group: a tens word
    # may be followed by one unit (not a teen); a unit/teen ends the
    # group ("nineteen eighty" is two numbers, not 99)
    have_tens = False
    have_unit = False
    while i < len(tokens):
        w = tokens[i]
        parts = w.split("-") if "-" in w else [w]
        matched = True
        ord_here = None
        for k, p in enumerate(parts):
            last = k == len(parts) - 1
            if p in _UNITS:
                if have_unit or (have_tens and _UNITS[p] > 9):
                    matched = False
                    break
                current += _UNITS[p]
                have_unit = True
            elif p in _TENS:
                if have_tens or have_unit:
                    matched = False
                    break
                current += _TENS[p]
                have_tens = True
            elif p in _SCALES:
                scale = _SCALES[p]
                if scale == 100:
                    current = max(current, 1) * 100
                else:
                    total += max(current, 1) * scale
                    current = 0
                have_tens = have_unit = False
            elif last and p in _ORD_UNITS:
                if have_unit or (have_tens and _ORD_UNITS[p] > 9):
                    matched = False
                    break
                current += _ORD_UNITS[p]
                ord_here = True
            elif last and p in _ORD_TENS:
                if have_tens or have_unit:
                    matched = False
                    break
                current += _ORD_TENS[p]
                ord_here = True
            elif last and p in _ORD_SCALES:
                scale = _ORD_SCALES[p]
                if scale == 100:
                    current = max(current, 1) * 100
                else:
                    total += max(current, 1) * scale
                    current = 0
                ord_here = True
            elif p == "a" and not consumed_any and i + 1 < len(tokens) and \
                    tokens[i + 1] in _SCALES:
                pass  # "a hundred", "a million"
            elif p == "and" and consumed_any and i + 1 < len(tokens) and \
                    _is_number_start(tokens[i + 1]):
                pass  # absorbed connective
            else:
                matched = False
                break
        if not matched:
            break
        consumed_any = consumed_any or w not in ("and",)
        i += 1
        if w != "and":
            content_end = i
        if ord_here:
            ordinal = total + current
            break
    if not consumed_any:
        return None, 0, None
    # roll back a trailing absorbed "and": it only belongs to the group
    # when a joinable number actually follows ("one hundred and five");
    # if the group ended right after it ("five and six"), the "and" is
    # ordinary text and must not be consumed
    return total + current, content_end, ordinal


def _is_number_start(w: str) -> bool:
    p = w.split("-")[0]
    return p in _UNITS or p in _TENS or p in _SCALES or p in _ORD_UNITS \
        or p in _ORD_TENS or p in _ORD_SCALES


_PUNCT = ".,;:!?()[]{}\"'"


def _decompose(tok: str) -> tuple[str, str, str]:
    """(leading punctuation, core, trailing punctuation)."""
    core = tok.strip(_PUNCT)
    if not core:
        return tok, "", ""
    start = len(tok) - len(tok.lstrip(_PUNCT))
    return tok[:start], core, tok[start + len(core):]


def normalize_number_words(text: str) -> str:
    """Rewrite spelled-out numbers in lowercased text to digits.
    Tokens are matched on their punctuation-stripped cores ("five," and
    "five." normalize like "five"); adjacent punctuation terminates a
    multi-word number group at that boundary and is re-attached to the
    rendered digits."""
    raw = text.split()
    decomp = [_decompose(t) for t in raw]
    cores = [c for _, c, _ in decomp]

    def boundary_clean(j: int) -> bool:
        """May a group that includes token j continue into token j+1?"""
        return decomp[j][2] == "" and (j + 1 >= len(raw) or decomp[j + 1][0] == "")

    out: list[str] = []
    i = 0
    while i < len(raw):
        w = cores[i]
        starts = _is_number_start(w) or (
            w == "a" and i + 1 < len(raw) and boundary_clean(i) and cores[i + 1] in _SCALES
        )
        if not starts or w == "and":
            out.append(raw[i])
            i += 1
            continue
        # the group may only span tokens with clean internal boundaries
        run_end = i + 1
        while run_end < len(raw) and boundary_clean(run_end - 1):
            run_end += 1
        value, consumed, ordinal = _parse_group(cores[i:run_end])
        if consumed == 0:
            out.append(raw[i])
            i += 1
            continue
        prefix = decomp[i][0]
        last = i + consumed - 1
        suffix = decomp[last][2]
        nxt_core = cores[i + consumed] if (i + consumed < len(raw) and boundary_clean(last)) else None
        # whisper keeps a solitary "one" textual ("one of them") — but
        # not when it heads a decimal / percent / currency expression
        if consumed == 1 and w == "one" and not (
            nxt_core == "point" or nxt_core == "percent" or nxt_core in _CURRENCY
        ):
            out.append(raw[i])
            i += 1
            continue
        i += consumed
        if ordinal is not None:
            out.append(f"{prefix}{ordinal}{_ordinal_suffix(ordinal)}{suffix}")
            continue
        rendered = str(value)
        # decimal: "point" + digit words (clean boundaries throughout)
        if suffix == "" and i < len(raw) and decomp[i][0] == "" and cores[i] == "point":
            digits = []
            j = i
            while (
                j + 1 < len(raw) and decomp[j][2] == "" and decomp[j + 1][0] == ""
                and cores[j + 1] in _UNITS and _UNITS[cores[j + 1]] <= 9
            ):
                digits.append(str(_UNITS[cores[j + 1]]))
                j += 1
            if digits:
                rendered = f"{rendered}.{''.join(digits)}"
                suffix = decomp[j][2]
                i = j + 1
        if suffix == "" and i < len(raw) and decomp[i][0] == "":
            core = cores[i]
            if core == "percent":
                rendered = f"{rendered}%"
                suffix = decomp[i][2]
                i += 1
            elif core in _CURRENCY:
                rendered = f"{_CURRENCY[core]}{rendered}"
                suffix = decomp[i][2]
                i += 1
        out.append(f"{prefix}{rendered}{suffix}")
    return " ".join(out)
