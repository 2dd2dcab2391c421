"""English text normalization following whisper's
``EnglishTextNormalizer`` algorithm (the reference's ``language="en"``
branch, ``dataflow/operators/core_audio/refine/audio_text_normalizer.py:30-31``,
which instantiates ``whisper_normalizer.english.EnglishTextNormalizer``).

Clean-room implementation of the published algorithm:

1. lowercase;
2. drop words between brackets ``[]`` and parentheses ``()``;
3. drop filler interjections (hmm/mm/mhm/mmm/uh/um);
4. expand contractions and spoken abbreviations (the well-known
   replacer table: won't -> will not, mr -> mister, 'll -> will, ...);
5. strip symbols/punctuation, KEEPING ``.,%$£€#`` when adjacent to
   digits (numeric expressions survive: ``1.5%``, ``$3,000``);
6. then drop commas between digits and periods not followed by a
   digit;
7. collapse whitespace.

Number words are rewritten to digits between steps 4 and 5 by
``functions/en_numbers.normalize_number_words`` (the
EnglishNumberNormalizer core: cardinals/ordinals/decimals/percent/
currency; fractions and double/triple spelling documented out of
scope there). The British->American spelling table (``english.json``
data file) is out of scope — it needs whisper's bundled data.
Everything here is deterministic and dependency-free.
"""
from __future__ import annotations

import re
import unicodedata

_BRACKETS_RE = re.compile(r"[<\[][^>\]]*[>\]]")
_PARENS_RE = re.compile(r"\([^)]*\)")
_FILLERS_RE = re.compile(r"\b(hmm|mm|mhm|mmm|uh|um)\b")
_WS_RE = re.compile(r"\s+")

# contraction / spoken-abbreviation replacers (whisper english.py
# algorithm; ordered — specific before generic suffix rules)
_REPLACERS = [
    (re.compile(p), r)
    for p, r in [
        (r"\bwon't\b", "will not"),
        (r"\bcan't\b", "can not"),
        (r"\blet's\b", "let us"),
        (r"\bain't\b", "aint"),
        (r"\by'all\b", "you all"),
        (r"\bwanna\b", "want to"),
        (r"\bgotta\b", "got to"),
        (r"\bgonna\b", "going to"),
        (r"\bi'ma\b", "i am going to"),
        (r"\bimma\b", "i am going to"),
        (r"\bwoulda\b", "would have"),
        (r"\bcoulda\b", "could have"),
        (r"\bshoulda\b", "should have"),
        (r"\bma'am\b", "madam"),
        (r"\bmr\b", "mister "),
        (r"\bmrs\b", "missus "),
        (r"\bst\b", "saint "),
        (r"\bdr\b", "doctor "),
        (r"\bprof\b", "professor "),
        (r"\bcapt\b", "captain "),
        (r"\bgov\b", "governor "),
        (r"\bald\b", "alderman "),
        (r"\bgen\b", "general "),
        (r"\bsen\b", "senator "),
        (r"\brep\b", "representative "),
        (r"\bpres\b", "president "),
        (r"\brev\b", "reverend "),
        (r"\bhon\b", "honorable "),
        (r"\basst\b", "assistant "),
        (r"\bassoc\b", "associate "),
        (r"\blt\b", "lieutenant "),
        (r"\bcol\b", "colonel "),
        (r"\bjr\b", "junior "),
        (r"\bsr\b", "senior "),
        (r"\besq\b", "esquire "),
        (r"'d been\b", " had been"),
        (r"'s been\b", " has been"),
        (r"'d gone\b", " had gone"),
        (r"'s gone\b", " has gone"),
        (r"'d done\b", " had done"),
        (r"'s got\b", " has got"),
        (r"n't\b", " not"),
        (r"'re\b", " are"),
        (r"'s\b", " is"),
        (r"'d\b", " would"),
        (r"'ll\b", " will"),
        (r"'t\b", " not"),
        (r"'ve\b", " have"),
        (r"'m\b", " am"),
    ]
]

_KEEP_NEAR_DIGITS = set(".%$£€#,")


def _remove_symbols_keep_numeric(s: str) -> str:
    """Replace symbol/punctuation codepoints with a space, except the
    numeric-expression characters when adjacent to a digit."""
    out = []
    for i, c in enumerate(s):
        cat = unicodedata.category(c)
        if cat.startswith(("P", "S")):
            if c in _KEEP_NEAR_DIGITS and (
                (i > 0 and s[i - 1].isdigit()) or (i + 1 < len(s) and s[i + 1].isdigit())
            ):
                out.append(c)
            else:
                out.append(" ")
        elif cat.startswith("M"):
            continue  # strip combining marks
        else:
            out.append(c)
    return "".join(out)


def en_text_norm(text: str) -> str:
    t = str(text).lower()
    t = _BRACKETS_RE.sub("", t)
    t = _PARENS_RE.sub("", t)
    t = _FILLERS_RE.sub("", t)
    for pat, rep in _REPLACERS:
        t = pat.sub(rep, t)
    from dataflow_mm_ray.functions.en_numbers import normalize_number_words

    t = normalize_number_words(t)
    t = _remove_symbols_keep_numeric(t)
    # commas between digits; periods not followed by a digit
    t = re.sub(r"(?<=\d),(?=\d)", "", t)
    t = re.sub(r"\.(?!\d)", " ", t)
    return _WS_RE.sub(" ", t).strip()
