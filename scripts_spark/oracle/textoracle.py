"""Pure-Python oracle for the text kernels.

Row-at-a-time reimplementation of scripts_spark.functions.text_kernel
using Python ``re`` — the parity target the Spark expressions must
match byte-for-byte (tests/test_text_kernel.py, tests/test_pipeline_parity.py).

The whitespace normalization is literally the reference's own idiom
(``" ".join(t.split())``, /root/reference/src/cur-prot/dollar_sign_replace.py:26).
"""

from __future__ import annotations

import re

_DOLLAR_1 = re.compile(r"^8 [0-9]{1,2}\.")
_DOLLAR_2 = re.compile(r"^[0-9]{1,2} ?\$")
_SOFT_HYPHEN = re.compile(" ?­ ?")
_CAP_DASH = re.compile("([A-ZÀ-Þ]{2,10})(- )([A-ZÀ-Þ]{2,10})")
_PNR = re.compile(r"(?<![0-9])[0-9]{6}(?:[0-9]{2})?[-+]?[0-9]{4}(?![0-9])")
_NAME = re.compile("\\b(Herr|Fru|Fröken|Doktor) ([A-ZÀ-Þ][A-ZÀ-Þa-zà-þ-]*)")
_ADDR = re.compile(
    "(?<![A-Za-zÀ-þ])[A-ZÀ-Þ][a-zà-þ]+" "(?:gatan|vägen|gränd|torget) [0-9]{1,3}(?![0-9])"
)
_WF_PUNCT = re.compile("[\\[\\]\\{\\}\\(\\)<>.,!§”$«»'\";]")
_WF_DIGIT_DASH = re.compile("[0-9\\-–—/]+")


def normalize_ws(t: str) -> str:
    return " ".join(t.split())


def join_soft_hyphens(t: str) -> str:
    return _SOFT_HYPHEN.sub("", normalize_ws(t))


def dollar_signs(raw: str) -> str:
    """Reference semantics at src/cur-prot/dollar_sign_replace.py:27-40:
    elif-cascade on the normalized text, literal replace in the raw."""
    norm = normalize_ws(raw)
    if norm.startswith("$"):
        return raw.replace("$", "§")
    m1 = _DOLLAR_1.search(norm)
    if m1 is not None:
        m = m1.group(0)
        return raw.replace(m, "§" + m[1:])
    m2 = _DOLLAR_2.search(norm)
    if m2 is not None:
        m = m2.group(0)
        return raw.replace(m, m.replace("$", "§"))
    return raw


def fix_capitalized_dashes(t: str) -> str:
    return _CAP_DASH.sub(r"\1\3", t)


def scrub_pii(t: str) -> str:
    t = _PNR.sub("[PNR]", t)
    t = _NAME.sub(r"\1 [NAME]", t)
    t = _ADDR.sub("[ADDR]", t)
    return t


def repair_and_scrub(raw: str) -> str:
    return scrub_pii(fix_capitalized_dashes(join_soft_hyphens(dollar_signs(raw))))


def token_normalize(word: str) -> str:
    out = word.lower()
    out = _WF_PUNCT.sub("", out)
    out = _WF_DIGIT_DASH.sub("", out)
    return out.strip(":")


def tokens(t: str) -> list[str]:
    return [w for w in normalize_ws(t).split(" ") if w != ""]
