"""Text repair/normalization kernels as pure Spark Column expressions.

Semantics derived from the reference curation scripts (cited per
function); every kernel here must stay byte-identical with the pure
Python oracle in ``scripts_spark.oracle.textoracle`` — that invariant
is the engine's core contract (BASELINE.json input_hint) and is pinned
by tests/test_text_kernel.py.

Everything is JVM-side Column expressions (whole-stage codegen); no
Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Python str.split() whitespace set (what the reference's
# ``" ".join(t.split())`` normalization splits on), spelled as an
# explicit Java regex class because Java's \s is ASCII-only while
# Python's is Unicode-wide. Soft hyphen U+00AD is deliberately NOT
# whitespace (it is removed by join_soft_hyphens, not here).
_PY_WS = (
    "\\t-\\r \\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000"
)
WS_RUN = f"[{_PY_WS}]+"

# Rule versions feed the lineage struct; bump on any semantic change.
KERNEL_VERSIONS = {
    "normalize_ws": "1.0",
    "dollar_signs": "1.0",
    "join_soft_hyphens": "1.0",
    "fix_capitalized_dashes": "1.0",
    "scrub_pii": "1.0",
    "token_normalize": "1.0",
}


def normalize_ws(col: Column) -> Column:
    """Collapse all whitespace runs to single spaces and trim.

    Parity target: ``" ".join(t.split())`` as used throughout the
    reference (e.g. /root/reference/src/cur-prot/dollar_sign_replace.py:26,
    src/classify_join_intros.py:127).
    """
    return F.trim(F.regexp_replace(col, WS_RUN, " "))


def join_soft_hyphens(col: Column) -> Column:
    """Whitespace-normalize then drop soft hyphens with optional
    surrounding spaces.

    Parity: join_soft_hyphens_p at
    /root/reference/src/cur-prot/dollar_sign_replace.py:44-47
    (``re.sub(' ?\\u00ad ?', '', " ".join(t.split()))``).
    """
    return F.regexp_replace(normalize_ws(col), " ?­ ?", "")


# The three-branch OCR cascade: $ misread for §. Branch order and
# first-match-only (elif) semantics are part of the contract
# (/root/reference/src/cur-prot/dollar_sign_replace.py:27-40; regexes
# compiled at :79-80). Matching runs on the *normalized* text, but
# replacement happens in the *raw* text by literal occurrence — exactly
# like the reference's ``elem.text.replace(m, m_new)``.
_DOLLAR_1 = "^8 [0-9]{1,2}\\."
_DOLLAR_2 = "^[0-9]{1,2} ?\\$"


def dollar_signs(raw: Column) -> Column:
    norm = normalize_ws(raw)
    m1 = F.regexp_extract(norm, _DOLLAR_1, 0)
    m2 = F.regexp_extract(norm, _DOLLAR_2, 0)
    return (
        F.when(norm.startswith("$"), F.replace(raw, F.lit("$"), F.lit("§")))
        .when(
            m1 != "",
            F.replace(raw, m1, F.concat(F.lit("§"), F.substring(m1, 2, 2147483647))),
        )
        .when(m2 != "", F.replace(raw, m2, F.replace(m2, F.lit("$"), F.lit("§"))))
        .otherwise(raw)
    )


# Split-name OCR repair "PERS- SON" -> "PERSSON".
# Parity: /root/reference/src/fix_capitalized_dashes.py:19,35-38.
# [A-ZÀ-Þ] is the reference's uppercase class incl. Å/Ä/Ö.
_CAP_DASH = "([A-ZÀ-Þ]{2,10})(- )([A-ZÀ-Þ]{2,10})"


def fix_capitalized_dashes(col: Column) -> Column:
    return F.regexp_replace(col, _CAP_DASH, "$1$3")


# --- PII scrub ------------------------------------------------------
# Engine-defined rules (the reference never redacts; these implement
# the north rule's personnummer / titled-name / address scrub using the
# reference's uppercase alphabet from src/fix_capitalized_dashes.py:19).
# Explicit ASCII digit classes + lookarounds keep Java and Python regex
# engines byte-identical.
PNR_PATTERN = "(?<![0-9])[0-9]{6}(?:[0-9]{2})?[-+]?[0-9]{4}(?![0-9])"
NAME_PATTERN = "\\b(Herr|Fru|Fröken|Doktor) ([A-ZÀ-Þ][A-ZÀ-Þa-zà-þ-]*)"
ADDR_PATTERN = (
    "(?<![A-Za-zÀ-þ])[A-ZÀ-Þ][a-zà-þ]+"
    "(?:gatan|vägen|gränd|torget) [0-9]{1,3}(?![0-9])"
)


def scrub_pii(col: Column) -> Column:
    """Ordered redaction chain; order is part of the rule version."""
    out = F.regexp_replace(col, PNR_PATTERN, "[PNR]")
    out = F.regexp_replace(out, NAME_PATTERN, "$1 [NAME]")
    out = F.regexp_replace(out, ADDR_PATTERN, "[ADDR]")
    return out


def repair_and_scrub(raw: Column) -> Column:
    """The full per-paragraph text chain, in pipeline order:

    dollar_signs -> join_soft_hyphens -> fix_capitalized_dashes ->
    scrub_pii, mirroring the reference post-pipeline stage order
    (/root/reference/src/cur-prot/post-pipeline.py:135-146 runs
    dollar_sign_replace then fix_capitalized_dashes).
    """
    return scrub_pii(fix_capitalized_dashes(join_soft_hyphens(dollar_signs(raw))))


# --- word-frequency token normalization -----------------------------
# Parity: /root/reference/src/mk-wf-dict.py:18,28-38 — lower, strip a
# punctuation class, strip digit/dash/slash runs, trim ':'.
WF_PUNCT = "[\\[\\]\\{\\}\\(\\)<>.,!§”$«»'\";]"
WF_DIGIT_DASH = "[0-9\\-–—/]+"
# tokens dropped after normalization (mk-wf-dict.py:38)
WF_DROP = ["", "-", "–", "—"]


def token_normalize(col: Column) -> Column:
    out = F.lower(col)
    out = F.regexp_replace(out, WF_PUNCT, "")
    out = F.regexp_replace(out, WF_DIGIT_DASH, "")
    return F.btrim(out, F.lit(":"))


def tokens(col: Column) -> Column:
    """Whitespace tokens of a (not necessarily normalized) text."""
    return F.filter(F.split(normalize_ws(col), " "), lambda t: t != "")
