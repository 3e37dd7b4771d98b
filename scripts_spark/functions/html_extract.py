"""Columnar HTML → text extraction for Common-Crawl-style pages.

The input-table shape this engine targets carries the raw page as
``html: binary`` next to the (often crawler-extracted) ``text``
column.  When the ``text`` column is absent or untrusted, extraction
must happen ON the engine — and at 10^12 documents that means pure
JVM column expressions (regexp/replace chains inside whole-stage
codegen), never a per-row Python HTML parser.  The reference pipeline
reaches for a DOM parser (lxml tree walks, e.g.
``src/build_pipeline.py`` parsing protocols before text rules run);
this is that capability re-expressed as a fixed normalization SPEC
that three engines can evaluate identically:

  1. strip HTML comments            ``(?s)<!--.*?-->``       → ''
  2. strip <script>…</script>       ``(?is)<script[^>]*>.*?</script>``
  3. strip <style>…</style>         ``(?is)<style[^>]*>.*?</style>``
  4. break tags → newline           ``(?i)<(br|/p|/div|/li|/h[1-6]|/tr)[^>]*>``
  5. every remaining tag → space    ``<[^>]*>``
  6. entity decode (after tag removal, so ``&lt;tag&gt;`` in text can
     never become a strippable tag): ``&nbsp;``→' ', ``&lt;``,
     ``&gt;``, ``&quot;``, ``&#39;``, ``&apos;``, and ``&amp;`` LAST
     (literal replaces — decoding ``&amp;lt;`` yields ``&lt;``, the
     standard single-pass result, not ``<``).
  7. whitespace: collapse ``[ \\t]+`` to one space, strip spaces
     around newlines, collapse newline runs, trim outer space/newline.

Deliberate non-goals, documented rather than guessed: numeric
entities beyond ``&#39;`` are left verbatim; an unclosed <script>
loses only its tags (RE2 has no way to say "to end of input or close
tag" portably); a bare ``<`` swallows text to the next ``>`` exactly
as the regex reads.  The point is a DETERMINISTIC spec that is
bit-identical between Spark (Java regex), DuckDB (RE2 with the 'g'
flag), and a pure-Python oracle — the ``html_extract`` registry query
value-hashes all the steps engine-to-engine, and the fuzz suite
checks Spark against the Python form on adversarial fragments.

Every step is a built-in expression: one projection, fully inside
whole-stage codegen, no shuffle, no UDF — at crawl scale extraction
is a free rider on the first scan of the table.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Bumped whenever any step table below changes — recorded in curate
# lineage (CurateConfig.text_from_html) so downstream consumers can
# tell which extraction spec produced a snapshot's text.
EXTRACT_SPEC_VERSION = "1.0"

# (pattern, replacement) — applied in order, all global.  Shared
# verbatim with the DuckDB oracle builder below and mirrored by the
# pure-Python test oracle (tests/test_html_extract.py).
HTML_REGEX_STEPS: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr)[^>]*>", "\n"),
    (r"<[^>]*>", " "),
]

# Literal entity decodes, in order; &amp; must stay last.
HTML_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]

HTML_WS_STEPS: list[tuple[str, str]] = [
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
]


def html_to_text(col: Column, from_binary: bool = False) -> Column:
    """Extract readable text from an HTML column per the module SPEC.

    ``from_binary=True`` reinterprets a ``binary`` column as a string
    (the input-hint shape stores pages as ``html: binary``) via
    ``cast(binary as string)``. Spark's binary→string cast wraps the
    bytes UNVALIDATED (UTF8String is byte-based): malformed sequences
    pass through as raw bytes, NOT as U+FFFD replacements — but
    crucially it never fails, whereas under Spark 4's default ANSI
    mode ``decode(..., 'UTF-8')`` would abort the WHOLE job on the
    first bad row (one poisoned page must cost one document, never
    the batch). Mislabeled/latin-1 pages therefore produce raw-byte
    text; add an explicit validate/transcode step upstream if
    replacement semantics are required. Null html yields null text.
    """
    s = col.cast("string") if from_binary else col
    for pat, rep in HTML_REGEX_STEPS:
        s = F.regexp_replace(s, pat, rep)
    for lit, rep in HTML_ENTITY_STEPS:
        s = F.replace(s, F.lit(lit), F.lit(rep))
    for pat, rep in HTML_WS_STEPS:
        s = F.regexp_replace(s, pat, rep)
    return F.btrim(s, F.lit(" \n"))


def html_to_text_sql(expr: str) -> str:
    """The identical chain as DuckDB SQL over ``expr`` — built from
    the same step tables so the engines cannot drift (the round-5
    ADVICE lesson from _banded_near_sql: ONE source of truth)."""
    s = expr
    # Regex PATTERNS pass through verbatim: backslash escapes (\t, \n)
    # are regex-engine escapes that Java regex and RE2 read alike (a
    # DuckDB string literal keeps backslashes literal, so RE2 sees
    # exactly what Spark's Java pattern sees).  REPLACEMENTS are
    # literals: real newline chars must be spliced via chr(10).
    for pat, rep in HTML_REGEX_STEPS:
        s = f"regexp_replace({s}, '{_sq(pat)}', '{_sq_rep(rep)}', 'g')"
    for lit, rep in HTML_ENTITY_STEPS:
        s = f"replace({s}, '{_sq(lit)}', '{_sq(rep)}')"
    for pat, rep in HTML_WS_STEPS:
        s = f"regexp_replace({s}, '{_sq(pat)}', '{_sq_rep(rep)}', 'g')"
    return f"trim({s}, ' ' || chr(10))"


def _sq(s: str) -> str:
    return s.replace("'", "''")


def _sq_rep(s: str) -> str:
    # Replacement literal: splice real newlines by closing/reopening
    # the single-quoted literal around chr(10).
    return _sq(s).replace("\n", "' || chr(10) || '")
