"""Frozen deterministic language/perplexity model tables.

This is the engine's analog of the reference's frozen fastText + FFNN
classifier (/root/reference/src/cur-prot/reclassify.py:23-52): a
word-level scoring table plus a per-token heuristic, summed per
document with multiplicity. Scores are small INTEGERS so the per-doc
sum is an exact long — immune to float summation order across
partitions (SURVEY.md §7.3 hard part #2).

The bigram "KenLM-style" table is trained offline-at-import on a
deterministic synthetic Swedish corpus (seeded generator, no external
data); costs are integer milli-nats so perplexity sums are exact too.

Both the Spark expression builders and the pure-Python oracle import
THIS module, so the model weights cannot drift apart.
"""

from __future__ import annotations

import math
import random
from functools import lru_cache

from scripts_spark.oracle import textoracle
from scripts_spark.sources import pages as _pages

# --- word score table (the "broadcast model") ------------------------
# Priority on overlap: sv > en > de > fi (later writes win ⇒ write in
# reverse priority order).
SV_SCORE, EN_SCORE, DE_SCORE, FI_SCORE = 4, -4, -3, -3


def _build_stop_scores() -> dict[str, int]:
    d: dict[str, int] = {}
    for w in _pages.FI_WORDS:
        d[w] = FI_SCORE
    for w in _pages.DE_WORDS:
        d[w] = DE_SCORE
    for w in _pages.EN_WORDS:
        d[w] = EN_SCORE
    for w in _pages.SV_FUNCTION_WORDS + _pages.SV_CONTENT_WORDS:
        d[w] = SV_SCORE
    return d


STOP_SCORES: dict[str, int] = _build_stop_scores()

SV_CHARS = set("åäö")
RARE_SV_CHARS = set("wz")


def token_score_py(token: str) -> int:
    """Integer language evidence for one whitespace token (oracle +
    spec). Mirrored exactly by the Spark expression in langid.py."""
    tl = textoracle.token_normalize(token)
    if tl == "":
        return 0
    s = STOP_SCORES.get(tl)
    if s is not None:
        return s
    score = 0
    if any(c in SV_CHARS for c in tl):
        score += 2
    if any(c in RARE_SV_CHARS for c in tl):
        score -= 1
    return score


def lang_decision(score_sum: int) -> str:
    return "sv" if score_sum > 0 else "other"


def lang_conf(score_sum: int) -> float:
    a = abs(score_sum)
    return a / (a + 8.0)


# --- bigram cost table (milli-nats) ----------------------------------
TRAIN_SEED = 1337
TRAIN_PARAGRAPHS = 500
ALPHA = 0.5  # add-alpha smoothing
OOV_COST_MILLI = 12000  # cost for unseen bigram / unknown history
PPX_THRESHOLD_MILLI = 9000  # drop if mean cost > 9 nats/bigram


@lru_cache(maxsize=1)
def bigram_cost_table() -> dict[str, int]:
    """pair "w1 w2" -> integer milli-nat cost, trained on a seeded
    synthetic Swedish corpus drawn from the same public wordlists the
    fixtures use. Deterministic across processes."""
    rnd = random.Random(TRAIN_SEED)
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _ in range(TRAIN_PARAGRAPHS):
        para = _pages._sv_paragraph(rnd)
        toks = [
            t for t in (textoracle.token_normalize(w) for w in para.split(" ")) if t != ""
        ]
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    vocab = len(uni)
    table: dict[str, int] = {}
    for (a, b), c in bi.items():
        p = (c + ALPHA) / (uni[a] + ALPHA * vocab)
        table[f"{a} {b}"] = min(round(-math.log(p) * 1000), OOV_COST_MILLI)
    return table


def doc_ppx_py(norm_tokens: list[str]) -> tuple[int, int]:
    """(sum of milli-nat costs, n_bigrams) for a normalized token list."""
    table = bigram_cost_table()
    total = 0
    n = 0
    for a, b in zip(norm_tokens, norm_tokens[1:]):
        total += table.get(f"{a} {b}", OOV_COST_MILLI)
        n += 1
    return total, n
