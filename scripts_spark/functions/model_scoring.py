"""Broadcast-model scoring through vectorized Arrow UDFs — the M1/M2
pattern from SURVEY.md §2.8 with the reference's prob_dict memo
re-expressed as vocabulary-level dedup.

The "model" here is a frozen hashing-trick linear classifier (fastText
architecture without external weights): token → 2^16 hash buckets →
int8 logit pair. Weights derive deterministically from blake2b of the
bucket index, so the Python oracle and the executor-side numpy path
share them bit-for-bit, and integer logits make per-doc sums exact.

Plan shape (the big lever at 10^12 docs, SURVEY §4):

    tokens → per-doc (token, cnt) → DISTINCT vocab
    → mapInPandas batch scoring (model loaded once per executor)
    → broadcast join scores back → per-doc long sum

Scoring cost is O(distinct tokens), not O(total tokens).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from scripts_spark.functions import text_kernel

HASH_BITS = 16
N_BUCKETS = 1 << HASH_BITS
MODEL_SEED = b"scripts-spark-langmodel-v1"

_WEIGHTS: np.ndarray | None = None


def model_weights() -> np.ndarray:
    """(N_BUCKETS, 2) int8 logits, derived deterministically — the
    'frozen model file'. Lazily built once per process (per executor)."""
    global _WEIGHTS
    if _WEIGHTS is None:
        raw = hashlib.blake2b(MODEL_SEED, digest_size=32).digest()
        # expand to N_BUCKETS*2 bytes via counter-mode blake2b
        chunks = []
        need = N_BUCKETS * 2
        i = 0
        while sum(len(c) for c in chunks) < need:
            chunks.append(
                hashlib.blake2b(raw + i.to_bytes(4, "big"), digest_size=64).digest()
            )
            i += 1
        buf = b"".join(chunks)[:need]
        _WEIGHTS = (
            np.frombuffer(buf, dtype=np.uint8).astype(np.int16).reshape(N_BUCKETS, 2)
            % 9
        ).astype(np.int8) - 4  # logits in [-4, 4]
    return _WEIGHTS


def token_bucket(token: str) -> int:
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big") % N_BUCKETS


def score_token_py(token: str) -> tuple[int, int]:
    """Oracle scoring: (logit_u, logit_note) ints for one token."""
    w = model_weights()[token_bucket(token)]
    return int(w[0]), int(w[1])


VOCAB_SCORE_SCHEMA = StructType(
    [
        StructField("token", StringType(), False),
        StructField("logit_u", LongType(), False),
        StructField("logit_note", LongType(), False),
    ]
)


def score_vocab(vocab: DataFrame) -> DataFrame:
    """mapInPandas batch scorer over the DISTINCT-token frame: the
    model is built once per executor process, then each Arrow batch is
    scored vectorized."""

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = model_weights()  # lazy per-executor init
        for b in batches:
            toks = b["token"]
            buckets = np.fromiter(
                (token_bucket(t) for t in toks), dtype=np.int64, count=len(toks)
            )
            logits = w[buckets]
            yield pd.DataFrame(
                {
                    "token": toks,
                    "logit_u": logits[:, 0].astype(np.int64),
                    "logit_note": logits[:, 1].astype(np.int64),
                }
            )

    return vocab.mapInPandas(_score, VOCAB_SCORE_SCHEMA)


# integer prior ≈ log([0.8, 0.2]) scaled — reference classify_paragraph
# adds log-prior once per paragraph (reclassify.py:45-47)
PRIOR_U, PRIOR_NOTE = 0, -3


def classify_docs(docs: DataFrame, key: str = "url",
                  text_col: str = "scrubbed_text") -> DataFrame:
    """Full M1 semantics, distributed: per-doc summed token logits +
    prior, argmax → 'u' | 'note' (classify_paragraph at
    /root/reference/src/cur-prot/reclassify.py:23-52; None → 'note').
    Returns (key, sum_u, sum_note, pred)."""
    tok_counts = (
        docs.select(F.col(key), F.explode(text_kernel.tokens(F.col(text_col))).alias("token"))
        .groupBy(key, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab_scores = score_vocab(tok_counts.select("token").distinct())
    sums = (
        tok_counts.join(vocab_scores, "token")
        .groupBy(key)
        .agg(
            F.sum(F.col("logit_u") * F.col("cnt")).alias("sum_u"),
            F.sum(F.col("logit_note") * F.col("cnt")).alias("sum_note"),
        )
    )
    universe = docs.groupBy(key).agg(
        F.max(F.col(text_col).isNull().cast("int")).alias("_null")
    )
    out = (
        universe.join(sums, key, "left")
        .withColumn("sum_u", F.coalesce("sum_u", F.lit(0)) + PRIOR_U)
        .withColumn("sum_note", F.coalesce("sum_note", F.lit(0)) + PRIOR_NOTE)
    )
    # reference: None → 'note' (reclassify.py:24-25); else
    # "if prediction[0] < prediction[1] -> note else u"
    return out.withColumn(
        "pred",
        F.when(F.col("_null") == 1, F.lit("note"))
        .when(F.col("sum_u") < F.col("sum_note"), F.lit("note"))
        .otherwise(F.lit("u")),
    ).drop("_null")


def classify_doc_py(text: str | None) -> str:
    """Oracle twin of classify_docs for one document."""
    if text is None:
        return "note"
    from scripts_spark.oracle import textoracle

    su, sn = PRIOR_U, PRIOR_NOTE
    for t in textoracle.tokens(text):
        u, n = score_token_py(t)
        su += u
        sn += n
    return "note" if su < sn else "u"
