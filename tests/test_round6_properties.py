"""Property-based parity for the round-6 training-mix operators:
token-budget sampling (exact + bucketed-prefix-sum twin), temperature
mix weights, and per-source doc caps — each vs a pure-Python oracle
on randomized corpora written as a documents.parquet fixture (the
queries read the driver's table shape, so the fuzz harness materializes
one per sample batch). Same harness shape as test_round5_properties."""

from __future__ import annotations

import hashlib
import math
import os

import hypothesis
from hypothesis import given, settings, strategies as st

from scripts_spark.plans import queries as Q

WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])
DOC = st.lists(WORD, min_size=0, max_size=30)
SRC = st.sampled_from(["s0", "s1", "s2"])
CORPUS = st.lists(st.tuples(SRC, DOC), min_size=0, max_size=25)


def _collect(strategy, n=25):
    out = []

    @settings(max_examples=n, deadline=None, database=None,
              derandomize=True,
              suppress_health_check=list(hypothesis.HealthCheck))
    @given(strategy)
    def run(sample):
        out.append(sample)

    run()
    return out


def _pri(salt: str, doc_id: int) -> int:
    return int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16)


def _write_documents(spark, rows, path):
    df = spark.createDataFrame(
        [(i, " ".join(toks) if toks is not None else None, "sv", src,
          len(" ".join(toks)) if toks is not None else 0)
         for i, (src, toks) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _py_token_budget(rows, budget):
    by_src: dict[str, list] = {}
    for i, (src, toks) in enumerate(rows):
        if toks is None:
            continue
        by_src.setdefault(src, []).append((_pri("tb", i), i, len(toks)))
    out = {}
    for src, docs in by_src.items():
        cum = 0
        for pri, i, n in sorted(docs):
            cum += n
            if cum > budget:
                break
            out[i] = (src, n, cum)
    return out


def _py_domain_cap(rows, cap):
    by_src: dict[str, list] = {}
    for i, (src, toks) in enumerate(rows):
        if toks is None:
            continue
        by_src.setdefault(src, []).append((_pri("dc", i), i))
    out = {}
    for src, docs in by_src.items():
        for rank, (pri, i) in enumerate(sorted(docs), start=1):
            if rank > cap:
                break
            out[i] = (src, rank)
    return out


def _py_mix_weights(rows):
    toks: dict[str, int] = {}
    for src, doc in rows:
        if doc is None:
            continue
        toks[src] = toks.get(src, 0) + len(doc)
    raw = {s: math.isqrt(n) for s, n in toks.items()}
    total = sum(raw.values())
    return {
        s: (toks[s], raw[s], (1000 * raw[s]) // total if total else None)
        for s in toks
    }


def test_token_budget_fuzz(spark, tmp_path):
    corpora = _collect(CORPUS)
    for k, rows in enumerate(corpora):
        sf = str(tmp_path / f"c{k}")
        os.makedirs(sf, exist_ok=True)
        _write_documents(spark, rows, sf)
        got = {
            r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
            for r in Q.REGISTRY["token_budget_sample"](spark, sf).collect()
        }
        assert got == _py_token_budget(rows, Q.TOKEN_BUDGET), (k, rows)
        # the bucketed twin must agree bit-for-bit on every fuzzed
        # corpus too, at a bucket count that forces mid-bucket cuts
        fast = {
            r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
            for r in Q.token_budget_sample_scalable(spark, sf, n_buckets=3).collect()
        }
        assert fast == got, (k, rows)


def test_domain_cap_fuzz(spark, tmp_path):
    corpora = _collect(CORPUS)
    for k, rows in enumerate(corpora):
        sf = str(tmp_path / f"d{k}")
        os.makedirs(sf, exist_ok=True)
        _write_documents(spark, rows, sf)
        got = {
            r["doc_id"]: (r["source"], r["rank_in_source"])
            for r in Q.REGISTRY["domain_cap_sample"](spark, sf).collect()
        }
        assert got == _py_domain_cap(rows, 12), (k, rows)


def test_mix_weights_fuzz(spark, tmp_path):
    corpora = _collect(CORPUS)
    for k, rows in enumerate(corpora):
        if not any(doc is not None for _, doc in rows):
            continue
        sf = str(tmp_path / f"m{k}")
        os.makedirs(sf, exist_ok=True)
        _write_documents(spark, rows, sf)
        got = {
            r["source"]: (r["n_tokens"], r["w_raw"], r["w_milli"])
            for r in Q.REGISTRY["source_mix_weights"](spark, sf).collect()
        }
        assert got == _py_mix_weights(rows), (k, rows)
