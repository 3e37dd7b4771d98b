"""Full-pipeline parity: Spark curate() vs the pure-Python oracle on a
600-page deterministic fixture. Asserts the BASELINE.json contract:
keep/drop F1 ≥ 0.99 (expected 1.0) and byte-identical scrubbed_text
per url, plus exact doubles (integer-derived) and id determinism."""

from __future__ import annotations

import math

import pytest

from scripts_spark.oracle import pipeline_oracle
from scripts_spark.plans import pipeline
from scripts_spark.sources import pages

N = 600


@pytest.fixture(scope="module")
def fixture_rows():
    return pages.gen_rows(range(N))


@pytest.fixture(scope="module")
def spark_result(spark, fixture_rows):
    df = pages.pages_df(spark, N, partitions=6)
    out = pipeline.curate(df, pipeline.CurateConfig(num_buckets=8))
    return {r["url"]: r.asDict() for r in out.collect()}


@pytest.fixture(scope="module")
def oracle_result(fixture_rows):
    return pipeline_oracle.curate_rows(fixture_rows)


def test_same_urls(spark_result, oracle_result):
    assert set(spark_result) == set(oracle_result)
    # dup-url planted row collapses to one output row
    assert len(spark_result) < N


def test_keep_f1(spark_result, oracle_result):
    tp = fp = fn = 0
    for url, o in oracle_result.items():
        s = spark_result[url]
        if s["keep"] and o["keep"]:
            tp += 1
        elif s["keep"] and not o["keep"]:
            fp += 1
        elif not s["keep"] and o["keep"]:
            fn += 1
    f1 = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
    assert f1 >= 0.99, f"keep/drop F1 {f1} (fp={fp}, fn={fn})"
    assert fp == 0 and fn == 0, "decision arithmetic is exact; expected F1=1.0"


def test_reasons_match(spark_result, oracle_result):
    for url, o in oracle_result.items():
        assert list(spark_result[url]["filter_reasons"]) == o["filter_reasons"], url


def test_scrubbed_text_byte_identical(spark_result, oracle_result):
    for url, o in oracle_result.items():
        assert spark_result[url]["scrubbed_text"] == o["scrubbed_text"], url


def test_lang_and_doubles(spark_result, oracle_result):
    for url, o in oracle_result.items():
        s = spark_result[url]
        assert s["lang_pred"] == o["lang_pred"], url
        assert math.isclose(s["lang_conf"], o["lang_conf"], rel_tol=0, abs_tol=0), url
        assert math.isclose(s["perplexity"], o["perplexity"], rel_tol=0, abs_tol=0), url


def test_doc_ids(spark_result, oracle_result):
    for url, o in oracle_result.items():
        assert spark_result[url]["doc_id"] == o["doc_id"], url
    ids = [s["doc_id"] for s in spark_result.values()]
    assert len(ids) == len(set(ids)), "lineage ids must be unique (A8 invariant)"


def test_mixture_is_nontrivial(oracle_result):
    kept = sum(1 for o in oracle_result.values() if o["keep"])
    assert 0 < kept < len(oracle_result)
    reasons = {r for o in oracle_result.values() for r in o["filter_reasons"]}
    assert {"lang", "min_length"} <= reasons, reasons


def test_lineage_struct(spark_result):
    s = next(iter(spark_result.values()))
    lin = s["lineage"].asDict()
    assert set(lin) == {"source_partition", "rule_versions", "input_snapshot"}
    assert "pipeline" in lin["rule_versions"]


def test_join_scorer_equals_arrow(spark, fixture_rows):
    """The two scorer physical forms must be result-identical."""
    from scripts_spark.plans.pipeline import CurateConfig, curate
    from scripts_spark.sources import pages as P

    df = P.pages_df(spark, 150, partitions=3)
    a = curate(df, CurateConfig(num_buckets=4, scorer="arrow"))
    b = curate(df, CurateConfig(num_buckets=4, scorer="join"))
    cols = ["url", "lang_pred", "keep", "perplexity", "doc_id"]
    ra = sorted(tuple(r[c] for c in cols) for r in a.select(cols).collect())
    rb = sorted(tuple(r[c] for c in cols) for r in b.select(cols).collect())
    assert ra == rb
    fa = {r["url"]: list(r["filter_reasons"]) for r in a.collect()}
    fb = {r["url"]: list(r["filter_reasons"]) for r in b.collect()}
    assert fa == fb


def test_repartition_mode_is_physical_only(spark):
    """The skew-bench control arm (repartition_mode='domain') must
    change ONLY the exchange key, never the output — same decisions,
    same scrubbed text, same doc ids."""
    from scripts_spark.plans.pipeline import CurateConfig, curate
    from scripts_spark.sources import pages as P

    df = P.pages_df(spark, 150, partitions=3)
    a = curate(df, CurateConfig(num_buckets=4))
    b = curate(df, CurateConfig(num_buckets=4, repartition_mode="domain"))
    cols = ["url", "keep", "scrubbed_text", "doc_id"]
    ra = sorted(tuple(r[c] for c in cols) for r in a.select(cols).collect())
    rb = sorted(tuple(r[c] for c in cols) for r in b.select(cols).collect())
    assert ra == rb
