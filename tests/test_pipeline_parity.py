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


def test_para_dedup_stage_parity_and_reasons(spark):
    """The opt-in corpus paragraph-dedup stage (CurateConfig.
    para_dedup): Spark's hash-keyed two-pass must match the oracle's
    seen-set recomputation EXACTLY — keep decision, sorted reasons,
    byte-identical scrubbed_text and doc_id per url — on a fixture
    with planted full-copy and half-copy documents; the para_dup_frac
    reason must actually fire; and the stage must be off by default
    (paras_dup literal 0, output unchanged)."""
    from scripts_spark.sources import pages as P

    base = P.gen_rows(range(250))
    planted = []
    for k in range(20):  # full copies: every paragraph already seen
        planted.append(
            dict(base[k], url=f"https://dupfarm.example.com/copy{k}")
        )
    for k in range(10):  # half copies: dup head + unique tail
        src_lines = (base[30 + k]["text"] or "").split("\n")
        planted.append(
            dict(
                base[30 + k],
                url=f"https://mix.example.com/m{k}",
                text="\n".join(
                    src_lines + [f"helt unik rad nummer {k} aldrig sedd förr"]
                ),
            )
        )
    rows = base + planted
    df = spark.createDataFrame(rows, P.PAGES_SCHEMA)
    out = {
        r["url"]: r.asDict()
        for r in pipeline.curate(
            df, pipeline.CurateConfig(num_buckets=8, para_dedup=True)
        ).collect()
    }
    ora = pipeline_oracle.curate_rows(
        rows, pipeline_oracle.OracleConfig(para_dedup=True)
    )
    assert set(out) == set(ora)
    for url, o in ora.items():
        s = out[url]
        assert s["keep"] == o["keep"], url
        assert list(s["filter_reasons"]) == o["filter_reasons"], url
        assert s["scrubbed_text"] == o["scrubbed_text"], url
        assert s["doc_id"] == o["doc_id"], url
    fired = [u for u, o in ora.items() if "para_dup_frac" in o["filter_reasons"]]
    assert len(fired) >= 20, len(fired)  # every full copy must trip it
    # default path unchanged: stage off → different scrub for planted docs
    off = pipeline_oracle.curate_rows(rows)
    assert any(off[u]["scrubbed_text"] != ora[u]["scrubbed_text"] for u in ora)
    assert all("para_dup_frac" not in off[u]["filter_reasons"] for u in off)
