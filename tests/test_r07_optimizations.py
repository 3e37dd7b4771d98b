"""Round-7 optimization pins.

The optimizations must not change WHAT any query computes (the DuckDB
parity suite pins that); these tests pin the optimization-specific
invariants: bind_once value semantics, the translate/regex char-count
equivalence on edge characters, and the salted two-stage top-k plan
shape that cleared the r6 perf-weak flags.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scripts_spark.functions.text_kernel import bind_once


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bind_once_value_semantics(spark):
    df = spark.createDataFrame(
        [("a b c",), ("",), (None,)], "text string"
    ).select(
        bind_once(
            F.filter(F.split("text", " "), lambda x: x != ""),
            lambda t: F.when(F.size(t) >= 2, F.size(t)).otherwise(F.lit(-1)),
        ).alias("v")
    )
    # null text: split(null) -> null array; when(size(null) >= 2) is
    # null -> otherwise branch. Identical with and without bind_once
    # (null propagates through the one-element array unchanged).
    assert [r.v for r in df.collect()] == [3, -1, -1]


def test_bind_once_single_evaluation_in_plan(spark):
    # the defining property: the bound expression appears ONCE in the
    # plan (inside the array() wrapper), not once per lambda reference
    df = spark.createDataFrame([("x y z",)], "text string").select(
        bind_once(
            F.filter(F.split("text", " "), lambda x: x != ""),
            lambda t: F.concat_ws("|", t[0], t[1], t[2]),
        ).alias("v")
    )
    plan = _plan(df)
    assert plan.count("split(text") == 1
    assert df.collect()[0].v == "x|y|z"


def test_translate_count_matches_regex_on_edge_chars(spark):
    # ×(U+00D7) and ÷(U+00F7) ARE inside the regex classes [À-þ]/[À-Þ];
    # the translate char sets must include them too
    rows = [("AB×÷ åÄ9\t\nmixedCASE 123",), ("",), (None,)]
    df = spark.createDataFrame(rows, "st string")
    import string

    letters = (
        string.ascii_letters + "".join(chr(c) for c in range(0xC0, 0xFF))
    )
    uppers = string.ascii_uppercase + "".join(chr(c) for c in range(0xC0, 0xDF))
    st = F.col("st")
    cmp = df.select(
        (F.length(st) - F.length(F.regexp_replace(st, "[0-9]", ""))).alias("r_d"),
        (F.length(st) - F.length(F.translate(st, "0123456789", ""))).alias("t_d"),
        (F.length(st) - F.length(F.regexp_replace(st, "[A-Za-zÀ-þ]", ""))).alias("r_l"),
        (F.length(st) - F.length(F.translate(st, letters, ""))).alias("t_l"),
        (F.length(st) - F.length(F.regexp_replace(st, "[A-ZÀ-Þ]", ""))).alias("r_u"),
        (F.length(st) - F.length(F.translate(st, uppers, ""))).alias("t_u"),
    ).collect()
    for row in cmp:
        assert row.r_d == row.t_d
        assert row.r_l == row.t_l
        assert row.r_u == row.t_u


@pytest.mark.parametrize(
    "name", ["domain_cap_sample", "temperature_mix_sample", "lexical_topk"]
)
def test_salted_two_stage_rank_plan(spark, name):
    """The r6 perf-weak queries must not sort the full frame by the
    group key alone: the first (full-frame) rank stage partitions by
    (group, _salt), so no Zipf-hot group serializes on one task. The
    group-only window runs after the stage-1 filter (bounded rows)."""
    from scripts_spark.plans import queries as Q

    df = Q.REGISTRY[name](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "_salt" in plan, f"{name}: salted stage missing from plan"
    # results stay oracle-exact — pinned by the parity suite; here just
    # sanity-check the query still returns rows with the right schema
    rows = df.limit(5).collect()
    assert len(rows) > 0
