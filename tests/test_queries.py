"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same parquet tables, then compare row count + column names + sorted
value multiset (order-insensitive, like the driver's value-hash).

IMPORTANT (round-1 lesson): both sides are fetched through PANDAS,
because that is the representation the driver hashes. DuckDB returns
SUM(BIGINT) as HUGEINT, which pandas fetch renders as float64 — so an
un-CAST oracle sum shows up here as '93182.0' vs Spark's '93182' and
FAILS, exactly as it fails the driver gate. fetchall() (python ints)
would mask that class of bug."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from scripts_spark.plans import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    # pd.isna on scalars; arrays/lists are not NA-checkable
    try:
        import pandas as pd

        if not isinstance(v, (list, tuple, dict)) and pd.isna(v):
            return "\x00NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):  # includes np.float64 (subclass of float)
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        v = v.replace(tzinfo=None)
        # DuckDB fetchdf renders DATE as midnight datetime64; Spark keeps
        # datetime.date — fold midnight to date-only so both sides agree
        # (the driver gate accepted this pairing in round 1).
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v) if v is not None else "\x00NULL"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    # Fetch BOTH sides through pandas — the driver's hashed representation.
    spdf = QUERIES[name](spark, SF_DIR).toPandas()
    opdf = ddb.execute(ORACLES[name]).fetchdf()
    scols = [c.lower() for c in spdf.columns]
    ocols = [c.lower() for c in opdf.columns]

    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(spdf) == len(opdf), f"{name}: rowcount {len(spdf)} vs {len(opdf)}"

    # order-insensitive compare: sort columns by name, then rows
    s_ix = sorted(range(len(scols)), key=lambda i: scols[i])
    o_ix = sorted(range(len(ocols)), key=lambda i: ocols[i])
    srows = list(spdf.itertuples(index=False, name=None))
    orows = list(opdf.itertuples(index=False, name=None))
    s_set = sorted(tuple(_norm_cell(r[i]) for i in s_ix) for r in srows)
    o_set = sorted(tuple(_norm_cell(r[i]) for i in o_ix) for r in orows)
    if s_set != o_set:
        diffs = [
            (a, b) for a, b in zip(s_set, o_set) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")


def test_every_query_has_oracle_or_reason():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may be oracle-less; keep the list tiny & known
    assert missing <= set(), f"queries without oracle: {missing}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns[0] == "url"
    assert len(rows) >= 0


def test_driver_window_covers_critical_operators():
    """The external gate checks only the first 50 registered queries;
    registration order is curated (Q.DRIVER_WINDOW) so those slots
    cover every §2 family + every LLM-pipeline operator. Pin it."""
    first50 = list(Q.REGISTRY)[:50]
    assert first50 == Q.DRIVER_WINDOW
    critical = {
        "quality_filter", "lang_mismatch", "doc_scoring", "boiler_headers",
        "dedup_groups", "history_near_losers", "simhash_pairs", "ivf_assign",
        "random_projection", "fuzzy_cascade", "containment_pages",
        "asof_join_purchases", "gold_decade_rollup", "section_lifecycle",
        "rollup_order_totals", "metrics_rollup", "normalize_ws",
        "uuid_ordinal_sort",
        # round 5: the scale-safe near-dup plan + LLM-pipeline rules
        "bucketed_near_pairs", "gopher_rules", "benchmark_contamination",
        "exact_dedup",
        # round 6: cross-corpus paragraph dedup, exact anchor + the
        # hash-keyed production twin sharing one oracle
        "paragraph_dedup", "paragraph_dedup_fast",
        # round 6: token-budget training-mix sampling
        "token_budget_sample",
    }
    assert critical <= set(first50)
    # every window slot must be value-checkable (has an oracle)
    assert all(n in Q.ORACLES for n in first50)


@pytest.mark.parametrize("n_buckets", [4, 512])
def test_token_budget_sample_scalable_equivalence(spark, n_buckets):
    """The bucketed-prefix-sum production twin selects the EXACT same
    rows (values included) as the window-cumsum oracle anchor, at a
    bucket count small enough that every source's cut lands mid-bucket
    (4) and large enough that most buckets hold 0-1 docs (512)."""
    exact = (
        Q.REGISTRY["token_budget_sample"](spark, SF_DIR)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    fast = (
        Q.token_budget_sample_scalable(spark, SF_DIR, n_buckets=n_buckets)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, fast)
