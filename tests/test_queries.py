"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same parquet tables, then compare row count + column names + sorted
value multiset (order-insensitive, like the driver's value-hash)."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
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
    sdf = QUERIES[name](spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()

    ores = ddb.execute(ORACLES[name]).fetchall()
    ocols = [d[0].lower() for d in ddb.description]

    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(ores), f"{name}: rowcount {len(srows)} vs {len(ores)}"

    # order-insensitive compare: sort columns by name, then rows
    s_ix = sorted(range(len(scols)), key=lambda i: scols[i])
    o_ix = sorted(range(len(ocols)), key=lambda i: ocols[i])
    s_set = sorted(tuple(_norm_cell(r[i]) for i in s_ix) for r in srows)
    o_set = sorted(tuple(_norm_cell(r[i]) for i in o_ix) for r in ores)
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
