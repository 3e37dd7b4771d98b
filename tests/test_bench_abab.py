"""The bench's same-window ABAB adjudication machinery
(bench_worker.plan_digest + the worker protocol): the JSON the driver
records must carry its own proof that a timing delta is environmental
— same-minute control samples and a plan-identity digest per query —
so these pin (a) digest invariance to session-local numbering noise,
(b) digest sensitivity to real plan changes, and (c) the worker
protocol end-to-end across processes."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from bench_worker import plan_digest
from scripts_spark.plans import queries as Q
from scripts_spark.plans.pipeline import CurateConfig, curate
from scripts_spark.sources.pages import pages_df

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plan_digest_invariant_to_session_state(spark):
    """Expression ids AND lambda-variable numbers come from
    session-global counters: planning other higher-order-function
    queries in between must not change a query's digest (this is
    exactly why two processes at different points in their lifetime
    can still be compared)."""
    d1 = plan_digest(Q.REGISTRY["wordfreq"](spark, SF))
    # burn the counters: plan (don't run) a few lambda-heavy queries
    for name in ("doc_fingerprint", "quality_filter", "wordfreq"):
        Q.REGISTRY[name](spark, SF)._jdf.queryExecution().executedPlan()
    d2 = plan_digest(Q.REGISTRY["wordfreq"](spark, SF))
    assert d1 == d2


def test_plan_digest_detects_real_plan_changes(spark):
    """Different physical plans must hash differently — the flag is
    only useful if a genuine operator change flips it."""
    df = pages_df(spark, 40, partitions=2)
    off = plan_digest(curate(df, CurateConfig(num_buckets=4)))
    on = plan_digest(curate(df, CurateConfig(num_buckets=4, para_dedup=True)))
    assert off != on
    assert plan_digest(Q.REGISTRY["wordfreq"](spark, SF)) != plan_digest(
        Q.REGISTRY["pricing_summary"](spark, SF)
    )


def test_para_dedup_off_plan_is_stage_free(spark):
    """With the stage off the plan must contain no trace of it (no
    xxhash64 span keys, no paras_dup column) — the byte-identity to
    the previous pipeline version that makes this round's flagship
    digest comparable against a previous-round control clone."""
    df = pages_df(spark, 40, partitions=2)
    plan = curate(df, CurateConfig(num_buckets=4))._jdf.queryExecution().executedPlan().toString()
    assert "paras_dup" not in plan
    assert "para_dup_frac" not in plan


def test_control_worker_protocol_cross_process(spark):
    """bench_worker end-to-end against THIS repo as its own target: a
    separate JVM planning the same logical query must produce the same
    digest the parent computes in-process (the plans_identical flag's
    ground truth), report per-query timings, and survive an unknown
    query without dying."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF,
        SPARK_GRAFT_CPUS="2",
        BENCH_SHUFFLE_PARTITIONS="8",
        BENCH_DRIVER_MEM="2g",
    )
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench_worker.py"), REPO],
        cwd=REPO,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
        env=env,
    )

    def rpc(**cmd):
        p.stdin.write(json.dumps(cmd) + "\n")
        p.stdin.flush()
        while True:
            ln = p.stdout.readline()
            if not ln:
                raise RuntimeError("worker died")
            if ln.startswith("@@ "):
                return json.loads(ln[3:])

    try:
        r = rpc(cmd="digest", name="wordfreq")
        assert r["ok"], r
        assert r["digest"] == plan_digest(Q.REGISTRY["wordfreq"](spark, SF))
        r = rpc(cmd="q", name="wordfreq")
        assert r["ok"] and r["sec"] > 0, r
        r = rpc(cmd="q", name="___nope___")
        assert not r["ok"] and "no such query" in r["error"], r
        r = rpc(cmd="settle")
        assert r["ok"], r
        assert rpc(cmd="quit")["ok"]
        assert p.wait(timeout=60) == 0
    finally:
        p.kill()
