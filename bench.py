#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

The flagship row is `curate`: the full keep/drop+scrub pipeline over a
pages table derived from the sf documents table and replicated 10x
(deterministic) — docs_per_sec is measured from it, matching
BASELINE.json's target metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from scripts_spark.plans import queries as Q
from scripts_spark.plans.pipeline import CurateConfig, curate
from scripts_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "10"))


def replicated_pages(spark, sf_dir: str, k: int):
    """documents → pages shape, replicated k× with distinct urls."""
    import __spark_entry__ as e

    base = e.pages_from_documents(spark, sf_dir)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    return base.crossJoin(reps).select(
        F.concat(F.col("url"), F.lit("?r="), F.col("rep")).alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
    )


def force(df) -> int:
    """Execute the full plan; returns row count via a cheap agg on top
    (noop write would hide output row counts)."""
    return df.count()


def main() -> None:
    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup (not timed)
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    timings: dict[str, float] = {}
    n_docs = 0

    t0 = time.perf_counter()
    pages = replicated_pages(spark, SF_DIR, REPLICATE)
    dec = curate(pages, CurateConfig(num_buckets=4 * CPUS, input_snapshot="bench"))
    n_docs = force(dec)
    timings["curate"] = time.perf_counter() - t0

    bench_queries = [
        "pricing_summary",
        "wordfreq",
        "quality_filter",
        "sessionize",
        "running_cursor",
        "revenue_by_nation",
        "minhash_lsh_pairs",
        "ngram_jaccard_pairs",
        "ann_topk",
        "top_events_per_user",
        "year_rollup",
    ]
    for name in bench_queries:
        t0 = time.perf_counter()
        force(Q.REGISTRY[name](spark, SF_DIR))
        timings[name] = time.perf_counter() - t0

    total = sum(timings.values())
    out = {
        "metric": "total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "docs": n_docs,
        "docs_per_sec": round(n_docs / timings["curate"], 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
