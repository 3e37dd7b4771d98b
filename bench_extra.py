#!/usr/bin/env python
"""Round-7 optimization harness (bench.py is FROZEN for measurement;
this file exists so plan isolation / noop-sink timings / synthetic
scale runs never touch it — guide §1.4).

Subcommands:
  gen-synth N OUTDIR [--near-frac 0.05]
      Write a documents.parquet statistically matching the driver's
      generator (31-word vocab, 10..100 tokens, ~5% near-dup perturbed
      copies) at N rows — lets sf1.0-scale behavior be reproduced
      locally without touching the read-only /root/testdata.
  time QUERY [QUERY...] [--sf-dir DIR] [--trials N]
      Per-query noop-sink timing with job descriptions, one JSON line.
  explain QUERY [--sf-dir DIR] [--out FILE]
      .explain("formatted") capture.
  curate [--replicate K] [--sf-dir DIR] [--trials N]
      The flagship curate timing, same construction as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark(shuffle_partitions: int | None = None):
    from scripts_spark.session import get_spark

    sp = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", "64"))
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=shuffle_partitions or sp,
        extra_conf={"spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def gen_synth(n: int, outdir: str, near_frac: float = 0.05, seed: int = 7) -> None:
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = [
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window",
    ]
    langs = ["en"] * 8 + ["zh", "es", "fr", "de"] * 3
    rng = random.Random(seed)
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < near_frac:
            # perturbed copy of an earlier doc: substitute ~3 words
            src = texts[rng.randrange(len(texts))].split(" ")
            for _ in range(3):
                src[rng.randrange(len(src))] = rng.choice(vocab)
            texts.append(" ".join(src))
        else:
            k = rng.randint(10, 100)
            texts.append(" ".join(rng.choice(vocab) for _ in range(k)))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langs[i % len(langs)] for i in range(n)], pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(tbl, os.path.join(outdir, "documents.parquet"))
    print(json.dumps({"rows": n, "out": outdir}))


def cmd_time(names: list[str], sf_dir: str, trials: int) -> None:
    from scripts_spark.plans import queries as Q

    spark = _spark()
    out: dict[str, float] = {}
    for name in names:
        # one untimed warmup pass amortizes codegen compilation
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        force(Q.REGISTRY[name](spark, sf_dir))
        best = float("inf")
        for t in range(trials):
            spark.sparkContext.setJobDescription(f"{name}:t{t}")
            t0 = time.perf_counter()
            force(Q.REGISTRY[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"sf_dir": sf_dir, "trials": trials, "queries": out}))


def cmd_explain(name: str, sf_dir: str, out: str | None) -> None:
    from scripts_spark.plans import queries as Q

    spark = _spark()
    df = Q.REGISTRY[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    if out:
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out}")
    else:
        print(txt)


def cmd_curate(replicate: int, sf_dir: str, trials: int, buckets: int) -> None:
    import bench as B
    from scripts_spark.plans.pipeline import CurateConfig, curate

    spark = _spark()
    spark.sparkContext.setJobDescription("warmup:curate")
    force(
        curate(
            B.replicated_pages(spark, sf_dir, 1),
            CurateConfig(num_buckets=buckets, input_snapshot="warmup"),
        )
    )
    best = float("inf")
    for t in range(trials):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"curate:t{t}")
        t0 = time.perf_counter()
        force(
            curate(
                B.replicated_pages(spark, sf_dir, replicate),
                CurateConfig(num_buckets=buckets, input_snapshot="bench"),
            )
        )
        best = min(best, time.perf_counter() - t0)
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count() * replicate
    print(
        json.dumps(
            {
                "curate_sec": round(best, 3),
                "docs": n,
                "docs_per_sec": round(n / best, 1),
                "replicate": replicate,
                "trials": trials,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen-synth")
    g.add_argument("n", type=int)
    g.add_argument("outdir")
    g.add_argument("--near-frac", type=float, default=0.05)
    t = sub.add_parser("time")
    t.add_argument("queries", nargs="+")
    t.add_argument("--sf-dir", default=SF_DIR)
    t.add_argument("--trials", type=int, default=2)
    e = sub.add_parser("explain")
    e.add_argument("query")
    e.add_argument("--sf-dir", default=SF_DIR)
    e.add_argument("--out", default=None)
    c = sub.add_parser("curate")
    c.add_argument("--replicate", type=int, default=40)
    c.add_argument("--sf-dir", default=SF_DIR)
    c.add_argument("--trials", type=int, default=2)
    c.add_argument("--buckets", type=int, default=256)
    a = ap.parse_args()
    if a.cmd == "gen-synth":
        gen_synth(a.n, a.outdir, a.near_frac)
    elif a.cmd == "time":
        cmd_time(a.queries, a.sf_dir, a.trials)
    elif a.cmd == "explain":
        cmd_explain(a.query, a.sf_dir, a.out)
    elif a.cmd == "curate":
        cmd_curate(a.replicate, a.sf_dir, a.trials, a.buckets)


if __name__ == "__main__":
    main()
