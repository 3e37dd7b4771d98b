#!/usr/bin/env python
"""Per-query bench worker: the control arm of bench.py's same-window
ABAB adjudication.

Usage: ``python bench_worker.py <target_repo_dir>`` — the worker
inserts <target_repo_dir> at sys.path[0] and imports ITS
``scripts_spark`` package and ``bench`` module (so a clone of a
previous-round commit runs its own code), but the worker script and
the plan-digest normalization are always the CURRENT repo's, so both
arms hash plans identically.

Protocol: one JSON object per line on stdin, one '@@ '-prefixed JSON
reply per line on stdout (Spark logs go to stderr; the prefix guards
against any stray stdout noise anyway). Commands:

  {"cmd": "warmup", "buckets": N}        -> {"ok": true, "sec": s}
  {"cmd": "q", "name": "..."}           -> {"ok": true, "sec": s}
  {"cmd": "digest", "name": "..."}      -> {"ok": true, "digest": d}
  {"cmd": "curate", "k": K, "buckets": N, "snapshot": "..."}
                                         -> {"ok": true, "sec": s}
  {"cmd": "curate_digest", "k": K, "buckets": N, "snapshot": "..."}
                                         -> {"ok": true, "digest": d}
  {"cmd": "settle"}                      -> {"ok": true}
  {"cmd": "quit"}                        -> {"ok": true} and exit

Timings are measured inside the worker (build + force), excluding IPC.
The parent waits for each reply before proceeding, so the two JVMs
never compete for cores — each sample runs alone, seconds apart from
its counterpart, which is what makes a per-query HEAD-vs-control delta
attributable on a host with documented CPU-steal bursts.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time


def plan_digest(df) -> str:
    """Normalized pre-execution executedPlan hash.

    Expression ids (``#123``), exchange/subquery ids (``[id=#42]``),
    AQE plan ids, and codegen stage ids are run-local counters — two
    processes planning the same logical query number them differently —
    so they are stripped before hashing. Everything else (operators,
    join strategies, pushed filters, literals, column order) is kept:
    equal digests mean the physical plans are the same plan, and a
    timing delta between the arms is environmental, not code."""
    s = df._jdf.queryExecution().executedPlan().toString()
    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"\bid=#?\d+", "id=", s)
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"\[codegen id : \d+\]", "", s)
    # lambda variables (higher-order functions) are numbered by a
    # SESSION-GLOBAL counter — x_1 in a fresh session is x_7 after a
    # few queries — so the numeric suffix is noise too (after the
    # #-normalization above they read like ``lambda x_7#``). Scoped to
    # the ``lambda <name>_N#`` token (r7, ADVICE fix): the old bare
    # ``_\d+#`` also rewrote real attribute names ending in _<digits>
    # (n2_1 vs a hypothetical n2_2), letting two genuinely different
    # plans hash equal.
    s = re.sub(r"(lambda [A-Za-z0-9$]+)_\d+#", r"\1_#", s)
    return hashlib.md5(s.encode()).hexdigest()[:16]


def main() -> None:
    target = os.path.abspath(sys.argv[1])
    sys.path.insert(0, target)
    os.chdir(target)
    import bench as B  # the TARGET's bench: replicated_pages/force/knobs
    from scripts_spark.plans import queries as Q
    from scripts_spark.plans.pipeline import CurateConfig, curate
    from scripts_spark.session import get_spark

    spark = get_spark(
        app_name="bench-control",
        master=f"local[{B.CPUS}]",
        shuffle_partitions=int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", "64")),
        extra_conf={"spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def reply(**kw) -> None:
        sys.stdout.write("@@ " + json.dumps(kw) + "\n")
        sys.stdout.flush()

    def flagship(k: int, buckets: int, snapshot: str):
        return curate(
            B.replicated_pages(spark, B.SF_DIR, k),
            CurateConfig(num_buckets=buckets, input_snapshot=snapshot),
        )

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            c = json.loads(line)
            cmd = c["cmd"]
            if cmd == "quit":
                reply(ok=True)
                break
            if cmd == "settle":
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                time.sleep(1)
                reply(ok=True)
            elif cmd == "warmup":
                t0 = time.perf_counter()
                B.force(flagship(1, int(c.get("buckets", 256)), "warmup"))
                reply(ok=True, sec=round(time.perf_counter() - t0, 3))
            elif cmd in ("q", "digest"):
                name = c["name"]
                if name not in Q.REGISTRY:
                    reply(ok=False, error=f"no such query: {name}")
                    continue
                if cmd == "digest":
                    reply(ok=True, digest=plan_digest(Q.REGISTRY[name](spark, B.SF_DIR)))
                else:
                    t0 = time.perf_counter()
                    B.force(Q.REGISTRY[name](spark, B.SF_DIR))
                    reply(ok=True, sec=round(time.perf_counter() - t0, 3))
            elif cmd in ("curate", "curate_digest"):
                df = flagship(
                    int(c["k"]), int(c.get("buckets", 256)), c.get("snapshot", "bench")
                )
                if cmd == "curate_digest":
                    reply(ok=True, digest=plan_digest(df))
                else:
                    t0 = time.perf_counter()
                    B.force(df)
                    sec = time.perf_counter() - t0
                    spark.catalog.clearCache()
                    reply(ok=True, sec=round(sec, 3))
            else:
                reply(ok=False, error=f"unknown cmd: {cmd}")
        except Exception as ex:  # protocol must survive any query error
            reply(ok=False, error=f"{type(ex).__name__}: {ex}"[:300])
    spark.stop()


if __name__ == "__main__":
    main()
