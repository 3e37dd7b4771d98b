"""Checkpoint/resume + metrics: kill-and-rerun must produce output
identical to a single clean run (north rule resumability)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from scripts_spark.plans.pipeline import CurateConfig, curate
from scripts_spark.sources import catalog
from scripts_spark.sources.pages import pages_df

CFG = CurateConfig(num_buckets=8)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _decisions(spark):
    return curate(pages_df(spark, 300, partitions=4), CFG)


def test_resume_after_partial_commit(spark, outdir):
    dec = _decisions(spark)

    # simulate a crashed run: only buckets 0-3 committed
    partial = dec.filter(F.col("bucket") < 4)
    catalog.commit_buckets(partial, outdir)
    assert catalog.completed_buckets(spark, outdir) == {0, 1, 2, 3}

    # resume: recompute, anti-join manifest, commit the rest
    stats = catalog.commit_buckets(_decisions(spark), outdir)
    assert stats["committed_buckets"] == 4  # only the missing buckets

    # full clean run for comparison
    clean = tempfile.mkdtemp()
    try:
        catalog.commit_buckets(_decisions(spark), clean)
        got = {
            (r["url"], r["doc_id"], r["keep"])
            for r in catalog.read_output(spark, outdir).collect()
        }
        want = {
            (r["url"], r["doc_id"], r["keep"])
            for r in catalog.read_output(spark, clean).collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(clean, ignore_errors=True)


def test_mid_commit_crash_leaves_no_duplicates(spark, outdir):
    """Crash BETWEEN the data write and the manifest append: the orphan
    bucket files must be (a) invisible to read_output and (b) replaced,
    not appended to, by the resumed run."""
    dec = _decisions(spark)
    # simulate the torn commit: bucket 2's data written, manifest never
    # appended (exactly what catalog.commit_buckets writes, minus the
    # manifest step)
    (
        dec.filter(F.col("bucket") == 2)
        .withColumn("job_id", F.lit(0).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("job_id", "bucket")
        .parquet(outdir + "/data")
    )
    assert catalog.read_output(spark, outdir).count() == 0  # orphan invisible

    stats = catalog.commit_buckets(_decisions(spark), outdir)
    assert stats["committed_buckets"] == 8  # bucket 2 NOT skipped
    out = catalog.read_output(spark, outdir)
    assert out.count() == dec.count()
    assert out.select("url").distinct().count() == out.count()  # no dups


def test_recommit_is_noop(spark, outdir):
    catalog.commit_buckets(_decisions(spark), outdir)
    stats = catalog.commit_buckets(_decisions(spark), outdir)
    assert stats["committed_buckets"] == 0 and stats["rows"] == 0


def test_partition_metrics(spark):
    dec = _decisions(spark)
    m = catalog.partition_metrics(dec).collect()
    assert {r["bucket"] for r in m} <= set(range(8))
    total = sum(r["n_rows"] for r in m)
    assert total == dec.count()
    assert sum(r["n_lang"] for r in m) > 0  # reason metrics populated


def test_metrics_written_at_commit(spark, outdir):
    dec = _decisions(spark)
    catalog.commit_buckets(dec.filter(F.col("bucket") < 4), outdir)
    catalog.commit_buckets(_decisions(spark), outdir)
    # recommit is a no-op and must not duplicate metrics rows
    catalog.commit_buckets(_decisions(spark), outdir)
    m = catalog.metrics_log(spark, outdir)
    rows = m.collect()
    assert len(rows) == 8  # one row per committed (job_id=0, bucket)
    assert sum(r["n_rows"] for r in rows) == dec.count()
    assert sum(r["n_kept"] for r in rows) == dec.filter("keep").count()
    # reason-level columns present and populated
    assert sum(r["n_lang"] for r in rows) > 0
    # time travel applies to metrics too
    assert catalog.metrics_log(spark, outdir, as_of=0).count() == 4


def test_snapshot_time_travel(spark, outdir):
    dec = _decisions(spark)
    catalog.commit_buckets(dec.filter(F.col("bucket") < 4), outdir)
    catalog.commit_buckets(_decisions(spark), outdir)

    snaps = catalog.snapshots(spark, outdir).collect()
    assert [s["commit_seq"] for s in snaps] == [0, 1]

    v0 = catalog.read_output(spark, outdir, as_of=0)
    v1 = catalog.read_output(spark, outdir, as_of=1)
    full = catalog.read_output(spark, outdir)
    assert set(r["bucket"] for r in v0.select("bucket").distinct().collect()) == {0, 1, 2, 3}
    assert v1.count() == full.count() > v0.count()


def test_resume_with_para_dedup_stage(spark, outdir):
    """Resume semantics extend through the corpus paragraph-dedup
    stage: its survivor rule (corpus-wide min (url, pidx)) is a pure
    function of the FULL input, so a resumed run — which recomputes
    globally but commits only the missing buckets — must reproduce
    byte-identical scrubbed text, reasons, and doc ids for every url,
    including docs whose paragraphs were deduped against docs living
    in already-committed buckets."""
    cfg = CurateConfig(num_buckets=8, para_dedup=True)

    def dec():
        df = pages_df(spark, 300, partitions=4)
        # plant cross-bucket duplicate content so dedup decisions span
        # the commit boundary: copy doc texts onto fresh urls
        extra = df.limit(0)
        dup = df.filter(F.xxhash64("url") % 10 == 0).select(
            F.concat(F.lit("https://resume-dup.example.com/"),
                     F.sha1("url")).alias("url"),
            "warc_ts", "html", "text", "lang",
        )
        return curate(df.unionByName(dup).unionByName(extra), cfg)

    partial = dec().filter(F.col("bucket") < 4)
    catalog.commit_buckets(partial, outdir)
    stats = catalog.commit_buckets(dec(), outdir)
    assert stats["committed_buckets"] == 4

    clean = tempfile.mkdtemp()
    try:
        catalog.commit_buckets(dec(), clean)
        cols = ["url", "doc_id", "keep", "scrubbed_text"]
        got = {tuple(r[c] for c in cols)
               for r in catalog.read_output(spark, outdir).select(cols).collect()}
        want = {tuple(r[c] for c in cols)
                for r in catalog.read_output(spark, clean).select(cols).collect()}
        assert got == want and len(got) > 300
        reasons = catalog.read_output(spark, outdir).select(
            F.explode("filter_reasons").alias("r")).distinct().collect()
        assert "para_dup_frac" in {r["r"] for r in reasons}
    finally:
        shutil.rmtree(clean, ignore_errors=True)
