"""Regression pins for the round-6 review findings: shared-state-dir
watermark collision, curate cache hygiene, oracle mode validation."""

from __future__ import annotations

import pytest

from scripts_spark.plans.pipeline import (
    CurateConfig,
    curate,
    drain_curate_persisted,
)
from scripts_spark.sources.pages import pages_df
from scripts_spark.streaming.jobs import stream_curate


def test_stream_curate_rejects_shared_state_dir(spark, tmp_path):
    # both stores keep their watermark at <dir>/COMPACTED_THROUGH; a
    # shared dir would let one stage's compaction mis-scope the other's
    with pytest.raises(ValueError, match="distinct"):
        stream_curate(
            spark,
            str(tmp_path / "in"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            CurateConfig(para_dedup=True),
            boiler_state_dir=str(tmp_path / "state"),
            span_state_dir=str(tmp_path / "state"),
        )


def test_curate_persists_are_drainable(spark):
    # relative to a baseline snapshot: the shared suite session may
    # carry caches owned by OTHER tests, and the whole point of the
    # drain is to release exactly curate's frames and nobody else's
    drain_curate_persisted()  # start with no curate-owned frames
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    dec = curate(pages_df(spark, 300, partitions=4), CurateConfig(num_buckets=4))
    dec.count()
    assert jsc.getPersistentRDDs().size() > baseline  # curate cached internally
    drain_curate_persisted()
    assert jsc.getPersistentRDDs().size() == baseline  # ... and released them all


def test_oracle_rejects_unknown_near_dedup_mode():
    from scripts_spark.oracle.pipeline_oracle import OracleConfig, curate_rows

    cfg = OracleConfig(near_dedup=True, near_dedup_mode="neighbour")
    rows = [
        {"url": "https://a.se/1", "warc_ts": 1, "html": None,
         "text": "ett två tre fyra fem sex sju åtta nio tio", "lang": "sv"},
    ]
    with pytest.raises(ValueError, match="near_dedup_mode"):
        curate_rows(rows, cfg)
