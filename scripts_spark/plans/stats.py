"""Corpus statistics — the reference's stats-dashboard scan
(/root/reference/src/stats-dashboard/generate-markdown.py:100-152)
as one aggregation: per protocol-year, the number of protocols, pages
(pb elements), speeches (note[@type=speaker]) and words (whitespace
tokens of u-element text). These are exactly the numbers BASELINE.md
quotes from the reference's descr_stats CSVs.

The reference walks every XML file in a tqdm loop, one process; here
it is a single partial-agg'd groupBy over the segments frame — one
shuffle regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def year_of_url(col: Column) -> Column:
    """The reference infers the year from the protocol path
    (generate-markdown.py:122); our segment urls carry /<year>/."""
    return F.regexp_extract(col, "/([0-9]{4})/", 1).cast("int")


def corpus_stats(segs: DataFrame) -> DataFrame:
    """(year, n_protocols, n_pages, n_speeches, n_words) — the
    count_pages_speeches_words totals rolled up per year."""
    is_pb = (F.col("elem_type") == "pb").cast("long")
    is_speech = (
        (F.col("elem_type") == "note") & (F.col("type_attr") == "speaker")
    ).cast("long")
    # reference word count: split(' '), keep tokens with len>0 that are
    # not a bare newline (generate-markdown.py:113)
    words = F.when(
        (F.col("elem_type") == "u") & F.col("text").isNotNull(),
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: (t != "") & (t != "\n"))),
    ).otherwise(F.lit(0)).cast("long")
    return (
        segs.groupBy(year_of_url(F.col("url")).alias("year"))
        .agg(
            F.count_distinct("url").alias("n_protocols"),
            F.sum(is_pb).alias("n_pages"),
            F.sum(is_speech).alias("n_speeches"),
            F.sum(words).alias("n_words"),
        )
        .orderBy("year")
    )


def version_trend(per_version: DataFrame, version_col: str = "version",
                  value_cols: list[str] | None = None) -> DataFrame:
    """Per-release trend table
    (/root/reference/src/stats-dashboard/generate-markdown.py:233-340,
    /root/reference/src/accuracy_version_plot.py:11-58): rows ordered by
    SEMVER (split-cast major/minor/patch — the O4 sort, not
    lexicographic), with a release_seq ordinal and the delta vs the
    PREVIOUS release for every value column. The release table is tiny
    (one row per published version), so the single-partition window is
    the right plan.

    Constraint: versions must be three-part semver (vX.Y.Z) — a
    two-part version yields a null patch ordinal, and null ordering
    differs between engines (Spark nulls-first vs DuckDB nulls-last),
    so mixed-arity version lists would not be portable."""
    value_cols = value_cols or [
        c for c in per_version.columns if c != version_col
    ]
    parts = F.split(F.regexp_replace(F.col(version_col), "^v", ""), "\\.")
    w = Window.orderBy(
        parts[0].cast("int"), parts[1].cast("int"), parts[2].cast("int")
    )
    out = per_version.withColumn("release_seq", F.row_number().over(w))
    for c in value_cols:
        out = out.withColumn(f"delta_{c}", F.col(c) - F.lag(c).over(w))
    return out


def snapshot_trend(spark, base: str) -> DataFrame:
    """The commit-snapshot log as a trend series: each commit_seq is a
    'release' of the output table; deltas of buckets/rows/kept between
    consecutive snapshots (the version-over-version dashboard over the
    engine's own snapshot substrate, sources/catalog.snapshots)."""
    from scripts_spark.sources import catalog

    snap = catalog.snapshots(spark, base)
    w = Window.orderBy("commit_seq")
    for c in ("n_buckets", "n_rows", "n_kept"):
        snap = snap.withColumn(f"delta_{c}", F.col(c) - F.lag(c).over(w))
    return snap
