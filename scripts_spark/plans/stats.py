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

from pyspark.sql import Column, DataFrame, functions as F


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
