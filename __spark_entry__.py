"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship curation pipeline (langid +
quality rules + PII scrub + lineage) over a pages table derived
deterministically from the sf0.001 ``documents`` parquet.

``queries()`` / ``oracle_sql()`` expose the operator registry in
scripts_spark/plans/queries.py — each entry is a SURVEY.md §2 operator
family expressed Spark-first with a DuckDB-parity oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from scripts_spark.plans import queries as Q
from scripts_spark.plans.pipeline import CurateConfig, curate

SF0001 = "/root/testdata/sf0.001"


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically reshape the driver's documents table into the
    engine's input shape (url, warc_ts, html, text, lang)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.se/2020/page-"), F.col("doc_id")
        ).alias("url"),
        (F.to_timestamp(F.lit("2020-01-01 00:00:00")) + F.make_dt_interval(secs=F.col("doc_id"))).alias(
            "warc_ts"
        ),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "utf-8").alias(
            "html"
        ),
        F.col("text"),
        F.col("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Input = the sf0.001 documents table reshaped to the pages schema
    (all English → dropped as 'lang': the engine is a Swedish quality
    filter) UNION a deterministic synthesized Swedish slice, so the
    output exhibits the full keep/drop/reason mixture."""
    from scripts_spark.sources.pages import pages_df

    pages = pages_from_documents(spark, SF0001).unionByName(
        pages_df(spark, 300, partitions=4)
    )
    out = curate(pages, CurateConfig(num_buckets=16, input_snapshot="sf0.001"))
    return out.select(
        "url",
        "warc_ts",
        "lang_pred",
        "lang_conf",
        "perplexity",
        "keep",
        "filter_reasons",
        "scrubbed_text",
        "doc_id",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.REGISTRY)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
