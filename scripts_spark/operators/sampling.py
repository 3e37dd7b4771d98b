"""Deterministic sampling operators — SURVEY.md §2.9 R1/R2/R4.

All sampling is derived from content hashes or fixed seeds; reruns and
retries produce identical samples (the reference seeds its RNG from
md5(seed_string), sample_pages_new.py:144-145 — same idea, no RNG
state at all here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_order(*cols: Column, seed: int = 0) -> Column:
    """Deterministic pseudo-random ordering key."""
    return F.xxhash64(*cols, F.lit(seed))


def _salted_top_n(df: DataFrame, strata: list[str], order_cols: list[Column],
                  n: int, id_col: str) -> DataFrame:
    """Top-n per stratum under a TOTAL order, without a per-stratum
    global sort (r7, guide §2.5): stage 1 ranks within
    (strata, pmod(xxhash64(id), 64)) and keeps n per salt — every true
    top-n row is within its own salt's top-n — stage 2 ranks the
    ≤ 64·n survivors per stratum. Bit-identical to the single-window
    form because the order (incl. the id tie-break) is total; no task
    ever sorts more than a 1/64 slice of a Zipf-hot stratum."""
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(64))
    w1 = Window.partitionBy(*strata, "_salt").orderBy(*order_cols)
    w2 = Window.partitionBy(*strata).orderBy(*order_cols)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= n)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= n)
        .drop("_salt", "_rn1", "_rn")
    )


def stratified_fixed_n(df: DataFrame, strata: list[str], n: int,
                       id_col: str, seed: int = 0) -> DataFrame:
    """R2: n rows per stratum, hash-ordered (sample_intros.py:37-43)."""
    return _salted_top_n(
        df, strata, [hash_order(F.col(id_col), seed=seed), F.col(id_col)], n, id_col
    )


def weighted_stratum_sample(df: DataFrame, stratum: str, weight: str,
                            id_col: str, n: int, seed: int = 0) -> DataFrame:
    """R1: weighted sample without replacement per stratum via the
    exponential-sort trick (weighted reservoir sampling, Efraimidis-
    Spirakis): key = -ln(u)/w with u derived deterministically from
    the id hash; smallest n keys win. Distributed: salted two-stage
    top-n (see _salted_top_n), no driver loop (reference:
    sample_pages_new.py:41-69 decade loop)."""
    u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(2**31)) + 1).cast(
        "double"
    ) / F.lit(float(2**31 + 1))
    key = -F.log(u) / F.col(weight).cast("double")
    return _salted_top_n(df, [stratum], [key.asc(), F.col(id_col)], n, id_col)


def deterministic_shuffle(df: DataFrame, id_col: str, seed: int = 0) -> DataFrame:
    """R4: seeded shuffle = global sort by hash (fuzzy_matching.py:71-73)."""
    return df.orderBy(hash_order(F.col(id_col), seed=seed), id_col)


def head_tail_slice(df: DataFrame, strata: list[str], order_col: Column,
                    head: int, tail: int) -> DataFrame:
    """R3: rows [head, tail) per stratum in a deterministic order
    (sample_paragraphs.py:99-118 uuid-ordinal slice)."""
    w = Window.partitionBy(*strata).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > head) & (F.col("_rn") <= tail))
        .drop("_rn")
    )
