"""Join operators beyond plain equi-joins: interval (point-in-range)
joins, the fuzzy-match cascade, and multi-match arbitration —
SURVEY.md §2.3 J2/J3/J8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def interval_join(facts: DataFrame, dim: DataFrame, point: Column,
                  start: Column, end: Column, how: str = "inner",
                  inclusive_end: bool = False) -> DataFrame:
    """Point-in-interval join, dimension broadcast (SURVEY J2 —
    fuzzy_matching.py:84, mp-coverage.py:175-178: start <= p < end).
    Broadcasting the dim turns the non-equi join into a BNLJ over a
    small in-memory side — the only sane physical plan for range
    predicates at scale (no shuffle of the fact table)."""
    cond = (point >= start) & ((point <= end) if inclusive_end else (point < end))
    return facts.join(F.broadcast(dim), cond, how)


def fuzzy_match_cascade(facts: DataFrame, dim: DataFrame, fact_key: str,
                        stages: list[tuple[str, Column]]) -> DataFrame:
    """Staged matching with first-hit semantics (SURVEY J3 —
    fuzzy_matching.py:75-103 tries 7 matchers in order and keeps the
    first hit). Each stage is (name, join_condition); stage k+1 joins
    ONLY the left_anti residue of stages <= k, so the reference's
    per-row short-circuit economics carry over set-at-a-time: when the
    cheap exact equi-join resolves 95% of facts, the expensive fuzzy
    stages (levenshtein theta-joins against the broadcast dim) scan
    only the unmatched 5% tail, not the full 10^12-row fact table.
    Unmatched facts survive with match_stage null.

    Within a stage, a fact matching several dim rows keeps a
    deterministic one: row_number ordered by every dim-side column
    (sorted by name). Results are identical to running ALL stages over
    ALL facts and arbitrating on (priority, dim cols) — a fact matched
    at stage k is by construction absent from every later stage —
    which the equivalence test pins."""
    dim_cols = sorted(set(dim.columns) - set(facts.columns))
    # every dim column shadowed by a fact column → nothing to order the
    # arbitration by (matches are then indistinguishable anyway); a
    # constant keeps the window valid instead of an AnalysisException
    order_cols = [F.col(c) for c in dim_cols] or [F.lit(1)]
    remaining = facts
    best = None
    for name, cond in stages:
        m = remaining.join(F.broadcast(dim), cond, "inner").withColumn(
            "match_stage", F.lit(name)
        )
        w = Window.partitionBy(fact_key).orderBy(*order_cols)
        stage_best = (
            m.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        best = stage_best if best is None else best.unionByName(stage_best)
        remaining = remaining.join(
            stage_best.select(fact_key), fact_key, "left_anti"
        )
    missing = remaining.withColumn("match_stage", F.lit(None).cast("string"))
    for c in best.columns:
        if c not in missing.columns:
            missing = missing.withColumn(c, F.lit(None))
    return best.unionByName(missing.select(best.columns))


def lookup_with_arbitration(facts: DataFrame, dim: DataFrame, on: str,
                            value_col: str, multi_label: str = "Multival") -> DataFrame:
    """SURVEY J8 (add-catalog-dob.py:10-17): left join; null if absent,
    the value if unique, `multi_label` if ambiguous."""
    agg = dim.groupBy(on).agg(
        F.count_distinct(value_col).alias("_n"), F.min(value_col).alias("_v")
    )
    out = facts.join(F.broadcast(agg), on, "left")
    return out.withColumn(
        value_col,
        F.when(F.col("_n").isNull(), F.lit(None))
        .when(F.col("_n") > 1, F.lit(multi_label))
        .otherwise(F.col("_v")),
    ).drop("_n", "_v")


def _unique_page_arb(hits: DataFrame, sent_col: str, page_id: str) -> DataFrame:
    """J5 arbitration shared by both containment forms: keep sentences
    found on exactly one distinct page (the reference's early-exit-at-2
    check has identical semantics)."""
    arb = hits.groupBy(sent_col).agg(
        F.count_distinct(page_id).alias("n_pages"), F.min(page_id).alias(page_id)
    )
    return arb.filter(F.col("n_pages") == 1).drop("n_pages")


def containment_join_unique_page(sentences: DataFrame, pages: DataFrame,
                                 sent_col: str = "sentence",
                                 page_text: str = "page_text",
                                 page_id: str = "page") -> DataFrame:
    """SURVEY J5 (add_modern_pagenumbers.py:102-123): locate sentences
    on pages by substring containment; keep only sentences found on
    exactly one distinct page."""
    hits = sentences.join(pages, F.col(page_text).contains(F.col(sent_col)))
    return _unique_page_arb(hits, sent_col, page_id)


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """As-of join: attach to each left row the LATEST right row with
    right.ts <= left.ts, per key (SURVEY custom-operator family; the
    time-series point-in-time lookup).

    Merged-stream window form — the scalable physical strategy: union
    both streams, one sort per key partition, and a running
    last(ignorenulls) carries the most recent right values forward onto
    left rows. No range join, no per-row probe, no broadcast
    requirement on either side; cost is one shuffle on the key plus the
    partition sort both sides already need for any time ordering. Right
    rows order BEFORE left rows at equal timestamps (<= semantics).

    Determinism + atomicity: the carried values travel as ONE struct of
    all value columns, so ties and NULLs can never mix fields from
    different right rows — the carried tuple is always exactly one
    right row (the tuple-MAX of rows tied on (key, ts), since the
    window order tie-breaks on the struct itself and last() then picks
    the greatest). Per-column last(ignorenulls) would instead
    synthesize a row on NULL-containing ties, e.g. tied rows (1, 7)
    and (2, NULL) carrying (2, 7) — a tuple in neither row."""
    l = left.withColumn("_is_left", F.lit(1))
    r = (
        right.select(
            F.col(key), F.col(ts), *[F.col(c).alias(f"_r_{c}") for c in value_cols]
        ).withColumn("_is_left", F.lit(0))
    )
    m = l.unionByName(r, allowMissingColumns=True)
    # non-null only on right rows: ignorenulls skips left rows entirely,
    # and a right row with NULL values still carries (as itself, atomically)
    m = m.withColumn(
        "_r_row",
        F.when(
            F.col("_is_left") == 0,
            F.struct(*[F.col(f"_r_{c}").alias(c) for c in value_cols]),
        ),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_is_left", "_r_row")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = m.withColumn("_r_row", F.last("_r_row", ignorenulls=True).over(w))
    out = m.filter(F.col("_is_left") == 1).drop("_is_left", *[f"_r_{c}" for c in value_cols])
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("_r_row")[c])
    return out.drop("_r_row")


def containment_join_unique_page_indexed(sentences: DataFrame, pages: DataFrame,
                                         sent_col: str = "sentence",
                                         page_text: str = "page_text",
                                         page_id: str = "page") -> DataFrame:
    """Scale form of containment_join_unique_page: identical output,
    built as candidate-prune + exact-verify instead of an all-pairs
    contains() BNLJ (which is quadratic in corpus size — fine for the
    reference's per-protocol page counts, a scale-killer at 10^12
    pages).

    Blocking key: any INTERNAL whitespace token of the sentence — if a
    page contains the sentence as a substring, every internal token is
    flanked by the sentence's own single spaces, so it also appears as
    an exact ' '-delimited token of the page text. The longest internal
    token (ties: lexicographic) is the most selective, and the
    candidate join is then a plain EQUI-join between that token and the
    page's exploded distinct token set — shuffle-partitionable, no
    cross product. contains() then re-verifies each candidate exactly,
    so false candidates cost only the verify. Sentences with < 3
    tokens (no internal token) fall back to the broadcast contains()
    join — broadcastable because such sentences are the rare
    degenerate tail."""
    toks = F.filter(F.split(F.col(sent_col), " "), lambda t: t != "")
    inner = F.slice(toks, 2, F.greatest(F.size(toks) - 2, F.lit(0)))
    block = F.array_max(
        F.transform(inner, lambda t: F.struct(F.length(t).alias("l"), t.alias("t")))
    )["t"]
    s = sentences.withColumn("_blk", block)
    s_idx = s.filter(F.col("_blk").isNotNull())
    s_tail = s.filter(F.col("_blk").isNull()).drop("_blk")

    page_toks = pages.select(
        page_id, page_text,
        F.explode(
            F.array_distinct(F.filter(F.split(F.col(page_text), " "), lambda t: t != ""))
        ).alias("_blk"),
    )
    cand = s_idx.join(page_toks, "_blk").filter(
        F.col(page_text).contains(F.col(sent_col))
    ).drop("_blk")
    # broadcast the TAIL (the rare <3-token sentences), not the page
    # corpus — pages is the side the main path exists to avoid
    # materializing; hinting it for broadcast would OOM the driver at
    # scale and defeat the operator's purpose
    tail_hits = F.broadcast(s_tail).join(
        pages, F.col(page_text).contains(F.col(sent_col))
    )
    hits = cand.select(sent_col, page_id).unionByName(
        tail_hits.select(sent_col, page_id)
    )
    return _unique_page_arb(hits, sent_col, page_id)
