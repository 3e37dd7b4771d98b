"""SURVEY §3.2 lifecycle — classify_intros → resegment — as ONE
distributed plan: extract → infer → apply.

The reference runs this as three processes with a CSV handoff
(/root/reference/src/cur-prot/classify_intros.py:21-90 writes
intros.csv; /root/reference/src/cur-prot/resegment.py:41-65 re-reads
the whole corpus, filters ids per protocol, and rewrites the lxml
tree). Here the id handoff is a DataFrame join, the tree rewrite is a
window relabel over (url, pos), and the model runs inside mapInPandas
with per-executor init (M2) — no intermediate files, no second corpus
scan.

Scale notes: the classifier cost is O(distinct tokens) via the
vocabulary-dedup scorer; the relabel + re-sectioning pass shares one
(url)-partitioned window; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from scripts_spark.functions import model_scoring as MS
from scripts_spark.operators import windows as W


def reclassify_targets() -> Column:
    """Elements the classifier may relabel: u/seg bodies and plain
    notes. Speaker intros (note[@type=speaker]) and structural elements
    (pb, docDate) keep their tags — same exclusions the reference's
    per-protocol loop applies (resegment.py:41-63)."""
    structural = F.col("elem_type").isin("pb", "docDate")
    speaker_note = (F.col("elem_type") == "note") & (F.col("type_attr") == "speaker")
    return ~structural & ~speaker_note


def resegment(segs: DataFrame) -> DataFrame:
    """extract → infer → apply:

    1. extract: the segments frame IS the flat (url, pos, elem_id,
       text) shape (reference classify_intros.py:21-30);
    2. infer: M2 classifier over the distinct vocabulary, one
       prediction per target element (u vs note);
    3. apply: join predictions back by elem_id, relabel, then recompute
       document structure with the window operators — sectionize (W1),
       re-type sections (W2), demote pre-intro utterances (W4) — the
       set-at-a-time form of the reference's per-protocol tree rewrite.

    Returns the segments frame with relabeled elem_type plus
    (section_id, section_type)."""
    targets = segs.filter(reclassify_targets())
    preds = MS.classify_docs(targets, key="elem_id", text_col="text").select(
        "elem_id", "pred"
    )
    j = segs.join(preds, "elem_id", "left")
    relabeled = j.withColumn(
        "elem_type",
        F.when(reclassify_targets() & F.col("pred").isNotNull(), F.col("pred")).otherwise(
            F.col("elem_type")
        ),
    ).drop("pred")
    s = W.sessionize_sections(relabeled, W.section_break_expr())
    s = W.type_sections(s)
    return W.demote_pre_intro(s)
