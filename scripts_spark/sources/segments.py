"""Deterministic synthetic generator for the segments table
(FIXTURES.md §2) — the TEI element-stream shape used to exercise the
window/sessionization operators exactly as the reference's
split_into_sections.py / merge_utterances.py consume it."""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

SEGMENTS_SCHEMA = (
    "url string, pos long, elem_type string, elem_id string, "
    "type_attr string, who string, facs string, when_attr string, "
    "text string, prev string, next string"
)

_SPEAKERS = ["anders_a", "berit_b", "carl_c", "unknown"]


def gen_doc(i: int, seed: int = 42) -> list[dict]:
    rnd = random.Random(i * 7919 + seed)
    url = f"https://prot.example.se/{1900 + i % 100}/prot-{i}"
    rows: list[dict] = []
    pos = 0

    def emit(elem_type, **kw):
        nonlocal pos
        rows.append(
            {
                "url": url,
                "pos": pos,
                "elem_type": elem_type,
                "elem_id": f"i-{i}-{pos}",
                "type_attr": kw.get("type_attr"),
                "who": kw.get("who"),
                "facs": kw.get("facs"),
                "when_attr": kw.get("when_attr"),
                "text": kw.get("text"),
                "prev": kw.get("prev"),
                "next": kw.get("next"),
            }
        )
        pos += 1

    emit("docDate", when_attr=f"{1900 + i % 100}-{rnd.randint(1,12):02d}-{rnd.randint(1,28):02d}",
         text="Sammanträdesdatum")
    if rnd.random() < 0.3:
        emit("docDate", when_attr=f"{1900 + i % 100}-{rnd.randint(1,12):02d}-{rnd.randint(1,28):02d}",
             text="Andra datum")
    page = 1
    for _ in range(rnd.randint(3, 8)):  # sections
        if rnd.random() < 0.7:
            emit("pb", facs=f"page-{page}")
            page += 1
        emit("note", text=f"§ {rnd.randint(1, 30)}. Ärende")
        if rnd.random() < 0.75:  # debate section
            for _ in range(rnd.randint(1, 3)):
                who = rnd.choice(_SPEAKERS)
                emit("note", type_attr="speaker", text=f"Herr {who.upper()}:")
                for _ in range(rnd.randint(1, 4)):
                    emit(
                        "u",
                        who=who,
                        text=f"Anförande {rnd.randint(1, 999)} av {who}.",
                        prev="x" if rnd.random() < 0.5 else None,
                        next="y" if rnd.random() < 0.5 else None,
                    )
        else:  # comment section
            for _ in range(rnd.randint(1, 3)):
                emit("note", text=f"Kommentar {rnd.randint(1, 999)}.")
            if rnd.random() < 0.4:
                emit("u", who="unknown", text="Vilsekommen replik.")
    return rows


def gen_docs(n: int, seed: int = 42) -> list[dict]:
    out: list[dict] = []
    for i in range(n):
        out.extend(gen_doc(i, seed))
    return out


def segments_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_docs(n, seed), SEGMENTS_SCHEMA)
