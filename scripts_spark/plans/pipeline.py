"""The flagship curation job: one DataFrame lineage from the pages
table to per-document keep/drop decisions.

Re-expresses the reference post-pipeline
(/root/reference/src/cur-prot/post-pipeline.py:135-146 — eleven full
corpus passes, one subprocess each) as a single declarative plan:

    scan → url-dedup → salted bucket repartition → paragraph explode →
    OCR repair chain → domain-boilerplate strip (cross-doc agg) →
    reassemble + PII scrub → vocab-dedup langid → bigram perplexity →
    quality rules → keep/filter_reasons/lineage → write

Scale design notes (100 TB / 1000 executors):
- ingest is repartitioned on pmod(xxhash64(url, salt), P) — the salt
  defuses Zipfian hot domains feeding any per-bucket work (SURVEY §4);
- the boilerplate detector is a (domain, line) partial-aggregated
  count — map-side combine keeps the shuffle proportional to distinct
  lines, not total lines;
- langid/perplexity shuffles are per-url aggregations with integer
  sums (exact, order-free) and AQE handles skew/coalescing;
- all decision thresholds are integer cross-multiplications — no
  float compares anywhere in keep/drop.

Every threshold is configurable via CurateConfig; thresholds are part
of the rule version map in the lineage struct.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import chain

from pyspark.sql import Column, DataFrame, Window, functions as F

from scripts_spark.functions import ids, langid, langmodel, perplexity, text_kernel
from scripts_spark.sources.pages import domain_of

PIPELINE_VERSION = "1.0"


@dataclass(frozen=True)
class CurateConfig:
    min_chars: int = 140
    # repetition: drop when n_distinct / n_tokens < rep_num/rep_den
    rep_num: int = 3
    rep_den: int = 10
    rep_min_tokens: int = 20
    word_len_min: int = 2  # mean token length bounds
    word_len_max: int = 14
    digit_num: int = 3  # digit ratio > 3/10 → drop
    digit_den: int = 10
    caps_num: int = 5  # uppercase ratio > 5/10 → drop
    caps_den: int = 10
    caps_min_letters: int = 20
    boiler_min_docs: int = 2  # line boilerplate iff in > this many docs
    boiler_frac_num: int = 1  # ... and in > 1/10 of the domain's docs
    boiler_frac_den: int = 10
    boiler_doc_num: int = 1  # doc reason iff > 1/2 of paragraphs stripped
    boiler_doc_den: int = 2
    num_buckets: int = 64
    salt: int = 0
    input_snapshot: str = "fixture-v1"

    def rule_versions(self) -> dict[str, str]:
        rv = dict(text_kernel.KERNEL_VERSIONS)
        rv["pipeline"] = PIPELINE_VERSION
        rv["thresholds"] = (
            f"len{self.min_chars}-rep{self.rep_num}/{self.rep_den}"
            f"-ppx{langmodel.PPX_THRESHOLD_MILLI}"
        )
        return rv


def repaired_paragraphs(pages: DataFrame, cfg: CurateConfig) -> DataFrame:
    """url-dedup'd pages → one row per non-empty repaired paragraph."""
    w = Window.partitionBy("url").orderBy("warc_ts", "text")
    docs = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("url"), F.lit(cfg.salt)), F.lit(cfg.num_buckets)),
        )
        .withColumn("domain", domain_of(F.col("url")))
    )
    # explicit salted repartition before the heavy per-paragraph work
    docs = docs.repartition(cfg.num_buckets, "bucket")
    raw = F.col("raw_para")
    repaired = text_kernel.fix_capitalized_dashes(
        text_kernel.join_soft_hyphens(text_kernel.dollar_signs(raw))
    )
    return (
        docs.select(
            "url",
            "bucket",
            "domain",
            "warc_ts",
            F.col("lang").alias("lang_tag"),
            F.posexplode(F.split(F.coalesce(F.col("text"), F.lit("")), "\n")).alias(
                "pos", "raw_para"
            ),
        )
        .withColumn("para", repaired)
        .filter(F.col("para") != "")
    )


def boilerplate_lines(paras: DataFrame, cfg: CurateConfig) -> DataFrame:
    """(domain, para) pairs that are domain-level boilerplate: the line
    appears in > boiler_min_docs docs AND in > frac of the domain's
    docs. Pure partial-agg'd counts — no driver collection."""
    dom_docs = paras.groupBy("domain").agg(
        F.count_distinct("url").alias("domain_docs")
    )
    line_docs = paras.groupBy("domain", "para").agg(
        F.count_distinct("url").alias("line_docs")
    )
    return (
        line_docs.join(dom_docs, "domain")
        .filter(
            (F.col("line_docs") > cfg.boiler_min_docs)
            & (
                F.col("line_docs") * cfg.boiler_frac_den
                > F.col("domain_docs") * cfg.boiler_frac_num
            )
        )
        .select("domain", "para")
        .withColumn("is_boiler", F.lit(True))
    )


def assemble_docs(pages: DataFrame, cfg: CurateConfig) -> DataFrame:
    """Paragraph-level frame → one row per url with scrubbed_text and
    paragraph counts. Docs whose text was empty still appear (left
    join from the deduped url universe)."""
    paras = repaired_paragraphs(pages, cfg)
    boiler = boilerplate_lines(paras, cfg)
    flagged = paras.join(boiler, ["domain", "para"], "left")

    kept_struct = F.when(
        F.col("is_boiler").isNull(), F.struct(F.col("pos"), F.col("para"))
    )
    per_url = flagged.groupBy("url").agg(
        F.count(F.lit(1)).alias("paras_total"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias("paras_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["para"]
            ),
            "\n",
        ).alias("joined_text"),
    )

    w = Window.partitionBy("url").orderBy("warc_ts", "text")
    universe = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "url",
            "warc_ts",
            F.col("lang").alias("lang_tag"),
            F.pmod(F.xxhash64(F.col("url"), F.lit(cfg.salt)), F.lit(cfg.num_buckets)).alias(
                "bucket"
            ),
            domain_of(F.col("url")).alias("domain"),
        )
    )
    docs = (
        universe.join(per_url, "url", "left")
        .withColumn("paras_total", F.coalesce("paras_total", F.lit(0)))
        .withColumn("paras_boiler", F.coalesce("paras_boiler", F.lit(0)))
        .withColumn(
            "scrubbed_text",
            text_kernel.scrub_pii(F.coalesce(F.col("joined_text"), F.lit(""))),
        )
        .drop("joined_text")
    )
    return docs


def _reasons(cfg: CurateConfig, c: dict[str, Column]) -> Column:
    """Ordered reason array; every test is integer-exact."""
    tests = [
        ("min_length", c["n_chars"] < cfg.min_chars),
        (
            "repetition",
            (c["n_tokens"] >= cfg.rep_min_tokens)
            & (c["n_distinct"] * cfg.rep_den < c["n_tokens"] * cfg.rep_num),
        ),
        (
            "word_length",
            (c["n_tokens"] > 0)
            & (
                (c["tok_chars"] < c["n_tokens"] * cfg.word_len_min)
                | (c["tok_chars"] > c["n_tokens"] * cfg.word_len_max)
            ),
        ),
        (
            "digit_ratio",
            (c["n_chars"] > 0) & (c["n_digits"] * cfg.digit_den > c["n_chars"] * cfg.digit_num),
        ),
        (
            "caps_ratio",
            (c["n_letters"] > cfg.caps_min_letters)
            & (c["n_upper"] * cfg.caps_den > c["n_letters"] * cfg.caps_num),
        ),
        (
            "boilerplate",
            (c["paras_total"] > 0)
            & (c["paras_boiler"] * cfg.boiler_doc_den > c["paras_total"] * cfg.boiler_doc_num),
        ),
        ("lang", c["lang_pred"] != "sv"),
        ("perplexity", c["ppx_flag"]),
    ]
    arr = F.array(*[F.when(cond, F.lit(name)) for name, cond in tests])
    return F.array_sort(F.filter(arr, lambda x: x.isNotNull()))


def curate(pages: DataFrame, cfg: CurateConfig | None = None) -> DataFrame:
    """Full pipeline → decision frame (SURVEY.md §7.0 output schema +
    bucket column for manifests/metrics)."""
    cfg = cfg or CurateConfig()
    docs = assemble_docs(pages, cfg)

    tok = langid.token_stats(docs)  # url, n_tokens, n_distinct, tok_chars, lang_score
    ppx = perplexity.ppx_stats(docs)  # url, ppx_sum, n_bigrams

    d = (
        docs.join(tok, "url", "left")
        .join(ppx, "url", "left")
        .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)))
        .withColumn("n_distinct", F.coalesce("n_distinct", F.lit(0)))
        .withColumn("tok_chars", F.coalesce("tok_chars", F.lit(0)))
        .withColumn("lang_score", F.coalesce("lang_score", F.lit(0)))
        .withColumn("ppx_sum", F.coalesce("ppx_sum", F.lit(0)))
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
    )
    st = F.col("scrubbed_text")
    d = (
        d.withColumn("n_chars", F.length(st))
        .withColumn("n_digits", F.length(st) - F.length(F.regexp_replace(st, "[0-9]", "")))
        .withColumn(
            "n_letters", F.length(st) - F.length(F.regexp_replace(st, "[A-Za-zÀ-þ]", ""))
        )
        .withColumn(
            "n_upper", F.length(st) - F.length(F.regexp_replace(st, "[A-ZÀ-Þ]", ""))
        )
        .withColumn("lang_pred", langid.lang_pred_expr(F.col("lang_score")))
        .withColumn("lang_conf", langid.lang_conf_expr(F.col("lang_score")))
        .withColumn(
            "perplexity", perplexity.perplexity_expr(F.col("ppx_sum"), F.col("n_bigrams"))
        )
        .withColumn(
            "ppx_flag", perplexity.ppx_reason_expr(F.col("ppx_sum"), F.col("n_bigrams"))
        )
    )
    cols = {
        n: F.col(n)
        for n in [
            "n_chars",
            "n_tokens",
            "n_distinct",
            "tok_chars",
            "n_digits",
            "n_letters",
            "n_upper",
            "paras_total",
            "paras_boiler",
            "lang_pred",
            "ppx_flag",
        ]
    }
    rv = cfg.rule_versions()
    lineage = F.struct(
        F.col("bucket").cast("string").alias("source_partition"),
        F.create_map(
            *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in sorted(rv.items()))
        ).alias("rule_versions"),
        F.lit(cfg.input_snapshot).alias("input_snapshot"),
    )
    d = (
        d.withColumn("filter_reasons", _reasons(cfg, cols))
        .withColumn("keep", F.size("filter_reasons") == 0)
        .withColumn("doc_id", ids.doc_id_expr(F.col("url"), st))
        .withColumn("lineage", lineage)
    )
    return d.select(
        "url",
        "warc_ts",
        "lang_pred",
        "lang_conf",
        "perplexity",
        "keep",
        "filter_reasons",
        "scrubbed_text",
        "lineage",
        "doc_id",
        "bucket",
        "n_tokens",
    )
