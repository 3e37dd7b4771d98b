"""The flagship curation job: one DataFrame lineage from the pages
table to per-document keep/drop decisions.

Re-expresses the reference post-pipeline
(/root/reference/src/cur-prot/post-pipeline.py:135-146 — eleven full
corpus passes, one subprocess each) as a single declarative plan:

    scan → url-dedup (map-side-combined min) → salted repartition →
    per-row paragraph repair (array-side, zero shuffle) →
    domain-boilerplate detection (the one genuine cross-doc agg) →
    broadcast boiler-set back → per-row strip + PII scrub +
    token stats + langid + bigram perplexity → decisions → write

Scale design (100 TB / 1000 executors):
- text transforms (OCR repair, boiler strip, PII scrub, char counts)
  are array-side Column math in one whole-stage-codegen pass per row —
  no explode/regroup for anything that is per-document;
- the genuine cross-row work is the (domain, line) boilerplate count:
  one partial-agg'd shuffle whose tiny result broadcasts back;
- model lookups (langid word scores, bigram LM costs) go through
  vocabulary-dedup + broadcast hash joins, NOT map literals: Spark map
  lookups are linear scans, so a 1.4k-entry literal costs ~70k string
  compares per doc (measured 135s vs 10s per 200k docs at local[8]),
  and literals cap out long before a real LM table would fit anyway.
  The same seam accepts the mapInPandas scorer in
  functions/model_scoring.py for genuinely expensive models;
- plus the url-dedup window and the explicit salted bucket
  repartition (north rule). Every shuffle partial-aggregates map-side
  and scales with cores; AQE coalesces/splits at runtime;
- all keep/drop thresholds are integer cross-multiplications; langid
  and perplexity sums are exact longs — no float-order
  nondeterminism anywhere.

Every threshold is configurable via CurateConfig; thresholds are part
of the rule version map in the lineage struct.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import chain

from pyspark.sql import Column, DataFrame, Window, functions as F

from scripts_spark.functions import ids, langid, langmodel, perplexity, scoring_join, scoring_udf, text_kernel
from scripts_spark.functions import html_extract
from scripts_spark.sources.pages import domain_of

PIPELINE_VERSION = "1.2"  # 1.2: toxicity lexicon scrub after PII
# The opt-in paragraph-dedup and near-dedup stages do NOT bump this:
# with them off, row semantics (and the physical plan, byte-for-byte)
# are exactly 1.2 — bench plan-identity digests depend on that — and
# with a stage on, the lineage carries its own "para_dedup" /
# "near_dedup" rule-version key.


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
    # physical shuffle partitions for the scoring stage; None → sized
    # at runtime to max(num_buckets, 4x cores). Independent of
    # num_buckets, which is only the commit/manifest unit.
    target_partitions: int | None = None
    input_snapshot: str = "fixture-v1"
    persist_intermediate: bool = True
    scorer: str = "arrow"  # "arrow" | "join"
    # "salted" (production): repartition on (url-hash bucket, intra-
    # bucket salt) — uniform under ANY domain distribution. "domain":
    # the naive co-locate-by-domain exchange, kept ONLY as the skew
    # bench's control arm (bench.py _skew_block) so the salt's
    # flattening effect on a Zipfian hot-domain input is a measured
    # number, not a design argument. Output is identical either way —
    # the knob changes physical layout only.
    repartition_mode: str = "salted"  # "salted" | "domain"
    # opt-in CORPUS-WIDE paragraph dedup (the C4/Dolma pattern) after
    # boilerplate strip, before the quality rules: a paragraph
    # repeated across documents survives only at its corpus-wide first
    # occurrence (min (url, idx)); the para_dup_frac reason fires when
    # > para_dup_num/para_dup_den of a doc's post-boiler paragraphs
    # were such repeats (Gopher's duplicate-paragraph-fraction rule).
    para_dedup: bool = False
    para_dup_num: int = 3
    para_dup_den: int = 10
    # opt-in corpus-wide NEAR-dedup (the FineWeb/Lee-et-al fuzzy-dedup
    # pattern) over the post-boiler (and post-paragraph-dedup, if on)
    # kept text: MinHash signatures → banded-LSH candidates → exact
    # shingle-Jaccard verify at threshold near_dup_num/near_dup_den
    # (integer cross-multiplication on the verify counts — no float
    # compare), then one survivor per duplicate cluster. The loser
    # docs gain the "near_dup" filter reason. Two survivor rules:
    # - "component" (default, the published pattern): connected
    #   components over the verified pair graph, survivor = min url
    #   per component. Label propagation is iterative, so with this
    #   mode ON curate() runs Spark jobs at plan-build time (CC
    #   rounds) instead of staying a pure lazy plan builder;
    # - "neighbor": drop a doc iff a verified pair links it to a
    #   strictly-smaller url. Single aggregation, fully lazy, no
    #   transitive chaining (a long a~b~c chain keeps every local
    #   minimum instead of collapsing to one doc) — over-retains
    #   relative to components but never merges unrelated docs.
    # opt-in: derive the text column ON the engine from the raw
    # html:binary payload (functions/html_extract.py fixed spec)
    # instead of trusting the table's crawler-extracted text — the
    # path for inputs whose text column is absent or suspect. A pure
    # narrow projection before the url-dedup shuffle; html is still
    # projected out before any exchange. Applied inside deduped_docs,
    # so callers that precompute docs with the same cfg (streaming)
    # get it too — the lineage record is truthful on every path.
    text_from_html: bool = False
    near_dedup: bool = False
    near_dup_num: int = 4  # Jaccard >= 4/5
    near_dup_den: int = 5
    near_dedup_hashes: int = 16
    near_dedup_bands: int = 8
    near_dedup_shingle_k: int = 3
    near_dedup_mode: str = "component"  # "component" | "neighbor"

    def rule_versions(self) -> dict[str, str]:
        rv = dict(text_kernel.KERNEL_VERSIONS)
        rv["pipeline"] = PIPELINE_VERSION
        rv["thresholds"] = (
            f"len{self.min_chars}-rep{self.rep_num}/{self.rep_den}"
            f"-ppx{langmodel.PPX_THRESHOLD_MILLI}"
        )
        # only recorded when the stage is ON: with it off the whole
        # plan (lineage literals included) must stay byte-identical to
        # pipeline 1.2, so bench plan-identity digests vs a
        # previous-round control clone read true
        if self.text_from_html:
            rv["text_from_html"] = f"on-{html_extract.EXTRACT_SPEC_VERSION}"
        if self.para_dedup:
            rv["para_dedup"] = f"on-{self.para_dup_num}/{self.para_dup_den}"
        if self.near_dedup:
            rv["near_dedup"] = (
                f"on-{self.near_dedup_mode}-j{self.near_dup_num}/"
                f"{self.near_dup_den}-mh{self.near_dedup_hashes}"
                f"b{self.near_dedup_bands}k{self.near_dedup_shingle_k}"
            )
        return rv


def _repair_line(line: Column) -> Column:
    """Per-paragraph repair chain in reference pipeline order:
    dollar_signs → join_soft_hyphens → fix_capitalized_dashes."""
    return text_kernel.fix_capitalized_dashes(
        text_kernel.join_soft_hyphens(text_kernel.dollar_signs(line))
    )


def _target_partitions(pages: DataFrame, cfg: CurateConfig) -> int:
    """Physical parallelism for the scoring stage: decoupled from
    num_buckets (the commit/manifest unit), sized to ~4x cores so the
    stage scales with the cluster instead of capping at 64 tasks."""
    if cfg.target_partitions is not None:
        return cfg.target_partitions
    cores = pages.sparkSession.sparkContext.defaultParallelism
    return max(cfg.num_buckets, 4 * cores)


def deduped_docs(pages: DataFrame, cfg: CurateConfig) -> DataFrame:
    """url-dedup (deterministic winner: min (warc_ts, coalesce(text,''))),
    salted bucket assignment + explicit repartition, repaired paragraph
    array.

    Scale notes:
    - the html payload is projected OUT before the dedup shuffle — the
      exchange carries only (url, warc_ts, text), not ~half the corpus
      bytes of html the pipeline never reads;
    - dedup is groupBy(url).min(struct(warc_ts, text)) rather than a
      row_number window: min() partial-aggregates map-side, so each
      input partition ships at most one candidate row per url instead
      of every duplicate crossing the wire;
    - text is coalesced to '' INSIDE the min so null and empty text
      rank identically to the oracle (pipeline_oracle maps None→'');
    - the post-dedup repartition spreads each bucket over
      target_partitions/num_buckets intra-bucket salt slices, so one
      hot bucket (Zipfian domain skew) cannot serialize a stage.

    cfg.text_from_html applies HERE (not in curate()) so EVERY path
    that builds docs — batch curate, streaming's own deduped_docs
    call — extracts identically; the lineage key rule_versions()
    records is then truthful on all of them."""
    if cfg.text_from_html:
        pages = pages.withColumn(
            "text",
            html_extract.html_to_text(F.col("html"), from_binary=True),
        )
    best = (
        pages.select(
            "url",
            F.struct(
                F.col("warc_ts"),
                F.coalesce(F.col("text"), F.lit("")).alias("text"),
            ).alias("_wt"),
        )
        .groupBy("url")
        .agg(F.min("_wt").alias("_wt"))
    )
    docs = (
        best.select("url", F.col("_wt.warc_ts").alias("warc_ts"), F.col("_wt.text").alias("text"))
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("url"), F.lit(cfg.salt)), F.lit(cfg.num_buckets)),
        )
        .withColumn("domain", domain_of(F.col("url")))
    )
    n_parts = _target_partitions(pages, cfg)
    if cfg.repartition_mode == "domain":
        # skew-probe control arm only — a hot domain serializes the
        # whole downstream narrow chain into one task
        docs = docs.repartition(n_parts, F.col("domain"))
    else:
        intra_salt = F.pmod(
            F.xxhash64(F.col("url"), F.lit(cfg.salt + 1)),
            F.lit(max(1, n_parts // cfg.num_buckets)),
        )
        docs = docs.repartition(n_parts, F.col("bucket"), intra_salt)
    lines = F.split(F.col("text"), "\n")
    repaired = F.filter(F.transform(lines, _repair_line), lambda p: p != "")
    # shed the wide inputs immediately: raw text does not travel past
    # the repair pass
    return docs.withColumn("paras", repaired).select(
        "url", "warc_ts", "bucket", "domain", "paras"
    )


def boilerplate_sets(docs: DataFrame, cfg: CurateConfig) -> DataFrame:
    """(domain, boiler_set) pairs: lines that appear in >
    boiler_min_docs docs AND in > frac of the domain's docs.

    Two-pass hash-then-confirm, so the BIG shuffle carries 8-byte
    hashes instead of paragraph strings (~25x fewer bytes at corpus
    scale):

    1. count (domain, xxhash64(para)) — partial-agg'd long-only
       shuffle — and keep hashes passing the thresholds as CANDIDATES
       (a hash collision can only ADD a candidate, never drop one);
    2. recount exactly, strings included, for the candidate rows only
       (a near-empty broadcast semi-join of the line stream), and apply
       the thresholds again on the exact counts.

    The output is therefore byte-identical to a single exact pass; the
    candidate set is tiny (repeated nav/footer lines only) and the
    result broadcasts back to the doc stream."""
    lines = docs.select(
        "domain", F.explode(F.array_distinct("paras")).alias("para")
    )
    dom_docs = docs.groupBy("domain").agg(F.count(F.lit(1)).alias("domain_docs"))

    hl = F.xxhash64("domain", "para").alias("hl")
    hash_counts = lines.select(hl).groupBy("hl").agg(F.count(F.lit(1)).alias("hn"))
    # the per-domain fraction threshold can't be applied hash-side
    # without the domain; the absolute > boiler_min_docs bound alone
    # already prunes every unique/rare line, which is the bulk
    cand = hash_counts.filter(F.col("hn") > cfg.boiler_min_docs).select("hl")

    cand_lines = (
        lines.withColumn("hl", F.xxhash64("domain", "para"))
        .join(F.broadcast(cand), "hl", "left_semi")
        .drop("hl")
    )
    line_docs = cand_lines.groupBy("domain", "para").agg(
        F.count(F.lit(1)).alias("line_docs")
    )
    return boiler_sets_from_counts(line_docs, dom_docs, cfg)


def boiler_line_rows(line_docs: DataFrame, dom_docs: DataFrame,
                     cfg: CurateConfig) -> DataFrame:
    """The two-threshold boilerplate rule as flat rows: lines in >
    boiler_min_docs docs AND > frac of the domain's docs. Shared by the
    set-collect below and the oracle'd `boiler_headers` query."""
    return line_docs.join(dom_docs, "domain").filter(
        (F.col("line_docs") > cfg.boiler_min_docs)
        & (
            F.col("line_docs") * cfg.boiler_frac_den
            > F.col("domain_docs") * cfg.boiler_frac_num
        )
    )


def boiler_sets_from_counts(line_docs: DataFrame, dom_docs: DataFrame,
                            cfg: CurateConfig) -> DataFrame:
    """Threshold + collect step shared by the batch two-pass path and
    the streaming cross-batch merge: (domain, para, line_docs) ×
    (domain, domain_docs) → (domain, boiler_set)."""
    boiler = boiler_line_rows(line_docs, dom_docs, cfg)
    return boiler.groupBy("domain").agg(F.collect_set("para").alias("boiler_set"))


def boiler_kept_col() -> Column:
    """THE boiler-strip expression: the kept paragraphs of a frame
    carrying ``paras`` plus a (possibly-null, from a left join against
    the (domain, boiler_set) table) ``boiler_set`` column. Every
    consumer — curate()'s strip, the streaming span-evidence write,
    and the near-dup signature evidence — must filter through this one
    expression: the stored evidence and the text the pipeline actually
    keeps have to agree on what "post-boiler" means, and three
    hand-synchronized copies of the coalesce+array_contains filter
    were one normalization tweak away from silently desynchronizing
    cross-batch state from the output."""
    bset = F.coalesce(F.col("boiler_set"), F.array().cast("array<string>"))
    return F.filter(F.col("paras"), lambda p: ~F.array_contains(bset, p))


def boiler_line_evidence(docs: DataFrame, cfg: CurateConfig) -> tuple[DataFrame, DataFrame]:
    """EXACT per-input (domain, para, line_docs) + (domain, domain_docs)
    counts — the incremental evidence unit for cross-batch boilerplate
    (streaming/jobs.stream_curate exact_boilerplate mode). Counts are
    additive across disjoint inputs, so per-batch tables merged by SUM
    equal one exact pass over the union.

    A line rare in every single batch but common across batches must
    survive into the merged state, so no per-batch candidate pruning is
    sound here; the stored state itself is hash-keyed by the caller
    (streaming/jobs._merged_boiler strips the strings before writing
    and re-confirms against the current batch's strings at merge
    time — the batch two-pass trick applied to the state table)."""
    lines = docs.select(
        "domain", F.explode(F.array_distinct("paras")).alias("para")
    )
    line_docs = lines.groupBy("domain", "para").agg(
        F.count(F.lit(1)).alias("line_docs")
    )
    dom_docs = docs.groupBy("domain").agg(F.count(F.lit(1)).alias("domain_docs"))
    return line_docs, dom_docs


# the 128-bit span key definition lives with the dedup operators;
# re-exported here because the batch stage and streaming span state
# import it from this module
from scripts_spark.operators.dedup import span_hash_cols  # noqa: E402


def _corpus_para_dedup(
    d: DataFrame, cfg: CurateConfig, span_history: DataFrame | None = None
) -> DataFrame:
    """Corpus-wide first-occurrence paragraph dedup over the
    boiler-stripped kept_paras — the PRODUCTION hash-keyed form
    (operators/dedup.paragraph_dedup_hashed, same two-pass): explode
    to (url, pidx) + a 16-byte (xxhash64, confirm-xxhash64) key — the
    paragraph string never crosses the dedup exchange — resolve the
    arg-min survivor per key with one window, fold surviving ordinals
    into a per-doc int array, and join that tiny array back on the
    uniform url key to rebuild kept_paras map-side.

    Deterministic BY CONSTRUCTION for resume: the survivor of a
    repeated paragraph is the corpus-wide lexicographic min
    (url, pidx), a pure function of the full input — so a resumed run
    that recomputes globally but writes only uncommitted buckets
    (catalog.commit_buckets) reproduces exactly the decisions of the
    crashed run (pinned in tests/test_resume.py). A false merge needs
    a 2^-128 double-hash collision between distinct paragraphs.

    ``span_history`` (streaming seam): an (h1, h2) frame of span keys
    seen by EARLIER micro-batches — any current paragraph whose key
    appears there is dropped too (its first occurrence lives in an
    already-committed batch). The history join runs on the same
    16-byte keys, after the within-batch arg-min, so batch and
    streaming modes share one survivor rule: corpus-wide first
    occurrence in (batch, url, pidx) order.

    Adds ``paras_dup`` (how many of this doc's post-boiler paragraphs
    were dropped as earlier-seen) and rewrites ``kept_paras``."""
    ex = d.select("url", F.posexplode("kept_paras").alias("pidx", "para"))
    h1, h2 = span_hash_cols(F.col("para"))
    hp = ex.select("url", "pidx", h1.alias("_h1"), h2.alias("_h2"))
    occ = F.struct(F.col("url").alias("u"), F.col("pidx").alias("i"))
    w = Window.partitionBy("_h1", "_h2")
    flags = hp.withColumn("_kept", occ == F.min(occ).over(w))
    if span_history is not None:
        hist = (
            span_history.select(
                F.col("h1").alias("_h1"), F.col("h2").alias("_h2")
            )
            .distinct()
            .withColumn("_hist", F.lit(True))
        )
        flags = flags.join(hist, ["_h1", "_h2"], "left").withColumn(
            "_kept", F.col("_kept") & F.col("_hist").isNull()
        )
    per_doc = flags.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("_kept"), F.col("pidx")))
        ).alias("_kept_idx")
    )
    # left join: a doc whose kept_paras is already empty has no
    # exploded rows, hence no per_doc row — it keeps an empty array
    d = d.join(per_doc, "url", "left")
    kidx = F.coalesce(F.col("_kept_idx"), F.array().cast("array<int>"))
    return (
        d.withColumn("paras_dup", F.size("kept_paras") - F.size(kidx))
        .withColumn(
            "kept_paras",
            F.transform(kidx, lambda i: F.element_at(F.col("kept_paras"), i + 1)),
        )
        .drop("_kept_idx")
    )


def _near_dup_losers(d: DataFrame, cfg: CurateConfig,
                     sig_history: DataFrame | None = None,
                     cur_sig_rows: DataFrame | None = None) -> DataFrame:
    """(url, near_dup_of) for every document that LOSES near-dedup —
    i.e. is a verified near-duplicate whose cluster survivor is some
    other (smaller-url) document. Input is the post-boiler frame with
    ``kept_paras``; detection text is the joined kept paragraphs, so
    boilerplate (and, if on, corpus-duplicated paragraphs) never vote
    on similarity.

    ``sig_history`` ((url, sig, bks) rows from PRIOR micro-batches —
    see near_dup_sig_evidence) additionally drops any current document
    that near-duplicates crawl HISTORY: candidates via (band,
    band_key) equi-join of the current batch's band keys against the
    store, similarity estimated from the signatures alone (matching
    MinHash components · den ≥ num · num_hashes — the store carries no
    text to shingle-verify against, which is exactly why it is
    ~25 longs/doc instead of the corpus). History may arrive compact
    ((url, sig, bks) — exploded here) or pre-exploded ((url, sig,
    band, band_key) — the band-key-partitioned store read, already
    bucket-pruned). Within-batch pairs keep the
    exact shingle verify; the estimate applies only across batches.
    A SAME-url history match counts: under the first-occurrence rule
    an unchanged recrawl of url U is stale corpus content exactly like
    the same body at url V, and cross-batch url-dedup is an
    independent opt-in that may be off — such a doc comes back with
    near_dup_of == its own url. Replay safety needs no self-exclusion
    because history is read strictly exclusive of the current batch
    (streaming/jobs._sig_state).

    ``cur_sig_rows`` is the batch's own (url, sig, bks) evidence frame
    (near_dup_sig_evidence — i.e. signatures of the post-boiler,
    PRE-paragraph-dedup text). When given, the history comparison uses
    it directly, guaranteeing query-side and stored signatures are
    built from the SAME text form — without it, a repost whose
    duplicated paragraphs were already stripped by _corpus_para_dedup
    would be signed on the edited remainder only and systematically
    underestimate similarity vs the stored full-text signature. When
    para-dedup is OFF the frame is byte-identical to what this
    function would sign anyway, so in-batch candidates reuse it too
    (one signing per micro-batch, not two).

    Scale shape: signatures are one explode + partial-agg'd groupBy
    (16 longs/doc through the exchange), candidates an equi self-join
    on (band, band_key), verify left-semi-pruned to candidate docs,
    and the threshold an integer cross-multiplication on the verify's
    exact shingle counts (n_common·den >= union·num — never a float
    compare). "component" survival adds O(cluster diameter) label-
    propagation rounds over the verified PAIRS only (near-dup graphs
    are shallow stars); "neighbor" survival is a single groupBy-min
    over the pair list."""
    from scripts_spark.operators import dedup as D

    txt = d.select(
        "url", F.array_join("kept_paras", "\n").alias("_nd_text")
    ).filter(F.length("_nd_text") > 0)
    if cur_sig_rows is not None and not cfg.para_dedup:
        # kept_paras here IS the evidence text form — reuse the rows
        # for in-batch candidates instead of re-signing the batch
        cur = cur_sig_rows
        cand = D.band_candidate_pairs(cur, "url")
    else:
        sig = D.minhash_signatures(
            txt, "url", "_nd_text",
            cfg.near_dedup_hashes, cfg.near_dedup_shingle_k,
        )
        cand = D.lsh_candidate_pairs(
            sig, "url", cfg.near_dedup_hashes, cfg.near_dedup_bands
        )
        cur = cur_sig_rows if cur_sig_rows is not None else (
            D.signature_with_bands(
                sig, "url", cfg.near_dedup_hashes, cfg.near_dedup_bands
            )
        )
    ver = D.jaccard_verify(
        txt, cand, "url", "_nd_text", cfg.near_dedup_shingle_k, threshold=0.0
    )
    pairs = ver.filter(
        F.col("n_common") * cfg.near_dup_den
        >= (F.col("size_a") + F.col("size_b") - F.col("n_common"))
        * cfg.near_dup_num
    ).select("key_a", "key_b")
    if cfg.near_dedup_mode == "component":
        comp = D.connected_components(pairs)
        batch_losers = comp.filter(F.col("node") != F.col("group")).select(
            F.col("node").alias("url"), F.col("group").alias("near_dup_of")
        )
    elif cfg.near_dedup_mode == "neighbor":
        # pairs always carry key_a < key_b, so "has any strictly-smaller
        # verified neighbor" == "appears on the b side of some pair"
        batch_losers = (
            pairs.groupBy("key_b")
            .agg(F.min("key_a").alias("near_dup_of"))
            .withColumnRenamed("key_b", "url")
        )
    else:
        raise ValueError(
            f"near_dedup_mode must be 'component' or 'neighbor', "
            f"got {cfg.near_dedup_mode!r}"
        )
    if sig_history is None:
        return batch_losers
    cb = cur.select("url", "sig", F.posexplode("bks").alias("band", "band_key"))
    hcols = set(sig_history.columns)
    if hcols == {"url", "sig", "bks"}:
        hb = sig_history.select(
            F.col("url").alias("h_url"),
            F.col("sig").alias("h_sig"),
            F.posexplode("bks").alias("band", "band_key"),
        )
    elif hcols == {"url", "sig", "band", "band_key"}:
        # pre-exploded history — the band-key-partitioned store read
        # (streaming/jobs._sig_state_banded) hands rows back as
        # (url, sig, band, band_key), already pruned to the buckets
        # this batch can match
        hb = sig_history.select(
            F.col("url").alias("h_url"),
            F.col("sig").alias("h_sig"),
            "band", "band_key",
        )
    else:
        # layout dispatch is by EXACT column set: a frame that merely
        # contains one shape plus extras would silently take the wrong
        # branch (double-explode or mis-join) — refuse instead
        raise ValueError(
            "sig_history must be compact (url, sig, bks) or exploded "
            f"(url, sig, band, band_key) rows; got {sorted(hcols)}"
        )
    # no self-url exclusion: history is strictly prior batches, so a
    # same-url hit is a RECRAWL of already-corpus content — stale under
    # the first-occurrence rule whether or not the independent
    # cross-batch url-dedup opt-in is on (see docstring)
    cand = (
        cb.join(hb, ["band", "band_key"])
        .select("url", "sig", "h_url", "h_sig")
        .distinct()
    )
    m = F.size(
        F.filter(
            F.zip_with(F.col("sig"), F.col("h_sig"), lambda a, b: a == b),
            lambda x: x,
        )
    )
    hist_losers = (
        cand.withColumn("_m", m)
        .filter(
            F.col("_m") * cfg.near_dup_den
            >= F.lit(cfg.near_dup_num * cfg.near_dedup_hashes)
        )
        .groupBy("url")
        .agg(F.min("h_url").alias("near_dup_of"))
    )
    # a url can lose both ways (in-batch AND vs history); the caller
    # left-joins on url, so the union must stay unique per url
    return (
        batch_losers.unionByName(hist_losers)
        .groupBy("url")
        .agg(F.min("near_dup_of").alias("near_dup_of"))
    )


def near_dup_sig_evidence(docs: DataFrame, boiler: DataFrame,
                          cfg: CurateConfig) -> DataFrame:
    """This batch's (url, sig, bks) rows for the cross-batch near-dup
    signature store — EVERY post-boiler document's signature, losers
    included (a future page similar only to a dropped loser still
    near-duplicates corpus content, and including losers keeps the
    write independent of the loser computation, so it can run after
    the bucket commit with the same crash-replay idempotence as
    _write_span_evidence). Detection text is the post-boiler kept
    paragraphs (pre span-dedup when cfg.para_dedup is also on —
    evidence is built the same way for every batch, so the estimate
    is self-consistent across the stream). Strip and signing go
    through boiler_kept_col / _sig_rows_from_kept — the exact
    expressions curate() itself strips and signs with — so stored
    evidence can never drift from what the pipeline keeps."""
    d = docs.join(F.broadcast(boiler), "domain", "left").withColumn(
        "kept_paras", boiler_kept_col()
    )
    return _sig_rows_from_kept(d, cfg)


def _sig_rows_from_kept(d: DataFrame, cfg: CurateConfig) -> DataFrame:
    """(url, sig, bks) MinHash rows of a post-boiler frame's
    ``kept_paras`` — the ONE signing path; both the signature-store
    write (near_dup_sig_evidence) and curate()'s history-query side go
    through it, so the two sides of the cross-batch comparison are
    guaranteed to sign the same text form with the same parameters."""
    from scripts_spark.operators import dedup as D

    txt = d.select(
        "url", F.array_join("kept_paras", "\n").alias("_nd_text")
    ).filter(F.length("_nd_text") > 0)
    sig = D.minhash_signatures(
        txt, "url", "_nd_text", cfg.near_dedup_hashes, cfg.near_dedup_shingle_k
    )
    return D.signature_with_bands(
        sig, "url", cfg.near_dedup_hashes, cfg.near_dedup_bands
    )


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
    if cfg.para_dedup:
        # para_dup_frac is measured against the POST-boiler paragraph
        # count (the dedup stage's own input); with the stage off the
        # test is omitted entirely (not a vacuous lit(0) predicate) so
        # the off-plan stays byte-identical to pipeline 1.2. Position
        # in this list is cosmetic: reasons are array_sort'ed.
        tests.append(
            (
                "para_dup_frac",
                (c["paras_total"] - c["paras_boiler"] > 0)
                & (
                    c["paras_dup"] * cfg.para_dup_den
                    > (c["paras_total"] - c["paras_boiler"]) * cfg.para_dup_num
                ),
            )
        )
    if cfg.near_dedup:
        # fires for cluster losers only; like para_dup_frac, omitted
        # (not a vacuous predicate) when the stage is off so the
        # off-plan stays byte-identical to pipeline 1.2
        tests.append(("near_dup", c["nd_loser"]))
    arr = F.array(*[F.when(cond, F.lit(name)) for name, cond in tests])
    return F.array_sort(F.filter(arr, lambda x: x.isNotNull()))


# Frames curate() persists internally, so long-lived callers (the
# streaming micro-batch loop, multi-query sessions) can release
# exactly these instead of spark.catalog.clearCache() — which evicts
# EVERY cached frame in the shared session, including the caller's own.
_CURATE_PERSISTED: list[DataFrame] = []


def drain_curate_persisted() -> None:
    """Unpersist every frame curate() cached internally since the
    last drain. Call after the decision frame has been fully
    materialized (written/collected); draining earlier is safe but
    recomputes the post-boiler chain on the next action."""
    while _CURATE_PERSISTED:
        _CURATE_PERSISTED.pop().unpersist()


def curate(pages: DataFrame, cfg: CurateConfig | None = None,
           boiler_override: DataFrame | None = None,
           docs: DataFrame | None = None,
           span_history: DataFrame | None = None,
           sig_history: DataFrame | None = None,
           sig_current: DataFrame | None = None) -> DataFrame:
    """Full pipeline → decision frame (SURVEY.md §7.0 output schema +
    bucket column for manifests/metrics).

    ``boiler_override``: a precomputed (domain, boiler_set) frame to use
    instead of this input's own boilerplate_sets — the seam streaming
    uses to strip against evidence merged across micro-batches.
    ``docs``: an already-computed (and typically persisted)
    deduped_docs frame for the same pages, so a caller that needed it
    for evidence extraction doesn't pay the dedup+repair chain twice.
    ``span_history``: earlier-batch span keys for the paragraph-dedup
    stage (see _corpus_para_dedup) — requires ``cfg.para_dedup``.
    ``sig_history``: earlier-batch (url, sig, bks) MinHash rows for
    the near-dedup stage (see near_dup_sig_evidence) — requires
    ``cfg.near_dedup``. ``sig_current``: THIS batch's already-computed
    evidence rows (streaming computes them once for the state write —
    passing them here avoids signing the batch twice); derived
    internally when omitted."""
    cfg = cfg or CurateConfig()
    if span_history is not None and not cfg.para_dedup:
        raise ValueError("span_history requires CurateConfig.para_dedup=True")
    if sig_history is not None and not cfg.near_dedup:
        raise ValueError("sig_history requires CurateConfig.near_dedup=True")
    if sig_current is not None and not cfg.near_dedup:
        raise ValueError("sig_current requires CurateConfig.near_dedup=True")
    if docs is None:
        docs = deduped_docs(pages, cfg)
        # three consumers read this frame (boilerplate line counts,
        # domain doc counts, and the main decision branch) — without
        # the persist each would recompute the scan + url-dedup window
        # + repair chain
        if cfg.persist_intermediate and boiler_override is None:
            docs = docs.persist()
            _CURATE_PERSISTED.append(docs)
    boiler = boilerplate_sets(docs, cfg) if boiler_override is None else boiler_override

    d = docs.join(F.broadcast(boiler), "domain", "left")
    kept = boiler_kept_col()
    d = (
        d.withColumn("paras_total", F.size("paras"))
        .withColumn("kept_paras", kept)
        .withColumn("paras_boiler", F.col("paras_total") - F.size("kept_paras"))
        .drop("boiler_set", "paras")
    )
    if cfg.near_dedup and sig_history is not None and sig_current is None \
            and cfg.para_dedup:
        # the signature STORE holds pre-paragraph-dedup signatures
        # (near_dup_sig_evidence); the query side must sign the SAME
        # text form, so capture it here — after para-dedup rewrites
        # kept_paras, a repost's duplicated paragraphs would be
        # stripped before signing and Jaccard vs the stored full-text
        # signature would systematically underestimate, defeating
        # exactly the cross-batch repost case the store exists for
        sig_current = _sig_rows_from_kept(d, cfg)
    if cfg.para_dedup:
        d = _corpus_para_dedup(d, cfg, span_history=span_history)
    if cfg.near_dedup:
        # the losers frame re-reads d (self-similarity is cross-doc by
        # nature); persist the post-boiler frame so the repair + strip
        # chain isn't recomputed for the signature/verify branches
        if cfg.persist_intermediate:
            d = d.persist()
            _CURATE_PERSISTED.append(d)
        losers = _near_dup_losers(d, cfg, sig_history=sig_history,
                                  cur_sig_rows=sig_current)
        d = d.join(
            losers.select("url").withColumn("_nd_loser", F.lit(True)),
            "url",
            "left",
        ).withColumn("_nd_loser", F.coalesce(F.col("_nd_loser"), F.lit(False)))
    d = d.withColumn(
        "scrubbed_text", text_kernel.scrub_all(F.array_join("kept_paras", "\n"))
    ).drop("kept_paras")

    st = F.col("scrubbed_text")
    # With the arrow scorer the rest of the plan is one linear pass —
    # no second consumer, nothing further to persist. The join scorer
    # consumes d twice, so checkpoint it there.
    if cfg.scorer != "arrow" and cfg.persist_intermediate:
        d = d.persist()
        _CURATE_PERSISTED.append(d)
    # langid + perplexity scoring. Two interchangeable physical forms
    # with identical results (both pinned to the oracle):
    # - "arrow" (default): broadcast model tables inside an Arrow
    #   pandas UDF with a per-worker token memo — zero shuffle, and
    #   ~9x faster than the explode path at local[32] (dict lookups
    #   vs 20M-row explode + window + joins + re-agg with GC churn);
    # - "join": pure-SQL explode → broadcast hash joins → groupBy
    #   (functions/scoring_join.py), for model tables too large to
    #   broadcast to Python workers. (Map literals were measured and
    #   rejected: Spark map lookup is a linear scan — 135s vs 10s.)
    if cfg.scorer == "arrow":
        d = scoring_udf.with_scores(d)
    else:
        scores = scoring_join.doc_scores(d)
        d = d.join(scores, "url", "left")
        for c in ["lang_score", "ppx_sum", "n_bigrams"]:
            d = d.withColumn(c, F.coalesce(c, F.lit(0)))
    # token counts are pure string arithmetic: scrubbed_text is
    # ws-normalized with exactly one ' '/'\n' between tokens, so
    # n_tokens = separators+1 and tok_chars = n_chars - separators —
    # no explode, no shuffle, stays in whole-stage codegen.
    # Counting uses translate() (a char-map pass) instead of
    # regexp_replace over an equivalent explicit character set — same
    # counts (r7: verified exceptAll-equal at 2M docs, parity suite
    # green), measured ~2x cheaper per pass (guide §1.2).
    n_sep = F.length(st) - F.length(F.translate(st, " \n", ""))
    d = (
        d.withColumn(
            "n_tokens",
            F.when(F.length(st) == 0, F.lit(0)).otherwise(n_sep + 1).cast("long"),
        )
        .withColumn("tok_chars", (F.length(st) - n_sep).cast("long"))
        .withColumn(
            "n_distinct",
            F.when(F.length(st) == 0, F.lit(0))
            .otherwise(F.size(F.array_distinct(F.split(st, "[ \n]"))))
            .cast("long"),
        )
    )

    # translate char sets spelled to match the regex classes EXACTLY:
    # [A-Za-zÀ-þ] is A-Z a-z U+00C0..U+00FE (× and ÷ included — the
    # regex class includes them too), [A-ZÀ-Þ] is A-Z U+00C0..U+00DE
    _letters = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        + "".join(chr(c) for c in range(0xC0, 0xFF))
    )
    _uppers = "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + "".join(chr(c) for c in range(0xC0, 0xDF))
    d = (
        d.withColumn("n_chars", F.length(st))
        .withColumn("n_digits", F.length(st) - F.length(F.translate(st, "0123456789", "")))
        .withColumn(
            "n_letters", F.length(st) - F.length(F.translate(st, _letters, ""))
        )
        .withColumn(
            "n_upper", F.length(st) - F.length(F.translate(st, _uppers, ""))
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
            *(["paras_dup"] if cfg.para_dedup else []),
            "lang_pred",
            "ppx_flag",
        ]
    }
    if cfg.near_dedup:
        cols["nd_loser"] = F.col("_nd_loser")
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
