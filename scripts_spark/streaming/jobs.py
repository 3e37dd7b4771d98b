"""Structured Streaming entry points.

The reference pipeline is purely batch (SURVEY.md §2.10), so streaming
here serves two engine-native purposes:

1. incremental ingest of new crawl partitions: a file-source stream
   over the pages directory, each micro-batch run through the SAME
   batch `curate` plan via foreachBatch and committed through the
   manifest catalog (exactly-once per bucket; the micro-batch is the
   resume unit). Cross-document statistics (domain boilerplate) are
   computed within the micro-batch — documented approximation for
   late-arriving pages of a domain.
2. watermarked tumbling-window metrics over an event stream — the
   streaming twin of the `tumbling_window` batch query.
3. custom stateful operators via applyInPandasWithState
   (running_domain_stats): explicit per-key GroupState carried across
   micro-batches; idle-timeout state eviction is opt-in for continuous
   streams (availableNow runs never terminate with a timeout set).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from scripts_spark.plans.pipeline import (
    CurateConfig,
    boiler_kept_col,
    boiler_line_evidence,
    boiler_sets_from_counts,
    boilerplate_sets,
    curate,
    deduped_docs,
    drain_curate_persisted,
    near_dup_sig_evidence,
    span_hash_cols,
)
from scripts_spark.sources import catalog
from scripts_spark.sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(input_dir)


def stream_curate(spark: SparkSession, input_dir: str, out_dir: str,
                  checkpoint_dir: str, cfg: CurateConfig | None = None,
                  available_now: bool = True,
                  max_files_per_trigger: int | None = None,
                  dedup_urls_across_batches: bool = False,
                  dedup_watermark: str = "30 days",
                  boiler_state_dir: str | None = None,
                  boiler_compact_every: int | None = 16,
                  span_state_dir: str | None = None,
                  span_compact_every: int | None = 16,
                  sig_state_dir: str | None = None,
                  sig_compact_every: int | None = 16,
                  sig_store_buckets: int | None = None):
    """File-source stream → batch curate per micro-batch → manifest
    commit. Returns the started StreamingQuery.

    ``dedup_urls_across_batches`` upgrades the documented per-batch
    url-dedup approximation to exact cross-batch semantics: a
    watermarked dropDuplicatesWithinWatermark("url") keeps one row per
    url across micro-batches (state bounded by the warc_ts watermark —
    a recrawl of the same url more than ``dedup_watermark`` later is
    treated as a new document, which is the right call for a rolling
    crawl). State survives restarts via the checkpoint.

    ``boiler_state_dir`` upgrades boilerplate detection the same way:
    each micro-batch appends its (domain, line-hash) counts to a
    parquet state table (partitioned by batch_id with dynamic partition
    overwrite, so a crash-replayed batch overwrites rather than
    double-counts its own evidence), and the strip runs against the
    boiler sets derived from the MERGED counts, confirmed against the
    current batch's strings (see _merged_boiler). A boilerplate line
    whose evidence is split across micro-batches — each batch alone
    below threshold — is therefore stripped from every batch processed
    after the threshold is crossed (evidence grows monotonically;
    already-committed earlier batches are not rewritten).

    ``span_state_dir`` (requires ``cfg.para_dedup``) extends the
    corpus paragraph-dedup stage across micro-batches the same way:
    each batch appends the distinct 128-bit span keys of its
    post-boiler paragraphs, and the dedup stage drops any current
    paragraph whose key a PRIOR batch already recorded — an
    incremental crawl drop therefore dedups against the whole crawl
    history, not just its own batch, with state that is 16 bytes/span
    and compacted/GC'd on the same snapshot+watermark discipline.

    ``sig_state_dir`` (requires ``cfg.near_dedup``) does the same for
    NEAR-duplicate pages: each batch appends the (url, sig, bks)
    MinHash rows of its post-boiler documents (~25 longs/doc, never
    text), and the near-dedup stage additionally drops any current
    document whose signature near-matches a PRIOR batch's — an
    edited repost landing in a later crawl drop is caught against the
    whole crawl history. Cross-batch similarity is estimated from the
    signatures (matching components ≥ num/den of the hashes);
    within-batch pairs keep the exact shingle verify. Same-url history
    matches count (an unchanged recrawl is stale corpus content — it
    is NOT assumed that ``dedup_urls_across_batches`` is also on), and
    a SIG_PARAMS marker in the state dir fails fast if a later run
    changes the MinHash parameterization (see _check_sig_params).

    ``sig_store_buckets`` (requires ``sig_state_dir``) switches the
    signature store's compacted snapshots to the band-key-PARTITIONED
    layout (_sig_state_banded): snapshots are stored partitioned by
    pmod(band_key, N) and each trigger reads only the buckets its own
    band keys can match — O(batch × occupancy) instead of O(store)
    per trigger, the layout you'd run against a 10^12-document crawl
    history. The marker pins the layout too, so a store cannot be
    silently reopened under the other one."""
    cfg = cfg or CurateConfig()
    if span_state_dir is not None and not cfg.para_dedup:
        raise ValueError("span_state_dir requires CurateConfig.para_dedup=True")
    if sig_state_dir is not None and not cfg.near_dedup:
        raise ValueError("sig_state_dir requires CurateConfig.near_dedup=True")
    if sig_store_buckets is not None and sig_state_dir is None:
        raise ValueError("sig_store_buckets requires sig_state_dir")
    if sig_store_buckets is not None and sig_store_buckets < 1:
        # 0 would pin 'store_buckets=0' in the marker while _process's
        # truthiness check silently ran the compact layout — marker
        # and on-disk layout disagreeing forever
        raise ValueError(
            f"sig_store_buckets must be >= 1, got {sig_store_buckets}"
        )
    named = [
        ("boiler_state_dir", boiler_state_dir),
        ("span_state_dir", span_state_dir),
        ("sig_state_dir", sig_state_dir),
    ]
    seen: dict[str, str] = {}
    for name, p in named:
        if p is None:
            continue
        ap = os.path.abspath(p)
        if ap in seen:
            # every store keeps its compaction watermark at
            # <dir>/COMPACTED_THROUGH — sharing a directory would let
            # one stage's compaction advance (or roll back) another's
            # marker past snapshots its GC already deleted
            raise ValueError(
                f"{seen[ap]} and {name} must be distinct directories "
                f"(both set to {p!r})"
            )
        seen[ap] = name
    if sig_state_dir is not None:
        _check_sig_params(sig_state_dir, cfg, sig_store_buckets)
    stream = read_pages_stream(spark, input_dir, max_files_per_trigger)
    if dedup_urls_across_batches:
        stream = stream.withWatermark("warc_ts", dedup_watermark)
        stream = stream.dropDuplicatesWithinWatermark(["url"])

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        boiler, docs, evidence, sig_cur = None, None, None, None
        any_state = (
            boiler_state_dir is not None
            or span_state_dir is not None
            or sig_state_dir is not None
        )
        if any_state:
            # compute + persist the deduped/repaired docs frame ONCE:
            # the evidence writes and the curate pass all read it
            # (without this the scan + url-dedup + repair chain runs 3x
            # per micro-batch)
            docs = deduped_docs(batch_df, cfg).persist()
        # everything that can fail AFTER a persist — state reads incl.
        # their fail-fast watermark guards, the bucket collect, curate,
        # the commit — runs under the one finally that releases every
        # frame this trigger pinned; a watermark ValueError must not
        # leak the materialized docs/signature caches into the shared
        # session
        try:
            if boiler_state_dir is not None:
                boiler, evidence = _merged_boiler(
                    spark, docs, batch_id, boiler_state_dir, cfg,
                    compact_every=boiler_compact_every,
                )
            elif any_state:
                # span/sig evidence and the strip must agree on the
                # boiler sets: compute the batch-local sets ONCE here
                # and hand them to curate as the override
                boiler = boilerplate_sets(docs, cfg)
            span_hist = None
            if span_state_dir is not None:
                span_hist = _span_state(
                    spark, span_state_dir, batch_id, span_compact_every
                )
            sig_hist = None
            if sig_state_dir is not None:
                # fail fast on a mismatched/compacted-ahead store
                # BEFORE paying the dominant per-batch cost below —
                # the state reads re-check this, but by then the whole
                # batch would already be signed and materialized on
                # every doomed restart attempt
                _guard_watermark(sig_state_dir, "sigs", batch_id)
                # sign the batch ONCE: the same (url, sig, bks) rows
                # serve curate's history comparison (and, with
                # para_dedup off, its in-batch candidates) AND the
                # post-commit store write — signing is the dominant
                # near-dedup cost per batch
                sig_cur = near_dup_sig_evidence(docs, boiler, cfg).persist()
                if sig_store_buckets:
                    # the batch's own bucket set drives snapshot
                    # partition pruning; driver-side collect is bounded
                    # by sig_store_buckets distinct ints, never by
                    # batch size
                    bb = _batch_buckets(sig_cur, sig_store_buckets)
                    sig_hist = _sig_state_banded(
                        spark, sig_state_dir, batch_id, sig_compact_every,
                        bb, sig_store_buckets,
                    )
                else:
                    sig_hist = _sig_state(
                        spark, sig_state_dir, batch_id, sig_compact_every
                    )
            dec = curate(batch_df, cfg, boiler_override=boiler, docs=docs,
                         span_history=span_hist, sig_history=sig_hist,
                         sig_current=sig_cur)
            # the commit unit is (job_id=batch_id, bucket): a replayed
            # micro-batch resumes its own partial commit, while a NEW
            # batch whose documents hash into buckets an earlier batch
            # already committed is still written in full (no
            # cross-batch skipping)
            catalog.commit_buckets(dec, out_dir, job_id=batch_id)
            if span_state_dir is not None:
                # AFTER the commit: a crash in between replays the
                # batch, which resumes the commit and rewrites its own
                # evidence partition (idempotent); history for the
                # replay is still exclusive of this batch (see
                # _span_state)
                _write_span_evidence(docs, boiler, batch_id, span_state_dir)
            if sig_state_dir is not None:
                _write_sig_evidence(sig_cur, batch_id, sig_state_dir)
        finally:
            if sig_cur is not None:
                sig_cur.unpersist()
            if docs is not None:
                docs.unpersist()
            # release exactly the frames curate() cached internally
            # (near-dedup post-boiler frame, its own docs persist when
            # we didn't pass one) — NOT catalog.clearCache(), which
            # would also evict every caller-owned cached frame in the
            # shared session
            drain_curate_persisted()
            if evidence is not None:
                evidence.unpersist()

    w = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def _line_hashes(df: DataFrame) -> DataFrame:
    """Two independent 64-bit line hashes — a 128-bit combined key, so
    a cross-batch false merge needs a 2^-128 collision (vs 2^-64 for a
    single xxhash64, which at 10^12 lines has a real birthday risk)."""
    return df.withColumn("h1", F.xxhash64("para")).withColumn(
        "h2", F.xxhash64(F.lit("boiler-h2"), F.col("para"))
    )


# state dirs whose schema this process has already validated
_SCHEMA_CHECKED: set[str] = set()


def _compacted_through(state_dir: str) -> int:
    """Compaction watermark: the largest batch_id whose evidence has
    been folded into the compacted snapshot (-1 = no snapshot yet).
    A single marker file updated by atomic rename — the read path
    trusts ONLY this marker, so a crash at any point of a compaction
    leaves stale files that are simply ignored (and GC'd by the next
    compaction), never double-counted."""
    import os

    p = f"{state_dir}/COMPACTED_THROUGH"
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        raw = f.read().strip()
    try:
        return int(raw)
    except ValueError:
        # GC has already run against past watermarks, so an unreadable
        # marker can mean folded partitions are gone — silently treating
        # it as -1 would double-count nothing but would SHRINK the
        # merged evidence. Refuse to run on corrupt state.
        raise RuntimeError(
            f"corrupt compaction watermark {p!r} (contents {raw!r}): "
            "state dir needs manual inspection — the marker gates GC of "
            "folded evidence, so it cannot be guessed"
        ) from None


def _check_sig_params(state_dir: str, cfg: CurateConfig,
                      store_buckets: int | None = None) -> None:
    """Fail fast when a sig store is reused under different MinHash
    parameters. The stored rows ('url string, sig array<bigint>, bks
    array<bigint>') are shape-identical for ANY (num_hashes, bands,
    shingle_k), so unlike the boiler state's schema check nothing
    structural detects drift — band keys hashed over different slice
    widths just never match, zip_with null-pads sig vs h_sig, and
    cross-batch near-dedup silently stops catching reposts. A durable
    SIG_PARAMS marker written on first use pins the parameterization
    the way COMPACTED_THROUGH pins the checkpoint lineage. The banded
    store layout (and its bucket count) is pinned the same way: a
    compact store reopened with sig_store_buckets set (or vice versa,
    or with a different bucket count) would look for snapshots in the
    wrong layout entirely."""
    want = (
        f"hashes={cfg.near_dedup_hashes} bands={cfg.near_dedup_bands} "
        f"shingle_k={cfg.near_dedup_shingle_k}"
    )
    if store_buckets is not None:
        want += f" store_buckets={store_buckets}"
    p = f"{state_dir}/SIG_PARAMS"
    if os.path.exists(p):
        with open(p) as f:
            have = f.read().strip()
        if have != want:
            raise ValueError(
                f"sig state dir {state_dir!r} was written with MinHash "
                f"params [{have}] but this run configures [{want}]: "
                "stored signatures and band keys are incomparable "
                "across parameterizations — resume with the original "
                "CurateConfig or clear the sig state dir"
            )
        return
    os.makedirs(state_dir, exist_ok=True)
    tmp = f"{p}.tmp"
    with open(tmp, "w") as f:
        f.write(want)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def _advance_watermark(state_dir: str, batch_id: int) -> None:
    """Advance the marker DURABLY: fsync the tmp file before the
    rename and the directory after it. GC of folded partitions keys
    off this marker, so unlike the evidence writes (whose loss merely
    replays a batch) a torn/unflushed marker after power loss could
    orphan already-GC'd evidence — the one non-idempotent step."""
    import os

    tmp = f"{state_dir}/COMPACTED_THROUGH.tmp"
    with open(tmp, "w") as f:
        f.write(str(batch_id))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, f"{state_dir}/COMPACTED_THROUGH")
    dfd = os.open(state_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _gc_folded(state_dir: str, sub: str, through: int,
               snap_sub: str | None = None) -> None:
    """Best-effort removal of evidence partitions already folded into
    the snapshot at ``through`` and of superseded snapshots. Failing
    here is harmless — the read path filters them out by the marker —
    so errors are swallowed (at crawl scale these are object-store
    deletes behind the manifest catalog, same semantics).
    ``snap_sub`` overrides the snapshot directory name (the banded sig
    layout keeps its snapshots under ``sigs_banded``)."""
    import os
    import shutil

    base = f"{state_dir}/{sub}"
    if os.path.isdir(base):
        for d in os.listdir(base):
            if d.startswith("batch_id=") and int(d.split("=")[1]) <= through:
                shutil.rmtree(f"{base}/{d}", ignore_errors=True)
    cbase = f"{state_dir}/{snap_sub or sub + '_compacted'}"
    if os.path.isdir(cbase):
        for d in os.listdir(cbase):
            if d.startswith("through=") and int(d.split("=")[1]) < through:
                shutil.rmtree(f"{cbase}/{d}", ignore_errors=True)


def _has_batch_partitions(state_dir: str, sub: str) -> bool:
    import os

    base = f"{state_dir}/{sub}"
    return os.path.isdir(base) and any(
        d.startswith("batch_id=") for d in os.listdir(base)
    )


def _live_state(spark: SparkSession, state_dir: str, sub: str, through: int,
                cols: list[str], schema: str) -> DataFrame:
    """The live evidence view: compacted snapshot (if any) + per-batch
    partitions NEWER than the watermark. Partitions <= the watermark are
    excluded even if GC hasn't removed them yet — their contents are
    already inside the snapshot. The tail can be legitimately empty
    (a replayed already-folded batch right after GC), hence the
    explicit-schema empty frame instead of a failing schema inference."""
    if _has_batch_partitions(state_dir, sub):
        tail = spark.read.parquet(f"{state_dir}/{sub}").filter(
            F.col("batch_id") > through
        ).select(*cols)
    else:
        tail = spark.createDataFrame([], schema)
    if through < 0:
        return tail
    # explicit schema: a zero-file snapshot (all-empty history fold)
    # must read back as an empty frame, not an inference error (see
    # _history_state)
    snap = spark.read.schema(schema).parquet(
        f"{state_dir}/{sub}_compacted/through={through}"
    ).select(*cols)
    return tail.unionByName(snap)


def _span_state(spark: SparkSession, state_dir: str, batch_id: int,
                compact_every: int | None) -> DataFrame:
    """Cross-batch paragraph-dedup history: the distinct (h1, h2) span
    keys of every post-boiler paragraph processed by micro-batches
    BEFORE this one, maintained with the boiler state's
    snapshot/watermark/GC discipline — with one twist: the history is
    EXCLUSIVE of the current batch. Its own ``batch_id=`` partition
    may already exist from a crashed attempt, and counting it would
    drop every paragraph of a replayed batch as "already seen" — so
    tail reads are bounded above by the current id, the watermark
    records the last batch FOLDED (b-1 when batch b compacts, never b
    itself), and a replayed batch sees exactly the history its first
    attempt saw. Unlike boiler counts (which must include the current
    batch), first-occurrence dedup wants strictly-prior state, so the
    exclusive read is the semantics, not just crash hygiene.

    Scale note: like the signature store, the span join scans the
    whole store per trigger; the same snapshot-bucketing evolution
    applies verbatim (_sig_state_banded is the template — partition
    snapshots by pmod(h1, N), push the batch's h1-bucket set down).
    One difference in when it pays: a batch's spans (~50/doc) cover
    far more buckets than its 8 band keys, so pruning only bites for
    trickle batches or very large N — which is exactly the
    incremental-crawl shape this store serves."""
    return _history_state(
        spark, state_dir, batch_id, compact_every,
        sub="spans", schema="h1 long, h2 long", cols=["h1", "h2"],
    )


def _sig_state(spark: SparkSession, state_dir: str, batch_id: int,
               compact_every: int | None) -> DataFrame:
    """Cross-batch near-dup history: the (url, sig, bks) MinHash rows
    of every post-boiler document processed by micro-batches BEFORE
    this one — the span state's exclusive-read/compaction/GC
    discipline verbatim (see _span_state for why the history must
    exclude the current batch on replay), applied to signature rows
    instead of span keys.

    Scale note: the candidate join scans the whole store per trigger
    (fine while the store is snapshot + ≤K tail partitions of compact
    rows, and AQE broadcasts the small batch side), but at 10^12
    accumulated documents the per-trigger scan is the bottleneck. The
    production evolution is _sig_state_banded (opt in via
    stream_curate's sig_store_buckets): snapshots partitioned by
    pmod(band_key, N) with the batch's band-key set pushed down as a
    partition filter — O(batch x occupancy) per trigger instead of
    O(store), same marker/GC machinery."""
    return _history_state(
        spark, state_dir, batch_id, compact_every,
        sub="sigs",
        schema="url string, sig array<bigint>, bks array<bigint>",
        cols=["url", "sig", "bks"],
    )


def sig_bucket_col(band_key: "F.Column | str", store_buckets: int):
    """THE bucket function of the banded signature store:
    pmod(band_key, N) as int. One definition — the snapshot writer,
    the per-trigger batch-bucket collect, and the bench's seeded
    stores must all bucket identically, or partition pruning silently
    reads the wrong buckets and cross-batch near-dups vanish with no
    error (the drift class SIG_PARAMS exists to catch for the hash
    params; the bucket function is pinned by sharing code instead)."""
    return F.pmod(band_key, F.lit(store_buckets)).cast("int")


def _batch_buckets(sig_rows: DataFrame, store_buckets: int) -> list[int]:
    """The distinct snapshot buckets a batch's (url, sig, bks) rows
    can match — ≤ store_buckets ints, safe to collect driver-side."""
    return [
        r["b"]
        for r in sig_rows.select(
            F.explode(
                F.transform("bks", lambda k: sig_bucket_col(k, store_buckets))
            ).alias("b")
        )
        .distinct()
        .collect()
    ]


def _sig_state_banded(spark: SparkSession, state_dir: str, batch_id: int,
                      compact_every: int | None, batch_buckets: list[int],
                      store_buckets: int) -> DataFrame:
    """The band-key-PARTITIONED evolution of _sig_state — the
    production layout the compact form's scale note describes. History
    rows come back pre-exploded as (url, sig, band, band_key), and the
    compacted snapshot is stored partitioned by
    ``bucket = pmod(band_key, store_buckets)`` so the per-trigger read
    prunes to the buckets the current batch can actually match
    (``batch_buckets``, derived from the batch's own band keys): at a
    10^12-document store a trickle batch touches O(batch × occupancy)
    partitions instead of scanning the whole store. Cost: the snapshot
    duplicates a doc's signature once per band (~8×, still ≈200
    longs/doc) — disk bought back as pruned reads, the standard
    index-table trade.

    Per-batch TAIL partitions stay in the compact (url, sig, bks)
    shape the evidence writer emits — they are ≤ compact_every batches
    and are exploded on the fly, so pruning them would save nothing —
    while every compaction folds tail + old snapshot into a new banded
    snapshot. Watermark semantics, exclusive-of-current-batch reads,
    crash-replay idempotence, and GC are _history_state's verbatim;
    only the snapshot layout (and the pruned return) differ."""
    sub = "sigs"
    through = _guard_watermark(state_dir, sub, batch_id)
    exploded_schema = (
        "url string, sig array<bigint>, band int, band_key long, bucket int"
    )
    bucket = sig_bucket_col(F.col("band_key"), store_buckets)
    if _has_batch_partitions(state_dir, sub):
        tail = (
            spark.read.parquet(f"{state_dir}/{sub}")
            .filter(
                (F.col("batch_id") > through) & (F.col("batch_id") < batch_id)
            )
            .select("url", "sig", F.posexplode("bks").alias("band", "band_key"))
            .withColumn("bucket", bucket)
        )
    else:
        tail = spark.createDataFrame([], exploded_schema)
    snap = None
    # explicit schema on snapshot reads: an all-empty-history
    # compaction writes a zero-file snapshot, and inference on it
    # would wedge the store (see _history_state)
    if through >= 0:
        snap = spark.read.schema(exploded_schema).parquet(
            f"{state_dir}/{sub}_banded/through={through}"
        )
    if _should_compact(batch_id, through, compact_every):
        merged = tail if snap is None else tail.unionByName(
            snap.select("url", "sig", "band", "band_key", "bucket")
        )
        (
            merged.distinct()
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{state_dir}/{sub}_banded/through={batch_id - 1}")
        )
        _advance_watermark(state_dir, batch_id - 1)
        _gc_folded(state_dir, sub, batch_id - 1, snap_sub=f"{sub}_banded")
        snap = spark.read.schema(exploded_schema).parquet(
            f"{state_dir}/{sub}_banded/through={batch_id - 1}"
        )
        tail = spark.createDataFrame([], exploded_schema)
    out = tail.select("url", "sig", "band", "band_key")
    if snap is None:
        return out
    pruned = snap.filter(
        F.col("bucket").isin([int(b) for b in batch_buckets])
        if batch_buckets else F.lit(False)
    ).select("url", "sig", "band", "band_key")
    return out.unionByName(pruned)


def _guard_watermark(state_dir: str, sub: str, batch_id: int) -> int:
    """Shared watermark guard for every history-state read path
    (compact and banded): returns the compaction watermark, refusing a
    batch id at or behind it — GC has already deleted the evidence
    such a batch would need, so proceeding would silently shrink
    history."""
    through = _compacted_through(state_dir)
    if batch_id <= through:
        raise ValueError(
            f"{sub} state watermark ({through}) is at or ahead of "
            f"micro-batch id {batch_id}: this state_dir was compacted "
            "by a different (or further-along) checkpoint. Resume with "
            f"the original checkpoint_dir, or clear the {sub} state_dir."
        )
    return through


def _should_compact(batch_id: int, through: int,
                    compact_every: int | None) -> bool:
    """Shared compaction trigger: fold once the unfolded tail reaches
    ``compact_every`` batches (the current batch itself is never
    folded — the watermark records batch_id - 1)."""
    return bool(compact_every) and (batch_id - 1) - through >= compact_every


def _history_state(spark: SparkSession, state_dir: str, batch_id: int,
                   compact_every: int | None, *, sub: str, schema: str,
                   cols: list[str]) -> DataFrame:
    through = _guard_watermark(state_dir, sub, batch_id)
    if _has_batch_partitions(state_dir, sub):
        tail = (
            spark.read.parquet(f"{state_dir}/{sub}")
            .filter(
                (F.col("batch_id") > through) & (F.col("batch_id") < batch_id)
            )
            .select(*cols)
        )
    else:
        tail = spark.createDataFrame([], schema)
    hist = tail
    # snapshot reads carry the EXPLICIT schema: a compaction of an
    # all-empty history legitimately writes a zero-file snapshot
    # (_SUCCESS only), and schema inference on it would throw forever
    # after the watermark already advanced — wedging the state dir
    if through >= 0:
        hist = tail.unionByName(
            spark.read.schema(schema).parquet(
                f"{state_dir}/{sub}_compacted/through={through}"
            ).select(*cols)
        )
    if _should_compact(batch_id, through, compact_every):
        hist.distinct().hint("rebalance").write.mode("overwrite").parquet(
            f"{state_dir}/{sub}_compacted/through={batch_id - 1}"
        )
        _advance_watermark(state_dir, batch_id - 1)
        _gc_folded(state_dir, sub, batch_id - 1)
        hist = spark.read.schema(schema).parquet(
            f"{state_dir}/{sub}_compacted/through={batch_id - 1}"
        ).select(*cols)
    return hist


def _write_span_evidence(docs: DataFrame, boiler: DataFrame, batch_id: int,
                         state_dir: str) -> None:
    """Append this batch's post-boiler span keys (distinct 128-bit
    hashes, ~16 bytes/span — never the paragraph strings) as its own
    ``batch_id=`` partition; per-write dynamic overwrite keeps
    crash-replay idempotent, mirroring the boiler evidence writes.
    Evidence is the PRE-dedup kept paragraphs: spans this batch
    dropped as duplicates are already in history, so the union of
    histories is unchanged and the write needs no dependency on the
    strip itself (it can run after the bucket commit)."""
    para = docs.join(F.broadcast(boiler), "domain", "left").select(
        F.explode(boiler_kept_col()).alias("para")
    )
    h1, h2 = span_hash_cols(F.col("para"))
    (
        para.select(h1.alias("h1"), h2.alias("h2"))
        .distinct()
        .withColumn("batch_id", F.lit(batch_id))
        .hint("rebalance")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(f"{state_dir}/spans")
    )


def _write_sig_evidence(sig_rows: DataFrame, batch_id: int,
                        state_dir: str) -> None:
    """Append this batch's (url, sig, bks) MinHash rows as its own
    ``batch_id=`` partition — same dynamic-overwrite crash-replay
    idempotence as _write_span_evidence. ``sig_rows`` is the
    near_dup_sig_evidence frame _process computed (and persisted) once
    for the whole trigger; see plans.pipeline.near_dup_sig_evidence
    for what the rows are and why losers are included."""
    (
        sig_rows
        .withColumn("batch_id", F.lit(batch_id))
        .hint("rebalance")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(f"{state_dir}/sigs")
    )


def _merged_boiler(spark: SparkSession, docs: DataFrame, batch_id: int,
                   state_dir: str, cfg: CurateConfig,
                   compact_every: int | None = None) -> DataFrame:
    """Append this batch's boilerplate evidence to the state table,
    then return boiler sets derived from ALL batches' merged counts.

    The state is HASH-KEYED — (domain, h1, h2, line_docs), ~24 bytes
    per line key instead of the paragraph string — the streaming twin
    of the batch pipeline's hash-then-confirm (plans/pipeline.
    boilerplate_sets). The confirm side needs no historic strings:
    only a line PRESENT in the current batch can be stripped from the
    current batch, so the current batch's own (domain, para) rows are
    joined (strings in hand) against the merged hash counts, with the
    absolute > boiler_min_docs threshold applied hash-side first so
    the join's broadcast side is just the candidate nav/footer lines.

    Idempotent under micro-batch replay: evidence is partitioned by
    batch_id and written with per-write dynamic partition overwrite
    (an .option on the writer, same as catalog.commit_buckets — NOT a
    session-conf mutation, which would leak dynamic mode into later
    unrelated overwrites), so a replayed batch replaces its own
    partition.

    Returns (boiler_sets, persisted_line_docs): line_docs is persisted
    because TWO actions consume it — the state write here, and the
    lazy confirm join when curate runs the strip — and without the
    persist the batch's explode+groupBy aggregation would execute
    twice per micro-batch. The caller unpersists it after commit.

    ``compact_every`` bounds state growth: without it every micro-batch
    re-reads ALL ``batch_id=`` partitions and re-aggregates from
    scratch — after 10^4 micro-batches that is 10^4 small files and a
    full re-agg per trigger. Every ``compact_every`` batches the merged
    (domain, h1, h2) → count table is rewritten as one snapshot
    (``lines_compacted/through=<b>``), the watermark marker advances by
    atomic rename, and the folded per-batch partitions are dropped; the
    per-trigger read is then one snapshot + at most ``compact_every``
    tail partitions. Replay stays idempotent across the horizon: a
    replayed batch == the watermark (the one batch Structured
    Streaming can replay after a crash during the compacting trigger)
    skips its already-folded state write entirely — a strict no-op —
    while a replayed tail batch dynamic-overwrites its own partition
    as before; a batch id BELOW the watermark cannot occur in a
    healthy stream and fails fast (checkpoint/state mismatch, see
    the guard below). A crash mid-
    compaction leaves a half-written snapshot the marker never points
    to; the read path ignores it and the next compaction overwrites it."""
    # one-time per process: schema inference on the state table costs
    # a listing + footer read per call — pointless on every trigger of
    # a long stream for a migration check whose answer cannot change
    # under this process's own writes
    if state_dir not in _SCHEMA_CHECKED and _has_batch_partitions(state_dir, "lines"):
        legacy = spark.read.parquet(f"{state_dir}/lines")
        if "para" in legacy.columns or "h1" not in legacy.columns:
            raise ValueError(
                "boiler state format changed (found legacy string-keyed "
                f"schema {legacy.columns} in {state_dir}/lines); clear the "
                "state_dir or migrate it to (domain, h1, h2, line_docs)"
            )
        _SCHEMA_CHECKED.add(state_dir)
    through = _compacted_through(state_dir)
    # batch ids are assigned by the streaming checkpoint and only ever
    # grow; the single legitimate id <= watermark is a crash-replay of
    # the batch that RAN the last compaction (== through). Anything
    # OLDER means this stream's checkpoint does not own this state_dir
    # (fresh/rewound checkpoint against old state) — silently skipping
    # writes would freeze boilerplate evidence forever, so fail fast.
    if batch_id < through:
        raise ValueError(
            f"boiler state watermark ({through}) is ahead of micro-batch "
            f"id {batch_id}: this state_dir was compacted by a different "
            "(or further-along) checkpoint. Resume with the original "
            "checkpoint_dir, or clear the boiler state_dir."
        )
    line_docs, dom_docs = boiler_line_evidence(docs, cfg)
    line_docs = line_docs.persist()
    if batch_id != through:
        # rebalance before writing: the evidence frame reads from the
        # persisted cache with the scoring stage's partitioning, which
        # would emit one near-empty file per cached partition per
        # micro-batch; the AQE rebalance re-sizes write partitions to
        # the advisory byte target instead (1 file per batch at test
        # scale, ~64 MB files at crawl scale)
        (
            _line_hashes(line_docs)
            .select("domain", "h1", "h2", "line_docs")
            .withColumn("batch_id", F.lit(batch_id))
            .hint("rebalance")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{state_dir}/lines")
        )
        (
            dom_docs.withColumn("batch_id", F.lit(batch_id))
            .hint("rebalance")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{state_dir}/domains")
        )
    merged_lines = _live_state(
        spark, state_dir, "lines", through, ["domain", "h1", "h2", "line_docs"],
        "domain string, h1 long, h2 long, line_docs long",
    ).groupBy("domain", "h1", "h2").agg(F.sum("line_docs").alias("line_docs"))
    merged_doms = _live_state(
        spark, state_dir, "domains", through, ["domain", "domain_docs"],
        "domain string, domain_docs long",
    ).groupBy("domain").agg(F.sum("domain_docs").alias("domain_docs"))
    if compact_every and batch_id - through >= compact_every:
        merged_lines.hint("rebalance").write.mode("overwrite").parquet(
            f"{state_dir}/lines_compacted/through={batch_id}"
        )
        merged_doms.hint("rebalance").write.mode("overwrite").parquet(
            f"{state_dir}/domains_compacted/through={batch_id}"
        )
        _advance_watermark(state_dir, batch_id)
        _gc_folded(state_dir, "lines", batch_id)
        _gc_folded(state_dir, "domains", batch_id)
        through = batch_id
        # explicit schema: zero-file snapshots must read back empty,
        # not wedge on inference (see _history_state)
        merged_lines = spark.read.schema(
            "domain string, h1 long, h2 long, line_docs long"
        ).parquet(f"{state_dir}/lines_compacted/through={through}")
        merged_doms = spark.read.schema(
            "domain string, domain_docs long"
        ).parquet(f"{state_dir}/domains_compacted/through={through}")
    cand = merged_lines.filter(F.col("line_docs") > cfg.boiler_min_docs)
    confirmed = (
        _line_hashes(line_docs.select("domain", "para"))
        .join(F.broadcast(cand), ["domain", "h1", "h2"])
        .select("domain", "para", "line_docs")
    )
    return boiler_sets_from_counts(confirmed, merged_doms, cfg), line_docs


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts — late rows beyond the
    watermark are dropped, state is bounded."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TS for watermark
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value_cents",
        )
    )


def run_windowed_counts(spark: SparkSession, input_dir: str, checkpoint_dir: str,
                        table_name: str, schema: str,
                        window: str = "1 hour") -> "StreamingQuery":
    """File-source events stream → windowed counts → in-memory sink
    (complete mode), processing everything available then stopping."""
    ev = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(ev, window=window)
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def running_domain_stats(pages: DataFrame,
                         idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState
    (the engine-native form the task brief names for operators the
    built-in aggregations can't express): per-domain RUNNING totals —
    documents seen, Swedish-tagged documents, total text bytes —
    carried across micro-batches in explicit GroupState rather than
    recomputed from history.

    Each micro-batch emits one updated row per domain touched in that
    batch (update-mode semantics); state is three longs per domain —
    bounded by the domain universe, not the stream length. Restart-safe
    via the query checkpoint like all stateful operators.

    ``idle_timeout_ms`` (continuous streams only): evict a domain's
    state after that much processing-time inactivity, so an abandoned
    domain does not pin memory forever. Leave None for availableNow /
    catch-up runs — a processing-time timeout makes Spark keep the
    query alive for no-data timeout sweeps, so an availableNow run
    never self-terminates (measured: a 2-row batch 4.8s with NoTimeout
    vs awaitTermination-capped minutes with a timeout set)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "domain string, docs_seen long, sv_docs long, text_bytes long"
    )
    state_schema = "docs_seen long, sv_docs long, text_bytes long"

    def _update(key, batches, state: GroupState):
        (domain,) = key
        if state.hasTimedOut:
            state.remove()
            return
        docs, sv, nbytes = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            docs += len(pdf)
            sv += int((pdf["lang"] == "sv").sum())
            nbytes += int(pdf["text"].fillna("").str.encode("utf-8").str.len().sum())
        state.update((docs, sv, nbytes))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"domain": [domain], "docs_seen": [docs], "sv_docs": [sv],
             "text_bytes": [nbytes]}
        )

    from scripts_spark.sources.pages import domain_of

    # project BEFORE the groupBy exchange: _update reads only lang and
    # text, and shuffling + Arrow-serializing the html blob per page is
    # the exact cost the batch pipeline was rewritten to avoid (BENCH.md
    # round-2 note). domain_of is the shared batch-pipeline key, so the
    # streaming stats join cleanly against domain-keyed batch outputs.
    return (
        pages.select(domain_of(F.col("url")).alias("domain"), "lang", "text")
        .groupBy("domain")
        .applyInPandasWithState(
            _update, out_schema, state_schema, "update",
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout,
        )
    )


def run_domain_stats(spark: SparkSession, input_dir: str, checkpoint_dir: str,
                     table_name: str,
                     max_files_per_trigger: int | None = None) -> "StreamingQuery":
    """File-source pages stream → running_domain_stats → in-memory
    sink (update mode), processing everything available then stopping."""
    pages = read_pages_stream(spark, input_dir, max_files_per_trigger)
    agg = running_domain_stats(pages)
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
