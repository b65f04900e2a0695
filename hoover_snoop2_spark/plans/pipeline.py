"""The end-to-end extraction pipeline — snoop2's task DAG
(walk → handle_file → {unarchive|email|tika|pdf} → gather → index,
SURVEY.md §3.1) re-expressed as one checkpointed DataFrame program.

Shape::

    pages ──► hash ──► recursion-guard ──► dedup(sha3) ──► size-class
          repartition ──► analyze (mapInPandas: sniff+extract+unpack)
          ──► join back to urls ──► children become next round's pages
          (bounded driver loop) ──► union rounds ──► gather projection
          (filetype, lang, word-count, skip rules) ──► digests

Scale notes (the parts that matter at 10^12 docs):

- extraction runs once per unique blob (dropDuplicates on sha3) and results
  fan back to urls with a join — the reference's content-hash memoization
  (models.py:102-113) as a relational op;
- the unpack loop is data-driven but bounded (MAX_DEPTH), with an
  ancestor-hash recursion guard replacing check_recursion
  (archives.py:531-540); each round is checkpointed, so lineage stays flat
  and a crashed run resumes from the last round's parquet/Iceberg snapshot;
- heavy blobs are spread thin before the UDF stage (spread_heavy,
  plans/skew.py) — light rows pass through unshuffled;
- everything after the UDF is plain Catalyst-optimized DataFrame code.
"""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.filetypes import filetype_col
from ..functions.langid import detect_language_udf
from ..operators.analyze import ANALYZE_SCHEMA, analyze_map_in_pandas
from .checkpoint import CheckpointStore, resume_delta
from .metrics import RowCounter, stage_metrics
from .skew import HEAVY_SPREAD_BYTES, spread_heavy

MAX_DEPTH = 5

#: 'auto' skips the dedup election entirely when the measured duplicate
#: fraction of a round is at or below this: re-analyzing a few duplicate
#: blobs costs dup_frac extra kernel CPU, while the election costs a
#: winner join against the blob scan plus two clone joins over the digest
#: and child tables — a bad trade until duplicates are common.  The
#: kernel is pure per (url, bytes), so both paths produce byte-identical
#: digests (certified by test_dedup_strategies.py).
DUP_SKIP_FRAC = 0.05

#: opt-in step timing to stdout (perf debugging)
_TIMING = os.environ.get("SNOOP_SPARK_TIMING") == "1"

_DIGEST_FIELDS = [
    "sha3_256", "md5", "sha1", "sha256", "size", "mime_type", "mime_encoding",
    "text", "status", "broken_reason", "subject", "email_from", "email_to",
    "email_domains", "email_date", "email_header", "email_header_key",
    "table_columns", "table_row_count",
    "exif_location", "exif_date", "pgp", "date_created", "date_modified",
    "n_children",
]


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    checkpoint_dir: str | None = None,
    max_depth: int = MAX_DEPTH,
    previous_digests: DataFrame | None = None,
    inline_max_children: int | None = None,
    inline_max_bytes: int | None = None,
    dedup_strategy: str = "auto",
    include_previous: bool = True,
    broadcast_max_uniques: int = 1_000_000,
    archive_password: str | None = None,
    pgp_keydata: bytes | None = None,
    pgp_passphrase: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """pages(url, warc_ts, html, ...) → (digests, metrics).

    ``previous_digests`` enables incremental re-runs: already-processed
    hashes are anti-joined away (resume_delta) and stitched back in.
    ``include_previous=False`` returns only this run's delta (append-style
    sinks — the streaming per-epoch writer — union epochs themselves).

    ``dedup_strategy``:
    - ``'auto'`` (default): measured per round — the dup-rate/heavy-count
      aggregates ride the pairs write via ``observe`` (no separate stats
      job); a round whose duplicate fraction is ≤ ``DUP_SKIP_FRAC`` picks
      ``none`` (analyze every row, skip the election + clone joins),
      otherwise ``broadcast`` while the unique-hash set fits
      (``broadcast_max_uniques``), degrading to ``shuffle`` past it, so
      the plan no longer silently breaks at ~10⁸ uniques on caller trust.
    - ``'none'``: no dedup election at all — every row is analyzed
      directly.  The kernel is deterministic per (url, bytes), so digests
      are identical to the elected paths'; duplicate blobs just spend
      duplicate kernel CPU.  Right when duplicates are rare (auto picks
      this by measurement); also removes the winner broadcast and both
      clone joins from the plan.
    - ``'broadcast'``: blob bytes never shuffle — winner urls elected over
      the (sha3, url) pairs table and broadcast back as a semi-join.
      Right while the per-round winner set fits a broadcast (millions of
      uniques).
    - ``'shuffle'``: one co-located shuffle of the blobs by sha3 with a
      min_by representative election, and the duplicate fan-out joins run
      as regular (non-broadcast) joins.  Right at 10^12-doc scale where
      neither winners nor the dup set fit a broadcast; pairs with an
      Iceberg table bucketed by sha3_256 so the exchange is free.
    """
    assert dedup_strategy in ("auto", "broadcast", "shuffle", "none"), dedup_strategy
    # Every stage boundary is a parquet snapshot (Iceberg-commit analog):
    # resumable, lineage-flat, and — decisive for this workload — all
    # downstream consumers read back COLUMN-PRUNED (children readers never
    # deserialize digest text; digest readers never touch child binaries).
    # Block-store persist/localCheckpoint was measured 2-4x more CPU here
    # because every consumer pays a full-row deserialize.
    user_dir = checkpoint_dir is not None
    if checkpoint_dir is None:
        import atexit
        import shutil
        import tempfile

        checkpoint_dir = tempfile.mkdtemp(prefix="snoop_spark_ckpt_")
        # ephemeral dirs are OURS to reap: the returned DataFrame reads
        # these parquet snapshots lazily, so deletion must wait until
        # interpreter exit — without this, every bench/test leg leaks
        # ~180 MB and a long session eventually fills /tmp (measured:
        # a full bench died on ENOSPC behind ~80 GB of stale legs)
        atexit.register(shutil.rmtree, checkpoint_dir, ignore_errors=True)
    cp = CheckpointStore(checkpoint_dir)

    work = pages.select(
        "url",
        "html",
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).alias("depth"),
        F.array().cast("array<string>").alias("ancestors"),
    )

    digest_rounds: list[DataFrame] = []
    metric_rounds: list[DataFrame] = []
    round_no = 0

    while True:
        # hashed is deliberately NOT materialized: blob bytes are the
        # dominant traffic, so its two consumers (pairs, analyze input)
        # recompute the cheap hash from the source scan instead of writing
        # corpus-sized blocks.  Round 0 reads straight from parquet; later
        # rounds read the (small) checkpointed child work set.
        # JVM-side sha2-256 as the opaque dedup/recursion key: blob bytes
        # never cross the Arrow boundary just to be hashed (the reported
        # sha3_256 Blob-PK field is computed inside the analyze kernel)
        hashed = work.withColumn("blob_key", F.sha2(F.col("html"), 256))

        # pairs: everything about a url EXCEPT the bytes — tiny; this is
        # the only per-round bookkeeping materialization.  size rides
        # along (8 B/row) so the skew guard below can be gated on a
        # measured heavy count instead of engaging unconditionally.
        # The per-round strategy aggregates (dup rate, heavy count) ride
        # this write via observe — they cost no second job, and every
        # consumer is a pure PLAN decision (a mis-observed value can only
        # pick a slower strategy, never a wrong result).
        _t0 = _time.perf_counter()
        obs = Observation()
        pairs = cp.write(
            hashed.select(
                "blob_key", "url", "parent_url", "depth", "ancestors",
                F.coalesce(F.length("html"), F.lit(0)).alias("size"),
            ).observe(
                obs,
                F.approx_count_distinct("blob_key").alias("n_uniq"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count_if(F.col("size") > HEAVY_SPREAD_BYTES).alias("n_heavy"),
            ),
            f"pairs_r{round_no}",
        )
        stats = obs.get
        if _TIMING:
            print(f"[pipeline] r{round_no} pairs write+stats: "
                  f"{_time.perf_counter() - _t0:.1f}s", flush=True)
        n_uniq, n_rows = stats["n_uniq"], stats["n_rows"]
        dup_frac = 0.0 if n_rows == 0 else 1.0 - n_uniq / n_rows
        if dedup_strategy == "auto":
            # resume rounds keep the election: the memoization anti-join
            # runs against the tiny pairs table there, never the blob rows
            if dup_frac <= DUP_SKIP_FRAC and not (
                round_no == 0 and previous_digests is not None
            ):
                strategy = "none"
            elif n_uniq <= broadcast_max_uniques:
                strategy = "broadcast"
            else:
                strategy = "shuffle"
            if _TIMING:
                print(f"[pipeline] r{round_no} auto dedup: ~{n_uniq} uniques "
                      f"/ {n_rows} rows (dup {dup_frac:.3f}) → {strategy}",
                      flush=True)
        else:
            strategy = dedup_strategy
        if strategy == "broadcast":
            # the broadcast fast path joins blobs on the WINNING URL, which
            # is only sound when urls are unique this round (a re-crawled
            # WARC url carrying two payloads breaks a url-only join) — one
            # exact aggregate over the tiny pairs parquet, run only when
            # this path is actually taken.
            _t0 = _time.perf_counter()
            u = pairs.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("url").alias("u"),
            ).first()
            urls_unique = u["n"] == u["u"]
            if _TIMING:
                print(f"[pipeline] r{round_no} url-unique check: "
                      f"{_time.perf_counter() - _t0:.1f}s", flush=True)
        _bcast = F.broadcast if strategy == "broadcast" else (lambda df: df)

        # recursion guard: a child whose bytes equal an ancestor container
        # is a zip bomb (check_recursion, archives.py:531-540).  Round 0
        # has no ancestors by construction — skip the branch there.
        if round_no == 0:
            ok_pairs = pairs
        else:
            is_rec = F.array_contains(F.col("ancestors"), F.col("blob_key"))
            # recursion markers carry the sha2 blob key as BOTH sha256
            # (literally correct — blob_key IS the bytes' sha2-256) and as
            # their stable sha3_256 document id: the ES sink ids on
            # sha3_256 (a NULL id re-emits forever) and resume_delta
            # anti-joins on sha256 (a NULL there re-processes the bomb on
            # every incremental run).  The bytes' true sha3 lives on the
            # ancestor container's own digest row.
            digest_rounds.append(
                pairs.filter(is_rec).select(
                    "url", "parent_url", "depth",
                    F.col("blob_key").alias("sha3_256"),
                    F.col("blob_key").alias("sha256"),
                    F.lit("broken").alias("status"),
                    F.lit("archive_recursion").alias("broken_reason"),
                    F.lit("").alias("text"),
                )
            )
            ok_pairs = pairs.filter(~is_rec)

        # memoization: skip hashes already digested in a previous run
        if round_no == 0:
            ok_pairs = resume_delta(ok_pairs, previous_digests)

        # Dedup WITHOUT moving blobs: elect one representative url per
        # hash over the pairs table (bytes-per-row ~100 B), then semi-join
        # the winner set back against the blob scan as a BROADCAST join —
        # blobs never leave their input partitions.  The corpus-sized
        # dedup shuffle this replaces was the pipeline's bandwidth
        # bottleneck.  (At 10^12-doc scale the winner set outgrows a
        # broadcast: there the Iceberg table is bucketed by sha3_256 at
        # ingest and dedup_by_size_class (plans/skew.py) does the same in
        # one co-located shuffle; both paths are kept.)
        # winners carry their depth: a duplicate and its representative can
        # sit at different depths in the same round (deferred children mix
        # depths), so clones must rebase depth/ancestors on rep_depth.
        if strategy != "none":
            winners = (
                ok_pairs.groupBy("blob_key")
                .agg(F.min_by(F.struct("url", "depth"), F.col("url")).alias("w"))
                .select("blob_key", F.col("w.url").alias("url"),
                        F.col("w.depth").alias("rep_depth"))
            )
        if strategy == "none":
            # no election: analyze every row directly — duplicate blobs
            # re-run the (pure) kernel instead of being cloned by joins.
            # Round 0 skips the JVM hash pass entirely: the kernel derives
            # blob_key from the bytes it already hashes for the digest's
            # sha256 field (identical value by construction).  Later
            # rounds reuse the in-scan JVM hash for the recursion filter
            # (the marker rows still come from the pairs table above); a
            # forced-'none' resume run anti-joins on the in-scan hash.
            if round_no > 0:
                uniq = hashed.filter(
                    ~F.array_contains(F.col("ancestors"), F.col("blob_key"))
                )
            elif previous_digests is not None:
                uniq = resume_delta(hashed, previous_digests)
            else:
                uniq = work.withColumn("blob_key", F.lit(None).cast("string"))
        elif strategy == "broadcast":
            # winners already reflects the recursion + resume filters.
            # Fast path (urls unique this round — the overwhelmingly common
            # case, verified by the stats pass above): join the raw blob
            # scan on the WINNING URL; the inner join attaches the
            # already-computed blob_key, so the corpus bytes are NOT
            # sha2-hashed a second time — at 10^12 docs a redundant hash
            # pass is ~10^5 core-seconds.
            # Slow path (a url carries >1 distinct payload this round —
            # re-crawled WARC urls): a url-only join would attach every
            # payload under the single winner's blob_key and clone the
            # wrong content's subtree, so join key-verified on
            # (blob_key, url) instead, paying one extra hash pass over the
            # blobs.  Each (url, payload) pair keeps its own digest row.
            if urls_unique:
                uniq = work.join(F.broadcast(winners), "url").drop("rep_depth")
            else:
                uniq = hashed.join(
                    F.broadcast(winners.drop("rep_depth")), ["blob_key", "url"]
                )
        else:
            # co-located shuffle election: blobs move once, grouped by
            # sha3; min_by keeps the representative row whole.  The blob
            # rows must carry the same filters the pairs table got —
            # recursion guard (rounds >= 1) and resume memoization
            # (round 0) — or retired/recursive blobs would win elections.
            ok_rows = hashed
            if round_no > 0:
                ok_rows = ok_rows.filter(
                    ~F.array_contains(F.col("ancestors"), F.col("blob_key"))
                )
            elif previous_digests is not None:
                ok_rows = resume_delta(ok_rows, previous_digests)
            uniq = (
                ok_rows.groupBy("blob_key")
                .agg(
                    F.min_by(
                        F.struct("url", "parent_url", "depth", "ancestors", "html"),
                        F.col("url"),
                    ).alias("w")
                )
                .select("blob_key", "w.*")
            )
        # skew guard (plans/skew.py): megabyte-class blobs co-located in
        # one input split would stall the analyze stage — spread ONLY the
        # heavy rows thin; light rows keep their partitioning unshuffled.
        # Gated on the measured per-round heavy count (from the same pairs
        # agg as the dedup strategy pick): an all-light round — the common
        # web-text case — skips the guard entirely, because its
        # filter-union costs a second pass over the upstream join/scan.
        if stats["n_heavy"] > 0:
            uniq = spread_heavy(uniq)

        # container subtrees expand INSIDE the kernel (analyze_tree) —
        # digest rows come out fully formed for the whole tree; only
        # oversized listings come back as kind='child' for a next round
        # per-partition row counter rides the UDF via an accumulator —
        # filled during the checkpoint write, no extra action (the
        # reference's per-task counters, admin.py:149-276)
        counter = RowCounter(spark, f"analyze_r{round_no}")
        analyzed = uniq.mapInPandas(
            counter.wrap(
                analyze_map_in_pandas(
                    max_depth=max_depth,
                    inline_max_children=inline_max_children,
                    inline_max_bytes=inline_max_bytes,
                    archive_password=archive_password,
                    pgp_keydata=pgp_keydata,
                    pgp_passphrase=pgp_passphrase,
                    # only the no-election path deliberately ships null
                    # keys for the kernel to derive; under the elected
                    # strategies a null key means NULL html and must stay
                    # null (root_sha NULL keeps the clone joins away from
                    # the empty-bytes hash)
                    derive_null_key=(strategy == "none"),
                )
            ),
            schema=ANALYZE_SCHEMA,
        )
        _t0 = _time.perf_counter()
        analyzed = cp.write(analyzed, f"analyzed_r{round_no}")
        if _TIMING:
            print(f"[pipeline] r{round_no} analyze: "
                  f"{_time.perf_counter() - _t0:.1f}s", flush=True)
        metric_rounds.append(
            spark.createDataFrame(
                [("analyze_udf", round_no, "emitted", None,
                  int(counter.acc.value), None, None)],
                schema="stage string, round int, status string, "
                       "broken_reason string, rows bigint, bytes bigint, "
                       "text_chars bigint",
            )
        )

        digests_r = analyzed.filter(F.col("kind") == "digest").select(
            "root_sha", "url", "parent_url", "depth", *_DIGEST_FIELDS
        )
        digest_rounds.append(digests_r.drop("root_sha"))
        metric_rounds.append(stage_metrics(digests_r, "analyze", round_no))

        # duplicate round-input urls (lost the election) clone the
        # representative's whole subtree via a broadcast of the small dup
        # set + url-prefix rewrite — digest texts themselves never shuffle.
        # strategy='none' has no election: every url analyzed its own row,
        # so there is nothing to clone and the joins are skipped outright.
        if strategy != "none":
            dups = (
                ok_pairs.withColumnsRenamed(
                    {"blob_key": "root_sha", "url": "dup_url",
                     "parent_url": "dup_parent_url", "depth": "dup_depth",
                     "ancestors": "dup_ancestors"}
                )
                .join(
                    _bcast(winners.withColumnsRenamed(
                        {"blob_key": "root_sha", "url": "rep_url"})),
                    "root_sha",
                )
                .filter(F.col("dup_url") != F.col("rep_url"))
            )
            rewrite_url = F.concat(
                F.col("dup_url"),
                F.expr("substring(url, length(rep_url) + 1)"),
            )
            # the subtree root is the row at the REPRESENTATIVE's depth;
            # clones rebase depth as dup_depth + (depth - rep_depth)
            rewrite_parent = F.when(
                F.col("depth") == F.col("rep_depth"), F.col("dup_parent_url")
            ).otherwise(
                F.concat(F.col("dup_url"),
                         F.expr("substring(parent_url, length(rep_url) + 1)"))
            )
            rewrite_depth = (
                F.col("dup_depth") + F.col("depth") - F.col("rep_depth")
            )
            dup_digests = (
                digests_r.join(
                    _bcast(dups.select(
                        "root_sha", "dup_url", "dup_parent_url", "dup_depth",
                        "rep_url", "rep_depth")),
                    "root_sha",
                )
                .withColumn("url", rewrite_url)
                .withColumn("parent_url", rewrite_parent)
                .withColumn("depth", rewrite_depth)
                .drop("root_sha", "dup_url", "dup_parent_url", "dup_depth",
                      "rep_url", "rep_depth")
            )
            digest_rounds.append(dup_digests)

        children = analyzed.filter(F.col("kind") == "child")
        if round_no >= max_depth:
            break
        # deferred-children probe (r6): the analyze checkpoint already
        # ran, so the UDF counter's child accumulator holds the round's
        # kind='child' row count — no extra job (the former
        # `children.limit(1).count()` probe re-read the snapshot per
        # round).  See RowCounter.child_acc for why the zero-test is
        # sound under task retries.
        if counter.child_acc.value == 0:
            break

        # deferred children: representative rows carry their fields already;
        # duplicate parents clone them with the same prefix rewrite (no
        # election → no clones: every parent's children came out of its
        # own analysis)
        rep_child_work = children.select(
            "url",
            F.col("child_data").alias("html"),
            "parent_url",
            "depth",
            "ancestors",
        )
        next_work = rep_child_work
        if strategy != "none":
            dup_child_work = (
                children.select(
                    "root_sha", "url", "parent_url", "depth", "ancestors",
                    "child_data"
                )
                .join(_bcast(dups), "root_sha")
                .select(
                    rewrite_url.alias("url"),
                    F.col("child_data").alias("html"),
                    F.concat(
                        F.col("dup_url"),
                        F.expr("substring(parent_url, length(rep_url) + 1)"),
                    ).alias("parent_url"),
                    rewrite_depth.alias("depth"),
                    # ancestor chain: duplicate's own prefix + the subtree
                    # suffix below the representative's depth (identical
                    # bytes → identical hashes below the root)
                    F.concat(
                        F.col("dup_ancestors"),
                        F.expr("slice(ancestors, rep_depth + 1, "
                               "size(ancestors) - rep_depth)"),
                    ).alias("ancestors"),
                )
            )
            next_work = rep_child_work.unionByName(dup_child_work)
        _t0 = _time.perf_counter()
        work = cp.write(next_work, f"work_r{round_no + 1}")
        if _TIMING:
            print(f"[pipeline] r{round_no} work write: "
                  f"{_time.perf_counter() - _t0:.1f}s", flush=True)
        round_no += 1

    all_digests = digest_rounds[0]
    for d in digest_rounds[1:]:
        all_digests = all_digests.unionByName(d, allowMissingColumns=True)

    digests = gather(all_digests)
    metrics = metric_rounds[0]
    for m in metric_rounds[1:]:
        metrics = metrics.unionByName(m)

    if previous_digests is not None and include_previous:
        digests = previous_digests.unionByName(digests, allowMissingColumns=True)

    # with a caller-owned checkpoint dir the final table is snapshotted
    # (resume anchor); ephemeral runs return it lazily — the caller's
    # sink/action is the only full-table materialization
    if user_dir:
        _t0 = _time.perf_counter()
        digests = cp.write(digests, "digests")
        if _TIMING:
            print(f"[pipeline] final gather: {_time.perf_counter() - _t0:.1f}s",
                  flush=True)
    return digests, metrics




def gather(all_digests: DataFrame) -> DataFrame:
    """The digests.gather projection (digests.py:216-390, 865-978):
    filetype mapping, language detect, word-count, skip-by-extension,
    attachments flag, path fields.  Pure column expressions + one lang UDF.
    """
    url_l = F.lower(F.col("url"))
    skip_ext = url_l.endswith(".exe") | url_l.endswith(".dat")
    return (
        all_digests
        .withColumn("filetype", filetype_col(F.col("mime_type")))
        .withColumn(
            "status",
            F.when(skip_ext, F.lit("skipped")).otherwise(F.col("status")),
        )
        # the reference's "word-count" is max text length in characters
        # (digests.py:887-893) — preserved verbatim, quirk included
        .withColumn("word_count", F.coalesce(F.length("text"), F.lit(0)))
        .withColumn(
            "lang",
            F.when(
                F.length("text") > 0, detect_language_udf(F.col("text"))
            ).otherwise(F.lit(None)),
        )
        .withColumn(
            "attachments",
            (F.col("filetype") == "email") & (F.coalesce("n_children", F.lit(0)) > 0),
        )
        .withColumn("path", F.col("url"))
        .withColumn(
            "is_container", F.coalesce(F.col("n_children"), F.lit(0)) > 0
        )
    )


def write_digests(digests: DataFrame, out_dir: str) -> None:
    """Sink analog of digests.bulk_index (digests.py:558-668): on a cluster
    this is ``writeTo(iceberg_table).append()`` / a foreachBatch ES writer;
    here a parquet directory."""
    digests.write.mode("overwrite").parquet(os.path.join(out_dir, "digests"))
