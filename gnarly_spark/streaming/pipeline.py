"""The CDC ingest pipeline: changelog stream -> lake table, exactly-once.

This is the Spark re-expression of the reference's whole engine loop
(SURVEY.md §3.2): Blockstream tail -> Ourbit.processTransaction -> reducer
-> commitTransaction -> typed-store apply (packages/gnarly-core/src/
Blockstream.ts:157-177, ourbit/Ourbit.ts:60-105,144-150,
typeStore/Sequelize.ts:28-191), plus reorg rollback (Ourbit.ts:152-167) and
crash resume (ReducerRunner.ts:63-104) — all as ONE set-oriented
``foreachBatch`` program:

  per micro-batch (batch_id, events):
    0. refire guard: batch_id already committed to the target -> skip
       (exactly-once atop the checkpoint's at-least-once).
    1. append events to the retained event log (idempotent: one partition
       dir per batch_id, overwritten on refire) — the analog of gnarly's
       transactions/patches/operations bookkeeping tables
       (stores/sequelize.ts:18-99), bounded by the reorg-retention window
       exactly like saveHistoricalBlock + prune (Blockstream.ts:202-208).
    2. resolve reverts: blocks named by revert events are dead; the urls
       they touched are re-adjudicated from
       (retained log ∪ current target rows ∪ activated undo rows).
    3. last-writer-wins per affected url (max_by partial agg; optional
       explicit salting) -> winners.
    4. extract text ONLY for winning events (vectorized pandas UDF).
    5. save the prior target rows being replaced to the UNDO log, tagged
       with the replacing block — the set-oriented form of the reference's
       per-operation ``oldValue`` + invertOperation (ourbit/types.ts:6-14,
       utils.ts:77-103): if the replacing block is later reverted, the
       prior row re-enters LWW as a candidate and resurfaces.
    6. MERGE upserts + deletes into the lake table keyed on url, with
       batch_id recorded in the snapshot -> idempotent commit.
    7. append audit lineage rows (before the commit point, idempotent) +
       per-batch metrics (after).

State bounding (the reference's BLOCK_RETENTION=100, ReducerRunner.ts:19):
reorgs deeper than ``retention_blocks`` are impossible by contract, so
- event-log partitions whose NEWEST block left the window are pruned
  (none of their events can be reverted, and any prior value they shadow
  was saved to undo when it was replaced);
- undo partitions are pruned when their REPLACING blocks leave the window
  (the revert that would activate them can no longer occur).

Scale notes:
- Nothing here collects event data to the driver; the only driver-side
  metadata are bucket ids (bounded by table bucket count) and per-batch
  stats JSON.
- The LWW agg is a partial aggregation (map-side combine) => hot-url skew
  is pre-reduced before shuffle; `salt_partitions` adds an explicit
  two-phase reduce on top.
- Backpressure = `maxFilesPerTrigger` on the source (the analog of the
  fast-forward queue cap 100 at Blockstream.ts:24,106-112).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gnarly_spark.fixtures import CHANGELOG_COLUMNS, CHANGELOG_DDL
from gnarly_spark.functions.extraction import extract_text_udf
from gnarly_spark.operators.audit import audit_rows
from gnarly_spark.operators.replay import (
    last_writer_wins,
    last_writer_wins_salted,
    reverted_blocks as reverted_blocks_op,
)
from gnarly_spark.sinks.lake import ParquetLakeTable

# target-table schema: page columns + lineage columns (block/op_seq of the
# winning event — needed so a later revert can re-adjudicate the url)
TARGET_COLUMNS = ["url", "warc_ts", "html", "text", "lang", "_block_hash", "_block_id", "_op_seq"]

#: undo prior-join broadcast cap (batch event count): below it, the batch's
#: winner-url relation broadcasts so the target never shuffles for the undo
#: save; above it (bootstrap-scale triggers) a forced broadcast would OOM
#: the driver, so the join is left to AQE. 4M keys ~ a few hundred MB of
#: (url, block) rows — sized to the documented multi-M-batch driver heap
#: (SPARK_GRAFT_DRIVER_MEM=48g), measured fine at 2.5M keys/batch in the
#: 20M sustained runs.
_UNDO_BROADCAST_MAX_KEYS = 4_000_000


def _undo_prior(tgt: DataFrame, replacing: DataFrame, n_replacing: int) -> DataFrame:
    """Prior target rows being replaced this batch (the undo-log save).

    Broadcasts ``replacing`` when its measured row count is under
    _UNDO_BROADCAST_MAX_KEYS: ``tgt`` is the WHOLE table, and a
    stats-blind sort-merge would shuffle O(table) bytes per batch — a
    growth term the per-batch flatness claim forbids. Above the cap a
    forced broadcast would OOM the driver instead, so the plain join is
    left to AQE. Inner join, so broadcasting the small side is legal
    (the outer-join non-preserved-side gotcha doesn't apply). Plan shape
    pinned by tests/test_plans.py::test_undo_prior_join_broadcasts_under_cap."""
    if n_replacing <= _UNDO_BROADCAST_MAX_KEYS:
        replacing = F.broadcast(replacing)
    return tgt.join(replacing, "url", "inner").select(
        *tgt.columns, "_replaced_by_block", "_replaced_by_block_id"
    )


class CdcIngestPipeline:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        target: ParquetLakeTable | None = None,
        retention_blocks: int = 100,
        salt_partitions: int | None = None,
        rename_map: dict[str, str] | None = None,
        with_text: bool = True,
        reducers: list | None = None,
        retain_log: bool = True,
        spread_batch: bool = True,
        dedup_minhash: dict | None = None,
        compact_every: int | None = None,
        files_per_bucket: int = 1,
        quality_gate: list | None = None,
        canonicalize_urls: bool = False,
        outbox_dir: str | None = None,
    ):
        self.spark = spark
        self.work_dir = work_dir.rstrip("/")
        # files_per_bucket > 1 range-splits each target bucket's rewrite
        # into parallel write tasks (lake.py _write_buckets) — the COW
        # merge's per-bucket single-task parquet+zstd encode is the
        # dominant serial term once buckets outgrow cores (measured 6-10x
        # on a 6M-row rewrite, BENCH.md). Only used when `target` is not
        # supplied; pass your own table to control its layout directly.
        self.target = target or ParquetLakeTable(
            spark,
            os.path.join(self.work_dir, "pages"),
            key="url",
            files_per_bucket=files_per_bucket,
        )
        self.retention_blocks = retention_blocks
        self.salt_partitions = salt_partitions
        self.rename_map = rename_map or {}
        self.with_text = with_text
        # canonicalize_urls: rewrite the url key per functions/url.py at
        # batch entry, BEFORE the log append — so the retained log, revert
        # adjudication, reducers, and the LWW merge all key on one spelling
        # per page (a crawl feed spells the same page many ways: case,
        # ?utm_*, trailing slash — each would otherwise mint its own row)
        self.canonicalize_urls = canonicalize_urls
        # outbox_dir: after every commit, export the lake change feed as
        # Debezium envelope files (sources/debezium.py export_outbox) —
        # the transactional-outbox pattern: downstream consumers tail the
        # envelope dir instead of the lake. Idempotent on refires (the
        # export cursor follows table versions; a no-op merge exports
        # nothing) and crash-resumable (cursor persists in the outbox).
        self.outbox_dir = outbox_dir
        # extra reducers running over the same stream (gnarly runs N
        # ReducerRunners over one source, Gnarly.ts:22-28); each has its own
        # sink + batch-id guard so partial crashes repair on refire
        self.reducers = reducers or []
        # retain_log=False: the changelog source is REPLAYABLE (a parquet
        # dir / Iceberg incremental read already provides retention), so
        # the per-batch event-log append — the disk-bound serial term of
        # every micro-batch — is skipped and revert adjudication reads the
        # source directly, bounded by (op_seq <= batch head, block within
        # the retention window). Reducers use the retained log
        # (log_before), so they require retain_log=True.
        self.retain_log = retain_log
        # spread_batch: a micro-batch from a file source arrives with as
        # many partitions as FILE SPLITS in the trigger (often 1-2), so
        # every per-batch job over batch_df — the log append, the audit
        # write, the revert scans — would run near-serially NO MATTER HOW
        # MANY CORES the cluster has (measured: the audit write alone was
        # 16 s single-task on a 2.5M-event batch that merges in 5 s).
        # One repartition to cluster parallelism + persist() caches the
        # batch across executors at its first action; the ~5 downstream
        # jobs then read the cached spread copy instead of re-scanning
        # the source file through 1-2 tasks each. Released per batch.
        self.spread_batch = spread_batch
        if not retain_log and self.reducers:
            raise ValueError(
                "retain_log=False requires no extra reducers (they replay "
                "from the retained log); keep the default retain_log=True"
            )
        # dedup_minhash (None = off): per-batch near-dup detection of the
        # newly-merged page versions against a PERSISTED corpus signature
        # table (its own exactly-once lake table under the work dir).
        # Accepts {"k", "bands", "min_est_jaccard"} overrides. Flags land in
        # dedup_flags/batch=N (idempotent overwrite); see dup_flags().
        self.compact_every = compact_every
        self.dedup_minhash = dedup_minhash
        if dedup_minhash is not None and not with_text:
            # fail at construction, not mid-batch: signatures are computed
            # over the extracted text column, which with_text=False never
            # materializes
            raise ValueError(
                "dedup_minhash requires with_text=True (near-dup signatures "
                "are computed over the extracted text column)"
            )
        if dedup_minhash is not None:
            self.dedup_params = {
                "k": 8, "bands": 4, "min_est_jaccard": 0.5, **dedup_minhash
            }
            if (
                self.dedup_params["bands"] < 1
                or self.dedup_params["k"] % self.dedup_params["bands"] != 0
            ):
                # fail at construction: banding silently ignores the
                # trailing k % bands positions (quiet recall loss mid-drain)
                raise ValueError(
                    f"dedup_minhash: k ({self.dedup_params['k']}) must be "
                    f"divisible by bands ({self.dedup_params['bands']}; "
                    "bands must be >= 1)"
                )
            self.dedup_dir = os.path.join(self.work_dir, "dedup_flags")
            os.makedirs(self.dedup_dir, exist_ok=True)
            self.sig_table = ParquetLakeTable(
                spark, os.path.join(self.work_dir, "_dedup_sigs"), key="url"
            )
        # quality_gate (None = off): a list of quality.Expectation /
        # UniqueKey checks evaluated over the STAGED post-merge table every
        # batch (write-audit-publish: merge_staged -> audit -> publish).
        # A fail-mode breach raises QualityGateError and HALTS the stream —
        # a CDC batch cannot be silently skipped (later batches' LWW
        # adjudication depends on it) — leaving the stage parked on disk:
        # read_staged() reproduces the exact audited state, publish_staged()
        # ships it after a manual override, abandon_staged() frees the
        # batch_id so the fixed batch can be redelivered and the stream
        # restarted from its checkpoint. Warn-mode violations only land in
        # the batch metrics. Requires a target with merge_staged
        # (ParquetLakeTable; Iceberg's WAP branch is the production analog).
        self.quality_gate = quality_gate
        if quality_gate is not None and not hasattr(self.target, "merge_staged"):
            raise ValueError(
                "quality_gate requires a target supporting staged commits "
                "(merge_staged/publish_staged)"
            )
        self.source_dir: str | None = None
        self.source_schema: str = CHANGELOG_DDL
        self.source_format: str = "parquet"
        self.dead_letter_dir = os.path.join(self.work_dir, "_dead_letters")
        self.log_dir = os.path.join(self.work_dir, "_cdc_log")
        self.undo_dir = os.path.join(self.work_dir, "_undo")
        self.audit_dir = os.path.join(self.work_dir, "audit")
        self.metrics_dir = os.path.join(self.work_dir, "_metrics")
        self.checkpoint_dir = os.path.join(self.work_dir, "_checkpoint")
        for d in (self.log_dir, self.undo_dir, self.audit_dir, self.metrics_dir):
            os.makedirs(d, exist_ok=True)

    # ----- retained bookkeeping dirs (event log / undo log) -------------
    @staticmethod
    def _batches_in(dirpath: str) -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(dirpath)
            if d.startswith("batch=")
        )

    def _normalize_batch(self, df: DataFrame) -> DataFrame:
        """Key/column normalization applied to EVERY changelog read — the
        arriving micro-batch AND the retain_log=False source re-read (the
        raw source has the un-renamed columns and raw url spellings; if
        the re-read skipped this, revert adjudication would key deletes on
        raw urls that don't exist in the target — silent rollback loss)."""
        for src, dst in self.rename_map.items():
            if src in df.columns:
                df = df.withColumnRenamed(src, dst)
        if self.canonicalize_urls:
            from gnarly_spark.functions.url import canonicalize_url

            # coalesce: a non-URL key (canonical = NULL) keeps its raw
            # string rather than null-keying the merge; map-side, codegen'd
            df = df.withColumn(
                "url", F.coalesce(canonicalize_url(F.col("url")), F.col("url"))
            )
        return df

    def _read_batched(
        self, dirpath: str, schema: str | None = None, exclude: int | None = None
    ) -> DataFrame | None:
        batches = [b for b in self._batches_in(dirpath) if b != exclude]
        if not batches:
            return None
        paths = [os.path.join(dirpath, f"batch={b}") for b in batches]
        if schema is not None:
            return self.spark.read.schema(schema).parquet(*paths)
        # schema evolution: merge schemas across batches — a column added
        # mid-stream appears null-filled in older batches. NOT parquet's
        # mergeSchema option: it refuses a sanctioned type widening
        # (CANNOT_MERGE_SCHEMAS for an int batch next to a bigint batch
        # after a restart with widened source DDL), which would wedge the
        # stream forever since pruning only runs after a successful batch.
        # Instead derive the widened union schema the CLAUDE-documented
        # way — unionByName over empty per-batch relations (coerces
        # int+bigint -> bigint, adds missing columns) — then one explicit-
        # schema read: Spark 4 upcasts int-under-bigint at scan and
        # null-fills missing columns, no file rewrite.
        if len(paths) == 1:
            return self.spark.read.parquet(paths[0])
        widened = None
        for p in paths:
            rel = self.spark.read.parquet(p).limit(0)
            widened = (
                rel
                if widened is None
                else widened.unionByName(rel, allowMissingColumns=True)
            )
        return self.spark.read.schema(widened.schema).parquet(*paths)

    def _write_batched(
        self, dirpath: str, df: DataFrame, batch_id: int, stat_col: str
    ) -> dict:
        """Idempotent per-batch write + stats sidecar used for pruning.

        Stats ride on the write job itself via Observation — no second
        pass over the batch (one Spark job per retained-log append)."""
        from pyspark.sql import Observation

        path = os.path.join(dirpath, f"batch={batch_id}")
        obs = Observation(f"stats-{batch_id}")
        stat_exprs = [F.max(stat_col).alias("mx"), F.count(F.lit(1)).alias("n")]
        if "op_seq" in df.columns:  # seq-span lineage rides the same job
            stat_exprs += [
                F.min("op_seq").alias("mn_seq"),
                F.max("op_seq").alias("mx_seq"),
            ]
        df.observe(obs, *stat_exprs).write.mode("overwrite").parquet(path)
        stats = obs.get
        # on-disk bytes ride along (driver-side listdir, control-plane):
        # lets burst analysis distinguish "bigger batch" from "slow disk"
        # when an append's wall time spikes (VERDICT r04 #6)
        nbytes = sum(
            e.stat().st_size for e in os.scandir(path) if e.is_file()
        )
        with open(os.path.join(path, "_stats.json"), "w") as f:
            json.dump(
                {"max_block": stats["mx"], "n": stats["n"], "bytes": nbytes}, f
            )
        return {**stats, "bytes": nbytes}

    def _prune_batched(self, dirpath: str, horizon: int) -> None:
        """Drop partitions entirely older than the retention window
        (≈ deleteHistoricalBlocks, stores/sequelize.ts:232-255)."""
        for b in self._batches_in(dirpath):
            try:
                with open(os.path.join(dirpath, f"batch={b}", "_stats.json")) as f:
                    mx = json.load(f)["max_block"]
            except FileNotFoundError:
                continue
            if mx is not None and mx < horizon:
                shutil.rmtree(os.path.join(dirpath, f"batch={b}"))

    # kept for tests / introspection
    def _log_batches(self) -> list[int]:
        return self._batches_in(self.log_dir)

    # ----- per-batch op_seq ranges (retain_log=False bookkeeping) -------
    @property
    def _ranges_path(self) -> str:
        return os.path.join(self.work_dir, "_log_ranges.json")

    def _seq_ranges(self) -> list[dict]:
        """Per-batch {batch_id, min_seq, max_seq, max_block} — the metadata
        twin of the retained event log's _stats.json sidecars, so the
        source-as-log mode prunes with identical (batch-granular)
        semantics. Tiny: one dict per retained batch."""
        if os.path.exists(self._ranges_path):
            with open(self._ranges_path) as f:
                return json.load(f)
        return []

    def _record_seq_range(
        self, batch_id: int, log_stats: dict, files: list[str] | None = None
    ) -> None:
        ranges = [r for r in self._seq_ranges() if r["batch_id"] != batch_id]
        ranges.append(
            {
                "batch_id": batch_id,
                "min_seq": log_stats["mn_seq"],
                "max_seq": log_stats["mx_seq"],
                "max_block": log_stats["mx"],
                # the trigger's source files: lets the retain_log=False
                # re-read scan exactly the retained batches' files instead
                # of the whole source dir (None = unknown -> full-dir read)
                "files": files,
            }
        )
        tmp = self._ranges_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ranges, f)
        os.replace(tmp, self._ranges_path)

    def _retained_ranges(self, batch_id: int, prev_high: int | None) -> list[dict]:
        """Prior batches still inside the reorg-retention window. A range
        with NULL max_block cannot be proven outside the window — the
        pruner keeps it (same predicate in the retention step), so the
        adjudication read must include it too, or its files silently
        vanish from the bounded scan while ``bounded`` stays True."""
        horizon_prev = (prev_high if prev_high is not None else 0) - self.retention_blocks
        return [
            r for r in self._seq_ranges()
            if r["batch_id"] != batch_id
            and (r["max_block"] is None or r["max_block"] >= horizon_prev)
        ]

    def _trigger_files(self, batch_id: int) -> list[str] | None:
        """Source files of one streaming trigger, from the file-source
        checkpoint log (``<checkpoint>/sources/0/<batchId>``: a version
        header line then one JSON entry per file, stamped with the batch
        that picked it up; every 10th batch is a ``.compact`` file holding
        the full history, so entries are filtered by batchId). Written to
        the WAL before foreachBatch runs, so always present here. None if
        the log can't be read (non-file source / format drift) — callers
        must then fall back to scanning the whole source dir."""
        d = os.path.join(self.checkpoint_dir, "sources", "0")
        try:
            for name in (str(batch_id), f"{batch_id}.compact"):
                fp = os.path.join(d, name)
                if not os.path.exists(fp):
                    continue
                out = []
                with open(fp) as f:
                    for line in f:
                        line = line.strip()
                        if not line or line.startswith("v"):
                            continue
                        e = json.loads(line)
                        if e.get("batchId") == batch_id and "path" in e:
                            # entries are URI-encoded (space -> %20 etc.);
                            # Spark itself decodes via new Path(new URI(p))
                            # before re-reading — mirror that, or a file
                            # named "ev 1.jsonl" 404s on the re-read
                            out.append(urllib.parse.unquote(e["path"]))
                return out or None
        except (OSError, ValueError):  # pragma: no cover - defensive
            return None
        return None

    def _high_block(self) -> int | None:
        """Highest block delivered so far (the order-contract watermark)."""
        wm_path = os.path.join(self.work_dir, "_watermark.json")
        if os.path.exists(wm_path):
            with open(wm_path) as f:
                return json.load(f)["high_block"]
        return None

    def _check_block_order(self, batch_id: int, batch_max_block) -> None:
        """Enforce the changelog's total-order contract (a WAL/binlog
        delivers blocks in order; the reference serializes delivery at
        Blockstream.ts:37-39 and asserts consistency on resume at
        ReducerRunner.ts:78-83, exiting on mismatch).

        A batch whose NEWEST block is already more than ``retention_blocks``
        behind the head seen so far cannot be adjudicated: the events it
        must be reconciled against may have been pruned, and silently
        applying it can resurrect deleted keys. Fail fast instead.
        (Beware: a parquet-dir file source orders micro-batches by file
        MTIME, not name — parallel-written fixture dirs violate the
        contract unless mtimes follow op_seq order.)
        """
        wm_path = os.path.join(self.work_dir, "_watermark.json")
        high = -1
        if os.path.exists(wm_path):
            with open(wm_path) as f:
                high = json.load(f)["high_block"]
        if batch_max_block is not None and batch_max_block < high - self.retention_blocks:
            raise RuntimeError(
                f"changelog ordering violation: batch {batch_id} ends at block "
                f"{batch_max_block}, more than retention_blocks="
                f"{self.retention_blocks} behind head {high}; the changelog "
                "source must deliver blocks in order (file sources order by "
                "mtime — fix the fixture's file mtimes or raise retention)"
            )
        if batch_max_block is not None and batch_max_block > high:
            tmp = wm_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"high_block": batch_max_block, "batch_id": batch_id}, f)
            os.replace(tmp, wm_path)

    # ----- reducer context helpers --------------------------------------
    def reverted_blocks(self) -> DataFrame:
        """All block hashes named by retained revert events."""
        from gnarly_spark.operators.replay import reverted_blocks

        return reverted_blocks(self._read_batched(self.log_dir))

    def log_before(self, batch_id: int) -> DataFrame | None:
        """Retained events from batches before `batch_id` (fold reducers
        negate these when their blocks get reverted). Uses _read_batched's
        unionByName schema widening — parquet's mergeSchema option refuses
        a sanctioned int→bigint widening (CANNOT_MERGE_SCHEMAS) and would
        wedge reducer-attached streams after a widened-DDL restart."""
        return self._read_batched(self.log_dir, exclude=batch_id)

    # ----- the per-micro-batch program ---------------------------------
    def process_batch(
        self, batch_df: DataFrame, batch_id: int, prespread: bool = False
    ) -> None:
        """One micro-batch. Wrapper pins/unpins the batch-lifetime caches:
        persist() with an explicit unpersist here, NEVER localCheckpoint —
        checkpoint blocks are only released by the ContextCleaner after a
        JVM GC, which a large-heap driver may not run for many batches, so
        a long drain accumulates every batch's blocks (measured: drains in
        the same JVM degraded 3x by the third 2M-event drain)."""
        pinned: list[DataFrame] = []
        try:
            self._process_batch(batch_df, batch_id, pinned, prespread)
        finally:
            for df in pinned:
                try:
                    df.unpersist(blocking=False)
                except Exception:
                    pass

    def _process_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        pinned: list[DataFrame],
        prespread: bool = False,
    ) -> None:
        t0 = time.monotonic()

        self._resolve_quarantine(batch_id)
        batch_df = self._normalize_batch(batch_df)

        phases = {}
        # prespread: the caller already repartitioned AND persisted the
        # batch (the JSONL _fb caches the parse for dead-letter routing);
        # batch_df is a narrow projection of that cached spread relation,
        # so a second repartition+persist here would re-shuffle the whole
        # batch and hold a duplicate cached copy for the batch lifetime
        if self.spread_batch and not prespread:
            batch_df = batch_df.repartition(
                self.spark.sparkContext.defaultParallelism
            ).persist()
            pinned.append(batch_df)

        prev_high = self._high_block()
        if self.retain_log:
            log_stats = self._write_batched(self.log_dir, batch_df, batch_id, "block_id")
        else:
            # no log append: one agg job over the (small) batch for the
            # stats the write-time Observation used to provide
            row = batch_df.agg(
                F.max("block_id").alias("mx"),
                F.count(F.lit(1)).alias("n"),
                F.max("op_seq").alias("mx_seq"),
                F.min("op_seq").alias("mn_seq"),
            ).collect()[0]
            log_stats = {"mx": row.mx, "n": row.n, "mx_seq": row.mx_seq, "mn_seq": row.mn_seq}
        self._check_block_order(batch_id, log_stats["mx"])
        # includes materializing the spread batch cache (persist is lazy;
        # the log write / stats agg is the first action over it)
        phases["log_append"] = round(time.monotonic() - t0, 3)

        # run extra reducers first — each guards its own batch_id, so a
        # crash between sub-sinks repairs on refire (the reference's
        # save-tx-then-apply gap, Ourbit.ts:144-150, closed per sink)
        t_r = time.monotonic()
        for red in self.reducers:
            if not getattr(red, "head_only", False):
                red.apply(self, batch_df, batch_id)
        phases["reducers"] = round(time.monotonic() - t_r, 3)

        if batch_id in self.target.applied_batch_ids():
            return  # core already committed (refire)

        # the trigger's source-file list feeds both the bounded
        # retain_log=False re-read and the metrics lineage — parse the
        # checkpoint source log (O(history) .compact files) ONCE per batch
        trigger_files = self._trigger_files(batch_id)

        if self.retain_log:
            log = self._read_batched(self.log_dir)
        else:
            # replayable source: the changelog dir IS the retained log.
            # Bound it to exactly the op_seq span the batch-granular
            # retention pruning would keep: a batch is retained while its
            # NEWEST block is inside the window (pruning mid-batch would
            # lose same-batch losers that a revert of their batch-local
            # winner can still resurface — batches may span more blocks
            # than the retention window). Batches are contiguous op_seq
            # ranges (total order), so one lower bound suffices. Files
            # beyond this batch exist in the dir but have higher op_seq by
            # the changelog's total-order contract.
            if self.source_dir is None:
                raise RuntimeError(
                    "retain_log=False needs the source dir; drive the "
                    "pipeline via start() (the source is the retained log)"
                )
            ranges = self._retained_ranges(batch_id, prev_high)
            lo = min(
                [r["min_seq"] for r in ranges if r["min_seq"] is not None]
                + [log_stats["mn_seq"] or 0]
            )
            # bound the re-read to the retained batches' FILES, not the
            # whole source dir: a full-dir read is O(history) per trigger
            # (every parquet footer re-opened; for jsonl a full re-parse of
            # every delivered line) — quadratic over a long drain. The
            # per-batch file lists recorded alongside the seq ranges make
            # the scan O(retention window). The trigger's files come from
            # the file-source checkpoint log (inputFiles() is empty on
            # micro-batch frames); any gap falls back to the full dir
            # (correct, just unbounded), and the op_seq window filter below
            # keeps the semantics identical either way.
            batch_files = trigger_files
            flists = [r.get("files") for r in ranges] + [batch_files]
            files = sorted({f for fl in flists for f in (fl or [])})
            bounded = bool(files) and all(fl for fl in flists)
            log = self._normalize_batch(
                self._read_source(files=files if bounded else None)
            ).where(
                (F.col("op_seq") <= F.lit(log_stats["mx_seq"]))
                & (F.col("op_seq") >= F.lit(lo))
            )
            # an all-dead-lettered trigger has no rows: its max_block=None
            # entry could never be proven outside the retention window, so
            # the keep-unprovable rule would retain it (and re-read its
            # files) FOREVER — and it contributes nothing to `lo` or to
            # adjudication. Don't record it.
            if log_stats["n"]:
                self._record_seq_range(batch_id, log_stats, files=batch_files)

        # columns added mid-stream (schema evolution) ride along end-to-end:
        # log -> candidates -> LWW payload -> MERGE (which widens the target)
        extras = [
            (f.name, f.dataType.simpleString())
            for f in log.schema.fields
            if f.name not in CHANGELOG_COLUMNS
        ]

        def _extra_cols(df: DataFrame):
            return [
                F.col(n) if n in df.columns else F.lit(None).cast(t).alias(n)
                for n, t in extras
            ]

        # blocks reverted by ANY retained revert event (old + this batch) —
        # the one definition in operators/replay.py, not an inlined copy
        reverted = reverted_blocks_op(log)
        new_reverts = reverted_blocks_op(batch_df)

        # urls touched by this batch's events, plus urls whose applied
        # events are being reverted by this batch (need re-adjudication)
        affected = (
            batch_df.where(F.col("op") != "revert")
            .select("url")
            .unionByName(
                log.join(F.broadcast(new_reverts), "block_hash", "left_semi").select("url")
            )
            .where(F.col("url").isNotNull())
            .distinct()
            # feeds four plan branches (log/target/undo semi-joins + the
            # delete anti-join) — cache once instead of 4 batch scans
            # (persist, unpinned at batch end by the process_batch wrapper)
            .persist()
        )
        pinned.append(affected)

        # ---- candidate relation for LWW ----
        # (a) retained live events for affected urls
        log_cand = (
            log.where(F.col("op") != "revert")
            .join(F.broadcast(reverted), "block_hash", "left_anti")
            .join(affected, "url", "left_semi")
            .select(
                "url", "warc_ts", "op_seq", "op", "html", "lang",
                F.col("block_hash").alias("_block_hash"),
                F.col("block_id").alias("_block_id"),
                F.lit(None).cast("string").alias("text"),
                F.lit("log").alias("_src"),
                *_extra_cols(log),
            )
        )
        parts = [log_cand]

        # (b) current target rows (cover events pruned beyond retention);
        # a row whose own block just got reverted is excluded
        tgt = self.target.read() if self.target.current_version() >= 0 else None
        if tgt is not None and "_op_seq" in tgt.columns:
            parts.append(
                tgt.join(affected, "url", "left_semi")
                .join(
                    F.broadcast(reverted.withColumnRenamed("block_hash", "_block_hash")),
                    "_block_hash",
                    "left_anti",
                )
                .select(
                    "url", "warc_ts",
                    F.col("_op_seq").alias("op_seq"),
                    F.lit("target").alias("op"),
                    "html", "lang", "_block_hash", "_block_id", "text",
                    F.lit("target").alias("_src"),
                    *_extra_cols(tgt),
                )
            )

        # (c) undo rows activated by a revert of their replacing block —
        # the prior values that must resurface (oldValue semantics)
        undo = self._read_batched(self.undo_dir)
        if undo is not None:
            parts.append(
                undo.join(
                    F.broadcast(
                        reverted.withColumnRenamed("block_hash", "_replaced_by_block")
                    ),
                    "_replaced_by_block",
                    "left_semi",
                )
                .join(
                    F.broadcast(reverted.withColumnRenamed("block_hash", "_block_hash")),
                    "_block_hash",
                    "left_anti",
                )
                .join(affected, "url", "left_semi")
                .select(
                    "url", "warc_ts",
                    F.col("_op_seq").alias("op_seq"),
                    F.lit("undo").alias("op"),
                    "html", "lang", "_block_hash", "_block_id", "text",
                    F.lit("undo").alias("_src"),
                    *_extra_cols(undo),
                )
            )

        candidates = parts[0]
        for p in parts[1:]:
            candidates = candidates.unionByName(p)

        lww = (
            last_writer_wins_salted(candidates, n_salts=self.salt_partitions)
            if self.salt_partitions
            else last_writer_wins(candidates)
        )
        # the winner set is reused three times (upserts, deletes, undo
        # pairing) — cache once, released at batch end
        lww = lww.persist()
        pinned.append(lww)

        # winners that change the table: new/resurfaced rows, not deletes,
        # not the row already in the target
        upserts = lww.where((F.col("_src") != "target") & (F.col("op") != "delete"))
        if self.with_text:
            # extract only where missing (undo rows already carry text);
            # vectorized pandas UDF over Arrow batches
            upserts = upserts.withColumn(
                "text",
                F.when(F.col("text").isNull(), extract_text_udf(F.col("html"))).otherwise(
                    F.col("text")
                ),
            )
        upserts = upserts.select(
            "url", "warc_ts", "html", "text", "lang",
            "_block_hash", "_block_id",
            F.col("op_seq").alias("_op_seq"),
            *[F.col(n) for n, _ in extras],
        )
        # deletes: affected urls whose winner is a delete — or that have no
        # surviving candidate at all (every event reverted)
        deletes = affected.join(
            lww.where(F.col("op") != "delete").select("url"), "url", "left_anti"
        )

        # ---- undo log: save prior target rows being replaced/deleted ----
        t_u = time.monotonic()
        # plan construction only: persist() is lazy, so the semi/anti
        # joins + LWW aggregation execute at the first downstream action
        # (the undo write) and land in that phase
        phases["candidates_lww"] = round(t_u - t_r - phases["reducers"], 3)
        if tgt is not None and "_op_seq" in tgt.columns:
            replacing = lww.where(F.col("_src") == "log").select(
                "url",
                F.col("_block_hash").alias("_replaced_by_block"),
                F.col("_block_id").alias("_replaced_by_block_id"),
            )
            # The guard must measure REPLACING itself, not the batch's
            # event count: a single revert event re-adjudicates every
            # url of the reverted block, so a 1-event batch can carry a
            # multi-million-row replacing relation (review r05). lww is
            # persisted, so this count materializes the cache the undo
            # write reuses — one cheap cached-scan job, an exact bound.
            n_replacing = replacing.count()
            prior = _undo_prior(tgt, replacing, n_replacing)
            u_stats = self._write_batched(
                self.undo_dir, prior, batch_id, "_replaced_by_block_id"
            )
            # rows/bytes ride into the batch metrics so an append-time
            # burst is attributable: flat MB/s + bigger bytes = workload,
            # sagging MB/s = the disk (VERDICT r04 #6)
            phases["undo_rows"] = int(u_stats["n"])
            phases["undo_bytes"] = int(u_stats["bytes"])
        phases["undo_log"] = round(time.monotonic() - t_u, 3)

        # lineage: append-only audit rows (volatile ops — never replayed
        # into state; FIXTURES.md F5), idempotent, written BEFORE the
        # commit point so refires cannot lose it
        t_a = time.monotonic()
        audit = audit_rows(batch_df.where(F.col("op").isNotNull()), batch_id=batch_id)
        audit.write.mode("overwrite").parquet(
            os.path.join(self.audit_dir, f"batch={batch_id}")
        )
        phases["audit"] = round(time.monotonic() - t_a, 3)

        # ---- streaming near-dup detection (before the commit point, so a
        # refire after the target commit implies the sig table and flags
        # are already durable — the crash window is empty) ----
        sig_v_before = None
        if self.dedup_minhash is not None:
            t_d = time.monotonic()
            sig_v_before = self.sig_table.current_version()
            # upserts feeds two consumers now (sig path + MERGE) — cache so
            # candidates/LWW/extraction run once
            upserts = upserts.persist()
            pinned.append(upserts)
            self._apply_dedup(upserts, deletes, batch_id)
            phases["dedup"] = round(time.monotonic() - t_d, 3)

        # ---- the commit point (idempotent keyed MERGE) ----
        t_m = time.monotonic()
        quality_report = None
        if self.quality_gate is not None:
            from gnarly_spark.quality import gate_and_publish

            token = self.target.merge_staged(
                upserts, delete_keys=deletes, batch_id=batch_id
            )
            if token is not None:  # None = refire/empty no-op, nothing new
                try:
                    # raises QualityGateError on a fail-mode breach: the
                    # stream halts with the stage parked for forensics
                    # (see __init__)
                    quality_report = gate_and_publish(
                        self.target, token, self.quality_gate
                    )
                except Exception:
                    # The stream halts with the stage parked (see __init__).
                    # The batch's signature merge and flags are already
                    # durable, and whether they should SURVIVE depends on
                    # which resolution the operator picks:
                    #   publish_staged(token)  -> ships exactly the rows the
                    #     sigs/flags were computed from: they must stay
                    #     (an eager rollback here would silently blind every
                    #     later batch to duplicates of the published pages);
                    #   abandon_staged + redeliver -> the redelivered batch
                    #     carries DIFFERENT rows: they must be rolled back,
                    #     or the refired batch no-ops on the sig batch-id
                    #     guard and the corpus diverges from the table.
                    # Neither is knowable now — park a quarantine marker and
                    # let the refire decide (_resolve_quarantine sees which
                    # path was taken: the target either has the batch_id
                    # applied, or it doesn't).
                    if (
                        sig_v_before is not None
                        and self.sig_table.current_version() > sig_v_before
                    ):
                        qdir = os.path.join(self.work_dir, "_quarantine")
                        os.makedirs(qdir, exist_ok=True)
                        tmp = os.path.join(qdir, f"batch={batch_id}.json.tmp")
                        with open(tmp, "w") as f:
                            json.dump({"sig_v_before": sig_v_before}, f)
                        os.replace(
                            tmp, os.path.join(qdir, f"batch={batch_id}.json")
                        )
                    raise
        else:
            self.target.merge(upserts, delete_keys=deletes, batch_id=batch_id)
        phases["lww_merge"] = round(time.monotonic() - t_m, 3)

        # MOR targets: fold the delta backlog into base files every
        # ``compact_every`` batches so reader cost stays bounded while the
        # hot path keeps O(batch) writes. Crash-safe: a refire of this
        # batch no-ops the merge, and compact on an empty backlog no-ops.
        if (
            self.compact_every
            # getattr: only the parquet lake table has a storage mode —
            # an Iceberg (or custom) target compacts via its own
            # maintenance, and dereferencing .mode here would kill the
            # stream post-commit on every batch hitting the cadence
            and getattr(self.target, "mode", None) == "mor"
            and (batch_id + 1) % self.compact_every == 0
        ):
            t_c = time.monotonic()
            self.target.compact()
            phases["compact"] = round(time.monotonic() - t_c, 3)

        if self.outbox_dir is not None:
            t_o = time.monotonic()
            from gnarly_spark.sources.debezium import export_outbox

            ob = export_outbox(self.target, self.outbox_dir)
            phases["outbox"] = round(time.monotonic() - t_o, 3)
            phases["outbox_envelopes"] = ob["envelopes"]

        n_events = int(log_stats["n"])  # counted on the log-append job
        wall = time.monotonic() - t0
        metrics = {
            "batch_id": batch_id,
            "n_events": n_events,
            "wall_s": round(wall, 3),
            "events_per_s": round(n_events / max(wall, 1e-9), 1),
            "target_version": self.target.current_version(),
            "phase_s": phases,
            # per-partition lineage: exactly which source files this
            # trigger consumed (from the file-source WAL — inputFiles()
            # is empty on micro-batch frames), the contiguous op_seq span
            # they covered, and how many tasks processed them. Together
            # with the lake manifest (which records the files each commit
            # added, per bucket) this gives source->sink lineage for every
            # batch; disjointness/coverage asserted in test_pipeline.
            "lineage": {
                "files": trigger_files,
                "min_seq": log_stats.get("mn_seq"),
                "max_seq": log_stats.get("mx_seq"),
                "max_block": log_stats["mx"],
                "n_partitions": batch_df.rdd.getNumPartitions(),
            },
        }
        if quality_report is not None:
            metrics["quality"] = quality_report
        with open(os.path.join(self.metrics_dir, f"batch-{batch_id}.json"), "w") as f:
            json.dump(metrics, f)

        # prune retained state beyond the reorg window
        if self.retain_log:
            known = []
            for b in self._batches_in(self.log_dir):
                try:
                    with open(os.path.join(self.log_dir, f"batch={b}", "_stats.json")) as f:
                        v = json.load(f)["max_block"]
                        if v is not None:
                            known.append(v)
                except FileNotFoundError:
                    pass
            if known:
                horizon = max(known) - self.retention_blocks
                self._prune_batched(self.log_dir, horizon)
                self._prune_batched(self.undo_dir, horizon)
        else:
            high = self._high_block()
            if high is not None:
                horizon = high - self.retention_blocks
                self._prune_batched(self.undo_dir, horizon)
                kept = [
                    r for r in self._seq_ranges()
                    if r["max_block"] is None or r["max_block"] >= horizon
                ]
                tmp = self._ranges_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(kept, f)
                os.replace(tmp, self._ranges_path)

    def _resolve_quarantine(self, batch_id: int) -> None:
        """Settle a parked quality-gate failure for this batch (see the
        marker write in _process_batch). Runs at the refire of the SAME
        batch_id — the only point where the operator's resolution is
        visible:

        - target has the batch_id applied -> publish_staged shipped the
          exact rows the batch's signatures/flags were computed from; keep
          them (the refire guard then returns as usual).
        - target does NOT have it -> the stage was abandoned and this is
          the redelivered (different) batch: roll the sig table back to
          its pre-batch snapshot (restore reverts batch_ids too) and drop
          the rejected flags so _apply_dedup recomputes from the new rows.
        """
        path = os.path.join(self.work_dir, "_quarantine", f"batch={batch_id}.json")
        if not os.path.exists(path):
            return
        with open(path) as f:
            sig_v_before = json.load(f)["sig_v_before"]
        if batch_id not in self.target.applied_batch_ids():
            if self.dedup_minhash is not None and (
                self.sig_table.current_version() > sig_v_before
            ):
                if sig_v_before >= 0:
                    self.sig_table.restore(sig_v_before)
                else:  # batch 0: no prior snapshot — wipe to empty
                    p = self.sig_table.path
                    shutil.rmtree(p, ignore_errors=True)
                    self.sig_table = ParquetLakeTable(self.spark, p, key="url")
                shutil.rmtree(
                    os.path.join(self.dedup_dir, f"batch={batch_id}"),
                    ignore_errors=True,
                )
        os.unlink(path)

    def _apply_dedup(self, upserts: DataFrame, deletes: DataFrame, batch_id: int) -> None:
        """Flag this batch's new page versions that near-duplicate the
        existing corpus, then fold their signatures into the persisted
        signature table (url -> minhash[k], a ParquetLakeTable with its own
        batch-id guard).

        The per-batch cost is O(batch): only the batch's docs are shingled,
        the batch side broadcasts into the corpus signature scan
        (incremental_lsh_dups), and the sig-table MERGE rewrites only the
        touched buckets. Refire semantics: flags are written (idempotent
        per-batch overwrite) BEFORE the sig merge commits, and the whole
        step no-ops once the sig batch_id is recorded — so flags are always
        computed against the pre-batch corpus, never against signatures the
        same batch already inserted.
        """
        from gnarly_spark.operators.dedup import incremental_lsh_dups, minhash_signatures

        if batch_id in self.sig_table.applied_batch_ids():
            return
        p = self.dedup_params
        new_docs = upserts.select("url", "text").where(F.col("text").isNotNull())
        # the batch's signatures feed TWO actions (the flags write below and
        # the sig-table merge at the end) — compute the shingle explode +
        # k-column min groupBy once and cache it. persist()+pinned
        # unpersist, NOT localCheckpoint: checkpoint blocks are only freed
        # by the ContextCleaner after a JVM GC, so a long drain would
        # accumulate every batch's signature blocks (the same leak
        # process_batch's wrapper exists to prevent)
        sigs_raw = minhash_signatures(
            new_docs, k=p["k"], text_col="text", id_col="url"
        ).persist()
        try:
            self._apply_dedup_inner(sigs_raw, upserts, deletes, batch_id)
        finally:
            try:
                sigs_raw.unpersist(blocking=False)
            except Exception:
                pass

    def _apply_dedup_inner(
        self,
        sigs_raw: DataFrame,
        upserts: DataFrame,
        deletes: DataFrame,
        batch_id: int,
    ) -> None:
        from gnarly_spark.operators.dedup import incremental_lsh_dups

        p = self.dedup_params
        new_docs = upserts.select("url", "text").where(F.col("text").isNotNull())
        flags = None
        if self.sig_table.current_version() >= 0:
            # every url this batch REPLACES or deletes leaves the corpus
            # before flagging — not just the ones with usable new text
            # (new_docs): a same-batch signatureless update (null/short
            # text) would otherwise leave its OLD signature live for this
            # batch's flags, marking another new doc as a dup of content
            # the corpus no longer holds (the cross-batch case is handled
            # by the no_sig deletion below; this keeps the one-batch and
            # two-batch splits of the same events consistent)
            replaced = upserts.select("url")
            if deletes is not None:
                replaced = replaced.unionByName(deletes.select("url"))
            corpus = self.sig_table.read().join(
                replaced.distinct(), "url", "left_anti"
            )
            flags = incremental_lsh_dups(
                new_docs,
                corpus.select(F.col("url").alias("id"), "minhash"),
                k=p["k"],
                bands=p["bands"],
                min_est_jaccard=p["min_est_jaccard"],
                text_col="text",
                id_col="url",
                # no hard broadcast hints: a backfill micro-batch can be
                # millions of docs — AQE picks broadcast vs shuffle from
                # actual sizes per batch
                broadcast_batch=False,
                new_sigs=sigs_raw,
            ).select(
                F.col("new_id").alias("url"), "dup_of", "est_jaccard"
            )
        if flags is None:
            flags = self.spark.createDataFrame(
                [], schema="url string, dup_of string, est_jaccard double"
            )
        flags.write.mode("overwrite").parquet(
            os.path.join(self.dedup_dir, f"batch={batch_id}")
        )
        sigs = sigs_raw.withColumnRenamed("id", "url")
        # a url whose NEW version yields no signature (null text, or too
        # short to shingle) must not keep its OLD signature live — later
        # batches would be flagged as dups of content the corpus no longer
        # holds. Batch urls without a signature row are deleted alongside
        # the stream's explicit deletes (sig merge resolves a key in both
        # upserts and delete_keys to the upsert, so this is safe even if
        # the anti-join and sigs ever overlapped).
        no_sig = upserts.select("url").distinct().join(
            sigs.select("url"), "url", "left_anti"
        )
        dels = no_sig if deletes is None else no_sig.unionByName(
            deletes.select("url")
        ).distinct()
        self.sig_table.merge(sigs, delete_keys=dels, batch_id=batch_id)

    def dup_flags(self) -> DataFrame | None:
        """All near-dup flags so far: (url, dup_of, est_jaccard, batch).
        None when dedup is off or no batch has run."""
        if self.dedup_minhash is None:
            return None
        batches = self._batches_in(self.dedup_dir)
        if not batches:
            return None
        return self.spark.read.option("basePath", self.dedup_dir).parquet(
            *[os.path.join(self.dedup_dir, f"batch={b}") for b in batches]
        )

    def dead_letters(self) -> DataFrame:
        """Poison-pill lines the JSONL source refused: (raw, reason).
        Kept per batch (idempotent overwrite on refire) so a fixed feed can
        be replayed from the raw lines. Empty for parquet sources."""
        batches = (
            self._batches_in(self.dead_letter_dir)
            if os.path.isdir(self.dead_letter_dir)
            else []
        )
        if not batches:
            return self.spark.createDataFrame([], "raw string, reason string")
        return (
            self.spark.read.schema("raw string, reason string")
            .option("basePath", self.dead_letter_dir)
            .parquet(
                *[os.path.join(self.dead_letter_dir, f"batch={b}") for b in batches]
            )
            .select("raw", "reason")
        )

    # ----- stream wiring ------------------------------------------------
    def _read_source(self, files: list[str] | None = None) -> DataFrame:
        """Batch re-read of the (replayable) changelog source in whatever
        format start() tailed it — the retain_log=False adjudication log.

        ``files``: restrict the scan to these source files (the retained
        batches' triggers). None reads the whole dir — correct but
        O(history); callers should pass the bounded list whenever the
        per-batch file metadata is complete."""
        if files:
            # DataFrameReader paths are GLOBS: a literal "[", "{", "*" or
            # "?" in a file name matches nothing (silently empty scan) —
            # escape them so the decoded checkpoint-log paths read back
            # exactly the files the trigger saw
            paths = [re.sub(r"([*?\[\]{}\\])", r"\\\1", p) for p in files]
        else:
            paths = self.source_dir
        if self.source_format == "jsonl":
            from gnarly_spark.sources.jsonl import jsonl_events, read_changelog_jsonl

            return jsonl_events(
                read_changelog_jsonl(self.spark, paths, self.source_schema),
                self.source_schema,
            )
        if self.source_format == "debezium":
            from gnarly_spark.sources.debezium import debezium_events, read_debezium

            return debezium_events(
                read_debezium(self.spark, paths, self.source_schema),
                self.source_schema,
            )
        if files:
            return self.spark.read.schema(self.source_schema).parquet(*paths)
        return self.spark.read.schema(self.source_schema).parquet(self.source_dir)
    def start(
        self,
        changelog_dir: str,
        available_now: bool = True,
        max_files_per_trigger: int | None = 1,
        processing_time: str | None = None,
        schema: str | None = None,
        source_format: str = "parquet",
    ):
        """Tail the changelog directory as a file stream.

        ``available_now`` processes the backlog then stops (backfill mode,
        ≈ the fast-forward loop Blockstream.ts:95-129); otherwise the query
        longpolls like the reference's 5 s subscription (Web3Api.ts:92-100).
        Crash resume = restart with the same checkpoint dir: offsets are in
        the WAL and state is in the lake table, so there is no patch replay
        (ReducerRunner.ts:63-104 collapses into this one option).
        ``schema`` overrides the source DDL (e.g. CHANGELOG_DDL plus
        payload columns added mid-stream — evolution extras ride through
        the whole pipeline into the target).
        ``source_format="jsonl"`` tails JSON lines instead of parquet
        (sources/jsonl.py): rows the parser refuses — malformed JSON,
        type-mismatched or missing required fields — are persisted per
        batch under _dead_letters (idempotent overwrite keyed on batch_id,
        so a refired batch rewrites, never duplicates) and the good rows
        flow through the identical micro-batch program.
        ``source_format="debezium"`` tails Debezium CDC envelopes
        (sources/debezium.py — a Kafka-Connect topic dump): before/after
        images flatten to the changelog schema, Kafka tombstones are
        dropped as protocol, and poison dead-letters exactly like jsonl.
        """
        self.source_dir = changelog_dir
        self.source_schema = schema or CHANGELOG_DDL
        self.source_format = source_format
        if source_format == "jsonl":
            from gnarly_spark.sources.jsonl import (
                jsonl_dead_letters,
                jsonl_events,
                stream_changelog_jsonl,
            )

            stream = stream_changelog_jsonl(
                self.spark,
                changelog_dir,
                schema=self.source_schema,
                max_files_per_trigger=max_files_per_trigger,
            )

            def _fb(parsed_df: DataFrame, batch_id: int) -> None:
                # parse the micro-batch's lines ONCE: both projections
                # (dead letters + good events) read the cached parse, so a
                # multi-million-line backfill trigger doesn't pay the text
                # scan + from_json twice. Also spread here — the raw file
                # stream arrives with as many partitions as file splits, so
                # without it the parse itself runs on 1-2 tasks.
                parsed = parsed_df.repartition(
                    self.spark.sparkContext.defaultParallelism
                ).persist()
                try:
                    jsonl_dead_letters(parsed).write.mode("overwrite").parquet(
                        os.path.join(self.dead_letter_dir, f"batch={batch_id}")
                    )
                    self.process_batch(
                        jsonl_events(parsed, self.source_schema),
                        batch_id,
                        prespread=True,
                    )
                finally:
                    parsed.unpersist()

            on_batch = _fb
        elif source_format == "debezium":
            from gnarly_spark.sources.debezium import (
                debezium_dead_letters,
                debezium_events,
                stream_debezium,
            )

            stream = stream_debezium(
                self.spark,
                changelog_dir,
                changelog_ddl=self.source_schema,
                max_files_per_trigger=max_files_per_trigger,
            )

            def _fb_dbz(parsed_df: DataFrame, batch_id: int) -> None:
                # same parse-once + spread rationale as the jsonl branch
                parsed = parsed_df.repartition(
                    self.spark.sparkContext.defaultParallelism
                ).persist()
                try:
                    debezium_dead_letters(parsed).write.mode("overwrite").parquet(
                        os.path.join(self.dead_letter_dir, f"batch={batch_id}")
                    )
                    self.process_batch(
                        debezium_events(parsed, self.source_schema),
                        batch_id,
                        prespread=True,
                    )
                finally:
                    parsed.unpersist()

            on_batch = _fb_dbz
        elif source_format == "parquet":
            reader = self.spark.readStream.schema(self.source_schema)
            if max_files_per_trigger:
                reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
            stream = reader.parquet(changelog_dir)
            on_batch = self.process_batch
        else:
            raise ValueError(f"unknown source_format {source_format!r}")
        writer = stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def reset(self) -> None:
        """Drop all engine state: target table, logs, checkpoints, reducer
        sinks (≈ gnarly.reset / setdown+setup, Gnarly.ts:44-56,
        stores/sequelize.ts:161-177). The changelog source is untouched.

        Parquet-lake targets only: an Iceberg target has no local path to
        wipe — drop/recreate the table with engine SQL instead."""
        if not isinstance(self.target, ParquetLakeTable):
            raise TypeError(
                "reset() only manages ParquetLakeTable targets; drop the "
                f"{type(self.target).__name__} with its own DDL and rebuild "
                "the pipeline"
            )
        for d in (
            self.log_dir,
            self.undo_dir,
            self.audit_dir,
            self.metrics_dir,
            self.checkpoint_dir,
            self.target.path,
            os.path.join(self.work_dir, "reducers"),
            os.path.join(self.work_dir, "dedup_flags"),
            os.path.join(self.work_dir, "_dedup_sigs"),
            self.dead_letter_dir,
        ):
            shutil.rmtree(d, ignore_errors=True)
        for fp in (os.path.join(self.work_dir, "_watermark.json"), self._ranges_path):
            if os.path.exists(fp):
                os.remove(fp)
        for d in (self.log_dir, self.undo_dir, self.audit_dir, self.metrics_dir):
            os.makedirs(d, exist_ok=True)
        # type(...): a ParquetLakeTable SUBCLASS passed as target must come
        # back as the same class after reset, not silently downgrade to the
        # base (a subclass with an incompatible __init__ fails loudly here)
        self.target = type(self.target)(
            self.spark, self.target.path, key=self.target.key,
            n_buckets=self.target.n_buckets, mode=self.target.mode,
            # preserve the write-parallelism knob: dropping it here would
            # silently revert every post-reset COW rewrite to one task per
            # bucket (the 6-10x serial-encode regression BENCH.md measures)
            files_per_bucket=self.target.files_per_bucket,
        )
        if self.dedup_minhash is not None:
            os.makedirs(self.dedup_dir, exist_ok=True)
            self.sig_table = ParquetLakeTable(
                self.spark, os.path.join(self.work_dir, "_dedup_sigs"), key="url"
            )

    def refresh_idempotent(self):
        """Run head-only reducers once, at HEAD (ReducerType.Idempotent,
        reducer/types.ts:6-16 — 'runs only at head, never during sync').
        Call after a backfill / availableNow drain completes."""
        out = {}
        for red in self.reducers:
            if getattr(red, "head_only", False) and hasattr(red, "refresh"):
                out[red.name] = red.refresh(self)
        return out

    def metrics(self) -> list[dict]:
        """Per-batch ingest metrics in TRIGGER order (filenames sort
        lexicographically — batch-10 < batch-2 — so sort on the recorded
        batch_id, not the name)."""
        out = []
        for fn in os.listdir(self.metrics_dir):
            if fn.endswith(".json"):
                with open(os.path.join(self.metrics_dir, fn)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m["batch_id"])

    def pages(self) -> DataFrame:
        """User-facing view of the target (lineage columns hidden)."""
        return self.target.read().select("url", "warc_ts", "html", "text", "lang")
