"""Debezium-style CDC envelope adapter: ingest the *de-facto standard*
change-event wire format (Debezium/Kafka-Connect JSON envelopes with
``before``/``after`` row images, ``op`` codes and a ``source`` block) into
the engine's flat changelog schema, and export the engine's change feed
back out as envelopes (the outbox direction).

Why: the reference ingests its own RPC JSON and normalizes it at ingestion
time (packages/gnarly-core/src/ingestion/Web3Api.ts:102-130); real CDC
deployments instead receive Debezium envelopes from Kafka Connect — every
Postgres/MySQL/Mongo binlog tail emits this shape. The engine speaks the
envelope natively in both directions: its own lake changelog feeds
downstream Debezium consumers, and seq-carrying envelope dumps (this
module's own exports, or any topic whose producer stamps a numeric
``source.seq``) replay with no preprocessing. Scope note: a RAW
Postgres/MySQL Debezium dump is NOT directly replayable — its ``source``
block carries ``lsn``/``pos`` and a string ``version`` instead of the
numeric total-order ``seq`` this engine keys exactly-once on, so such a
topic needs one preprocessing pass (lsn -> seq projection) before
ingest; rows without a usable seq dead-letter as ``missing_seq`` rather
than ingesting unordered.

Envelope (public Debezium format, JSON value without schema wrapper):

    {"before": {...}|null, "after": {...}|null,
     "source": {"name": str, "seq": long, "version": long},
     "op": "c"|"u"|"d"|"r"|"m", "ts_ms": long}

Mapping to the engine changelog (fixtures.CHANGELOG_DDL):

- ``c`` (create) / ``r`` (snapshot read) -> ``insert``; row image = after
- ``u`` (update)                         -> ``update``; row image = after
  (``before`` is retained for downstream retraction consumers but the
  changelog row itself carries the post-image, matching the reference's
  oldValue/newValue patch semantics, ourbit/Ourbit.ts:169-214)
- ``d`` (delete)                         -> ``delete``; row image = BEFORE
  (Debezium deletes carry only the before image — the key must come from
  it or the delete cannot route)
- ``m`` (message/control)                -> ``revert``; Debezium reserves
  ``m`` for out-of-band messages, which is exactly what a reorg
  notification is. The revert target rides in after.revert_of_block.
- a whole-value ``null`` line is a Kafka *tombstone* (compaction marker,
  not data) — counted and dropped, never an event and never a dead letter.

Scale shape: identical to sources/jsonl.py — text scan + ``from_json``
(map-side JVM, whole-stage codegen, no Python, no shuffle); streaming and
batch share the parser; malformed lines dead-letter with the raw line
preserved. Binary columns travel base64 inside the images (JSON has no
binary type); microsecond timestamps are pinned by the shared JSON_OPTS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gnarly_spark.fixtures import CHANGELOG_DDL
from gnarly_spark.sources.jsonl import JSON_OPTS

#: envelope fields that must be present on a non-tombstone line: without
#: ``op`` the row image cannot be routed; without source.seq there is no
#: total order (U3).
_OP_CODES = ("c", "u", "d", "r", "m")

#: changelog columns that are ENVELOPE-level, not row-image-level: the
#: image structs carry everything else.
_ENVELOPE_COLS = ("op_seq", "op")


def _image_ddl(changelog_ddl: str) -> tuple[StructType, list[str]]:
    """The row-image struct type for a changelog schema: every changelog
    column except the envelope-level ones, with binary fields as base64
    strings on the wire. Returns (wire image struct, binary col names)."""
    st = StructType.fromDDL(changelog_ddl)
    binary_cols = [f.name for f in st.fields if isinstance(f.dataType, BinaryType)]
    fields = [
        StructField(f.name, StringType()) if f.name in binary_cols else f
        for f in st.fields
        if f.name not in _ENVELOPE_COLS
    ]
    return StructType(fields), binary_cols


def _wire_schema(changelog_ddl: str) -> StructType:
    img, _ = _image_ddl(changelog_ddl)
    return StructType(
        [
            StructField("before", img),
            StructField("after", img),
            StructField(
                "source",
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField("seq", LongType()),
                        StructField("version", LongType()),
                    ]
                ),
            ),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
            StructField("_corrupt", StringType()),
        ]
    )


def parse_debezium(lines: DataFrame, changelog_ddl: str = CHANGELOG_DDL) -> DataFrame:
    """Text lines (column ``value``) -> parsed envelope columns + ``_raw``
    + ``_corrupt`` + ``_tombstone``. Batch and streaming inputs share this
    (same contract as jsonl.parse_changelog_jsonl).

    Kafka Connect's JsonConverter with ``schemas.enable=true`` wraps every
    value as ``{"schema": {...}, "payload": <envelope>}`` — auto-detected
    and unwrapped here (safe: a bare envelope has no top-level ``payload``
    key, so the tuple slot comes back NULL and the raw line parses as-is).
    ONE json_tuple parse feeds both the unwrap and the tombstone
    predicate — the previous shape paid three independent
    get_json_object parses per line on top of from_json (they live in
    separate projection nodes, so no common-subexpression elimination
    applies), a real term at 10^10 lines."""
    wire = _wire_schema(changelog_ddl)
    tup = lines.select(
        F.col("value").alias("_raw"),
        F.json_tuple(F.col("value"), "schema", "payload").alias(
            "_schema", "_payload"
        ),
    )
    # Kafka tombstone: the value is the literal JSON `null` (compaction
    # marker). from_json files that under _corrupt (a bare null is not a
    # struct), so detection keys on the RAW line — exact, and cheap. A
    # schemas-enabled tombstone arrives as {"schema":..., "payload":null}:
    # schema key present + payload null (a real wrapped envelope always
    # has a non-null payload).
    return tup.select(
        "_raw",
        F.from_json(
            F.coalesce(F.col("_payload"), F.col("_raw")),
            wire,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt", **JSON_OPTS},
        ).alias("_r"),
        (
            (F.trim(F.col("_raw")) == F.lit("null"))
            | (F.col("_schema").isNotNull() & F.col("_payload").isNull())
        ).alias("_tombstone"),
    ).select("_raw", "_r.*", "_tombstone")


def _routable_image():
    # the image the op routes to must EXIST: a 'd' with a null before (or
    # c/u/r with a null after) would otherwise flatten to a NULL-key
    # changelog row — a delete that silently no-ops downstream (NULL
    # never equi-joins) instead of dead-lettering. 'm' control messages
    # are exempt (an out-of-band message may carry no image).
    return (
        F.when(F.col("op") == "d", F.col("before").isNotNull())
        .when(F.col("op") == "m", F.lit(True))
        .otherwise(F.col("after").isNotNull())
    )


def _valid_envelope():
    # isin on a NULL op yields NULL, and a NULL predicate drops the row
    # from BOTH the events and the dead-letter projection — coalesce to
    # False so a missing op is a dead letter, never a vanished row.
    return (
        F.col("_corrupt").isNull()
        & ~F.col("_tombstone")
        & F.coalesce(F.col("op").isin(*_OP_CODES), F.lit(False))
        & F.col("source.seq").isNotNull()
        & F.coalesce(_routable_image(), F.lit(False))
    )


def debezium_events(parsed: DataFrame, changelog_ddl: str = CHANGELOG_DDL) -> DataFrame:
    """The good envelopes, flattened to the engine changelog schema (column
    order = DDL order, binary restored from base64) — the exact shape
    sources/changelog.py scans, so the streaming pipeline ingests a
    Debezium topic dump unchanged."""
    st = StructType.fromDDL(changelog_ddl)
    _, binary_cols = _image_ddl(changelog_ddl)
    # image routing: d reads before, everything else reads after
    img = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    op = (
        F.when(F.col("op").isin("c", "r"), "insert")
        .when(F.col("op") == "u", "update")
        .when(F.col("op") == "d", "delete")
        .otherwise("revert")
    )
    cols = []
    for f in st.fields:
        if f.name == "op_seq":
            cols.append(F.col("source.seq").alias("op_seq"))
        elif f.name == "op":
            cols.append(op.alias("op"))
        elif f.name in binary_cols:
            cols.append(F.unbase64(img.getField(f.name)).alias(f.name))
        else:
            cols.append(img.getField(f.name).cast(f.dataType).alias(f.name))
    return parsed.where(_valid_envelope()).select(*cols)


def debezium_dead_letters(parsed: DataFrame) -> DataFrame:
    """(raw, reason) for lines that cannot enter the changelog: reason in
    ``malformed`` (unparseable / type-mismatched), ``bad_op`` (valid JSON,
    op missing or not a Debezium code), ``missing_seq`` (no source.seq —
    no total order), ``no_image`` (the op's routed image is null — e.g. a
    'd' without a before: it would flatten to a NULL-key delete that
    silently no-ops downstream). Tombstones are NOT dead letters (they
    are protocol, not poison) — count them with ``debezium_tombstones``."""
    reason = (
        F.when(F.col("_corrupt").isNotNull(), "malformed")
        .when(
            F.col("op").isNull() | ~F.coalesce(F.col("op").isin(*_OP_CODES), F.lit(True)),
            "bad_op",
        )
        .when(F.col("source.seq").isNull(), "missing_seq")
        .otherwise("no_image")
    )
    return parsed.where(~_valid_envelope() & ~F.col("_tombstone")).select(
        F.col("_raw").alias("raw"), reason.alias("reason")
    )


def debezium_tombstones(parsed: DataFrame) -> DataFrame:
    return parsed.where(F.col("_tombstone")).select(F.col("_raw").alias("raw"))


def read_debezium(
    spark: SparkSession, path: str, changelog_ddl: str = CHANGELOG_DDL
) -> DataFrame:
    """Bounded batch read of an envelope JSONL dir (a Debezium topic dump)
    -> parsed relation for debezium_events / _dead_letters / _tombstones."""
    return parse_debezium(spark.read.text(path), changelog_ddl)


def stream_debezium(
    spark: SparkSession,
    path: str,
    changelog_ddl: str = CHANGELOG_DDL,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Unbounded tail of an envelope dir with file-count backpressure
    (same O3 contract as the parquet and JSONL sources)."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_debezium(reader.text(path), changelog_ddl)


# ---------------------------------------------------------------------------
# writer: engine changelog rows -> envelopes (ingest-side fixture/export)
# ---------------------------------------------------------------------------


def _b64_image(st: StructType, binary_cols: list[str]):
    """struct(...) of the DDL image columns with binary as base64
    (write_debezium's wire image). feed_to_debezium builds its image from
    a DataFrame's live columns instead of a DDL (arbitrary feed schemas),
    so it has its own _wire_col — both apply the SAME explicit rule
    (binary travels base64, everything else as-is), and the base64
    contract is pinned for both writers by
    test_outbox_binary_columns_base64_contract."""
    cols = []
    for f in st.fields:
        if f.name in _ENVELOPE_COLS:
            continue
        src = F.col(f.name)
        cols.append(
            F.base64(src).alias(f.name) if f.name in binary_cols else src.alias(f.name)
        )
    return F.struct(*cols)


def write_debezium(
    events: DataFrame,
    path: str,
    changelog_ddl: str = CHANGELOG_DDL,
    source_name: str = "gnarly",
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Serialize engine changelog rows as Debezium envelopes. Op mapping is
    the exact inverse of debezium_events (insert->c, update->u, delete->d,
    revert->m); deletes put the image in ``before``, everything else in
    ``after``. ts_ms = epoch millis of warc_ts when present.

    One text file per partition; ``n_files`` coalesces for deterministic
    micro-batch tests. NOTE for streaming fixtures: a file is one trigger's
    batch — order files by op_seq ranges (repartitionByRange) if the
    consumer is retention-sensitive (CLAUDE.md gen_changelog gotcha)."""
    st = StructType.fromDDL(changelog_ddl)
    _, binary_cols = _image_ddl(changelog_ddl)
    img = _b64_image(st, binary_cols)
    op = (
        F.when(F.col("op") == "insert", "c")
        .when(F.col("op") == "update", "u")
        .when(F.col("op") == "delete", "d")
        .otherwise("m")
    )
    # warc_ts is TIMESTAMP_NTZ: compute epoch-millis from its own
    # date/time fields (wall clock read AS UTC) — a cast to TIMESTAMP
    # would re-interpret the wall clock in the session timezone and
    # silently shift ts_ms for non-UTC callers (ADVICE r03; the CLAUDE.md
    # "never unix_* on NTZ" gotcha). to_date/date_format on NTZ are
    # timezone-free.
    ts_ms = (
        (
            F.unix_date(F.to_date("warc_ts")) * F.lit(86400000).cast("long")
            + F.date_format("warc_ts", "HH").cast("long") * 3600000
            + F.date_format("warc_ts", "mm").cast("long") * 60000
            + F.date_format("warc_ts", "ss").cast("long") * 1000
            + F.date_format("warc_ts", "SSS").cast("long")
        ).alias("ts_ms")
        if "warc_ts" in events.columns
        else F.lit(None).cast("long").alias("ts_ms")
    )
    env = events.select(
        F.when(F.col("op") == "delete", img).alias("before"),
        F.when(F.col("op") != "delete", img).alias("after"),
        F.struct(
            F.lit(source_name).alias("name"),
            F.col("op_seq").cast("long").alias("seq"),
            F.lit(None).cast("long").alias("version"),
        ).alias("source"),
        op.alias("op"),
        ts_ms,
    )
    out = env.select(F.to_json(F.struct("*"), JSON_OPTS).alias("value"))
    if n_files:
        out = out.coalesce(n_files)
    out.write.mode(mode).text(path)


def feed_to_debezium(
    feed: DataFrame,
    key: str,
    seq_start: int,
    source_name: str = "gnarly",
    version: int | None = None,
    with_seq: bool = False,
    n_ranges: int | None = None,
    small_delta_rows: int = 100_000,
) -> DataFrame:
    """The OUTBOX direction: a lake ``changelog(v_from[, v_to])`` image
    feed -> one envelope JSON line per changed key (column ``value``).

    update_before/update_after row PAIRS collapse into one ``u`` envelope
    carrying both images — the Debezium contract downstream consumers
    (cache invalidation, search sync) rely on for retraction. Envelope seq
    is ``seq_start + rank of key`` (deterministic: a snapshot diff
    has at most one change per key), so replaying a feed of successive
    versions yields strictly increasing seqs when callers advance
    seq_start by the previous count.

    Seq assignment is two-phase distributed (VERDICT r03 #2): a global
    ``row_number().over(Window.orderBy(key))`` would funnel the whole
    relation through ONE task's sort — tolerable on a per-commit delta,
    a single-task table scan on export_outbox's snapshot bootstrap.
    Instead: range-partition on the key (range i holds strictly smaller
    keys than range i+1), rank locally per range, and add the cumulative
    count of lower ranges (the classic zipWithIndex two-phase). The
    resulting seq equals the global rank by key EXACTLY, wherever the
    sampled range boundaries happen to land, so re-exports reproduce
    identical seqs.

    Scale: shuffles are key-hash (groupBy) + key-range + per-range rank,
    all parallel and O(input); the feed itself is changed-rows-only, so
    the common path is O(delta). ``with_seq=True`` additionally returns
    the ``_seq`` column so callers can range-order output files.

    Small-delta fast path (ADVICE r04): a merged feed of at most
    ``small_delta_rows`` keys takes the single-window
    ``row_number().over(orderBy(key))`` instead — one task sorts a
    bounded delta, and the per-version export pays one count job rather
    than the two-phase path's checkpoint + per-range collect (measured
    slower on tiny deltas). Both paths compute seq == the exact global
    rank by key, so which one ran is unobservable in the output and
    re-exports stay byte-identical either way.

    Cost notes for the two-phase (bootstrap-scale) path: the offset
    computation collects one (partition, count) row per range — bounded
    control-plane metadata, never data rows — and the eager
    ``localCheckpoint`` that pins partition ids materializes the WHOLE
    merged feed in executor storage for the job's lifetime and is not
    recoverable on executor loss (Spark recomputes from the checkpoint,
    which no longer exists on the lost executor); a failed export run is
    simply re-run — the files it writes are idempotent."""
    from pyspark.sql import Window

    data_cols = [c for c in feed.columns if c not in (key, "_change_type")]

    def _wire_col(c: str):
        # binary travels base64, the SAME explicit contract write_debezium
        # uses (one wire format, two writers — never two encodings)
        if isinstance(feed.schema[c].dataType, BinaryType):
            return F.base64(F.col(c)).alias(c)
        return F.col(c).alias(c)

    img = F.struct(_wire_col(key), *[_wire_col(c) for c in data_cols])
    tagged = feed.select(
        F.col(key).alias("_k"),
        F.when(
            F.col("_change_type").isin("delete", "update_before"), img
        ).alias("_before"),
        F.when(
            F.col("_change_type").isin("insert", "update_after", "snapshot"), img
        ).alias("_after"),
        F.when(F.col("_change_type") == "insert", "c")
        .when(F.col("_change_type") == "delete", "d")
        # 'snapshot' -> Debezium's 'r' (initial-snapshot read): a full
        # state row, not a change — export_outbox's bootstrap files
        .when(F.col("_change_type") == "snapshot", "r")
        .otherwise("u")
        .alias("_op"),
    )
    merged = tagged.groupBy("_k").agg(
        F.max("_before").alias("before"),
        F.max("_after").alias("after"),
        F.max("_op").alias("_op"),  # {u} or {c} or {d}: pairs agree on 'u'
    )
    sess = feed.sparkSession
    n_merged = merged.count()  # AQE reuses this shuffle downstream
    if n_merged <= small_delta_rows:
        # bounded delta: one-task sort is cheaper than checkpoint +
        # per-range offsets; identical seqs (global rank by key)
        base = merged
        seq = F.row_number().over(Window.orderBy("_k")) + F.lit(seq_start - 1)
    else:
        n_parts = max(1, n_ranges or sess.sparkContext.defaultParallelism)
        ranged = (
            merged.repartitionByRange(n_parts, "_k")
            .withColumn("_pid", F.spark_partition_id())
            # pin partition ids: the counts job and the rank job below
            # must see the SAME pid per row (range boundaries are
            # sampled once)
            .localCheckpoint()
        )
        counts = sorted(
            (r["_pid"], r["count"])
            for r in ranged.groupBy("_pid").count().collect()
        )
        offsets, acc = {}, 0
        for pid, n in counts:
            offsets[pid] = acc
            acc += n
        if offsets:
            off = F.coalesce(
                F.try_element_at(
                    F.create_map(
                        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
                    ),
                    F.col("_pid"),
                ),
                F.lit(0),
            )
        else:
            off = F.lit(0)
        base = ranged
        lw = Window.partitionBy("_pid").orderBy("_k")
        seq = F.row_number().over(lw) + off + F.lit(seq_start - 1)
    env = base.select(
        "before",
        "after",
        F.struct(
            F.lit(source_name).alias("name"),
            seq.cast("long").alias("seq"),
            F.lit(version).cast("long").alias("version"),
        ).alias("source"),
        F.col("_op").alias("op"),
        F.lit(None).cast("long").alias("ts_ms"),
        seq.cast("long").alias("_seq"),
    )
    out_cols = (["_seq"] if with_seq else []) + [
        F.to_json(F.struct("before", "after", "source", "op", "ts_ms"), JSON_OPTS).alias(
            "value"
        )
    ]
    return env.select(*out_cols)


def export_outbox(
    table,
    out_dir: str,
    source_name: str = "gnarly",
    max_single_file_bytes: int = 256 << 20,
    small_delta_rows: int = 100_000,
) -> dict:
    """Incremental OUTBOX export: envelope JSONL for every lake commit
    since the last export — the transactional-outbox pattern that feeds
    downstream Debezium consumers (search sync, cache invalidation)
    from the lake's own change feed, without a message broker in the
    write path.

    Each run walks the committed versions after the recorded cursor, and
    per version writes ``{out_dir}/v{N}.jsonl`` from
    ``feed_to_debezium(table.changelog(N-1, N))``; envelope seqs continue
    monotonically across runs (cursor + next_seq persist in
    ``{out_dir}/_outbox_state.json``). Idempotent at the file level: a
    re-run after a crash rewrites the same per-version files with the
    same seqs (the changelog between two immutable snapshots is
    deterministic), so downstream file-stream consumers never see
    duplicates under at-least-once re-export. The per-version file write
    is tmp+rename, so a consumer tailing ``*.jsonl`` never reads a
    half-written batch.

    Two non-append wrinkles, handled explicitly:

    - Refs share ONE version-number space (lake.py _commit), so the walk
      follows the MAIN chain from the snapshots() metadata — a branch
      commit interleaved in the numbers is never exported (its rows are
      unpublished), and each main commit diffs against the PREVIOUS MAIN
      snapshot, not version-minus-one.
    - A fresh outbox on a mature table (early snapshots expired), or a
      cursor that fell behind the retention window, cannot be expressed
      incrementally. The export then emits a SNAPSHOT file: every row of
      the oldest exportable snapshot as Debezium ``r`` (snapshot-read)
      envelopes — consumers treat an r-file as a full state refresh, the
      exact semantic Debezium gives its initial snapshot. Incremental
      files resume from there.

    File layout is size-adaptive (VERDICT r04). A version whose export
    fits in ``max_single_file_bytes`` publishes the single
    ``v{N}.jsonl`` (the common incremental-delta shape). A larger one —
    the snapshot bootstrap above all — publishes
    ``v{N}-part-{i:05d}.jsonl`` files in envelope-seq order plus a
    ``v{N}.manifest.json`` listing each part's count and seq range;
    the parts are the parallel write's own range-ordered output renamed
    into place (no driver-side concat: the old single-file concat
    streamed the whole bootstrap through one driver file handle, and
    assumed the parts live on a driver-local FS). Each part is
    tmp+rename atomic and the manifest lands LAST, so a consumer that
    needs all-of-version semantics gates on the manifest, while plain
    ``v*.jsonl`` file-stream tailers (which both layouts match) just see
    parts arrive — safe under at-least-once replay because envelope seq
    is the idempotency key. Re-exports clean up the other layout's
    files and any higher-numbered stale parts, so a crashed or
    reconfigured earlier attempt can't leave a mixed layout behind.

    Cost per run: O(changed rows since cursor) — each changelog() is one
    key-shuffle over two snapshots' files; the multi-file path adds one
    parallel line-count pass over the written parts (for the manifest +
    seq advance) instead of the old serial driver concat. Returns
    {"exported_versions", "envelopes", "from_version", "to_version"}."""
    import json as _json
    import os

    os.makedirs(out_dir, exist_ok=True)
    state_path = os.path.join(out_dir, "_outbox_state.json")
    state = {"cursor": -1, "next_seq": 0}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = _json.load(f)
    head = table.current_version()
    start = int(state["cursor"])
    seq = int(state["next_seq"])
    # main-chain versions only, ascending (snapshots() is control-plane)
    mains = sorted(
        r.version for r in table.snapshots().collect() if r.ref == "main"
    )
    main_set = set(mains)
    exported, n_env = [], 0
    # publisher election (review r05: the CLAUDE.md multi-file-pair lesson
    # applies here too): two concurrent exporters — the pipeline's
    # per-batch export plus an ad-hoc outbox_job run — would share the
    # .tmp-v{N} dirs and the state file. An exclusive flock serializes
    # them; advisory + local-FS scoped, matching this writer.
    import fcntl

    lockfd = os.open(os.path.join(out_dir, ".export.lock"), os.O_CREAT | os.O_RDWR)
    fcntl.flock(lockfd, fcntl.LOCK_EX)
    try:
        # re-read state UNDER the lock: a concurrent exporter may have
        # advanced the cursor while this one waited
        if os.path.exists(state_path):
            with open(state_path) as f:
                state = _json.load(f)
        start = int(state["cursor"])
        seq = int(state["next_seq"])
        todo = [v for v in mains if v > start]
        prev = start
        for v in todo:
            adopted = _adopt_published(out_dir, v, seq)
            if adopted is not None:
                # a crash between publish and the state write left a
                # COMPLETE artifact at our exact seq base: adopt it
                # instead of regenerating — a consumer may already have
                # ingested it, and regenerating through a different path
                # (e.g. incremental base expired since) would bind the
                # same seqs to different envelopes
                n = adopted
            else:
                if prev >= 0 and prev in main_set:
                    feed = table.changelog(prev, v)
                else:
                    # no incremental base (fresh outbox, or the cursor's
                    # snapshot expired): full-state snapshot, rows as 'r'
                    snap = table.read(version=v)
                    feed = snap.select(
                        table.key,
                        F.lit("snapshot").alias("_change_type"),
                        *[c for c in snap.columns if c != table.key],
                    )
                env = feed_to_debezium(
                    feed, key=table.key, seq_start=seq, source_name=source_name,
                    version=v, with_seq=True, small_delta_rows=small_delta_rows,
                )
                n = _publish_version(env, out_dir, v, seq, max_single_file_bytes)
            seq += n
            n_env += n
            exported.append(v)
            prev = v
            # persist AFTER each version: a crash resumes at the next one
            # with the right seq base (or adopts this one, above)
            with open(state_path + ".tmp", "w") as f:
                _json.dump({"cursor": v, "next_seq": seq}, f)
            os.replace(state_path + ".tmp", state_path)
    finally:
        fcntl.flock(lockfd, fcntl.LOCK_UN)
        os.close(lockfd)
    return {
        "exported_versions": exported,
        "envelopes": n_env,
        "from_version": start + 1,
        "to_version": head,
    }


def _adopt_published(out_dir: str, v: int, expected_seq: int):
    """Envelope count of an already-complete v{v} artifact at exactly
    ``expected_seq``, else None (regenerate). Adoption fires only in the
    crash window between a publish and its state write; a mixed layout
    (both a single file and a manifest — a crash mid-layout-switch) or a
    seq-base mismatch regenerates instead."""
    import json as _json
    import os

    man_p = os.path.join(out_dir, f"v{v}.manifest.json")
    single_p = os.path.join(out_dir, f"v{v}.jsonl")
    has_man, has_single = os.path.exists(man_p), os.path.exists(single_p)
    if has_man == has_single:  # neither, or a mixed crash state
        return None
    if has_man:
        with open(man_p) as f:
            man = _json.load(f)
        parts = man.get("parts", [])
        if not parts or any(
            not os.path.exists(os.path.join(out_dir, pt["file"])) for pt in parts
        ):
            return None
        if parts[0]["seq_first"] != expected_seq:
            return None
        return int(man["envelopes"])
    # single file: complete by rename-atomicity; verify the seq base from
    # the first line (files on this path are bounded by
    # max_single_file_bytes, so the streamed count is cheap)
    n, first_seq = 0, None
    with open(single_p, "rb") as f:
        for line in f:
            if first_seq is None:
                try:
                    first_seq = _json.loads(line)["source"]["seq"]
                except Exception:
                    return None
            n += 1
    if n and first_seq != expected_seq:
        return None
    return n


def _publish_version(
    env: DataFrame, out_dir: str, v: int, seq: int, max_single_file_bytes: int
) -> int:
    """Write one version's envelopes and commit them to ``out_dir``,
    choosing the layout by size. Ordering rule: all stale OTHER-layout
    artifacts are removed BEFORE the new commit point lands (the single
    file's rename, or the manifest), so a reader never observes a mixed
    layout — at worst it sees the version mid-publish (no commit point),
    which it skips. Returns the envelope count."""
    import json as _json
    import os
    import shutil as _shutil

    tmp = os.path.join(out_dir, f".tmp-v{v}")
    # parallel write, range-partitioned on seq so part-00000 <
    # part-00001 in envelope order — no coalesce(1) single-task
    # sort/encode even when the bootstrap path pushes a whole snapshot
    # through here (VERDICT r03 #2 / ADVICE r03)
    n_out = max(1, env.sparkSession.sparkContext.defaultParallelism)
    (
        env.repartitionByRange(n_out, "_seq")
        .sortWithinPartitions("_seq")
        .select("value")
        .write.mode("overwrite")
        .text(tmp)
    )
    parts = [
        p
        for p in sorted(os.listdir(tmp))
        if p.startswith("part-") and os.path.getsize(os.path.join(tmp, p))
    ]
    total_bytes = sum(os.path.getsize(os.path.join(tmp, p)) for p in parts)
    man_p = os.path.join(out_dir, f"v{v}.manifest.json")
    single_p = os.path.join(out_dir, f"v{v}.jsonl")

    def _stale_parts(keep_below: int) -> list[str]:
        out = []
        for f in os.listdir(out_dir):
            if f.startswith(f"v{v}-part-") and f.endswith(".jsonl"):
                try:
                    idx = int(f[len(f"v{v}-part-") : -len(".jsonl")])
                except ValueError:
                    continue
                if idx >= keep_below:
                    out.append(f)
        return out

    if total_bytes <= max_single_file_bytes:
        # small delta: one file per version, streamed concat
        n = 0
        cat = os.path.join(tmp, "_cat.jsonl")
        with open(cat, "wb") as outf:
            for p in parts:
                with open(os.path.join(tmp, p), "rb") as f:
                    while True:
                        chunk = f.read(1 << 20)
                        if not chunk:
                            break
                        n += chunk.count(b"\n")
                        outf.write(chunk)
        # other-layout cleanup BEFORE the commit rename: manifest first
        # (readers fall back to the old single file or see mid-publish),
        # then its parts, then the atomic single-file replace
        if os.path.exists(man_p):
            os.remove(man_p)
        for f in _stale_parts(0):
            os.remove(os.path.join(out_dir, f))
        os.replace(cat, single_p)
    else:
        # bootstrap-scale: publish the range-ordered parts directly.
        # Per-part line counts via one PARALLEL pass (split-parallel
        # Spark read; no JSON parse), then the manifest's seq ranges are
        # arithmetic — seqs are dense in file order.
        from urllib.parse import unquote

        sess = env.sparkSession
        by_file = {
            unquote(r["f"].rsplit("/", 1)[-1]): r["n"]
            for r in sess.read.text(tmp)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # de-commit the version FIRST (old manifest away -> readers see
        # mid-publish and skip; old single file away -> no mixed layout),
        # then land parts, then stale-part cleanup, then the new commit
        # point (manifest) LAST
        if os.path.exists(man_p):
            os.remove(man_p)
        if os.path.exists(single_p):
            os.remove(single_p)
        manifest_parts, cum = [], 0
        for i, p in enumerate(parts):
            cnt = int(by_file.get(p, 0))
            name = f"v{v}-part-{i:05d}.jsonl"
            os.replace(os.path.join(tmp, p), os.path.join(out_dir, name))
            manifest_parts.append(
                {
                    "file": name,
                    "count": cnt,
                    "seq_first": seq + cum,
                    "seq_last": seq + cum + cnt - 1,
                }
            )
            cum += cnt
        n = cum
        for f in _stale_parts(len(parts)):
            os.remove(os.path.join(out_dir, f))
        man = {"version": v, "envelopes": n, "parts": manifest_parts}
        man_tmp = os.path.join(tmp, "_manifest.json")
        with open(man_tmp, "w") as f:
            _json.dump(man, f)
        # manifest lands LAST: its presence == every part published
        os.replace(man_tmp, man_p)
    _shutil.rmtree(tmp, ignore_errors=True)
    return n


def read_outbox(
    spark: SparkSession, out_dir: str, verify_manifests: bool = True
) -> DataFrame:
    """Consumer-side batch read of an export_outbox directory — BOTH
    layouts (single ``v{N}.jsonl`` and multi-file ``v{N}-part-*.jsonl``
    + manifest) — as one DataFrame of raw envelope lines (``value``
    string; feed into parse_debezium/debezium_events).

    ``verify_manifests`` (default on) enforces the multi-file contract
    before handing data downstream, driver-side and control-plane only:
    every part a manifest lists must exist, no unlisted part of a
    manifested version may linger (a torn republish / stale wider
    attempt), and a version carrying BOTH layouts (single file AND a
    manifest — a crash mid-layout-switch; the exporter's commit ordering
    makes this a narrow window, and the next export heals it) fails loud
    rather than delivering every envelope twice. A version mid-publish
    (parts but no manifest yet) is skipped the same way a half-written
    single file is invisible before its rename — the next read picks it
    up complete.

    ``verify_manifests=False`` reads best-effort for forensics: existing
    manifested parts only (a listed-but-missing part is skipped, not a
    crash), and a both-layouts version contributes only its manifested
    parts (no double read).

    Envelope seq remains the idempotency/order key; readers that need
    all-of-version atomicity gate on the manifest exactly as this does.
    """
    import glob as _glob
    import json as _json
    import os
    import re

    files: list[str] = []
    part_re = re.compile(r"^v(\d+)-part-(\d+)\.jsonl$")
    plain_re = re.compile(r"^v(\d+)\.jsonl$")
    manifested: dict[int, dict] = {}
    for p in sorted(_glob.glob(os.path.join(out_dir, "v*.manifest.json"))):
        with open(p) as f:
            man = _json.load(f)
        manifested[int(man["version"])] = man
    parts_on_disk: dict[int, list[str]] = {}
    singles: dict[int, str] = {}
    for p in sorted(os.listdir(out_dir)):
        m = part_re.match(p)
        if m:
            parts_on_disk.setdefault(int(m.group(1)), []).append(p)
            continue
        m = plain_re.match(p)
        if m:
            singles[int(m.group(1))] = p
        elif p.endswith(".jsonl") and not p.startswith("."):
            files.append(os.path.join(out_dir, p))  # foreign jsonl: pass through
    for v, p in singles.items():
        if v in manifested:
            if verify_manifests:
                raise ValueError(
                    f"outbox v{v} carries BOTH layouts (v{v}.jsonl and a "
                    f"manifest) — torn layout switch; re-run the exporter "
                    f"to heal, or read with verify_manifests=False"
                )
            continue  # best-effort: the manifested parts win, no double read
        files.append(os.path.join(out_dir, p))
    for v, man in manifested.items():
        have = set(parts_on_disk.get(v, []))
        want = [pt["file"] for pt in man["parts"]]
        missing = [w for w in want if w not in have]
        extra = sorted(have - set(want))
        if verify_manifests and (missing or extra):
            raise ValueError(
                f"outbox v{v} violates its manifest: missing parts "
                f"{missing}, unlisted parts {extra}"
            )
        files.extend(
            os.path.join(out_dir, w) for w in want if w in have
        )
    # parts of a version with no manifest yet (mid-publish) never entered
    # `files` — skipped, not an error; complete on the next read
    if not files:
        return spark.createDataFrame([], "value string")
    return spark.read.text(files)
