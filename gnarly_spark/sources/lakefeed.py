"""Lake change feed as a Structured Streaming SOURCE (Python Data Source
API, Spark 4) — downstream pipelines tail a MOR ``ParquetLakeTable``'s
commits incrementally:

    spark.dataSource.register(LakeFeedDataSource)
    feed = (spark.readStream.format("lakefeed")
            .option("path", table_dir)
            .option("startingVersion", 0)   # omit -> tail from now
            .load())

Feed schema = the table's data columns + ``_op`` ('upsert' | 'delete')
+ ``_delta_seq`` (the commit sequence the writer stamped) — the same
markers MOR delta files already carry, so the feed is a zero-transform
scan of exactly the bytes each commit appended. This is the Iceberg
incremental-read / Delta CDF-stream analog of ``diff()``/``changelog()``
(sinks/lake.py), replacing the reference's poll-the-store tailing
(packages/gnarly-core/src/Blockstream.ts:24-112) with checkpointed
offsets: resume re-reads nothing, refires re-emit identical rows
(manifests and data files are immutable).

Scale shape:
- offsets are manifest versions: ``{"version": N}`` — one tiny JSON read
  per trigger on the driver, no file listing.
- ``partitions(start, end)`` emits ONE InputPartition per NEW delta file
  in ``(start, end]`` (manifest-diff against each commit's parent) —
  executors read files in parallel with pyarrow and return Arrow
  RecordBatches (no per-row Python).
- maintenance commits (compact / rebucket / cluster) add no delta files
  and are emitted as nothing — they rewrite, they don't change state.
- ``restore()`` commits DO change state but not as deltas: the feed
  fails loudly on them (Iceberg's incremental read has the same
  non-append restriction); opt into skipping with
  ``skipRestoreCommits=true``.
- backpressure: ``maxVersionsPerTrigger`` caps how many commits one
  micro-batch drains (the feed-side twin of the ingest pipeline's
  ``maxFilesPerTrigger``).

Boundaries, stated honestly: COW tables are rejected (every commit
rewrites whole buckets — tail those with batch ``diff()`` calls); the
stream's schema is fixed at start, so a mid-stream type widening makes
the checked Arrow cast fail loudly — restart the stream to adopt the
widened schema; ``expire_snapshots`` retention must exceed consumer lag
or ``partitions()`` raises on the expired manifest.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition


def _published_version(table_path: str, branch: str | None = None) -> int:
    """The published pointer — readers consume published snapshots only
    (same rule as ParquetLakeTable.read; a commit that won its version
    CAS but hasn't swapped the pointer yet is not yet visible). With
    ``branch``, the branch ref file plays the role of _CURRENT."""
    if branch is not None:
        return int(_branch_entry(table_path, branch)["version"])
    try:
        with open(os.path.join(table_path, "_CURRENT")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return -1


def _branch_entry(table_path: str, branch: str) -> dict:
    try:
        with open(os.path.join(table_path, "_refs", f"{branch}.json")) as f:
            return json.load(f)
    except FileNotFoundError:
        raise RuntimeError(
            f"lakefeed: branch {branch!r} does not exist on {table_path} "
            "(dropped mid-stream, or never created)"
        ) from None


def _manifest(table_path: str, version: int) -> dict:
    if version < 0:
        return {"version": -1, "deltas": {}, "buckets": {}}
    p = os.path.join(table_path, "_manifests", f"v{version}.json")
    try:
        with open(p) as f:
            return json.load(f)
    except FileNotFoundError:
        raise RuntimeError(
            f"lakefeed: manifest v{version} is gone (expired by "
            "expire_snapshots?) — the table's retention window must "
            "exceed this consumer's lag; restart from a retained version"
        ) from None


def _new_delta_files(man: dict, parent: dict) -> list[str]:
    """Delta files this commit ADDED vs its parent (delta lists are
    cumulative per bucket until compact() empties them)."""
    seen = {f for fl in parent.get("deltas", {}).values() for f in fl}
    return sorted(
        f for fl in man.get("deltas", {}).values() for f in fl if f not in seen
    )


def _pa_type(ddl: str):
    """Spark simpleString DDL -> pyarrow type, for the file->feed-schema
    alignment cast. Covers the lake's column universe; unknown types
    raise (better than mis-typed bytes reaching the JVM)."""
    import pyarrow as pa

    t = ddl.strip().lower()
    flat = {
        "string": pa.string(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        # the lake writes TIMESTAMP_MICROS parquet (session.py); _NTZ is
        # the driver-table flavor, plain timestamp maps tz-aware UTC
        "timestamp_ntz": pa.timestamp("us"),
        "timestamp": pa.timestamp("us", tz="UTC"),
    }
    if t in flat:
        return flat[t]
    if t.startswith("decimal(") and t.endswith(")"):
        p, s = t[len("decimal(") : -1].split(",")
        return pa.decimal128(int(p), int(s))
    if t.startswith("array<") and t.endswith(">"):
        return pa.list_(_pa_type(t[len("array<") : -1]))
    raise ValueError(f"lakefeed: unsupported column type {ddl!r}")


class _FeedPartition(InputPartition):
    def __init__(self, file: str, fields: list[tuple[str, str]]):
        self.file = file
        self.fields = fields  # [(name, simpleString ddl)] — the STREAM schema


class LakeFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, fields: list[tuple[str, str]]):
        self.path = os.path.realpath(options["path"])
        self.fields = fields
        # branch=<name>: tail a BRANCH ref instead of main — the preview
        # consumer of a write-audit-publish chain (e.g. a quality monitor
        # reading an ingest branch before fast_forward publishes it).
        # Feed = the pre-fork main chain plus the branch's own commits;
        # main commits AFTER the fork are invisible (they are not part of
        # the branch's history). The epoch is captured at stream start: a
        # dropped-and-recreated same-name branch emits nothing further
        # (restart the stream to follow the new incarnation).
        self.branch = options.get("branch")
        self._branch_epoch = (
            _branch_entry(self.path, self.branch).get("epoch")
            if self.branch is not None
            else None
        )
        self._fork = (
            int(_branch_entry(self.path, self.branch).get("forked_from", -1))
            if self.branch is not None
            else None
        )
        self.skip_restore = (
            str(options.get("skipRestoreCommits", "false")).lower() == "true"
        )
        self.skip_dv = (
            str(options.get("skipDeleteVectorCommits", "false")).lower() == "true"
        )
        mv = options.get("maxVersionsPerTrigger")
        self.max_versions = int(mv) if mv is not None else None
        sv = options.get("startingVersion")
        # offset = last version already consumed; startingVersion=V means
        # "emit V and everything after"; omitted -> tail (changes from now)
        self.start = (
            int(sv) - 1
            if sv is not None
            else _published_version(self.path, self.branch)
        )
        # consumedBase: the caller already knows the checkpoint's resumed
        # offset (e.g. drain_feed reads it from the offset log between
        # runs) — seed _consumed so the maxVersionsPerTrigger cap applies
        # from the FIRST batch of a resumed run instead of being suspended
        # until partitions()/commit() reveal the offset (see below)
        cb = options.get("consumedBase")
        if cb is not None:
            self._consumed = self._hwm = int(cb)

    # last offset KNOWN consumed. None until Spark tells us (initialOffset
    # on a fresh stream; partitions()/commit() after a checkpoint resume,
    # where initialOffset is bypassed) — the maxVersionsPerTrigger cap is
    # suspended while None: capping relative to the stream's ORIGINAL
    # start could hold latestOffset below a resumed checkpoint's offset
    # forever (no batch -> no partitions() call -> never learn -> wedged).
    # Cost of the suspension: the first micro-batch after a cold start is
    # uncapped; every later one honors the cap.
    _consumed: int | None = None
    # highest end version this reader has ever advertised or seen planned.
    # latestOffset is clamped to never regress below it: Spark treats a
    # smaller offset as new data and re-plans (start, end] ranges that
    # were already delivered — duplicate rows in every append sink (the
    # exactly-once contract of this module). All tracking is None-checked,
    # never `x or y`: version 0 and the tail sentinel -1 are falsy.
    _hwm: int | None = None

    @staticmethod
    def _bump(cur: int | None, v: int) -> int:
        return v if cur is None else max(cur, v)

    def initialOffset(self) -> dict:
        self._consumed = self._bump(self._consumed, self.start)
        self._hwm = self._bump(self._hwm, self.start)
        return {"version": self.start}

    def latestOffset(self) -> dict:
        cur = max(_published_version(self.path, self.branch), self.start)
        # cap relative to what's consumed (or, failing that, the last end
        # we advertised — Spark will plan a batch up to it)
        base = self._consumed if self._consumed is not None else self._hwm
        if self.max_versions is not None and base is not None:
            cur = min(cur, base + self.max_versions)
        if self._hwm is not None:
            cur = max(cur, self._hwm)  # monotonic: never below a prior end
        self._hwm = cur
        return {"version": cur}

    def commit(self, end: dict) -> None:
        self._consumed = self._bump(self._consumed, end["version"])
        self._hwm = self._bump(self._hwm, end["version"])

    def _visible(self, man: dict, v: int) -> bool:
        """Is commit ``v`` part of this reader's ref history? Main readers
        see main-chain manifests only (a branch commit sharing the version
        space is unpublished data). Branch readers see the branch's own
        commits (name AND stream-start epoch) plus the pre-fork main
        chain."""
        ref, epoch = man.get("ref", "main"), man.get("ref_epoch")
        if self.branch is None:
            return ref == "main"
        if (ref, epoch) == (self.branch, self._branch_epoch):
            return True
        return ref == "main" and v <= self._fork

    def partitions(self, start: dict, end: dict) -> list[_FeedPartition]:
        # start is consumed by definition (this batch covers (start, end])
        self._consumed = self._bump(self._consumed, start["version"])
        self._hwm = self._bump(self._hwm, end["version"])
        parts: list[_FeedPartition] = []
        # Walk the MAIN chain only. Branch refs share the version-number
        # space (sinks/lake.py), so the raw range may contain BRANCH
        # commits — emitting their files would leak unpublished data into
        # the feed. Each main manifest diffs against the PREVIOUS MAIN
        # manifest in the walk, not its `parent` pointer: a fast_forward
        # publish has parent = the branch HEAD, and diffing against that
        # would silently drop every delta file the branch chain introduced
        # (the feed never saw the branch's own commits).
        prev_main = _manifest(self.path, start["version"])
        for v in range(start["version"] + 1, end["version"] + 1):
            man = _manifest(self.path, v)
            if not self._visible(man, v):
                continue
            if man.get("restored_from") is not None:
                if not self.skip_restore:
                    raise RuntimeError(
                        f"lakefeed: commit v{v} is a restore (rolled back to "
                        f"v{man['restored_from']}) — state changed without delta "
                        "files, so an incremental feed cannot represent it. "
                        "Reprocess from the restored snapshot, or pass "
                        "skipRestoreCommits=true to ignore restore commits."
                    )
                # skip means SKIP: a restore manifest copies the restore
                # TARGET's file lists, so a parent diff would re-emit the
                # target's whole delta backlog (already delivered when
                # those commits first landed) as duplicates. A restore
                # adds no delta files — emit nothing for it.
                continue
            # a delete_where commit adds deletion-vector files, not delta
            # files: state changed but there is nothing appendable to emit
            # (same non-append restriction as restore). Compares as a SET
            # GROWTH test because ordinary merges carry DVs forward and
            # compact() shrinks the list — neither is a state change.
            new_dvs = set(man.get("dvs") or []) - set(prev_main.get("dvs") or [])
            if new_dvs:
                if not self.skip_dv:
                    raise RuntimeError(
                        f"lakefeed: commit v{v} added deletion vectors "
                        "(delete_where) — rows were deleted without delta "
                        "files, so an incremental feed cannot represent "
                        "them. Reprocess from the snapshot, or pass "
                        "skipDeleteVectorCommits=true to ignore the "
                        "deletes (downstream will retain the deleted "
                        "rows)."
                    )
                prev_main = man
                continue
            parts.extend(
                _FeedPartition(f, self.fields)
                for f in _new_delta_files(man, prev_main)
            )
            prev_main = man
        return parts

    def read(self, partition: _FeedPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.file)
        have = set(pf.schema_arrow.names)
        wanted = [n for n, _ in partition.fields if n in have]
        # bounded memory: stream the file in row-group-sized Arrow batches
        # (never the whole file at once) and prune to the feed's columns
        # at the decoder — a delta file is O(batch/bucket) today, but the
        # reader shouldn't assume that
        for rb in pf.iter_batches(batch_size=1 << 16, columns=wanted):
            n = rb.num_rows
            cols, names = [], []
            for name, ddl in partition.fields:
                pa_t = _pa_type(ddl)
                if name in have:
                    # checked cast (pyarrow default): a mid-stream widening
                    # that would truncate fails loudly, never corrupts
                    cols.append(rb.column(wanted.index(name)).cast(pa_t))
                else:
                    # pre-evolution delta file: added column reads as null
                    cols.append(pa.nulls(n, pa_t))
                names.append(name)
            yield pa.RecordBatch.from_arrays(cols, names=names)


class LakeFeedDataSource(DataSource):
    """format("lakefeed") — see module docstring. Options: path
    (required), startingVersion, skipRestoreCommits, maxVersionsPerTrigger."""

    @classmethod
    def name(cls) -> str:
        return "lakefeed"

    def _fields(self) -> list[tuple[str, str]]:
        path = os.path.realpath(self.options["path"])
        v = _published_version(path)
        if v < 0:
            raise RuntimeError(f"lakefeed: no committed snapshot at {path}")
        man = _manifest(path, v)
        if man.get("mode", "cow") != "mor":
            raise RuntimeError(
                "lakefeed: table is copy-on-write — commits rewrite whole "
                "buckets, there is no per-commit delta to tail. Use "
                "ParquetLakeTable.diff(v1, v2) batch reads, or write the "
                "table with mode='mor'."
            )
        # paren-aware DDL split (decimal(38,0) carries a comma)
        fields: list[tuple[str, str]] = []
        depth, tok = 0, ""
        for ch in man["schema"] + ",":
            if ch == "," and depth == 0:
                name, t = tok.strip().split(" ", 1)
                fields.append((name, t.strip()))
                tok = ""
                continue
            depth += ch in "(<"
            depth -= ch in ")>"
            tok += ch
        return fields + [("_op", "string"), ("_delta_seq", "bigint")]

    def schema(self) -> str:
        return ", ".join(f"{n} {t}" for n, t in self._fields())

    def streamReader(self, schema) -> LakeFeedStreamReader:
        # align to the RESOLVED stream schema (fixed at start — also what
        # executors must emit), not whatever the latest manifest says now
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        return LakeFeedStreamReader(self.options, fields)
