"""Lake table sink: keyed MERGE with snapshot isolation.

The reference's steady-state store is Postgres rows mutated by a typed-store
applier (INSERT/UPDATE/DELETE routed per JSON-Patch op,
packages/gnarly-core/src/typeStore/Sequelize.ts:28-191). Our steady state is
a lake table and the applier is a set-oriented MERGE:

    MERGE INTO target USING updates ON target.key = updates.key
    WHEN MATCHED AND updates.op = 'delete' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED [AND op != 'delete'] THEN INSERT *

Two implementations share the interface:

- `IcebergLakeTable` — issues the MERGE as Spark SQL against a configured
  Iceberg catalog. The production path (requires
  org.apache.iceberg:iceberg-spark-runtime on the classpath; not present in
  this sandbox, so it is constructed only when a catalog is configured).

- `ParquetLakeTable` — a from-scratch bucketed copy-on-write table with the
  same semantics, used for local tests/bench. Scale design mirrors Iceberg:

  * rows are hash-bucketed on the merge key (`pmod(xxhash64(key), B)`);
    a MERGE rewrites ONLY the buckets containing changed keys — at 10^8
    live urls and B=1024, a micro-batch touching 10^5 urls rewrites ~1/10
    of the data in the worst case and usually far less, never the table.
  * every commit writes immutable data files + a new JSON manifest
    (version, bucket -> file list, applied batch_ids, schema); the
    `_CURRENT` pointer is swapped atomically (`os.replace`) => readers
    always see a consistent snapshot, and time travel = read an old
    manifest.
  * commits record `batch_id`s: re-delivery of a micro-batch (foreachBatch
    refire after crash) is detected and skipped — the exactly-once half
    that checkpoints alone don't give (SURVEY.md §7.4 risk 1).
  * schema evolution: a MERGE whose updates carry new columns widens the
    table (missing columns null-filled both ways) and the manifest records
    the merged schema (north_rule: added/renamed columns mid-stream).

  Control-plane I/O (manifest JSON, pointer swap) is driver-side local-fs;
  on a real deployment this is the catalog's job (Hive/Glue/REST for
  Iceberg). Data-plane I/O is all distributed Spark parquet read/write.
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_of(key_col, n_buckets: int):
    """Deterministic bucket id for a key — xxhash64 is a JVM-side codegen'd
    expression, so bucketing never leaves the JVM."""
    return F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")


def _rank_code(col_name: str, boundaries_arr):
    """Equi-depth rank code: #boundaries <= value, as one JVM-side fold
    over the literal boundary array (NULL values fold to code 0). A
    separate function so the column name binds by closure — pyspark's
    higher-order-function wrapper dispatches on lambda ARITY, so a
    `col=c` default parameter would silently turn the merge lambda into
    a 3-arg variant."""
    return F.aggregate(
        boundaries_arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(col_name) >= b, 1).otherwise(0),
    )


def _interleave_bits(codes, bits: int):
    """Z-value: interleave the low ``bits`` bits of each rank code, first
    column most significant within each bit level. Pure bigint arithmetic
    (literal shifts — the Python shiftright wrapper requires them), plan
    size O(bits · n_cols); bits<=16 and n_cols<=4 keeps z inside bigint."""
    n = len(codes)
    if n * bits > 62:
        raise ValueError(f"{n} columns x {bits} bits exceeds bigint z-value")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, code in enumerate(codes):
            weight = 1 << (b * n + (n - 1 - i))
            z = z + (
                F.shiftright(code.cast("int"), b).bitwiseAND(F.lit(1)).cast("bigint")
                * F.lit(weight)
            )
    return z


def _norm_stat(v):
    """Normalize a parquet footer min/max to a JSON-storable, ORDER-
    PRESERVING value: bytes -> utf-8 text, timestamps -> fixed-width
    '%Y-%m-%d %H:%M:%S.%f' strings (lexicographic == chronological),
    dates -> ISO strings, numbers/strings unchanged. None = type we don't
    prune on (the file just gets no bounds — safe)."""
    import datetime

    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):  # bool before int: True/False bounds are useless
        return None
    if isinstance(v, (int, float, str)):
        return v
    return None


def _file_stats(path: str, cols: list[str]) -> dict[str, list]:
    """{col: [min, max]} for the requested columns of one parquet file,
    from ONE footer read (no data pages) — what an Iceberg manifest writer
    records as per-file column bounds. A column is omitted when stats are
    missing for any row group or the type isn't order-normalizable (the
    file then simply isn't prunable on that column — safe). Parquet stat
    truncation (PARQUET-1685) keeps truncated min/max valid bounds (max is
    truncated by increment), so pruning against them is always sound."""
    out: dict[str, list] = {}
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for col in cols:
            i = idx.get(col)
            if i is None:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mn, mx = _norm_stat(st.min), _norm_stat(st.max)
                if mn is None or mx is None:
                    ok = False
                    break
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if ok and lo is not None:
                out[col] = [lo, hi]
    except Exception:  # pragma: no cover - stats layer never fails a commit
        return {}
    return out


def _key_bounds(path: str, key: str) -> list[str] | None:
    """[min, max] of ``key`` in one parquet file (see _file_stats)."""
    return _file_stats(path, [key]).get(key)


#: type changes an existing column may undergo via schema evolution — the
#: parquet widening reads Spark 4 supports at scan time (int32 file under a
#: wider integral read schema, float under double), so evolution never
#: requires rewriting old base files.
#: deletion-vector file schema (Iceberg v2 positional deletes): one row
#: per deleted physical position. file_path is stored EXACTLY as Spark's
#: ``_metadata.file_path`` spells it (the file:// URI): the scan-side
#: anti-join then compares raw metadata strings with NO per-row
#: normalization — a 10^10-row scan pays zero extra string work; the
#: scheme strip happens only on the tiny DV side (driver/bookkeeping).
_DV_SCHEMA = "file_path string, row_index bigint"


def _strip_uri(p: str) -> str:
    """file:///x -> /x (manifests record plain realpaths)."""
    return p[7:] if p.startswith("file://") else (
        p[5:] if p.startswith("file:") else p
    )


def _tag_positions(df: DataFrame) -> DataFrame:
    """Append each row's physical identity (``_dv_file``, ``_dv_pos``)
    from the scan's metadata columns — must be called directly on a
    parquet scan relation (``_metadata`` exists only there). The URI is
    kept verbatim (see _DV_SCHEMA)."""
    return df.select(
        "*",
        F.col("_metadata.file_path").alias("_dv_file"),
        F.col("_metadata.row_index").alias("_dv_pos"),
    )


_WIDENINGS = frozenset(
    {
        ("tinyint", "smallint"),
        ("tinyint", "int"),
        ("tinyint", "bigint"),
        ("smallint", "int"),
        ("smallint", "bigint"),
        ("int", "bigint"),
        ("float", "double"),
    }
)


class CommitConflict(Exception):
    """Another writer committed this version first (optimistic-concurrency
    loss). Callers recompute against the new current manifest and retry —
    see ParquetLakeTable._retrying. Iceberg's catalog CAS plays this role
    on the production path."""


class BranchDiverged(Exception):
    """fast_forward refused: main committed after the branch forked, so the
    branch head is no longer a descendant of main's head. NOT retryable —
    the caller must re-create the branch from the new head (re-applying its
    batches; their batch_ids make that idempotent), or publish through
    ``merge_branch`` (key-level three-way merge) when the two change sets
    touch disjoint keys."""


class BranchMergeConflict(Exception):
    """merge_branch refused: the branch and main both changed at least one
    key since the fork. Carries a sample of the conflicting keys in its
    message; resolution (pick a side, re-create the branch, merge the keys
    explicitly) is the caller's decision — exactly git/Nessie semantics."""


class ParquetLakeTable:
    """Bucketed lake table with snapshot manifests; two write paths:

    - ``mode="cow"`` (copy-on-write, default): a MERGE rewrites every
      bucket containing a changed key. Best read latency (a snapshot is a
      plain parquet scan) but per-batch write cost is O(touched buckets) —
      a 1-row change to a 6 GB bucket rewrites 6 GB.
    - ``mode="mor"`` (merge-on-read): a MERGE appends only the batch's own
      rows as DELTA files (upserts + delete tombstones stamped with the
      commit sequence); readers resolve base ∪ deltas with one
      max_by(commit_seq) per key. Per-batch write cost is O(batch) — the
      shape a high-frequency CDC stream needs (Hudi MOR / Iceberg v2
      deletes / Paimon LSM all make this same trade). Reader cost grows
      with the delta backlog; ``compact()`` folds deltas back into base
      files (bucket-granular, snapshot-atomic), restoring scan speed.

    The mode is recorded in the manifest at first commit; reopening an
    existing table adopts the recorded mode (the constructor argument only
    seeds new tables, so a maintenance job can't accidentally flip a
    table's write path).
    """

    #: internal columns carried by MOR delta files; base files lack them
    #: and read as null (parquet missing-column null-fill), which resolves
    #: as commit_seq -1 — older than every delta.
    _MOR_DDL = ", _op string, _delta_seq bigint"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "url",
        n_buckets: int = 16,
        mode: str = "cow",
        files_per_bucket: int = 1,
        stats_columns: tuple[str, ...] = (),
        key_bloom_ndv: int | None = None,
        branch: str | None = None,
    ):
        self.spark = spark
        # realpath: manifests record absolute data-file paths, and
        # expire_snapshots compares paths for liveness — opening the same
        # table under a different spelling (relative, symlinked, trailing
        # slash) must resolve to the identical prefix or maintenance would
        # treat every live file as orphaned
        self.path = os.path.realpath(path)
        self.key = key
        # writable named refs (Iceberg branches): a handle is bound to ONE
        # ref for its lifetime — "main" (the _CURRENT pointer) or a branch
        # created with create_branch(). All reads and commits of this
        # handle resolve/advance that ref; manifests are stamped with the
        # ref (+ a per-incarnation epoch so a dropped-and-recreated branch
        # never adopts the old incarnation's commits). {version: (ref,
        # epoch)} is cached per handle — a manifest's ref never changes
        # once written (purge_keys rewrites file lists in place, never the
        # ref stamp).
        self.ref = "main"
        self._ref_epoch: str | None = None
        self._refcache: dict[int, tuple[str, str | None]] = {}
        if branch is not None:
            self._check_tag_name(branch)
            e = self._branch_entry(branch)
            self.ref = branch
            self._ref_epoch = e.get("epoch")
        self.n_buckets = n_buckets
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        self.mode = mode
        # write-parallelism knob (NOT a layout fact — readers don't care
        # how many files a bucket has, the manifest lists them): with the
        # default 1, each bucket is written by ONE task (hash repartition
        # on _bucket puts a whole bucket in one partition) — a 6 GB bucket
        # rewrite is a 6 GB single-task file. >1 range-splits each bucket
        # into that many key-disjoint files written in parallel, preserving
        # per-file key sort (so row-group AND file-level pruning survive).
        self.files_per_bucket = max(1, int(files_per_bucket))
        # secondary zone-map columns: per-file [min, max] of these columns
        # are recorded in every manifest (one footer read per NEW file, at
        # commit) and scan_range() prunes files against them — Iceberg's
        # manifest column-bounds for non-key serving predicates (e.g.
        # "pages changed in [t1, t2)" on warc_ts). Adding a column later is
        # safe: old files lack bounds and are simply never pruned.
        self.stats_columns = tuple(stats_columns)
        # opt-in NATIVE parquet bloom filters on the key (write-side knob,
        # like files_per_bucket): every data file carries a per-row-group
        # key bloom sized for ~this many distinct keys, and Spark's parquet
        # reader consults it for pushed key equalities automatically. The
        # case that needs it: a z-ordered table (cluster()) — files are no
        # longer key-sorted, so min/max row-group stats stop pruning point
        # lookups; the bloom restores row-group skipping at ~1 byte/key.
        # Off by default (blooms cost file bytes; key-sorted layouts don't
        # need them). SIZING: parquet allocates each ROW-GROUP's bloom for
        # this declared NDV, so set it to ~rows per data file (table rows /
        # (n_buckets * files_per_bucket)), NOT the table-wide distinct
        # count — the table-wide value pays ~20x the bytes for zero extra
        # lookup benefit (measured in BENCH.md "key-bloom sizing").
        self.key_bloom_ndv = key_bloom_ndv
        if key in self.stats_columns:
            raise ValueError(
                f"stats_columns must not include the key ({key!r}); key "
                "bounds are always recorded"
            )
        os.makedirs(os.path.join(self.path, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        cur = self._manifest()
        if cur["version"] >= 0:
            # mode and n_buckets are physical-layout facts of the table, not
            # per-open options: reopening with a different n_buckets would
            # route lookups to the wrong bucket and make compact() write
            # rows into buckets the manifest never references (silent loss).
            # The manifest is authoritative once the table exists.
            self.mode = cur.get("mode", "cow")
            self.n_buckets = int(cur.get("n_buckets", n_buckets))
            # the merge KEY is the most layout-critical fact of all (it
            # seeds the bucket hash): opening with a different key and
            # running rebucket()/cluster()/merge() would re-route every
            # row and silently break lookup()'s bucket routing. Refuse
            # loudly instead of adopting — a wrong key is always caller
            # error, never a migration.
            recorded_key = cur.get("key")
            if recorded_key is not None and recorded_key != key:
                raise ValueError(
                    f"table at {self.path} is keyed by {recorded_key!r}; "
                    f"opened with key={key!r} (pass the recorded key — "
                    "the bucket layout is derived from it)"
                )
            # union the table's recorded stats columns in so a plain
            # reopen keeps maintaining them; a constructor list ADDS
            # columns (writers also re-union at every commit via
            # _adopt_layout, so no handle can silently drop a column
            # another handle declared — see the stale-handle note there)
            self.stats_columns = tuple(
                dict.fromkeys(
                    list(self.stats_columns) + list(cur.get("stats_columns", ()))
                )
            )

    # ---- snapshot control plane -------------------------------------
    @property
    def _current_path(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    @property
    def _refs_dir(self) -> str:
        return os.path.join(self.path, "_refs")

    def _branch_path(self, name: str) -> str:
        return os.path.join(self._refs_dir, f"{name}.json")

    def _branch_entry(self, name: str) -> dict:
        try:
            with open(self._branch_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"branch {name!r} does not exist on {self.path} "
                "(create_branch first)"
            )

    def _branch_entries(self) -> list[dict]:
        try:
            names = os.listdir(self._refs_dir)
        except FileNotFoundError:
            return []
        out = []
        for fn in sorted(names):
            if fn.endswith(".json"):
                try:
                    with open(os.path.join(self._refs_dir, fn)) as f:
                        out.append(json.load(f))
                except (OSError, ValueError):  # pragma: no cover - defensive
                    continue
        return out

    def _ref_of(self, v: int) -> tuple[str, str | None]:
        """(ref, epoch) stamp of version ``v``'s manifest ('main', None for
        pre-branch manifests). Cached — the stamp is immutable."""
        hit = self._refcache.get(v)
        if hit is None:
            try:
                m = self._manifest(v)
            except FileNotFoundError:
                return ("?", None)
            hit = (m.get("ref", "main"), m.get("ref_epoch"))
            self._refcache[v] = hit
        return hit

    def current_version(self) -> int:
        if self.ref != "main":
            return int(self._branch_entry(self.ref)["version"])
        try:
            with open(self._current_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v < 0:
            return {
                "version": -1,
                "buckets": {},
                "deltas": {},
                "batch_ids": [],
                "schema": None,
            }
        with open(os.path.join(self.path, "_manifests", f"v{v}.json")) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> int:
        # stamp the physical-layout facts on every snapshot so reopen
        # restores them (see __init__)
        manifest["mode"] = self.mode
        manifest["n_buckets"] = self.n_buckets
        manifest["key"] = self.key
        # ref membership: every manifest records which ref committed it —
        # head resolution (_latest_committed) and expire's keep rule walk
        # these stamps. Epoch ties a branch commit to the ref-file
        # incarnation that made it.
        manifest["ref"] = self.ref
        if self.ref != "main":
            manifest["ref_epoch"] = self._ref_epoch
        else:
            manifest.pop("ref_epoch", None)
        # staleness guard: before the number CAS can even run, the commit
        # must still be built on ITS REF'S latest head. The version-number
        # collision used to double as this check; with refs sharing one
        # number space a collision can come from another ref, and the
        # allocation bump below would otherwise let a stale same-ref writer
        # slide in WITHOUT recomputing (lost update). `_built_on` defaults
        # to `parent`; fast_forward overrides it (its parent is the branch
        # head while it builds on main's).
        built_on = manifest.pop("_built_on", manifest.get("parent", -1))
        latest = self._latest_committed()
        if built_on != latest:
            raise CommitConflict(
                f"commit was built on v{built_on} but ref {self.ref!r} is "
                f"at v{latest} — recompute"
            )
        # version allocation: refs share ONE version-number space (so every
        # manifest is addressable by read(version=)/diff()), but a ref only
        # chains through its own manifests via `parent`. The caller's
        # head+1 guess is a floor — when another ref took that number, the
        # next free number is used WITHOUT changing `parent` (the chain is
        # the parent pointer, not number adjacency). The narrow
        # check-then-allocate window between two same-ref writers is still
        # serialized by the os.link number CAS below (both compute the same
        # next number; one loses and recomputes).
        manifest["version"] = max(
            manifest["version"], max(self._retained_versions(), default=-1) + 1
        )
        # wall-clock commit stamp: AS OF timestamp time travel + the
        # snapshots() metadata table. Commits are serialized by the
        # version CAS, so per-table stamps are monotone up to clock skew
        # between writers (same caveat as Iceberg's snapshot timestamps).
        manifest["committed_at"] = time.time()
        self._attach_bounds(manifest)
        v = manifest["version"]
        mpath = os.path.join(self.path, "_manifests", f"v{v}.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # optimistic concurrency: exactly ONE writer may create v{N}.json.
        # os.link is atomic and fails with EEXIST if another writer (a
        # concurrent merge vs a compact/rebucket maintenance job) committed
        # this version first — the loser re-reads the new manifest and
        # recomputes (_retrying) instead of silently overwriting the
        # winner's commit out of the manifest chain. This is the local-fs
        # analog of Iceberg's catalog pointer CAS.
        try:
            os.link(tmp, mpath)
        except FileExistsError:
            raise CommitConflict(f"version {v} was committed by another writer")
        finally:
            os.unlink(tmp)
        self._publish(v)
        return v

    def _attach_bounds(self, manifest: dict) -> None:
        """Record per-file key [min, max] bounds in the manifest (Iceberg's
        manifest column-bounds analog): one driver-side FOOTER read per NEW
        file per commit — files carried over from the parent (or already
        present when a manifest is copied, e.g. restore()) reuse their
        recorded bounds. lookup() prunes files inside a bucket against
        these before any Spark scan is planned, so a point read on object
        storage opens ~1 file per bucket instead of files_per_bucket (and
        skips delta files whose key range can't match). Files without
        usable stats simply get no entry and are never pruned."""
        reuse = dict(manifest.get("bounds", {}))
        reuse_col: dict[str, dict] = {
            c: dict(m) for c, m in manifest.get("col_bounds", {}).items()
        }
        p = manifest.get("parent", -1)
        if isinstance(p, int) and p >= 0:
            try:
                pm = self._manifest(p)
                reuse.update(pm.get("bounds", {}))
                for c, m in pm.get("col_bounds", {}).items():
                    reuse_col.setdefault(c, {}).update(m)
            except FileNotFoundError:  # parent expired mid-flight
                pass
        bounds: dict[str, list[str]] = {}
        col_bounds: dict[str, dict[str, list]] = {c: {} for c in self.stats_columns}
        for fmap in (manifest.get("buckets", {}), manifest.get("deltas", {})):
            for fl in fmap.values():
                for f in fl:
                    missing = [
                        c
                        for c in self.stats_columns
                        if f not in reuse_col.get(c, {})
                    ]
                    if f not in reuse:
                        missing.append(self.key)
                    if missing:
                        # one footer read covers every missing column
                        stats = _file_stats(f, missing)
                        if self.key in stats:
                            reuse[f] = stats[self.key]
                        for c in self.stats_columns:
                            if c in stats:
                                reuse_col.setdefault(c, {})[f] = stats[c]
                    if f in reuse:
                        bounds[f] = reuse[f]
                    for c in self.stats_columns:
                        b = reuse_col.get(c, {}).get(f)
                        if b is not None:
                            col_bounds[c][f] = b
        manifest["bounds"] = bounds
        manifest["col_bounds"] = {c: m for c, m in col_bounds.items() if m}
        manifest["stats_columns"] = list(self.stats_columns)

    def _publish(self, v: int) -> None:
        """Swap _CURRENT to version ``v`` — guarded so the pointer never
        moves BACKWARD. The per-version CAS serializes manifest creation
        but not pointer swaps: winner A (v5) can stall before its swap
        while B builds on v5, commits v6, and publishes — A's late swap
        must then be a no-op, or readers time-travel backward and
        expire_snapshots computes its keep window from a regressed head.
        The read-compare-replace is serialized with a pointer lock (local
        FS engine; the Iceberg path delegates this to the catalog).

        Branch handles move their ref file instead of _CURRENT — same
        forward-only rule, same lock — and additionally check the epoch: a
        branch dropped (or dropped-and-recreated) mid-commit must NOT have
        its pointer resurrected/hijacked by the stale writer; the durable
        manifest is simply left unreachable for expire_snapshots."""
        with open(os.path.join(self.path, "_PTR_LOCK"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                if self.ref != "main":
                    bpath = self._branch_path(self.ref)
                    try:
                        with open(bpath) as f:
                            e = json.load(f)
                    except FileNotFoundError:
                        return  # branch dropped mid-commit
                    if e.get("epoch") != self._ref_epoch:
                        return  # different incarnation owns the name now
                    if int(e["version"]) < v:
                        e["version"] = v
                        btmp = bpath + f".tmp-{uuid.uuid4().hex[:8]}"
                        with open(btmp, "w") as f:
                            json.dump(e, f)
                        os.replace(btmp, bpath)
                    return
                if self.current_version() < v:
                    ptmp = self._current_path + f".tmp-{uuid.uuid4().hex[:8]}"
                    with open(ptmp, "w") as f:
                        f.write(str(v))
                    os.replace(ptmp, self._current_path)  # atomic swap
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def _retrying(self, attempt_fn, attempts: int = 5):
        """Run ``attempt_fn()`` (which reads the latest committed manifest,
        writes data files, and _commits) until it wins the version CAS. Each
        retry recomputes against the NEW manifest, so a lost race never
        drops the winner's rows; the loser's orphaned data files are
        reclaimed by expire_snapshots. Concurrent WRITER support is for
        maintenance-vs-ingest races — steady-state ingest is still one
        streaming writer."""

        for i in range(attempts):
            try:
                return attempt_fn()
            except CommitConflict:
                if i == attempts - 1:
                    raise
                # brief backoff: the winner may not have swapped _CURRENT
                # yet, but _latest_committed() already sees its manifest
                time.sleep(0.05 * (i + 1))
        raise AssertionError("unreachable")

    def _adopt_layout(self, m: dict) -> None:
        """A writer must use the layout of the manifest it BUILDS ON, not
        __init__-time state: a concurrent rebucket() (or a CAS retry against
        one) changes n_buckets mid-handle, and hashing with the stale count
        would read survivors from the wrong buckets, miss old copies of
        upserted keys, and stamp the old layout back over the manifest —
        silent duplicates and lost lookups."""
        if m["version"] >= 0:
            self.mode = m.get("mode", self.mode)
            self.n_buckets = int(m.get("n_buckets", self.n_buckets))
            # UNION the recorded stats columns in, never replace: a stale
            # handle (e.g. a streaming ingest opened before a concurrent
            # `maintenance_job --cluster x,y` committed) would otherwise
            # stamp its shorter list over the manifest and silently drop
            # the zone-map bounds the cluster rewrite just paid for.
            # Constructor lists therefore ADD columns; recorded ones are
            # kept for the table's lifetime (a drop would have to rewrite
            # this union, deliberately).
            self.stats_columns = tuple(
                dict.fromkeys(
                    list(self.stats_columns) + list(m.get("stats_columns", ()))
                )
            )

    def _latest_committed(self) -> int:
        """Highest durably-committed version OF THIS HANDLE'S REF — what a
        writer must build on. Readers use the published pointer (_CURRENT /
        the ref file); a writer using it could race the window between a
        competitor's version CAS and its pointer swap, then spin losing the
        same version. Scanning manifests by ref stamp covers that window
        for branches exactly as the max-version scan did for main. A fresh
        branch with no commits yet resolves to its fork-base (main)
        manifest."""
        vs = self._retained_versions()
        if self.ref == "main":
            return max(
                (v for v in vs if self._ref_of(v)[0] == "main"), default=-1
            )
        e = self._branch_entry(self.ref)
        floor = int(e.get("forked_from", -1))
        mine = (self.ref, e.get("epoch"))
        return max((v for v in vs if self._ref_of(v) == mine), default=floor)

    def applied_batch_ids(self) -> set[int]:
        """Batch ids that are DURABLY applied — read from the latest
        committed manifest, not the _CURRENT pointer: a crash between a
        commit's version CAS and its pointer swap leaves the batch durable
        (the next commit chains from it) but unpublished, and the refire
        guard must treat it as applied or the batch would double-apply."""
        return set(self._manifest(self._latest_committed())["batch_ids"])

    # ---- data plane ---------------------------------------------------
    def read(
        self, version: int | None = None, as_of=None, tag: str | None = None
    ) -> DataFrame:
        """Snapshot read (time travel when ``version``, ``as_of`` or
        ``tag`` is given; ``as_of`` is a datetime or epoch-seconds float
        resolved to the last snapshot committed at or before it —
        Iceberg/Delta's TIMESTAMP AS OF; ``tag`` is a named ref created
        with :meth:`tag` — Iceberg's VERSION AS OF 'tag'). On a MOR table
        with outstanding deltas this resolves base ∪ deltas per key (one
        shuffle); after ``compact()`` — or always on a COW table — it is
        a plain pruned parquet scan."""
        if sum(x is not None for x in (version, as_of, tag)) > 1:
            raise ValueError("pass at most one of version / as_of / tag")
        if tag is not None:
            version = self._tag_version(tag)
        if as_of is not None:
            version = self._version_as_of(as_of)
        m = self._manifest(version)
        df = self._read_snapshot(m, None)
        if df is None:
            return self.spark.createDataFrame(
                [], schema=m["schema"] or f"{self.key} string"
            )
        return df

    def _read_snapshot(self, m: dict, buckets: list[int] | None) -> DataFrame | None:
        """Resolved relation for a manifest, optionally restricted to a
        bucket subset (the lookup path). None when the table has no schema
        yet. Base and delta files are read in ONE scan with the manifest
        schema plus the MOR columns — base files null-fill them, and
        coalesce(_delta_seq, -1) makes every delta newer than base — then
        one max_by per key picks the winner and delete tombstones drop out.

        When the manifest carries deletion vectors (``dvs`` — see
        delete_where), the scan is position-filtered FIRST: DV'd physical
        rows are removed before MOR resolution, so a DV'd delta row can
        never win and a DV'd base row can never resurface. Every reader
        (read / lookup / scan_range / scan_box / diff / changelog /
        compact / rebucket / cluster) funnels through here, so the filter
        is applied exactly once, everywhere."""
        if m["schema"] is None:
            return None
        bsel = m["buckets"] if buckets is None else {
            str(b): m["buckets"].get(str(b), []) for b in buckets
        }
        dmap = m.get("deltas", {})
        dsel = dmap if buckets is None else {
            str(b): dmap.get(str(b), []) for b in buckets
        }
        base = [f for fl in bsel.values() for f in fl]
        dfiles = [f for fl in dsel.values() for f in fl]
        dvs = m.get("dvs") or []
        if not dfiles:
            if not base:
                return self.spark.createDataFrame([], schema=m["schema"])
            df = self.spark.read.schema(m["schema"]).parquet(*base)
            if dvs:
                df = self._anti_dvs(_tag_positions(df), dvs).drop(
                    "_dv_file", "_dv_pos"
                )
            return df
        df = self.spark.read.schema(m["schema"] + self._MOR_DDL).parquet(
            *(base + dfiles)
        )
        if dvs:
            df = self._anti_dvs(_tag_positions(df), dvs).drop("_dv_file", "_dv_pos")
        data_cols = [c for c in df.columns if c not in ("_op", "_delta_seq")]
        seq = F.coalesce(F.col("_delta_seq"), F.lit(-1).cast("bigint"))
        win = df.groupBy(F.col(self.key).alias("_k")).agg(
            F.max_by(
                F.struct(*[F.col(c) for c in data_cols], F.col("_op")), seq
            ).alias("_w")
        )
        return (
            win.where(
                F.col("_w._op").isNull() | (F.col("_w._op") != F.lit("delete"))
            )
            .select(*[F.col(f"_w.{c}").alias(c) for c in data_cols])
        )

    def _key_type(self, m: dict) -> str:
        """The merge key's data type per the manifest schema ('string' for
        an empty table)."""
        ddl = m.get("schema")
        if not ddl:
            return "string"
        return (
            self.spark.createDataFrame([], schema=ddl)
            .schema[self.key]
            .dataType.simpleString()
        )

    def _typed_keys(self, m: dict, keys, op: str) -> list:
        """Coerce caller-supplied key literals to the TABLE's key type.

        Point paths (lookup / purge_keys) hash and compare the literals;
        on a non-string-keyed table a raw string hashes differently
        (xxhash64('12345') != xxhash64(12345L)), routing to the wrong
        buckets and silently matching nothing — for purge_keys that's a
        compliance hard delete that reports success while purging nothing.
        Uncastable keys raise instead of vanishing."""
        ktype = self._key_type(m)
        if ktype == "string":
            return [k if isinstance(k, str) else str(k) for k in keys]
        typed = [
            r[0]
            for r in self.spark.createDataFrame(
                [(str(k),) for k in keys], schema=f"{self.key} string"
            )
            # try_cast: under ANSI mode a plain cast THROWS on a malformed
            # literal; NULL + the explicit raise below names the bad keys
            .select(F.expr(f"try_cast({self.key} AS {ktype})"))
            .collect()
        ]
        bad = [k for k, t in zip(keys, typed) if t is None]
        if bad:
            raise ValueError(
                f"{op}: key(s) {bad!r} not castable to the table's key type "
                f"{ktype!r}"
            )
        return typed

    def lookup(self, *keys: str) -> DataFrame:
        """Point read on the serving table: route each key to its bucket
        via the same xxhash64 bucketing the writer used, scan ONLY those
        buckets' files, and push the key equality into the parquet scan.

        At 100 TB / n_buckets this turns a full-table scan into reading
        1/n_buckets of the files per key (and the pushed filter then skips
        row groups via parquet min/max stats) — the serving-path analog of
        the reference's indexed `findOne` (typeStore/Sequelize.ts:117-124),
        without a row store. Bucket ids for the literal keys are computed
        with one tiny metadata-only Spark job (n_keys rows, no table I/O).

        Bucket ids come from the layout of the manifest BEING READ, never
        __init__-time state: a concurrent rebucket() changes n_buckets, and
        hashing with a stale count would scan the wrong buckets and return
        empty for keys that exist (the reader-side twin of the writer's
        _adopt_layout hazard). One manifest fetch serves both the bucket
        computation and the scan, so the pair is always consistent.
        """
        if not keys:
            raise ValueError("lookup() needs at least one key")
        m = self._manifest()
        n = int(m.get("n_buckets", self.n_buckets)) if m["version"] >= 0 else self.n_buckets
        keys = self._typed_keys(m, keys, "lookup")
        kdf = self.spark.createDataFrame(
            [(k,) for k in keys], schema=f"{self.key} {self._key_type(m)}"
        )
        buckets = [
            r.b
            for r in kdf.select(bucket_of(F.col(self.key), n).alias("b"))
            .distinct()
            .collect()
        ]
        bounds = m.get("bounds", {})
        # bounds are stored _norm_stat-normalized (timestamps/dates/bytes
        # as order-preserving strings) — normalize the typed keys the same
        # way before comparing, or a timestamp-keyed lookup raises
        # TypeError('<=' between str and datetime); a key _norm_stat can't
        # represent disables pruning for the whole call (keep-all is safe)
        norm_keys = [_norm_stat(k) for k in keys]
        if any(nk is None for nk in norm_keys):
            bounds = {}
        if bounds:
            # file-level zone-map pruning WITHIN the routed buckets: a file
            # whose recorded key range can't contain any requested key is
            # dropped before the scan is even planned (files without bounds
            # are kept — safe). With files_per_bucket>1 the writer's range
            # split makes per-bucket files key-disjoint, so this reads ~1
            # file per key instead of files_per_bucket.
            def _keep(f: str) -> bool:
                b = bounds.get(f)
                if b is None:
                    return True
                try:
                    return any(b[0] <= nk <= b[1] for nk in norm_keys)
                except TypeError:
                    return True  # mixed bound flavors: never prune on doubt

            m = {
                **m,
                "buckets": {
                    bk: [f for f in fl if _keep(f)]
                    for bk, fl in m["buckets"].items()
                },
                "deltas": {
                    bk: [f for f in fl if _keep(f)]
                    for bk, fl in m.get("deltas", {}).items()
                },
            }
        df = self._read_snapshot(m, buckets)
        if df is None:
            return self.spark.createDataFrame(
                [], schema=m.get("schema") or f"{self.key} string"
            )
        return df.where(F.col(self.key).isin(list(keys)))

    def scan_range(self, col: str, lo=None, hi=None) -> DataFrame:
        """Range read with manifest zone-map file skipping: rows of the
        current snapshot where ``lo <= col <= hi`` (either bound may be
        None), scanning ONLY files whose recorded [min, max] for ``col``
        overlaps the range (plus files without bounds — never pruned,
        always safe). With ``col`` in ``stats_columns`` (or the key), a
        time-window serving query like "pages changed on 2026-08-14" opens
        the handful of files that window's commits wrote instead of the
        whole table — Iceberg's manifest-bounds scan planning, driver-side,
        before Spark ever plans the scan.

        Soundness on MOR: key-column pruning is always safe (every row of
        a key carries the same key, so a kept key's base AND delta files
        are all kept). A NON-key predicate over outstanding deltas is NOT
        file-prunable — pruning a delta file whose rows fall outside the
        range would resurrect the stale base row it supersedes — so that
        case falls back to the resolved read + filter (compact() restores
        prunability). Timestamp bounds are normalized to the fixed-width
        format the manifest records, so lexicographic compare == time
        compare."""
        return self.scan_box({col: (lo, hi)})

    def scan_box(self, preds: dict[str, tuple]) -> DataFrame:
        """Multi-column range read: rows satisfying EVERY ``col: (lo, hi)``
        predicate (either bound may be None), opening only files whose
        recorded bounds overlap ALL the ranges — the per-column zone-map
        file sets are INTERSECTED, which is the serving read a z-order
        layout exists for: each clustered file is a small hyper-rectangle,
        so a 2-D box ("domain X, changed in window T") opens roughly the
        files whose rectangle intersects the box, strictly fewer than
        either 1-D slice alone. scan_range() is the single-column case.

        Same soundness rules as scan_range: files without bounds for a
        column are never pruned on that column; with outstanding MOR
        deltas, any NON-key predicate forces the resolved-read fallback
        (pruning a delta file on a non-key range could resurrect the
        stale base row it supersedes)."""
        if not preds:
            raise ValueError("scan_box needs at least one column predicate")
        m = self._manifest()
        if m["version"] < 0 or m["schema"] is None:
            return self.spark.createDataFrame([], schema=f"{self.key} string")

        def _pred(df: DataFrame):
            p = F.lit(True)
            for col, (lo, hi) in preds.items():
                c = F.col(col)
                dt = df.schema[col].dataType
                if lo is not None:
                    p = p & (c >= F.lit(lo).cast(dt))
                if hi is not None:
                    p = p & (c <= F.lit(hi).cast(dt))
            return p

        has_deltas = any(fl for fl in m.get("deltas", {}).values())
        if has_deltas and any(c != self.key for c in preds):
            r = self.read()
            return r.where(_pred(r))

        norm = {
            c: (
                _norm_stat(lo) if lo is not None else None,
                _norm_stat(hi) if hi is not None else None,
            )
            for c, (lo, hi) in preds.items()
        }

        def _keep(f: str) -> bool:
            for c, (lo_n, hi_n) in norm.items():
                fb = m["bounds"] if c == self.key else m.get("col_bounds", {}).get(c, {})
                b = fb.get(f)
                if b is None:
                    continue
                if lo_n is not None and b[1] < lo_n:
                    return False
                if hi_n is not None and b[0] > hi_n:
                    return False
            return True

        pruned = {
            **m,
            "buckets": {
                bk: [f for f in fl if _keep(f)] for bk, fl in m["buckets"].items()
            },
            "deltas": {
                bk: [f for f in fl if _keep(f)]
                for bk, fl in m.get("deltas", {}).items()
            },
        }
        df = self._read_snapshot(pruned, None)
        if df is None:
            return self.spark.createDataFrame([], schema=m["schema"])
        return df.where(_pred(df))

    def _write_buckets(
        self,
        df: DataFrame,
        version: int,
        n_write_buckets: int | None = None,
        range_split: bool = True,
        order_col: str | None = None,
    ) -> dict[str, list[str]]:
        """Write df (carrying ``_bucket``) as one dir per bucket; returns
        bucket -> file list. Data files are immutable once written.

        ``n_write_buckets``: how many distinct buckets df actually holds —
        range partitioning must scale to THAT, not the table's bucket
        count: a 1-bucket merge on a 16-bucket/fpb=4 table range-split 64
        ways would scatter one bucket's rows across ~64 tiny key ranges
        (file-count explosion per commit). None means all buckets.

        ``order_col``: alternate within-bucket file order (cluster() passes
        the interleaved z-value). The column is a write-time helper — it is
        dropped after the in-partition sort (a narrow projection, row order
        preserved) and never lands in the data files. Default: the key."""
        out_dir = os.path.join(self.path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
        order = order_col or self.key
        if self.files_per_bucket > 1 and range_split:
            # range partition on (_bucket, order): each written bucket
            # splits into ~files_per_bucket contiguous ranges of the order
            # column written by parallel tasks (one range-sampling job
            # extra — worth it for big COW rewrites; MOR delta appends
            # bypass this, see _merge_mor)
            nb = self.n_buckets if n_write_buckets is None else max(1, n_write_buckets)
            df = df.repartitionByRange(
                nb * self.files_per_bucket, "_bucket", order
            )
        else:
            df = df.repartition(F.col("_bucket"))
        # order-sorted within each bucket file: parquet records min/max
        # per row group, so lookup()'s pushed key-equality skips every
        # row group but the winner's — at 100 TB a point read touches
        # 1/n_buckets of the files AND ~1 row group per file, instead
        # of decoding whole buckets. Cost: an in-task sort of rows the
        # write was already shuffling (no extra exchange).
        w = df.sortWithinPartitions("_bucket", order)
        if order_col is not None:
            w = w.drop(order_col)
        writer = w.write.partitionBy("_bucket").mode("overwrite")
        if self.key_bloom_ndv:
            writer = writer.option(
                f"parquet.bloom.filter.enabled#{self.key}", "true"
            ).option(
                f"parquet.bloom.filter.expected.ndv#{self.key}",
                str(int(self.key_bloom_ndv)),
            )
        writer.parquet(out_dir)
        result: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if entry.startswith("_bucket="):
                b = entry.split("=", 1)[1]
                bdir = os.path.join(out_dir, entry)
                result[b] = sorted(
                    os.path.join(bdir, f) for f in os.listdir(bdir) if f.endswith(".parquet")
                )
        return result

    @staticmethod
    def _align(df: DataFrame, columns: list[tuple[str, str]]) -> DataFrame:
        """Project df to `columns` [(name, ddl_type)], null-filling (typed)
        the ones it lacks — the schema-merge half of evolution."""
        # resolve case-insensitively (Spark's default spark.sql.caseSensitive
        # =false): a batch delivering 'V' for table column 'v' feeds the
        # EXISTING column under the table's spelling instead of null-filling
        # it while the data forks into a new column
        have = {c.lower(): c for c in df.columns}
        return df.select(
            *[
                # the cast is a no-op when types already match; when a merge
                # widened the column (int->bigint) it coerces BOTH the batch
                # and the survivor/delta rows to the manifest type, so every
                # file written from here on carries exactly the manifest
                # schema (old base files upcast at scan time — Spark 4
                # parquet widening reads)
                F.col(have[c.lower()]).cast(t).alias(c)
                if c.lower() in have
                else F.lit(None).cast(t).alias(c)
                for c, t in columns
            ]
        )

    def merge(
        self,
        upserts: DataFrame | None,
        delete_keys: DataFrame | None = None,
        batch_id: int | None = None,
    ) -> bool:
        """Keyed MERGE: upsert rows, delete keys, commit one snapshot.

        Returns False (no-op) when ``batch_id`` was already applied — the
        idempotence that makes foreachBatch exactly-once under refires
        (replaces the reference's save-tx-then-apply replay protocol,
        Ourbit.ts:144-150 + ReducerRunner.ts:63-104). Optimistically
        retried on a version-CAS loss to a concurrent maintenance commit
        (compact/rebucket) — recomputed against the winner's manifest.
        """
        return self._retrying(lambda: self._merge_once(upserts, delete_keys, batch_id))

    # ---- write-audit-publish (staged commits) -------------------------
    def _staged_path(self, token: str) -> str:
        return os.path.join(self.path, "_staged", f"{token}.json")

    def merge_staged(
        self,
        upserts: DataFrame | None,
        delete_keys: DataFrame | None = None,
        batch_id: int | None = None,
    ) -> str | None:
        """Write-audit-publish: run the FULL merge (data files written,
        manifest built, bounds recorded) but park the result as a staged
        snapshot instead of committing — readers still see the old table.
        Returns a stage token, or None when the merge was a no-op (empty
        batch or batch_id already applied). Audit the staged state with
        ``read_staged(token)`` (a data-quality gate runs its checks here),
        then ``publish_staged(token)`` to make it the table's next version
        atomically, or ``abandon_staged(token)`` to drop it. Until publish,
        the batch_id is NOT durably applied — an abandoned batch can be
        re-delivered, quarantined, or fixed upstream without any tombstone
        surgery (Iceberg's WAP branch pattern)."""
        staged: dict[str, str] = {}

        def stage(manifest: dict) -> int:
            manifest["mode"] = self.mode
            manifest["n_buckets"] = self.n_buckets
            self._attach_bounds(manifest)
            token = f"s{manifest['parent']}-{uuid.uuid4().hex[:8]}"
            os.makedirs(os.path.join(self.path, "_staged"), exist_ok=True)
            with open(self._staged_path(token), "w") as f:
                json.dump(manifest, f)
            staged["token"] = token
            return manifest["version"]

        applied = self._merge_once(upserts, delete_keys, batch_id, commit_fn=stage)
        return staged.get("token") if applied else None

    def read_staged(self, token: str) -> DataFrame:
        """Snapshot read of a staged (not yet published) merge — the audit
        surface of write-audit-publish."""
        with open(self._staged_path(token)) as f:
            m = json.load(f)
        df = self._read_snapshot(m, None)
        if df is None:
            return self.spark.createDataFrame(
                [], schema=m["schema"] or f"{self.key} string"
            )
        return df

    def publish_staged(self, token: str) -> int:
        """Atomically commit a staged snapshot as the table's next version.
        Raises CommitConflict if anything was committed after the stage was
        built (its survivor rewrite / delta chain is stale) — re-stage on
        the new head, exactly like an optimistic-commit retry."""
        with open(self._staged_path(token)) as f:
            m = json.load(f)
        if self._latest_committed() != m.get("parent", -1):
            raise CommitConflict(
                f"staged snapshot {token} was built on v{m.get('parent')}, "
                f"table is at v{self._latest_committed()} — re-stage"
            )
        v = self._commit(m)
        os.unlink(self._staged_path(token))
        return v

    def abandon_staged(self, token: str) -> None:
        """Drop a staged snapshot. Files written FOR the stage (their data
        dir carries a version newer than any committed snapshot) are
        unlinked promptly; anything else the stage referenced belongs to
        committed history and is untouched. If a concurrent commit already
        took the staged version number, the stage's files are left as
        orphans for expire_snapshots to reclaim."""
        with open(self._staged_path(token)) as f:
            m = json.load(f)
        os.unlink(self._staged_path(token))
        cur = self._latest_committed()
        for fmap in (m.get("buckets", {}), m.get("deltas", {})):
            for fl in fmap.values():
                for fpath in fl:
                    vdir = os.path.dirname(os.path.dirname(fpath))
                    name = os.path.basename(vdir)
                    try:
                        dir_version = int(name.split("-", 1)[0].lstrip("v"))
                    except ValueError:
                        continue
                    if dir_version > cur and os.path.exists(fpath):
                        os.unlink(fpath)

    def _merge_once(
        self,
        upserts: DataFrame | None,
        delete_keys: DataFrame | None,
        batch_id: int | None,
        commit_fn=None,
        manifest: dict | None = None,
    ) -> bool:
        # `manifest`: a caller that DERIVED upserts from a specific
        # snapshot pins it here, so a commit that lands between the
        # caller's read and this merge trips _commit's _built_on check
        # (CommitConflict -> the caller's retry recomputes) instead of
        # being silently built over with stale-derived values
        m = manifest if manifest is not None else self._manifest(
            self._latest_committed()
        )
        self._adopt_layout(m)
        if batch_id is not None and batch_id in m["batch_ids"]:
            return False

        key = self.key
        up = upserts
        dk = delete_keys.select(key).distinct() if delete_keys is not None else None
        if up is None and dk is None:
            return False  # nothing to commit (and no batch_id recorded)

        # NULL merge keys are unroutable and must fail LOUD (review r05):
        # the MOR read's groupBy treats NULLs as equal, silently collapsing
        # distinct null-key rows to one arbitrary winner, while the COW
        # survivor anti-join never matches NULL = NULL, so old null rows
        # survive every merge and duplicate unboundedly. Poison the key
        # in-plan — the raise_error branch evaluates only when the key IS
        # null, so validation rides the write job at zero extra scan cost.
        def _null_poison(rel: DataFrame) -> DataFrame:
            kt = rel.schema[key].dataType
            return rel.withColumn(
                key,
                F.coalesce(
                    F.col(key),
                    F.raise_error(
                        F.lit(
                            f"NULL merge key {key!r} in batch — unroutable "
                            "(filter or key-fill upstream)"
                        )
                    ).cast(kt),
                ),
            )

        if up is not None:
            up = _null_poison(up)
        if dk is not None:
            dk = _null_poison(dk)

        # merged column set (schema evolution): new columns widen the table,
        # and an existing column arriving with a wider type (int->bigint,
        # float->double) widens to Spark's own union-coerced type — computed
        # by unionByName over two empty relations, so the rule is exactly
        # Spark's least-common-type, not a hand-rolled table. Delta/rewrite
        # files are cast to the widened type in _align; old base files need
        # no rewrite on the MOR path (parquet widening reads upcast at scan
        # time), and the COW path rewrites stale buckets below as before.
        if m["schema"] and up is not None:
            # evolve each existing column by the _WIDENINGS whitelist, NOT
            # by Spark's union least-common-type: ANSI string promotion
            # resolves (int, string) to bigint — one misconfigured batch
            # (e.g. quoted JSON numbers) would slip past a
            # coerced-type-vs-whitelist check and then blow up (or flip a
            # string column's stored type) at write. A batch column must be
            # the table type, a sanctioned widening of it (table widens in
            # place; old base files stay readable — Spark 4 parquet
            # widening reads), or a narrowing of it (the batch upcasts in
            # _align); anything else is a hard error.
            old = [
                (f.name, f.dataType.simpleString())
                for f in self.spark.createDataFrame([], m["schema"]).schema.fields
            ]
            # key by lowercase: Spark resolves names case-insensitively by
            # default, so a case-only rename ('v' -> 'V') is the SAME column
            # — matching exactly would fork a new column and null-fill the
            # old one (silent data loss + AMBIGUOUS_REFERENCE on next read)
            up_types: dict[str, str] = {}
            for f in up.schema.fields:
                lo = f.name.lower()
                if lo in up_types:
                    raise ValueError(
                        f"batch has columns differing only in case around "
                        f"{f.name!r} — ambiguous under Spark's default "
                        "case-insensitive resolution"
                    )
                up_types[lo] = f.dataType.simpleString()
            columns = []
            for name, t in old:
                bt = up_types.get(name.lower())
                if bt is None or bt == t:
                    columns.append((name, t))
                elif (t, bt) in _WIDENINGS:
                    columns.append((name, bt))
                elif (bt, t) in _WIDENINGS:
                    columns.append((name, t))
                else:
                    raise ValueError(
                        f"incompatible type for column {name!r}: table has "
                        f"{t}, batch has {bt} (only widenings "
                        f"{sorted(_WIDENINGS)} evolve in place; fix the "
                        "upstream types or migrate explicitly)"
                    )
            old_names = {n.lower() for n, _ in old}
            columns += [
                (f.name, f.dataType.simpleString())
                for f in up.schema.fields
                if f.name.lower() not in old_names
            ]
        elif m["schema"]:
            columns = [tuple(f.split(" ", 1)) for f in m["schema"].split(", ")]
        elif up is not None:
            columns = [(f.name, f.dataType.simpleString()) for f in up.schema.fields]
        else:
            return False

        if self.mode == "mor":
            return self._merge_mor(m, up, dk, columns, batch_id, commit_fn)

        # buckets touched by this merge — only these are rewritten
        touched = []
        for d in (up, dk):
            if d is not None:
                touched.append(d.select(bucket_of(F.col(key), self.n_buckets).alias("b")))
        tdf = touched[0]
        for t in touched[1:]:
            tdf = tdf.unionAll(t)
        buckets = [r.b for r in tdf.distinct().collect()]

        # read survivors from the WRITER's manifest m (not _CURRENT — on a
        # CAS retry m is the competitor's newer commit)
        existing = self._read_snapshot(m, buckets) if m["schema"] else None

        changed_keys = None
        if up is not None:
            changed_keys = up.select(key)
        if dk is not None:
            changed_keys = dk if changed_keys is None else changed_keys.unionByName(dk)

        parts = []
        if existing is not None and changed_keys is not None:
            # survivors: existing rows in touched buckets not being replaced
            # (broadcast anti-join: changed keys per micro-batch are small
            # relative to the table)
            parts.append(
                self._align(
                    existing.join(F.broadcast(changed_keys.distinct()), key, "left_anti"),
                    columns,
                )
            )
        elif existing is not None:
            parts.append(self._align(existing, columns))
        if up is not None:
            parts.append(self._align(up, columns))
        if not parts:
            return False
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        merged = merged.withColumn("_bucket", bucket_of(F.col(key), self.n_buckets))

        version = m["version"] + 1
        new_files = self._write_buckets(merged, version, n_write_buckets=len(buckets))

        schema_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in merged.drop("_bucket").schema.fields
        )
        bucket_map = dict(m["buckets"])
        for b in buckets:
            bucket_map[str(b)] = new_files.get(str(b), [])  # bucket may be emptied
        manifest = {
            "version": version,
            "buckets": bucket_map,
            "deltas": {},
            # DVs survive a COW merge: untouched buckets keep their files,
            # so their recorded delete positions stay live. Entries for
            # rewritten files go inert (the path leaves the manifest) and
            # are pruned at the next compact().
            "dvs": m.get("dvs") or [],
            "batch_ids": (m["batch_ids"] + ([batch_id] if batch_id is not None else []))[-10000:],
            "schema": schema_ddl,
            "parent": m["version"],
            "mode": self.mode,
        }
        # Schema evolution does NOT rewrite untouched buckets: readers use
        # an explicit manifest-schema read, where missing columns null-fill
        # and Spark 4's parquet scan upcasts every sanctioned _WIDENINGS
        # pair in place (byte/short/int under a wider int type, float under
        # double — verified against the installed runtime). A 1-row merge
        # that adds a column therefore stays O(batch), not O(table); the
        # MOR path has always relied on the same property for its base
        # files.
        (commit_fn or self._commit)(manifest)
        return True

    def _merge_mor(
        self,
        m: dict,
        up: DataFrame | None,
        dk: DataFrame | None,
        columns: list[tuple[str, str]],
        batch_id: int | None,
        commit_fn=None,
    ) -> bool:
        """Merge-on-read commit: append ONLY the batch's rows as delta
        files — upserts plus delete tombstones, stamped with the commit
        sequence — never reading or rewriting existing data. Write cost is
        O(batch) regardless of table size; resolution happens at read time
        (_read_snapshot) and is folded away by compact(). A key in both
        upserts and delete_keys resolves to the upsert (tombstones are
        anti-joined out), matching the COW path and build_merge_source."""
        version = m["version"] + 1
        parts = []
        if up is not None:
            parts.append(self._align(up, columns).withColumn("_op", F.lit("upsert")))
        if dk is not None:
            if up is not None:
                dk = dk.join(up.select(self.key).distinct(), self.key, "left_anti")
            parts.append(self._align(dk, columns).withColumn("_op", F.lit("delete")))
        if not parts:
            return False
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        delta = delta.withColumn(
            "_delta_seq", F.lit(version).cast("bigint")
        ).withColumn("_bucket", bucket_of(F.col(self.key), self.n_buckets))
        # delta appends are O(batch) small: always the hash path (one file
        # per touched bucket), never the range split — files_per_bucket is
        # a big-rewrite knob and would multiply tiny files per commit here
        files = self._write_buckets(delta, version, range_split=False)
        dmap = {b: list(fl) for b, fl in m.get("deltas", {}).items()}
        for b, fl in files.items():
            dmap[b] = dmap.get(b, []) + fl
        (commit_fn or self._commit)(
            {
                "version": version,
                "buckets": m["buckets"],
                "deltas": dmap,
                "dvs": m.get("dvs") or [],
                "batch_ids": (
                    m["batch_ids"] + ([batch_id] if batch_id is not None else [])
                )[-10000:],
                "schema": ", ".join(f"{c} {t}" for c, t in columns),
                "parent": m["version"],
                "mode": self.mode,
            }
        )
        return True

    # ---- positional deletion vectors (Iceberg v2 deletes, Spark-first) --

    def _anti_dvs(self, tagged: DataFrame, dv_files: list[str]) -> DataFrame:
        """Remove DV'd positions from a position-tagged relation. The DV
        relation is tiny relative to the table (positions of deleted rows
        only) so AQE broadcasts the anti-join; a table whose DV backlog has
        grown large should compact() — same maintenance contract as the
        MOR delta backlog."""
        dv = self.spark.read.schema(_DV_SCHEMA).parquet(*dv_files)
        return tagged.join(
            dv,
            (tagged["_dv_file"] == dv["file_path"])
            & (tagged["_dv_pos"] == dv["row_index"]),
            "left_anti",
        )

    def _dv_paths(self, dv_files: list[str]) -> set[str]:
        """Distinct data-file paths referenced by these DV files,
        normalized to the manifests' plain-path spelling — driver-bounded
        by the table's file count (same order as the manifest's own path
        lists)."""
        if not dv_files:
            return set()
        return {
            _strip_uri(r.file_path)
            for r in self.spark.read.schema(_DV_SCHEMA)
            .parquet(*dv_files)
            .select("file_path")
            .distinct()
            .collect()
        }

    def _dv_file_map(self, dv_files: list[str]) -> dict[str, set[str]]:
        """{dv file (manifest spelling) -> referenced data paths (manifest
        spelling)} in ONE Spark job (input_file_name tags each row's own
        DV file) — compact() needs both the union (pending-bucket
        detection) and the per-file sets (pruning), and per-file jobs
        would be K+1 driver-blocking submissions for K stacked DVs."""
        if not dv_files:
            return {}
        rows = (
            self.spark.read.schema(_DV_SCHEMA)
            .parquet(*dv_files)
            .select(F.input_file_name().alias("dv"), "file_path")
            .distinct()
            .collect()
        )
        out: dict[str, set[str]] = {f: set() for f in dv_files}
        by_real = {os.path.realpath(f): f for f in dv_files}
        for r in rows:
            key = by_real.get(os.path.realpath(_strip_uri(r.dv)))
            if key is not None:
                out[key].add(_strip_uri(r.file_path))
        return out

    def delete_where(self, predicate: str, batch_id: int | None = None) -> dict:
        """Predicate delete via positional deletion vectors (Iceberg v2
        positional deletes / Delta deletion vectors, re-expressed
        Spark-first): rows of the CURRENT snapshot matching ``predicate``
        (a SQL boolean expression over the table's columns) are deleted by
        recording their physical positions — (file, row_index) pairs in a
        tiny DV parquet file the manifest references — instead of
        rewriting data files (COW) or resolving key tombstones (MOR).

        Semantics: the predicate is evaluated against the RESOLVED current
        view; every physical copy of a matched key is DV'd (base image AND
        delta images), so MOR resolution can never resurrect an older
        image of a deleted row. Cost: one scan + one tiny file — a 1-row
        predicate delete on a 6 GB COW bucket writes ~30 bytes, not 6 GB.
        On a COW table with no DV backlog the predicate pushes straight
        into the parquet scan (no join at all).

        Time travel is preserved (older snapshots don't carry the new DV);
        diff()/changelog() report the rows as deletes. compact() folds DVs
        into rewritten files and prunes fully-materialized DV files.
        NOT a compliance delete: the bytes remain in the data files until
        compact() + expire_snapshots() age them out — purge_keys is the
        hard-delete path (and refuses to run while retained snapshots
        carry DVs; see its docstring). The lakefeed incremental source
        fails loudly on DV commits (state change without delta files —
        same contract as restore()).

        Returns {"version", "rows_deleted", "positions", "dv_files"};
        no-ops without a commit when nothing matches."""
        return self._retrying(lambda: self._delete_where_once(predicate, batch_id))

    def _delete_where_once(self, predicate: str, batch_id: int | None) -> dict:
        m = self._manifest(self._latest_committed())
        self._adopt_layout(m)
        # refire guard, same as _merge_once: a re-delivered batch must
        # no-op, not re-evaluate the predicate against a LATER snapshot
        # (rows merged since the original run would be deleted unseen)
        if batch_id is not None and batch_id in m["batch_ids"]:
            return {"version": m["version"], "rows_deleted": 0, "positions": 0,
                    "dv_files": 0}
        if m["version"] < 0 or m["schema"] is None:
            return {"version": m["version"], "rows_deleted": 0, "positions": 0,
                    "dv_files": 0}
        cond = F.expr(predicate)
        base = [f for fl in m["buckets"].values() for f in fl]
        dfiles = [f for fl in m.get("deltas", {}).values() for f in fl]
        dvs = m.get("dvs") or []
        if not (base or dfiles):
            return {"version": m["version"], "rows_deleted": 0, "positions": 0,
                    "dv_files": 0}
        version = m["version"] + 1
        if dfiles:
            # MOR backlog: matched keys come from the resolved view, then
            # EVERY physical copy of those keys is DV'd (delete-tombstone
            # rows belong to already-deleted keys, which the resolved view
            # excludes, so tombstones stay — they must keep suppressing
            # their base rows)
            resolved = self._read_snapshot(m, None)
            # one row per key in the resolved view, so the matched-keys
            # relation IS the visible-rows-deleted count — materialize it
            # once (checkpoint) and both the count and the semi-join read
            # it, instead of paying the base∪delta max_by resolution twice
            keys = (
                resolved.where(cond)
                .select(self.key)
                .localCheckpoint(eager=True)
            )
            tagged = _tag_positions(
                self.spark.read.schema(m["schema"] + self._MOR_DDL).parquet(
                    *(base + dfiles)
                )
            )
            if dvs:
                tagged = self._anti_dvs(tagged, dvs)
            live = tagged.where(~F.col("_op").eqNullSafe(F.lit("delete")))
            hits = live.join(keys, self.key, "left_semi")
            rows_deleted = keys.count()
        else:
            # COW / compacted: one physical row per key — the predicate
            # pushes into the scan, no join
            tagged = _tag_positions(
                self.spark.read.schema(m["schema"]).parquet(*base)
            )
            if dvs:
                tagged = self._anti_dvs(tagged, dvs)
            hits = tagged.where(cond)
            rows_deleted = None
        dv_rows = hits.select(
            F.col("_dv_file").alias("file_path"), F.col("_dv_pos").alias("row_index")
        )
        out_dir = os.path.join(
            self.path, "data", f"v{version}-dv-{uuid.uuid4().hex[:8]}"
        )
        dv_rows.coalesce(4).write.mode("overwrite").parquet(out_dir)
        files = [
            os.path.realpath(os.path.join(out_dir, p))
            for p in sorted(os.listdir(out_dir))
            if p.endswith(".parquet")
        ]
        n_pos = (
            self.spark.read.schema(_DV_SCHEMA).parquet(*files).count()
            if files
            else 0
        )
        if n_pos == 0:
            shutil.rmtree(out_dir, ignore_errors=True)
            return {"version": m["version"], "rows_deleted": 0, "positions": 0,
                    "dv_files": 0}
        committed_v = self._commit(
            {
                "version": version,
                "buckets": m["buckets"],
                "deltas": m.get("deltas", {}),
                "dvs": dvs + files,
                "batch_ids": (
                    m["batch_ids"] + ([batch_id] if batch_id is not None else [])
                )[-10000:],
                "schema": m["schema"],
                "parent": m["version"],
                "mode": self.mode,
            }
        )
        return {
            # the COMMITTED number, not the pre-allocation guess — refs
            # share the version space and _commit may have bumped past a
            # number another ref took
            "version": committed_v,
            "rows_deleted": rows_deleted if rows_deleted is not None else n_pos,
            "positions": n_pos,
            "dv_files": len(files),
        }

    def update_where(
        self,
        predicate: str,
        set_exprs: dict[str, str],
        batch_id: int | None = None,
    ) -> dict:
        """Predicate update (SQL ``UPDATE ... SET ... WHERE`` / Iceberg
        UPDATE analog): rows of the current snapshot matching
        ``predicate`` get ``set_exprs`` ({column: SQL expression})
        applied and re-committed as an ordinary MERGE of the rewritten
        rows — one commit, snapshot-atomic, refire-guardable via
        ``batch_id``. All assignments evaluate against the OLD row in one
        projection (standard UPDATE semantics: ``{"a": "b", "b": "a"}``
        swaps). The merge key cannot be assigned (rewriting identity
        would orphan the old row — use delete + insert explicitly).

        Cost: the matched rows ride the normal merge path — O(matched)
        delta append on MOR, O(touched buckets) rewrite on COW; the scan
        side pushes ``predicate`` into the file scan when the table has
        no MOR/DV backlog (same pushdown story as delete_where's fast
        path). Returns {"version", "rows_updated"}; no commit when
        nothing matches."""
        if not set_exprs:
            raise ValueError("update_where: empty set_exprs")
        if self.key in set_exprs:
            raise ValueError(
                f"update_where: cannot assign the merge key {self.key!r} — "
                "rewriting identity would orphan the old row; delete and "
                "re-insert instead"
            )
        bad = [c for c in set_exprs if c not in self.read().columns]
        if bad:
            raise ValueError(f"update_where: unknown column(s) {bad}")

        # the WHOLE read-compute-merge runs inside the CAS retry: a merge
        # losing the version CAS to a concurrent commit must recompute the
        # matched set against the WINNER's snapshot — retrying only the
        # merge with a DataFrame pinned to the stale snapshot would
        # clobber the concurrent write with values derived from old rows
        # (the _built_on lost-update class). Same shape as
        # _delete_where_once.
        def attempt() -> dict:
            m = self._manifest(self._latest_committed())
            self._adopt_layout(m)
            resolved = self._read_snapshot(m, None)
            if resolved is None:
                return {"version": m["version"], "rows_updated": 0}
            upserts = resolved.where(F.expr(predicate)).withColumns(
                {c: F.expr(e) for c, e in set_exprs.items()}
            )
            n = upserts.count()
            if n == 0:
                return {"version": m["version"], "rows_updated": 0}
            # pin the snapshot the upserts were computed from: without it
            # _merge_once would re-read the head and absorb a commit that
            # landed during count(), writing stale-derived values over it
            applied = self._merge_once(upserts, None, batch_id, manifest=m)
            # a refired batch_id makes the merge a no-op: report 0, not
            # the match count of a commit that never happened
            return {
                "version": self.current_version(),
                "rows_updated": n if applied else 0,
            }

        return self._retrying(attempt)

    def compact(self, buckets: list[int] | None = None) -> dict:
        """Fold outstanding MOR deltas into base files (bucket-granular,
        snapshot-atomic): resolve each selected bucket's base ∪ deltas,
        rewrite it as plain base files, and commit a manifest with those
        buckets' delta lists emptied. Readers of the new snapshot pay a
        plain scan again; old snapshots still time-travel (expire_snapshots
        reclaims the folded delta files once their manifests age out).

        ``buckets=None`` compacts every bucket with deltas; a list limits
        the rewrite (at 100 TB you compact the hottest buckets on a cadence
        — cost is O(selected buckets' data), never the table). No-op
        (no commit) when nothing is pending. Returns {"compacted_buckets",
        "folded_delta_files", "version"}. CAS-retried against concurrent
        ingest commits (the maintenance-vs-ingest race)."""
        return self._retrying(lambda: self._compact_once(buckets))

    def compact_hot(self, max_deltas: int = 8) -> dict:
        """Backlog-driven compaction policy (Hudi's inline-compaction
        trigger / Iceberg's `rewrite_data_files where` analog): compact
        ONLY the buckets whose outstanding delta-file count exceeds
        ``max_deltas`` — the read-amplification hotspots — leaving cool
        buckets' cheap deltas in place. This is the cadence call a
        maintenance cron makes on a 100 TB MOR table: cost tracks the hot
        buckets' data, read cost stays bounded at max_deltas resolves per
        key everywhere else. Control-plane selection (manifest delta map
        only); returns compact()'s stats plus {"hot_buckets": [...]}."""
        m = self._manifest(self._latest_committed())
        hot = sorted(
            int(b)
            for b, fl in m.get("deltas", {}).items()
            if len(fl) > max_deltas
        )
        if not hot:
            return {
                "compacted_buckets": 0,
                "folded_delta_files": 0,
                "version": m["version"],
                "hot_buckets": [],
            }
        out = self.compact(buckets=hot)
        out["hot_buckets"] = hot
        return out

    def _compact_once(self, buckets: list[int] | None) -> dict:
        m = self._manifest(self._latest_committed())
        self._adopt_layout(m)
        dmap = m.get("deltas", {})
        dvs = m.get("dvs") or []
        pending = {int(b) for b, fl in dmap.items() if fl}
        dv_map = self._dv_file_map(dvs)  # one job for detection AND pruning
        if dvs:
            # buckets holding DV'd files need compaction too: rewriting
            # them materializes the deletes so the DV entries (and
            # eventually the DV files) can be dropped
            dv_paths = set().union(*dv_map.values()) if dv_map else set()
            for fmap in (m["buckets"], dmap):
                for b, fl in fmap.items():
                    if any(f in dv_paths for f in fl):
                        pending.add(int(b))
        pending = sorted(pending)
        todo = pending if buckets is None else [b for b in pending if b in set(buckets)]
        if not todo:
            # no bucket needs data work, but FULLY-INERT DV files (every
            # referenced path already left the manifest — e.g. a COW
            # merge rewrote the DV'd bucket) still need a control-plane
            # prune: without it the dvs list persists forever, every read
            # pays the anti-join, and purge_keys' DV guard can never
            # clear (its own remediation says "run compact()")
            if dvs:
                current = {
                    f for fmap in (m["buckets"], dmap)
                    for fl in fmap.values() for f in fl
                }
                kept = [
                    dvf for dvf in dvs
                    if any(p in current for p in dv_map.get(dvf, ()))
                ]
                if kept != dvs:
                    v = self._commit(
                        {
                            "version": m["version"] + 1,
                            "buckets": m["buckets"],
                            "deltas": dmap,
                            "dvs": kept,
                            "batch_ids": m["batch_ids"],
                            "schema": m["schema"],
                            "parent": m["version"],
                            "mode": self.mode,
                        }
                    )
                    return {
                        "compacted_buckets": 0,
                        "folded_delta_files": 0,
                        "pruned_dv_files": len(dvs) - len(kept),
                        "version": v,
                    }
            return {
                "compacted_buckets": 0,
                "folded_delta_files": 0,
                "version": m["version"],
            }
        resolved = self._read_snapshot(m, todo).withColumn(
            "_bucket", bucket_of(F.col(self.key), self.n_buckets)
        )
        version = m["version"] + 1
        files = self._write_buckets(resolved, version, n_write_buckets=len(todo))
        bucket_map = dict(m["buckets"])
        new_deltas = {b: list(fl) for b, fl in dmap.items()}
        folded = 0
        for b in todo:
            bucket_map[str(b)] = files.get(str(b), [])  # may resolve empty
            folded += len(new_deltas.pop(str(b), []))
        # prune fully-materialized DV files: a DV file whose every
        # referenced data file left the manifest is inert (the anti-join
        # can never match) — drop it so the read-side DV relation shrinks
        # with compaction instead of growing forever
        kept_dvs = dvs
        if dvs:
            remaining = {
                f
                for fmap in (bucket_map, new_deltas)
                for fl in fmap.values()
                for f in fl
            }
            kept_dvs = [
                dvf
                for dvf in dvs
                if any(p in remaining for p in dv_map.get(dvf, ()))
            ]
        committed_v = self._commit(
            {
                "version": version,
                "buckets": bucket_map,
                "deltas": new_deltas,
                "dvs": kept_dvs,
                "batch_ids": m["batch_ids"],
                "schema": m["schema"],
                "parent": m["version"],
                "mode": self.mode,
            }
        )
        return {
            "compacted_buckets": len(todo),
            "folded_delta_files": folded,
            "pruned_dv_files": len(dvs) - len(kept_dvs),
            "version": committed_v,
        }

    def rebucket(self, n_buckets: int) -> dict:
        """Re-hash the table into a different bucket count — the sanctioned
        way to change the (manifest-sticky) layout when a table outgrows it
        (a 100 TB table that started at n_buckets=16 has 6 TB buckets; the
        fix is 4096, not reopening with a different constructor arg, which
        the manifest deliberately ignores).

        One snapshot: resolve the current state (folding MOR deltas),
        rewrite every row under the new hash, commit with the new
        n_buckets recorded. O(table) by construction — bucket-parallel,
        and `files_per_bucket` bounds the largest write task. Old
        snapshots still time-travel (their files are untouched);
        applied batch_ids carry over, so refires stay no-ops across the
        layout change.
        """
        self._require_main("rebucket")
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        return self._retrying(lambda: self._rebucket_once(n_buckets))

    def _rebucket_once(self, n_buckets: int) -> dict:
        m = self._manifest(self._latest_committed())
        self._adopt_layout(m)
        if m["version"] < 0:
            self.n_buckets = n_buckets  # empty table: just adopt the layout
            return {"version": -1, "n_buckets": n_buckets, "rows": 0}
        resolved = self._read_snapshot(m, None)
        old = self.n_buckets
        self.n_buckets = n_buckets
        try:
            resolved = resolved.withColumn(
                "_bucket", bucket_of(F.col(self.key), n_buckets)
            )
            version = m["version"] + 1
            files = self._write_buckets(resolved, version)
            self._commit(
                {
                    "version": version,
                    "buckets": files,
                    "deltas": {},
                    "batch_ids": m["batch_ids"],
                    "schema": m["schema"],
                    "parent": m["version"],
                    "mode": self.mode,
                }
            )
        except Exception:
            # failed write OR lost the version CAS: layout unchanged (a
            # CAS retry re-enters with the pre-rebucket bucket count)
            self.n_buckets = old
            raise
        return {
            "version": version,
            "n_buckets": n_buckets,
            "files": sum(len(fl) for fl in files.values()),
        }

    def cluster(self, by: list[str], bits: int = 8) -> dict:
        """Z-order the table's base files on ``by`` (Delta's OPTIMIZE
        ZORDER BY / Iceberg's sort-order rewrite, from scratch): resolve
        the current state (folding MOR deltas), lay rows out along an
        interleaved-bit space-filling curve over the ``by`` columns, and
        commit one new snapshot. Each data file then covers a small
        hyper-rectangle in ``by``-space instead of a key range, so the
        per-file bounds the manifest already records (``stats_columns``)
        let ``scan_range`` file-skip on ANY clustered column — the layout
        that makes 2-D serving predicates ("domain X, changed in window T")
        open a handful of files at 100 TB. ``by`` columns are auto-added to
        ``stats_columns`` so the commit records their bounds.

        Mechanics (all Spark-side except one bounded driver sample):
        equi-depth rank codes per column from a ~20·2^bits row sample
        (the RangePartitioner recipe — sample size is O(2^bits),
        independent of table size, and works for any orderable type:
        ints, floats, strings, timestamps), then the z-value interleaves
        the code bits; the rewrite range-partitions on (_bucket, z) so
        files split the curve, and the z column never lands on disk.

        Trade-off (documented, inherent): clustered files are no longer
        key-disjoint within a bucket, so lookup()'s file-level key zone
        maps stop pruning (bucket routing and pushed row-group filters
        still apply). Run cluster() when range scans dominate point reads;
        a later compact()/rebucket() restores key order. Like compact,
        cost is O(table being rewritten), CAS-retried vs concurrent
        ingest; old snapshots still time-travel and batch_ids carry over
        (refires stay no-ops across the layout change)."""
        self._require_main("cluster")
        if not by:
            raise ValueError("cluster() needs at least one column")
        if len(set(by)) != len(by):
            raise ValueError(f"duplicate columns in cluster(by={by!r})")
        if not (1 <= bits <= 16):
            raise ValueError(f"bits must be in [1, 16], got {bits}")
        if len(by) * bits > 62:
            # pure arithmetic — fail here, before _cluster_once pays the
            # count + sample jobs over the whole table
            raise ValueError(
                f"{len(by)} columns x {bits} bits exceeds bigint z-value; "
                "lower bits or cluster on fewer columns"
            )
        return self._retrying(lambda: self._cluster_once(list(by), bits))

    def _cluster_once(self, by: list[str], bits: int) -> dict:
        m = self._manifest(self._latest_committed())
        self._adopt_layout(m)
        if m["version"] < 0:
            return {"version": -1, "files": 0, "clustered_by": by}
        resolved = self._read_snapshot(m, None)
        missing = [c for c in by if c not in resolved.columns]
        if missing:
            raise ValueError(f"cluster columns not in table schema: {missing}")
        # record bounds for every clustering column from this commit on
        self.stats_columns = tuple(
            dict.fromkeys(list(self.stats_columns) + [c for c in by if c != self.key])
        )
        # one bounded sample job → equi-depth boundaries per column
        # (driver holds O(2^bits · len(by)) scalars, never the table)
        n_rows = resolved.count()
        target = 20 * (1 << bits)
        frac = min(1.0, target / max(n_rows, 1))
        sample = resolved.select(*by).sample(fraction=frac, seed=42).collect()
        codes = []
        for c in by:
            vals = sorted(r[c] for r in sample if r[c] is not None)
            k = 1 << bits
            bnds = list(
                dict.fromkeys(
                    vals[min(len(vals) - 1, int(len(vals) * j / k))]
                    for j in range(1, k)
                )
            ) if vals else []
            if not bnds:
                codes.append(F.lit(0))
                continue
            dt = resolved.schema[c].dataType
            arr = F.array(*[F.lit(b).cast(dt) for b in bnds])
            # rank code = #boundaries <= value (NULLs code to 0); one fold
            # over a 2^bits-1 literal array, fully JVM-side
            codes.append(_rank_code(c, arr))
        z = _interleave_bits(codes, bits)
        version = m["version"] + 1
        df = resolved.withColumn(
            "_bucket", bucket_of(F.col(self.key), self.n_buckets)
        ).withColumn("_zorder", z)
        files = self._write_buckets(df, version, order_col="_zorder")
        self._commit(
            {
                "version": version,
                "buckets": files,
                "deltas": {},
                "batch_ids": m["batch_ids"],
                "schema": m["schema"],
                "parent": m["version"],
                "mode": self.mode,
                "clustered_by": by,
            }
        )
        return {
            "version": version,
            "files": sum(len(fl) for fl in files.values()),
            "clustered_by": by,
        }

    def _retained_versions(self) -> list[int]:
        """Versions with a retained manifest file, ascending."""
        mdir = os.path.join(self.path, "_manifests")
        out = []
        for f in os.listdir(mdir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def _version_as_of(self, ts) -> int:
        import datetime as _dt

        if isinstance(ts, _dt.datetime):
            # naive datetimes are UTC, matching everything else in the
            # system (session TZ pinned UTC, NTZ table timestamps) —
            # .timestamp() alone would interpret them in the OS-local zone
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            ts = ts.timestamp()
        best = -1
        fork = (
            int(self._branch_entry(self.ref).get("forked_from", -1))
            if self.ref != "main"
            else -1
        )
        for v in self._retained_versions():
            try:
                m = self._manifest(v)
            except FileNotFoundError:  # expired mid-listing
                continue
            # AS OF resolves within this handle's ref HISTORY only: main
            # sees main-chain manifests (a branch's unpublished commits
            # must not satisfy a main read); a branch sees its own commits
            # plus the pre-fork main chain it grew from
            ref, epoch = m.get("ref", "main"), m.get("ref_epoch")
            if self.ref == "main":
                if ref != "main":
                    continue
            elif not (
                (ref, epoch) == (self.ref, self._ref_epoch)
                or (ref == "main" and v <= fork)
            ):
                continue
            ca = m.get("committed_at")
            if ca is not None and ca <= ts:
                best = max(best, v)
        if best < 0:
            raise ValueError(
                f"no retained snapshot committed at or before {ts} "
                "(older ones may have been expired, or the timestamp "
                "predates the table)"
            )
        return best

    def snapshots(self) -> DataFrame:
        """Metadata table (Iceberg's ``table.snapshots`` analog): one row
        per retained snapshot — version, parent, commit timestamp, file
        and delta-file counts, applied-batch count, layout facts. Control
        plane only (manifest JSON), no data I/O."""
        rows = []
        for v in self._retained_versions():
            try:
                m = self._manifest(v)
            except FileNotFoundError:
                continue
            rows.append(
                (
                    v,
                    m.get("parent", -1),
                    m.get("ref", "main"),
                    float(m["committed_at"]) if m.get("committed_at") else None,
                    sum(len(fl) for fl in m.get("buckets", {}).values()),
                    sum(len(fl) for fl in m.get("deltas", {}).values()),
                    len(m.get("batch_ids", [])),
                    m.get("mode", self.mode),
                    int(m.get("n_buckets", self.n_buckets)),
                )
            )
        return self.spark.createDataFrame(
            rows,
            schema="version int, parent int, ref string, committed_at double, "
            "n_files int, n_delta_files int, n_batches int, "
            "mode string, n_buckets int",
        )

    # ---- named snapshot refs (Iceberg tags) ----------------------------

    @property
    def _tags_dir(self) -> str:
        return os.path.join(self.path, "_tags")

    @staticmethod
    def _check_tag_name(name: str) -> None:
        import re

        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]{0,127}", name or ""):
            raise ValueError(
                f"invalid tag name {name!r}: use [A-Za-z0-9._-], start "
                "alphanumeric, <=128 chars (tag names are manifest-dir "
                "file names)"
            )

    def tag(self, name: str, version: int | None = None, replace: bool = False) -> int:
        """Create (or with ``replace=True`` re-point) a named ref to a
        snapshot — Iceberg's tags (``ALTER TABLE ... CREATE TAG``).
        Defaults to the current version. Tagged snapshots are PINNED:
        ``expire_snapshots`` keeps their manifests and data files however
        old they get, so a tag is the durable form of "the audited
        snapshot we trained run X on". Returns the tagged version.

        Creation is atomic (os.link CAS, the same primitive as the commit
        pointer): two writers racing the same new tag name — one wins,
        the loser gets ValueError rather than a silent overwrite."""
        self._check_tag_name(name)
        v = self.current_version() if version is None else int(version)
        if v < 0 or v not in self._retained_versions():
            raise ValueError(f"version {v} is not a retained snapshot")
        os.makedirs(self._tags_dir, exist_ok=True)
        tpath = os.path.join(self._tags_dir, f"{name}.json")
        payload = {"name": name, "version": v, "created_at": time.time()}
        tmp = tpath + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        try:
            if replace:
                os.replace(tmp, tpath)
                tmp = None
            else:
                try:
                    os.link(tmp, tpath)
                except FileExistsError:
                    raise ValueError(
                        f"tag {name!r} already exists (pass replace=True to re-point)"
                    )
        finally:
            if tmp is not None and os.path.exists(tmp):
                os.unlink(tmp)
        return v

    def drop_tag(self, name: str) -> bool:
        """Remove a named ref. The snapshot itself stays until
        ``expire_snapshots`` next runs without the pin. Returns whether
        the tag existed."""
        self._check_tag_name(name)
        try:
            os.remove(os.path.join(self._tags_dir, f"{name}.json"))
            return True
        except FileNotFoundError:
            return False

    def _tag_entries(self) -> list[dict]:
        try:
            names = os.listdir(self._tags_dir)
        except FileNotFoundError:
            return []
        out = []
        for fn in sorted(names):
            if not fn.endswith(".json") or ".tmp-" in fn:
                continue
            try:
                with open(os.path.join(self._tags_dir, fn)) as f:
                    out.append(json.load(f))
            except (OSError, ValueError):  # pragma: no cover - defensive
                continue
        return out

    def _tag_version(self, name: str) -> int:
        self._check_tag_name(name)
        try:
            with open(os.path.join(self._tags_dir, f"{name}.json")) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            raise ValueError(f"unknown tag {name!r}")

    def tags(self) -> DataFrame:
        """Metadata table (Iceberg's ``table.refs`` analog): one row per
        named snapshot ref — name, pinned version, creation stamp.
        Control plane only."""
        rows = [
            (t["name"], int(t["version"]), float(t["created_at"]))
            for t in self._tag_entries()
        ]
        return self.spark.createDataFrame(
            rows, schema="name string, version int, created_at double"
        )

    # ---- writable branches (Iceberg branch refs) ------------------------

    def _require_main(self, opname: str) -> None:
        if self.ref != "main":
            raise ValueError(
                f"{opname} must run on the main ref "
                f"(this handle is bound to branch {self.ref!r})"
            )

    def create_branch(self, name: str, version: int | None = None):
        """Create a writable named ref forked from a main snapshot
        (Iceberg's ``ALTER TABLE ... CREATE BRANCH`` analog) and return a
        handle bound to it. Defaults to the current main head.

        Everything a main handle does works on the branch handle — merge /
        merge_staged / compact / read / lookup / diff / changelog — but its
        commits advance only the branch ref; main readers never see them
        until :meth:`fast_forward`. The fork-base snapshot's batch_ids are
        inherited, so a stream re-pointed at the branch keeps its refire
        guard (the generalization of write-audit-publish from one staged
        manifest to a whole auditable commit CHAIN).

        Creation is atomic (os.link CAS): racing writers on the same name —
        one wins, the loser gets ValueError. Branch names share the tag
        grammar but live in a separate namespace (_refs/ vs _tags/)."""
        self._require_main("create_branch")
        self._check_tag_name(name)
        v = self.current_version() if version is None else int(version)
        # v == -1 forks the EMPTY table: a brand-new ingest can run its
        # entire backfill on a branch and publish main's first snapshot
        # with one fast_forward
        if v != -1 and v not in self._retained_versions():
            raise ValueError(f"version {v} is not a retained snapshot")
        if v != -1 and self._ref_of(v)[0] != "main":
            raise ValueError(
                f"version {v} is a branch commit — branches fork from "
                "main snapshots only"
            )
        os.makedirs(self._refs_dir, exist_ok=True)
        payload = {
            "name": name,
            "version": v,
            "forked_from": v,
            "epoch": uuid.uuid4().hex,
            "created_at": time.time(),
        }
        bpath = self._branch_path(name)
        tmp = bpath + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        try:
            try:
                os.link(tmp, bpath)
            except FileExistsError:
                raise ValueError(
                    f"branch {name!r} already exists (drop_branch first)"
                )
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return self.branch_handle(name)

    def branch_handle(self, name: str) -> "ParquetLakeTable":
        """A handle bound to an EXISTING branch ref (raises if it does not
        exist). The main handle is unaffected."""
        return ParquetLakeTable(
            self.spark,
            self.path,
            key=self.key,
            n_buckets=self.n_buckets,
            mode=self.mode,
            files_per_bucket=self.files_per_bucket,
            stats_columns=self.stats_columns,
            key_bloom_ndv=self.key_bloom_ndv,
            branch=name,
        )

    def drop_branch(self, name: str) -> bool:
        """Remove a branch ref. Its commits become unreachable and
        ``expire_snapshots`` reclaims their manifests and branch-only data
        files (files shared with kept snapshots are untouched — liveness is
        computed from kept manifests' file lists). Returns whether the
        branch existed."""
        self._check_tag_name(name)
        try:
            os.remove(self._branch_path(name))
            return True
        except FileNotFoundError:
            return False

    def branches(self) -> DataFrame:
        """Metadata table: one row per live branch ref — name, current head
        version, fork-base version, creation stamp. Control plane only."""
        rows = [
            (
                e["name"],
                int(e["version"]),
                int(e.get("forked_from", -1)),
                float(e.get("created_at", 0.0)),
            )
            for e in self._branch_entries()
        ]
        return self.spark.createDataFrame(
            rows,
            schema="name string, version int, forked_from int, "
            "created_at double",
        )

    def fast_forward(self, name: str) -> int:
        """Publish a branch to main (Iceberg's
        ``CALL system.fast_forward('main', branch)`` analog): if main has
        not moved since the branch forked, main adopts the branch head as
        its next snapshot — one control-plane commit copying the head
        manifest (no data I/O), exactly the restore() shape. The adopted
        snapshot's batch_ids become durably applied on main, so a stream
        whose batches were audited on the branch cannot refire after
        publish (write-audit-publish across a commit chain).

        Raises :class:`BranchDiverged` when main committed after the fork —
        NOT retryable (see the exception docstring). A branch with no
        commits fast-forwards as a no-op. The branch ref itself is left in
        place (its head is now main's parent; keep committing or drop it).
        Returns main's head version after the operation."""
        self._require_main("fast_forward")

        def attempt() -> int:
            e = self._branch_entry(name)  # reread per attempt
            bh_v = int(e["version"])
            head_v = self._latest_committed()
            # walk the branch head's parent chain back through its own
            # commits; the first non-branch manifest is the fork base
            node_v = bh_v
            while True:
                ref, _ = self._ref_of(node_v)
                if ref != name:
                    break
                node_v = int(self._manifest(node_v).get("parent", -1))
            if node_v != head_v:
                raise BranchDiverged(
                    f"main is at v{head_v} but branch {name!r} forked from "
                    f"v{node_v} — re-create the branch from the new head"
                )
            if bh_v == node_v:
                return head_v  # no branch commits: no-op
            bh = self._manifest(bh_v)
            self._adopt_layout(bh)
            m = dict(bh)
            m["version"] = head_v + 1
            m["parent"] = bh_v
            m["_built_on"] = head_v  # staleness guard vs main, not parent
            m["fast_forwarded_from"] = {"branch": name, "version": bh_v}
            return self._commit(m)

        return self._retrying(attempt)

    def merge_branch(self, name: str, batch_id: int | None = None) -> int:
        """Publish a DIVERGED branch by key-level three-way merge
        (Nessie-style content merge — the path :meth:`fast_forward` refuses
        with :class:`BranchDiverged`): the branch's change set relative to
        its fork base (``changelog(fork, branch_head)`` — inserts/updates
        as upserts, deletes as delete keys) is applied to main's CURRENT
        head as one ordinary MERGE commit, **iff no key was also changed
        on main since the fork**. Overlapping keys raise
        :class:`BranchMergeConflict` carrying a sample of the conflicting
        keys — resolving them is a human decision, exactly as in Nessie /
        git.

        Cost: two keys-only diffs (each one key-shuffle pruned to two
        snapshots) + one MERGE of only the branch's changed rows — O(delta),
        not O(table). The commit records ``merged_from``; the branch ref
        stays (drop it or keep committing — its fork base is unchanged, so
        a SECOND merge_branch of the same unextended branch conflicts with
        itself via main's adopted changes... re-create the branch after a
        merge). The branch's batch_ids are NOT adopted (its commits are
        re-expressed as one new merge commit); pass ``batch_id`` to make
        the publish itself refire-guarded."""
        self._require_main("merge_branch")
        e = self._branch_entry(name)
        bh_v = int(e["version"])
        # fork base: walk the branch chain's parents to the first
        # non-branch manifest (same walk as fast_forward)
        node_v = bh_v
        while self._ref_of(node_v)[0] == name:
            node_v = int(self._manifest(node_v).get("parent", -1))
        fork_v = node_v
        if bh_v == fork_v:
            return self._latest_committed()  # no branch commits: no-op
        if self._latest_committed() == fork_v:
            return self.fast_forward(name)  # not diverged: cheap path
        br = self.branch_handle(name)
        b_delta = br.diff(fork_v, bh_v).localCheckpoint(eager=False)
        images = br.changelog(fork_v, bh_v)
        ups = images.where(
            F.col("_change_type").isin("insert", "update_after")
        ).drop("_change_type")
        dels = images.where(F.col("_change_type") == "delete").select(self.key)
        committed: dict[str, int] = {}

        def attempt() -> bool:
            # conflict detection and the merge MUST see the same head:
            # the merge pins the manifest the conflicts were computed
            # against, so a main commit landing in between trips
            # _commit's _built_on check and the WHOLE check-then-merge
            # re-runs here against the new head (the update_where
            # lost-update pattern) — previously the merge re-read the
            # head on its own retry and could silently overwrite a
            # concurrent change to a branch-touched key the stale
            # conflict check never saw.
            head_v = self._latest_committed()
            m_head = self._manifest(head_v)
            conflicts = [
                r[0]
                for r in b_delta.join(
                    self.diff(fork_v, head_v), self.key, "left_semi"
                )
                .select(self.key)
                .limit(20)
                .collect()
            ]
            if conflicts:
                raise BranchMergeConflict(
                    f"branch {name!r} and main both changed key(s) since "
                    f"v{fork_v}: {conflicts[:10]} — resolve by hand "
                    "(re-create the branch from the new head, or merge the "
                    "keys explicitly)"
                )

            def commit_and_record(man: dict) -> int:
                committed["v"] = self._commit(man)
                return committed["v"]

            return self._merge_once(
                ups, dels, batch_id, commit_fn=commit_and_record,
                manifest=m_head,
            )

        applied = self._retrying(attempt)
        if applied and "v" in committed:
            # stamp provenance on EXACTLY the manifest this merge
            # committed (atomic in-place rewrite, same primitive
            # purge_keys uses) — re-resolving the head here could stamp
            # a concurrent ingest's snapshot instead
            v = committed["v"]
            m = self._manifest(v)
            m["merged_from"] = {"branch": name, "version": bh_v, "fork": fork_v}
            mpath = os.path.join(self.path, "_manifests", f"v{v}.json")
            tmp = mpath + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(m, f)
            os.replace(tmp, mpath)
            return v
        return self._latest_committed()

    def data_files(self, version: int | None = None) -> DataFrame:
        """Metadata table (Iceberg's ``table.files`` analog): one row per
        live data file of a snapshot — bucket, base/delta kind, on-disk
        bytes, and the recorded key bounds the zone-map pruning uses.
        Control plane only; the files themselves are never opened."""
        m = self._manifest(version)
        bounds = m.get("bounds", {})
        rows = []
        for kind, fmap in (("base", m.get("buckets", {})), ("delta", m.get("deltas", {}))):
            for bk, fl in fmap.items():
                for f in fl:
                    b = bounds.get(f)
                    try:
                        size = os.path.getsize(f)
                    except OSError:
                        size = None
                    # bounds are rendered as strings: a numeric key's
                    # recorded min/max are ints in the manifest, and the
                    # metadata table's schema must hold either kind
                    rows.append(
                        (
                            f,
                            int(bk),
                            kind,
                            size,
                            str(b[0]) if b else None,
                            str(b[1]) if b else None,
                        )
                    )
        for f in m.get("dvs") or []:
            # deletion-vector files are table-level (positions span
            # buckets): bucket -1, no key bounds
            try:
                size = os.path.getsize(f)
            except OSError:
                size = None
            rows.append((f, -1, "dv", size, None, None))
        return self.spark.createDataFrame(
            rows,
            schema="file string, bucket int, kind string, bytes bigint, "
            "key_min string, key_max string",
        )

    def lineage(self) -> list[dict]:
        """Per-partition (bucket) commit lineage across retained snapshots:
        for every version, which buckets were rewritten by which batch_id —
        the queryable form of the north_rule's 'per-partition lineage'
        (≈ the reference's transactions/patches bookkeeping,
        stores/sequelize.ts:18-99, keyed by data partition instead of row).

        Returns rows {version, parent, batch_id, buckets_rewritten,
        n_files}; batch_id is the one recorded by that commit (None for
        overwrite/compaction commits without one).
        """
        out = []
        versions = self._retained_versions()
        prev_buckets: dict = {}
        prev_deltas: dict = {}
        prev_ids: list = []
        for v in versions:
            m = self._manifest(v)
            # this handle's REF chain only: branch commits interleave in
            # the shared version space, and mixing them in would attribute
            # a branch's bucket rewrites (and batch_ids) to main lineage
            if (m.get("ref", "main"), m.get("ref_epoch")) != (
                ("main", None) if self.ref == "main" else (self.ref, self._ref_epoch)
            ):
                continue
            deltas = m.get("deltas", {})
            changed = {
                b for b, fl in m["buckets"].items()
                if fl != prev_buckets.get(b, [])
            } | {
                # a MOR commit touches a bucket by appending to (or, at
                # compact, emptying) its delta list
                b for b in set(deltas) | set(prev_deltas)
                if deltas.get(b, []) != prev_deltas.get(b, [])
            }
            prev_set = set(prev_ids)  # hoisted: in the condition it would
            # be rebuilt per element — O(|batch_ids|^2) at the 10k-id cap
            new_ids = [i for i in m["batch_ids"] if i not in prev_set]
            out.append(
                {
                    "version": v,
                    "parent": m.get("parent", v - 1),
                    "batch_id": new_ids[-1] if new_ids else None,
                    "buckets_rewritten": sorted(int(b) for b in changed),
                    "n_files": sum(len(fl) for fl in m["buckets"].values())
                    + sum(len(fl) for fl in deltas.values()),
                }
            )
            prev_buckets, prev_deltas, prev_ids = m["buckets"], deltas, m["batch_ids"]
        return out

    def diff(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Change feed BETWEEN snapshots: (key, _change) with _change in
        insert/update/delete — the reverse direction of ingest (Iceberg's
        incremental changelog read analog; lets a downstream consumer tail
        THIS table as its own CDC source). Full-outer join old vs new on
        key; rows equal in both snapshots are dropped. One shuffle on the
        key, pruned to the two snapshots' files. Under schema evolution
        only columns present in BOTH snapshots are compared (a row whose
        only change is in a column the old snapshot predates reads as
        unchanged)."""
        changed, _ = self._joined_changes(v_from, v_to)
        return changed.select(self.key, F.col("_kind").alias("_change"))

    def _joined_changes(self, v_from: int, v_to: int | None):
        """Shared core of diff()/changelog(): full-outer join old vs new
        snapshot on the key, keep only rows that differ, classify as
        insert/delete/update in ``_kind``; returns (changed_rows, cols)
        where changed_rows carries ``_o``/``_n`` image structs."""
        old = self.read(v_from)
        new = self.read(self.current_version() if v_to is None else v_to)
        cols = [c for c in new.columns if c != self.key and c in old.columns]
        o = old.select(self.key, F.struct(*cols).alias("_o"))
        n = new.select(self.key, F.struct(*cols).alias("_n"))
        j = o.join(n, self.key, "full_outer")
        changed = j.withColumn(
            "_kind",
            F.when(F.col("_o").isNull(), "insert")
            .when(F.col("_n").isNull(), "delete")
            # null-safe: a null FIELD inside the struct must compare
            # equal to null, not poison the comparison
            .when(~F.col("_o").eqNullSafe(F.col("_n")), "update"),
        ).where(F.col("_kind").isNotNull())
        return changed, cols

    def changelog(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Image-carrying change feed between snapshots (the Iceberg
        changelog-read shape): one row per change with ``_change_type`` in
        insert / delete / update_before / update_after, carrying the FULL
        row as of the corresponding snapshot. ``diff()`` is the keys-only
        projection of this; the images are what downstream incremental
        consumers need — materialized-view maintenance (operators/mv.py),
        cache invalidation, search-index sync — because an update/delete
        must retract the OLD row's contribution, not just apply the new
        one. Same cost shape as diff(): one shuffle on the key over the two
        snapshots; updates fan out to a before/after pair only after the
        join has already reduced the relation to changed rows."""
        changed, cols = self._joined_changes(v_from, v_to)
        sides = (
            F.when(
                F.col("_kind") == "update",
                F.array(F.lit("update_before"), F.lit("update_after")),
            )
            .when(F.col("_kind") == "insert", F.array(F.lit("insert")))
            .otherwise(F.array(F.lit("delete")))
        )
        ex = changed.select(
            self.key, "_o", "_n", F.explode(sides).alias("_change_type")
        )
        img = F.when(
            F.col("_change_type").isin("insert", "update_after"), F.col("_n")
        ).otherwise(F.col("_o"))
        return ex.select(
            self.key,
            "_change_type",
            *[img.getField(c).alias(c) for c in cols],
        )

    def restore(self, version: int) -> int:
        """Roll the table back to an earlier snapshot (Iceberg
        rollback_to_snapshot analog) as a NEW forward commit: the restored
        manifest copies the target version's file lists / schema / layout
        but takes the next version number, so history stays linear, the
        _CURRENT pointer only ever moves forward, and expire_snapshots'
        keep-window math is unaffected. Control-plane only — no data files
        move. ``batch_ids`` revert to the restored snapshot's set, so
        batches applied after it stop being durably applied and a resumed
        stream's refire guard re-applies them — the recovery path for a
        reorg deeper than the retention window (reference semantics:
        re-running ourbit from an older head, ourbit/Ourbit.ts:60-167).

        Raises FileNotFoundError if ``version`` was expired, ValueError if
        it never existed."""
        self._require_main("restore")

        def attempt():
            if version < 0 or version > self._latest_committed():
                raise ValueError(f"restore: no snapshot v{version}")
            if self._ref_of(version)[0] != "main":
                raise ValueError(
                    f"restore: v{version} is a branch commit — main rolls "
                    "back to main-chain snapshots only (fast_forward is "
                    "the branch-publish path)"
                )
            src = self._manifest(version)
            base = self._manifest(self._latest_committed())
            # _commit stamps self.mode/self.n_buckets — adopt the TARGET's
            # layout so the restored manifest describes its own files
            self._adopt_layout(src)
            m = dict(src)
            m["version"] = base["version"] + 1
            # parent = the PREVIOUS HEAD, not the restored snapshot's own
            # parent (a stale copy would report the restore as a child of
            # an ancient version in snapshots()/lineage() and break the
            # linear-history contract this docstring promises)
            m["parent"] = base["version"]
            m["restored_from"] = version
            return self._commit(m)

        return self._retrying(attempt)

    def export_snapshot(self, dest: str, version: int | None = None) -> dict:
        """Export ONE snapshot as a fully-functional standalone table at
        ``dest`` (Iceberg snapshot-export / Delta SHALLOW-CLONE-then-deep
        analog — the backup/DR and dev-fork primitive): the version's data
        files are copied under ``dest`` and a fresh v0 manifest is written
        referencing the copies, carrying schema, mode, n_buckets, key,
        stats, per-file bounds (rewritten to the new paths, so lookup/
        scan_range pruning works on the clone without re-reading footers)
        AND ``batch_ids`` — a stream resumed against the clone keeps its
        refire guard. History is deliberately NOT exported: a backup wants
        one consistent snapshot, not the undo chain.

        The file copy here is a driver-side shutil loop — correct at any
        scale but serial; a production deployment swaps that one loop for
        a distributed/object-store copy (distcp, S3 batch). The manifest
        rewrite — the part that IS the engine — is identical either way.

        Returns {"dest", "version_exported", "n_files", "n_bytes"}.
        """
        self._require_main("export_snapshot")
        m = self._manifest(version)
        if m["version"] < 0:
            raise ValueError("export_snapshot: table has no committed snapshot")
        dest = os.path.realpath(dest)
        if dest == self.path:
            raise ValueError("export_snapshot: dest must differ from the table path")
        os.makedirs(os.path.join(dest, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(dest, "data"), exist_ok=True)

        path_map: dict[str, str] = {}
        n_bytes = 0
        seq = 0
        for section in ("buckets", "deltas"):
            for b, fl in m.get(section, {}).items():
                # v0- prefix: the clone's manifest is v0, and its own
                # expire_snapshots/orphan_report attribute data dirs by
                # parsing the v{N}- prefix — an unparseable name would be
                # treated as in-flight forever, so files the clone later
                # rewrites would never be reclaimable (review r05)
                d = os.path.join(dest, "data", f"v0-{section}-{b}")
                os.makedirs(d, exist_ok=True)
                for f in fl:
                    # a running sequence prefix, NOT the bare basename:
                    # files from different source dirs can share a name
                    # (two purge runs both emit purged-0.parquet into one
                    # bucket) and a bare-basename copy would silently
                    # overwrite one with the other in the clone
                    nf = os.path.join(d, f"{seq:05d}-{os.path.basename(f)}")
                    seq += 1
                    shutil.copy2(f, nf)
                    path_map[f] = nf
                    n_bytes += os.path.getsize(nf)

        out = dict(m)
        out["version"] = 0
        out["parent"] = -1
        out["exported_from"] = {"table": self.path, "version": m["version"]}
        out["committed_at"] = time.time()
        for section in ("buckets", "deltas"):
            out[section] = {
                b: [path_map[f] for f in fl]
                for b, fl in m.get(section, {}).items()
            }
        out["bounds"] = {
            path_map[f]: v for f, v in m.get("bounds", {}).items() if f in path_map
        }
        out["col_bounds"] = {
            c: {path_map[f]: v for f, v in fm.items() if f in path_map}
            for c, fm in m.get("col_bounds", {}).items()
        }
        # deletion vectors reference data files BY PATH, so the clone needs
        # its own DV files with the paths rewritten to the copies (a raw
        # copy would point at the source table and filter nothing)
        out["dvs"] = []
        if m.get("dvs"):
            # DV contents are file: URIs on both sides — NOTE Spark spells
            # _metadata.file_path as "file:" + path (single slash), and
            # the clone's scans will spell its (realpath'd) copies the
            # same way
            remap = self.spark.createDataFrame(
                [
                    (f"file:{old}", f"file:{os.path.realpath(new)}")
                    for old, new in path_map.items()
                ],
                schema="file_path string, _new string",
            )
            dv = self.spark.read.schema(_DV_SCHEMA).parquet(*m["dvs"])
            mapped = dv.join(remap, "file_path").select(
                F.col("_new").alias("file_path"), "row_index"
            )
            dv_dir = os.path.join(dest, "data", "v0-dv-export")
            mapped.coalesce(1).write.mode("overwrite").parquet(dv_dir)
            out["dvs"] = [
                os.path.realpath(os.path.join(dv_dir, p))
                for p in sorted(os.listdir(dv_dir))
                if p.endswith(".parquet")
            ]
            for p in out["dvs"]:
                n_bytes += os.path.getsize(p)
        with open(os.path.join(dest, "_manifests", "v0.json"), "w") as f:
            json.dump(out, f)
        tmp = os.path.join(dest, f"_CURRENT.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write("0")
        os.replace(tmp, os.path.join(dest, "_CURRENT"))
        return {
            "dest": dest,
            "version_exported": m["version"],
            "n_files": len(path_map),
            "n_bytes": n_bytes,
        }

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Drop manifests older than the last ``keep_last`` versions and
        delete data files no surviving manifest references (Iceberg's
        expire_snapshots/remove_orphan_files analog — bounds disk growth of
        a long-running COW stream; time travel remains for kept versions).

        Control-plane only (file listing + unlink); never touches data files
        a kept snapshot can still read. Returns {"kept", "dropped_manifests",
        "deleted_files"}.
        """
        self._require_main("expire_snapshots")
        cur = self.current_version()
        if cur < 0:
            return {"kept": [], "dropped_manifests": 0, "deleted_files": 0}
        versions = self._retained_versions()
        # tagged snapshots are pinned (Iceberg ref-retention): their
        # manifests AND data files survive however far behind head they
        # fall, until drop_tag releases them
        pinned = {int(t["version"]) for t in self._tag_entries()}
        # live-branch retention: every commit of a live branch ref (name +
        # epoch both matching) is kept, and so is its fork-base manifest —
        # a fresh branch with no commits resolves its head THROUGH the
        # fork base, and bounds reuse walks parents into it. Dead-branch
        # manifests (ref dropped, or an older incarnation's epoch) fall
        # out of every keep set and are reclaimed here.
        live_branches = {
            e["name"]: e.get("epoch") for e in self._branch_entries()
        }
        for e in self._branch_entries():
            pinned.add(int(e.get("forked_from", -1)))
        branch_keep = set()
        for v in versions:
            ref, epoch = self._ref_of(v)
            if ref not in ("main", "?") and live_branches.get(ref) == epoch:
                branch_keep.add(v)
        # keep the last N MAIN-CHAIN COMMITS, not the last N version
        # NUMBERS: refs share one number space, so branch commits
        # interleaved in the numbering (e.g. main v5, branch v6-v8,
        # main v9) would otherwise eat the window — keep_last=2 kept
        # only v9 and deleted v5, main's immediately-previous snapshot,
        # breaking the promised time travel one commit after head
        main_vs = sorted(
            v for v in versions if self._ref_of(v)[0] == "main"
        )
        main_recent = set(main_vs[-keep_last:]) if keep_last > 0 else set()
        keep = [
            v
            for v in versions
            if v in main_recent or v in pinned or v in branch_keep
        ]
        live: set[str] = set()
        for v in keep:
            km = self._manifest(v)
            for fl in km["buckets"].values():
                live.update(os.path.realpath(f) for f in fl)
            # MOR delta files are as live as base files until compacted
            # out of every kept manifest
            for fl in km.get("deltas", {}).values():
                live.update(os.path.realpath(f) for f in fl)
            # deletion-vector files are manifest metadata living in data/:
            # deleting one would silently RESURRECT its deleted rows in
            # every kept snapshot that references it
            live.update(os.path.realpath(f) for f in km.get("dvs") or [])
        # PARKED write-audit-publish stages are live too: a gate-halted
        # stream keeps its stage on disk "for forensics" — once any later
        # commit moves `cur` past the stage's data-dir version, the
        # in-flight guard below no longer protects it, and without this
        # the stage's files would be deleted out from under read_staged()
        sdir = os.path.join(self.path, "_staged")
        if os.path.isdir(sdir):
            for fn in os.listdir(sdir):
                if not fn.endswith(".json"):
                    continue
                try:
                    with open(os.path.join(sdir, fn)) as f:
                        sm = json.load(f)
                except (OSError, ValueError):  # pragma: no cover - defensive
                    continue
                for section in ("buckets", "deltas"):
                    for fl in sm.get(section, {}).values():
                        live.update(os.path.realpath(f) for f in fl)
                live.update(os.path.realpath(f) for f in sm.get("dvs") or [])
        deleted = 0
        data_dir = os.path.join(self.path, "data")
        # In-flight guard FLOOR: a writer names its data dir after ITS
        # REF's next version — main writers use cur+1, but a LIVE BRANCH
        # whose head trails main writes v{branch_head+1}, which can be
        # far BELOW cur (refs share one number space). Guarding only
        # `> cur` would let expire delete a branch merge's freshly
        # written files mid-commit; the floor is the minimum live ref
        # head, so every ref's in-flight dirs are protected.
        guard_floor = min(
            [cur]
            + [
                int(e.get("version", cur))
                for e in self._branch_entries()
            ]
        )
        for d in os.listdir(data_dir):
            # data dirs are named v{version}-{uuid}; a dir from a version
            # NEWER than the guard floor may belong to an in-flight,
            # not-yet-committed writer of SOME live ref — never touch it
            # (racing a concurrent ingest must not delete its files). A
            # dir we can't attribute at all gets the same protection:
            # never delete what we can't prove ours and committed (the
            # conservative side of orphan cleanup).
            try:
                dir_version = int(d.split("-", 1)[0].lstrip("v"))
            except ValueError:
                dir_version = None
            if dir_version is None or dir_version > guard_floor:
                continue
            full = os.path.join(data_dir, d)
            for root, _, files in os.walk(full):
                for f in files:
                    p = os.path.realpath(os.path.join(root, f))
                    if f.endswith(".parquet") and p not in live:
                        os.remove(p)
                        deleted += 1
        # prune now-empty version dirs (same in-flight guard as above)
        for d in os.listdir(data_dir):
            try:
                dir_version = int(d.split("-", 1)[0].lstrip("v"))
            except ValueError:
                dir_version = None
            if dir_version is None or dir_version > guard_floor:
                continue
            full = os.path.join(data_dir, d)
            if not any(f.endswith(".parquet") for _, _, fs in os.walk(full) for f in fs):
                shutil.rmtree(full, ignore_errors=True)
        dropped = 0
        mdir = os.path.join(self.path, "_manifests")
        for v in versions:
            if v not in keep:
                os.remove(os.path.join(mdir, f"v{v}.json"))
                dropped += 1
        return {"kept": keep, "dropped_manifests": dropped, "deleted_files": deleted}

    def orphan_report(self) -> DataFrame:
        """Dry-run of the file-reclamation half of ``expire_snapshots``
        (Iceberg's remove_orphan_files dry-run): every data file under the
        table that NO retained manifest, live branch commit, or parked WAP
        stage references — losers of commit races, crashed writers'
        leftovers, abandoned-stage survivors. Returns (file, bytes,
        dir_version, status) where status is 'orphan' or 'in_flight'
        (a dir newer than the current head may belong to an uncommitted
        writer — expire never touches those, and operators should not
        either). Control plane only; nothing is deleted."""
        live: set[str] = set()
        for v in self._retained_versions():
            try:
                km = self._manifest(v)
            except FileNotFoundError:  # pragma: no cover - expire race
                continue
            for section in ("buckets", "deltas"):
                for fl in km.get(section, {}).values():
                    live.update(os.path.realpath(f) for f in fl)
            live.update(os.path.realpath(f) for f in km.get("dvs") or [])
        sdir = os.path.join(self.path, "_staged")
        if os.path.isdir(sdir):
            for fn in os.listdir(sdir):
                if not fn.endswith(".json"):
                    continue
                try:
                    with open(os.path.join(sdir, fn)) as f:
                        sm = json.load(f)
                except (OSError, ValueError):  # pragma: no cover - defensive
                    continue
                for section in ("buckets", "deltas"):
                    for fl in sm.get(section, {}).values():
                        live.update(os.path.realpath(f) for f in fl)
                live.update(os.path.realpath(f) for f in sm.get("dvs") or [])
        # same floor rule as expire_snapshots (CLAUDE.md): a LIVE BRANCH
        # writer names its in-flight dir v{branch_head+1}, which can sit
        # far BELOW main's head in the shared number space — flooring at
        # main's cur alone would report a mid-commit branch merge's
        # files as 'orphan' and invite an operator to delete them
        cur = self.current_version() if self.ref == "main" else None
        guard_floor = (
            None
            if cur is None
            else min(
                [cur]
                + [int(e.get("version", cur)) for e in self._branch_entries()]
            )
        )
        rows = []
        data_dir = os.path.join(self.path, "data")
        for d in sorted(os.listdir(data_dir)):
            try:
                dir_version = int(d.split("-", 1)[0].lstrip("v"))
            except ValueError:
                dir_version = None
            for root, _, files in os.walk(os.path.join(data_dir, d)):
                for f in files:
                    p = os.path.realpath(os.path.join(root, f))
                    if not f.endswith(".parquet") or p in live:
                        continue
                    in_flight = (
                        dir_version is None
                        or guard_floor is None
                        or dir_version > guard_floor
                    )
                    try:
                        size = os.path.getsize(p)
                    except OSError:  # pragma: no cover - racing delete
                        continue
                    rows.append(
                        (
                            p,
                            size,
                            dir_version,
                            "in_flight" if in_flight else "orphan",
                        )
                    )
        return self.spark.createDataFrame(
            rows,
            schema="file string, bytes bigint, dir_version int, status string",
        )

    def purge_keys(self, *keys: str) -> dict:
        """Compliance hard delete (GDPR right-to-be-forgotten): physically
        remove the given merge keys from EVERY retained snapshot — current
        AND historical — in one maintenance operation.

        A normal ``merge(delete_keys=...)`` is logical: a tombstone in the
        next snapshot, with the old rows still readable via time travel,
        ``diff()`` and the change feed. Compliance requires the opposite —
        history itself is rewritten. This is the engine's one deliberate
        violation of snapshot immutability, scoped to exactly the purged
        rows:

        - affected data files (bucket-routed, zone-map pre-skipped) are
          rewritten without the keys' rows — including MOR delta files and
          their tombstone rows (consistent: every copy in every version
          goes, so nothing can resurrect a purged key), and files
          referenced only by OLD manifests (pre-compaction deltas etc.);
        - a NEW version is committed under the usual CAS, so a purge racing
          an ingest resolves like any other maintenance op (recompute on a
          lost CAS); then every older retained manifest is atomically
          rewritten in place to reference the purged files, preserving its
          version number, commit stamp and batch_ids — time travel, AS OF
          reads and the refire guard all survive;
        - the replaced files are unlinked; files emptied entirely drop out
          of the manifests.

        Not touched: staged write-audit-publish manifests (publish or
        abandon them first) and exported snapshot clones (separate tables).
        Rewritten files do not re-declare optional key blooms. Cost:
        O(affected files) single-file jobs — bucket routing plus zone maps
        bound that to ~retained_versions x files_per_bucket per key.
        """
        self._require_main("purge_keys")
        if not keys:
            return {"files_rewritten": 0, "files_dropped": 0, "rows_purged": 0,
                    "versions_rewritten": 0}
        klist = list(keys)

        def attempt() -> dict:
            head = self._manifest(self._latest_committed())
            self._adopt_layout(head)
            # Parked write-audit-publish stages reference data files BY
            # PATH; the rewrite below unlinks replaced files, which would
            # destroy a parked stage's readability (read_staged ->
            # FileNotFound) despite the docstring's "Not touched" promise.
            # The documented contract is "publish or abandon them first" —
            # enforce it loudly instead of silently breaking the stage.
            sdir = os.path.join(self.path, "_staged")
            parked = (
                [fn for fn in os.listdir(sdir) if fn.endswith(".json")]
                if os.path.isdir(sdir)
                else []
            )
            if parked:
                raise ValueError(
                    f"purge_keys: {len(parked)} parked staged commit(s) "
                    "reference data files this purge would rewrite — "
                    "publish_staged() or abandon_staged() them first"
                )
            # Deletion vectors pin physical ROW POSITIONS; purge rewrites
            # files (removing rows, shifting every later position), which
            # would make each retained snapshot's DVs delete the WRONG
            # rows — resurrecting some deleted rows and vanishing live
            # ones, silently. Refuse until no retained snapshot carries a
            # DV: compact() materializes the head's DVs, expire_snapshots()
            # ages out the historical ones.
            dv_versions = [
                v
                for v in self._retained_versions()
                if self._manifest(v).get("dvs")
            ]
            if dv_versions:
                raise ValueError(
                    "purge_keys: retained snapshot(s) "
                    f"{dv_versions} carry deletion vectors, whose row "
                    "positions a purge rewrite would invalidate. Run "
                    "compact() and expire_snapshots() until no retained "
                    "manifest has DVs, then purge."
                )
            # coerce literals to the table's key type (see _typed_keys:
            # hashing the raw string on a bigint-keyed table would route
            # to the wrong buckets and "purge" nothing, silently)
            typed = self._typed_keys(head, klist, "purge_keys")
            kdf = self.spark.createDataFrame(
                [(k,) for k in typed], schema=f"{self.key} {self._key_type(head)}"
            )
            # Hash the keys ONCE (JVM xxhash64 — the same expression
            # bucket_of composes), then derive bucket ids per manifest from
            # THAT manifest's recorded n_buckets. A rebucket() inside the
            # retention window leaves older manifests keyed by the old
            # layout; pruning them with head's layout would silently skip
            # files that still hold the purged key in historical snapshots
            # (readable via time travel) — breaking the hard-delete
            # guarantee. pmod(h, n) in Python mirrors F.pmod for int64.
            hashes = [
                r.h for r in kdf.select(F.xxhash64(self.key).alias("h")).collect()
            ]

            def bids_for(nb: int) -> set:
                return {str(((h % nb) + nb) % nb) for h in hashes}

            retained = self._retained_versions()
            manifests = {v: self._manifest(v) for v in retained}
            affected: list[str] = []
            seen: set[str] = set()
            for m in manifests.values():
                bounds = m.get("bounds", {})
                bids = bids_for(int(m.get("n_buckets", self.n_buckets)))
                for fmap in (m.get("buckets", {}), m.get("deltas", {})):
                    for b, fl in fmap.items():
                        if b not in bids:
                            continue
                        for f in fl:
                            if f in seen:
                                continue
                            seen.add(f)
                            kb = bounds.get(f)
                            try:
                                if kb is not None and not any(
                                    kb[0] <= k <= kb[1] for k in typed
                                ):
                                    continue  # zone map proves key absent
                            except TypeError:
                                pass
                            affected.append(f)

            # rewrite each affected file without the keys' rows
            subst: dict[str, str | None] = {}
            rows_purged = 0
            # dir named v{next_version}-... like every other writer: the
            # version prefix is what expire_snapshots' in-flight guard
            # parses — an unversioned dir would lose that protection and a
            # concurrent expire could delete the rewrite mid-flight,
            # before the manifests referencing it commit
            out_root = os.path.join(
                self.path,
                "data",
                f"v{head['version'] + 1}-purge-{uuid.uuid4().hex[:8]}",
            )
            for i, old in enumerate(sorted(affected)):
                df = self.spark.read.parquet(old)
                counts = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count(
                        F.when(F.col(self.key).isin(typed), 1)
                    ).alias("hit"),
                ).collect()[0]
                if counts.hit == 0:
                    continue  # bounds were absent/wide; file untouched
                rows_purged += counts.hit
                if counts.hit == counts.n:
                    # every row in the file belonged to the keys
                    subst[old] = None
                    continue
                kept = df.where(~F.col(self.key).isin(typed))
                tmp = os.path.join(out_root, f"_tmp-{i}")
                kept.coalesce(1).write.mode("overwrite").parquet(tmp)
                parts = [
                    p for p in os.listdir(tmp) if p.endswith(".parquet")
                ]
                dest = os.path.join(out_root, f"purged-{i}.parquet")
                os.replace(os.path.join(tmp, parts[0]), dest)
                shutil.rmtree(tmp, ignore_errors=True)
                subst[old] = os.path.realpath(dest)

            if not subst:
                return {"files_rewritten": 0, "files_dropped": 0,
                        "rows_purged": 0, "versions_rewritten": 0}

            def patch_maps(m: dict) -> dict:
                out = dict(m)
                for which in ("buckets", "deltas"):
                    out[which] = {
                        b: [
                            (subst.get(f, f))
                            for f in fl
                            if subst.get(f, f) is not None
                        ]
                        for b, fl in m.get(which, {}).items()
                    }
                # drop stale per-file stats; _attach_bounds / the in-place
                # patch below re-derive them for the new files
                for sect in ("bounds",):
                    out[sect] = {
                        f: v for f, v in m.get(sect, {}).items() if f not in subst
                    }
                out["col_bounds"] = {
                    c: {f: v for f, v in fm.items() if f not in subst}
                    for c, fm in m.get("col_bounds", {}).items()
                }
                return out

            # 1) the new head commit (CAS-guarded — raises CommitConflict
            #    into _retrying if an ingest won the version)
            new = patch_maps(head)
            new["version"] = head["version"] + 1
            new["parent"] = head["version"]
            self._commit(new)

            # 2) in-place rewrite of every older retained manifest
            newest = self._manifest(new["version"])
            nb, ncb = newest.get("bounds", {}), newest.get("col_bounds", {})
            mdir = os.path.join(self.path, "_manifests")
            n_rewritten = 0
            for v, m in manifests.items():
                pm = patch_maps(m)
                if pm["buckets"] == m.get("buckets", {}) and pm["deltas"] == m.get(
                    "deltas", {}
                ):
                    continue
                for f in {nf for nf in subst.values() if nf}:
                    if f in nb:
                        pm["bounds"][f] = nb[f]
                    for c, fm in ncb.items():
                        if f in fm:
                            pm.setdefault("col_bounds", {}).setdefault(c, {})[
                                f
                            ] = fm[f]
                tmp = os.path.join(mdir, f"v{v}.json.purge-{uuid.uuid4().hex[:6]}")
                with open(tmp, "w") as fh:
                    json.dump(pm, fh)
                os.replace(tmp, os.path.join(mdir, f"v{v}.json"))
                n_rewritten += 1

            # 3) unlink the replaced files
            for old in subst:
                try:
                    os.unlink(old)
                except OSError:
                    pass
            return {
                "files_rewritten": sum(1 for v in subst.values() if v),
                "files_dropped": sum(1 for v in subst.values() if v is None),
                "rows_purged": rows_purged,
                "versions_rewritten": n_rewritten,
            }

        return self._retrying(attempt)

    def overwrite(self, df: DataFrame, batch_id: int | None = None) -> None:
        """Full-table replace — for INITIAL loads: it RESETS the applied
        batch_id history (a refire of a pre-overwrite batch would re-apply).
        Table maintenance on a live table is compact() (fold MOR deltas /
        consolidate COW files) or rebucket() — both preserve batch_ids and
        recompute on a lost CAS. CAS-retried so a replace racing another
        writer fails cleanly instead of overwriting its commit."""
        return self._retrying(lambda: self._overwrite_once(df, batch_id))

    def _overwrite_once(self, df: DataFrame, batch_id: int | None) -> None:
        m = self._manifest(self._latest_committed())
        self._adopt_layout(m)
        withb = df.withColumn("_bucket", bucket_of(F.col(self.key), self.n_buckets))
        version = m["version"] + 1
        files = self._write_buckets(withb, version)
        schema_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        self._commit(
            {
                "version": version,
                "buckets": files,
                "deltas": {},
                "batch_ids": [batch_id] if batch_id is not None else [],
                "schema": schema_ddl,
                "parent": m["version"],
                "mode": self.mode,
            }
        )


def build_merge_source(
    upserts: DataFrame,
    delete_keys: DataFrame | None,
    key: str,
    batch_id: int | None,
) -> DataFrame:
    """The single source relation for the one-commit Iceberg MERGE:
    upsert rows tagged ``_op='upsert'`` (plus ``_batch_id`` when given)
    unioned with delete keys tagged ``_op='delete'`` and null-filled to the
    upsert schema.

    Contract (matches ParquetLakeTable.merge): a key present in BOTH
    upserts and delete_keys resolves to the UPSERT — delete rows are
    anti-joined against upsert keys before the union, so the source never
    carries two rows for one target key (Iceberg MERGE raises a
    cardinality error on multi-match; ParquetLakeTable silently lets the
    upsert win — this makes both sinks agree).
    """
    src = upserts.withColumn("_op", F.lit("upsert"))
    if batch_id is not None:
        src = src.withColumn("_batch_id", F.lit(batch_id))
    if delete_keys is not None:
        dk = (
            delete_keys.select(key)
            .distinct()
            .join(upserts.select(key).distinct(), key, "left_anti")
            .withColumn("_op", F.lit("delete"))
        )
        for f in src.schema.fields:
            if f.name not in dk.columns:
                dk = dk.withColumn(f.name, F.lit(None).cast(f.dataType))
        src = src.unionByName(dk.select(src.columns))
    return src


def build_merge_sql(table: str, key: str, columns: list[str], source_view: str = "_cdc_src") -> str:
    """The MERGE statement for one upsert+delete commit: matched deletes
    first, then matched updates, then not-matched inserts (deletes never
    insert). ``columns`` is the source relation's schema; ``_op`` is
    control metadata and never written to the target."""
    cols = [c for c in columns if c != "_op"]
    set_clause = ", ".join(f"t.{c} = u.{c}" for c in cols)
    ins_cols = ", ".join(cols)
    ins_vals = ", ".join(f"u.{c}" for c in cols)
    return (
        f"MERGE INTO {table} t USING {source_view} u ON t.{key} = u.{key}\n"
        f"WHEN MATCHED AND u._op = 'delete' THEN DELETE\n"
        f"WHEN MATCHED THEN UPDATE SET {set_clause}\n"
        f"WHEN NOT MATCHED AND u._op != 'delete' THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def build_update_sql(table: str, predicate: str, set_exprs: dict[str, str]) -> str:
    """Row-level predicate update for the Iceberg path (v2 executes it
    merge-on-read with positional deletes + rewritten rows). Pure function
    so the SQL contract tests jar-free."""
    sets = ", ".join(f"{c} = {e}" for c, e in sorted(set_exprs.items()))
    return f"UPDATE {table} SET {sets} WHERE {predicate}"


def build_delete_sql(table: str, predicate: str) -> str:
    """Row-level predicate delete for the Iceberg path: on a v2 table this
    statement writes positional delete files — Iceberg's native deletion
    vectors — never rewriting data files (write.delete.mode=merge-on-read).
    Pure function so the SQL contract tests jar-free, like
    build_merge_sql."""
    return f"DELETE FROM {table} WHERE {predicate}"


class IcebergLakeTable:
    """MERGE INTO an Iceberg table — the production sink.

    Requires a live Iceberg catalog (spark.sql.catalog.<name> configured and
    the iceberg-spark-runtime jar). Same interface as ParquetLakeTable so the
    pipeline flips with one constructor:

        spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<v> \
            --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog ...

    ParquetLakeTable maintenance maps onto Iceberg's own procedures on
    this path — no custom code needed: cluster() ≈ CALL rewrite_data_files
    (strategy => 'sort', sort_order => 'zorder(c1, c2)'); read(as_of=...)
    ≈ SELECT ... FOR SYSTEM_TIME AS OF; snapshots()/data_files() ≈ the
    <table>.snapshots / <table>.files metadata tables; expire_snapshots()
    ≈ CALL expire_snapshots; key blooms ≈ write.parquet.bloom-filter-
    enabled.column.<key> table property.
    """

    def __init__(self, spark: SparkSession, table: str, key: str = "url"):
        self.spark = spark
        self.table = table
        self.key = key
        try:
            spark.sql(f"DESCRIBE TABLE {table}")
        except Exception as e:  # pragma: no cover - no Iceberg jar in sandbox
            raise RuntimeError(
                f"Iceberg table {table} not reachable; configure an Iceberg "
                "catalog or use ParquetLakeTable"
            ) from e

    def read(self) -> DataFrame:
        return self.spark.read.table(self.table)

    def applied_batch_ids(self) -> set[int]:
        # a fresh Iceberg table has no _batch_id column until the first
        # stamped merge adds it (schema merge) — treat that as "no batch
        # ever applied" instead of failing the very first merge() on an
        # unresolved column
        if "_batch_id" not in self.read().columns:
            return set()
        rows = self.spark.sql(
            f"SELECT DISTINCT _batch_id FROM {self.table} WHERE _batch_id IS NOT NULL"
        ).collect()
        return {r[0] for r in rows}

    def current_version(self) -> int:  # pragma: no cover
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return rows[0][0] if rows else -1

    def overwrite(self, df, batch_id=None) -> None:  # pragma: no cover
        """Full-table replace (initial load / compaction) — one snapshot."""
        if batch_id is not None:
            df = df.withColumn("_batch_id", F.lit(batch_id))
        df.writeTo(self.table).overwritePartitions()

    def expire_snapshots(self, keep_last: int = 2) -> dict:  # pragma: no cover
        """Iceberg-native snapshot expiry (same contract as
        ParquetLakeTable.expire_snapshots)."""
        self.spark.sql(
            f"CALL {self.table.split('.')[0]}.system.expire_snapshots("
            f"table => '{self.table}', retain_last => {keep_last})"
        )
        return {"kept": keep_last}

    def merge(self, upserts, delete_keys=None, batch_id=None) -> bool:
        """One MERGE covering upsert + delete, `_batch_id` stamped on every
        written row so `applied_batch_ids()` gives refire idempotence —
        identical contract to ParquetLakeTable.merge (including upsert-wins
        on a key appearing in both upserts and delete_keys; see
        build_merge_source).

        Deletes ride in the same source relation (`_op = 'delete'`) so the
        whole mutation is ONE Iceberg commit: atomic, snapshot-isolated, and
        a single join pass over the target (vs MERGE-then-DELETE = two).
        Iceberg handles schema evolution via
        spark.sql.iceberg.check-ordering=false + mergeSchema on the catalog;
        added columns in `upserts` widen the table on write.

        Source construction and the MERGE SQL are the pure functions
        build_merge_source / build_merge_sql (contract-tested without an
        Iceberg catalog in tests/test_lake.py); only the spark.sql execution
        below needs the jar.
        """
        if batch_id is not None and batch_id in self.applied_batch_ids():
            return False
        src = build_merge_source(upserts, delete_keys, self.key, batch_id)
        # per-call unique view name: two merges interleaving in ONE Spark
        # session (two target tables fed by two streaming queries) would
        # otherwise clobber a shared view between createOrReplaceTempView
        # and the MERGE execution — rows upserted into the wrong table
        # with no error (review r05)
        view = f"_cdc_src_{uuid.uuid4().hex[:12]}"
        src.createOrReplaceTempView(view)
        try:  # pragma: no cover - needs the Iceberg jar
            self.spark.sql(
                build_merge_sql(self.table, self.key, src.columns, source_view=view)
            )
        finally:
            self.spark.catalog.dropTempView(view)
        return True

    def update_where(self, predicate: str, set_exprs: dict, batch_id=None) -> dict:
        """Predicate update — interface parity with
        ParquetLakeTable.update_where; Iceberg v2 executes UPDATE
        merge-on-read (positional deletes + rewritten rows). SQL via the
        pure build_update_sql (contract-tested jar-free).

        Refire guard (review r05): with ``batch_id`` the UPDATE also
        stamps ``_batch_id`` on every row it touches, and a re-delivered
        batch_id no-ops — previously a foreachBatch refire re-executed
        the predicate mutation (e.g. double-incrementing a counter).
        Residual: the guard decays if LATER merges overwrite every
        touched row's ``_batch_id`` before the refire arrives — the same
        row-stamp decay merge()'s guard carries; exactly-once beyond it
        needs the WAP/branch flow."""
        if batch_id is not None:
            if batch_id in self.applied_batch_ids():
                return {"table": self.table, "predicate": predicate, "noop": True}
            set_exprs = {**set_exprs, "_batch_id": str(int(batch_id))}
        self.spark.sql(  # pragma: no cover - needs the Iceberg jar
            build_update_sql(self.table, predicate, set_exprs)
        )
        return {"table": self.table, "predicate": predicate}

    def delete_where(self, predicate: str, batch_id=None) -> dict:
        """Predicate delete — interface parity with
        ParquetLakeTable.delete_where. On an Iceberg v2 table a row-level
        ``DELETE FROM ... WHERE`` writes POSITIONAL DELETE files (the same
        deletion-vector representation the parquet lake implements from
        scratch) without rewriting data files; compaction
        (rewrite_position_delete_files / rewrite_data_files) folds them,
        exactly mirroring the parquet table's compact() contract. SQL via
        the pure build_delete_sql (contract-tested jar-free).

        Refire caveat (review r05): deleted rows can carry no stamp, so a
        ``batch_id`` here is checked against applied_batch_ids() (covers
        mixed update/merge workloads) but CANNOT guarantee a refire
        no-ops — a re-run re-evaluates the predicate against the current
        snapshot and may delete rows merged since. For exactly-once
        predicate deletes on Iceberg use the WAP/branch flow, or express
        the delete as merge(delete_keys=...) keyed on a snapshot-pinned
        key set."""
        if batch_id is not None and batch_id in self.applied_batch_ids():
            return {"table": self.table, "predicate": predicate, "noop": True}
        self.spark.sql(  # pragma: no cover - needs the Iceberg jar
            build_delete_sql(self.table, predicate)
        )
        return {"table": self.table, "predicate": predicate}

    # ---- named snapshot refs (interface parity with ParquetLakeTable) --

    def tag(self, name, version=None, replace=False):  # pragma: no cover
        """Iceberg-native tag (ALTER TABLE ... CREATE TAG); pins the
        snapshot against expire_snapshots exactly like the parquet table's
        pin (Iceberg ref retention)."""
        ParquetLakeTable._check_tag_name(name)
        verb = "CREATE OR REPLACE TAG" if replace else "CREATE TAG"
        asof = f" AS OF VERSION {int(version)}" if version is not None else ""
        self.spark.sql(f"ALTER TABLE {self.table} {verb} `{name}`{asof}")
        return version if version is not None else self.current_version()

    def drop_tag(self, name) -> bool:  # pragma: no cover
        ParquetLakeTable._check_tag_name(name)
        self.spark.sql(f"ALTER TABLE {self.table} DROP TAG IF EXISTS `{name}`")
        return True

    def tags(self) -> DataFrame:  # pragma: no cover
        return self.spark.sql(
            f"SELECT name, snapshot_id AS version, NULL AS created_at "
            f"FROM {self.table}.refs WHERE type = 'TAG'"
        )

    # ---- writable branches (interface parity with ParquetLakeTable) ----

    def create_branch(self, name, version=None):  # pragma: no cover
        """Iceberg-native branch (ALTER TABLE ... CREATE BRANCH). Writing
        to it uses Iceberg's branch identifiers (`table.branch_<name>` /
        the `branch` write option) plus spark.wap.branch for the audit
        flow — same semantics as ParquetLakeTable's branch handles."""
        ParquetLakeTable._check_tag_name(name)
        asof = f" AS OF VERSION {int(version)}" if version is not None else ""
        self.spark.sql(f"ALTER TABLE {self.table} CREATE BRANCH `{name}`{asof}")
        return name

    def drop_branch(self, name) -> bool:  # pragma: no cover
        ParquetLakeTable._check_tag_name(name)
        self.spark.sql(
            f"ALTER TABLE {self.table} DROP BRANCH IF EXISTS `{name}`"
        )
        return True

    def fast_forward(self, name) -> None:  # pragma: no cover
        """Iceberg-native publish (CALL system.fast_forward): main adopts
        the branch head iff it is a descendant — the engine raises when
        diverged, matching ParquetLakeTable.fast_forward/BranchDiverged."""
        ParquetLakeTable._check_tag_name(name)
        catalog = self.table.split(".")[0]
        self.spark.sql(
            f"CALL {catalog}.system.fast_forward("
            f"table => '{self.table}', branch => 'main', to => '{name}')"
        )

    def branches(self) -> DataFrame:  # pragma: no cover
        return self.spark.sql(
            f"SELECT name, snapshot_id AS version FROM {self.table}.refs "
            "WHERE type = 'BRANCH' AND name != 'main'"
        )
