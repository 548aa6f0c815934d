"""ParquetTieredStore — the persistent, partitioned replacement for the
reference's fixed-size .hs archive files.

Reference storage model (kenshin/storage.py:21-33): one preallocated file =
header + one ring of points per retention tier; writes land at
O(1) ring offsets (kenshin/storage.py:499-503), retention expiry is the
ring overwriting itself, and flushes batch ~cacheRetention seconds of data
per file (rurouni/cache.py:259-262).

Spark-native equivalent, designed for 100 TB:

- **Layout**: one directory per tier, Parquet partitioned by ``day``
  (``ts // 86400`` — integer epoch day). Time-range predicates prune at
  the partition level; metric predicates prune via Parquet row-group
  stats + pushed filters. At cluster scale add
  ``.bucketBy(metric)``/liquid clustering per tier — the layout below is
  identical, only the writer call changes.
- **Upsert** (the ring overwrite, kenshin/storage.py:468-480): merge the
  batch with the *touched day partitions only* under last-write-wins,
  then dynamic-partition-overwrite exactly those days. Untouched
  partitions are never read or rewritten — the 100 TB analog of the
  reference's "one sequential write per file" (README.md:63-66).
- **Retention expiry** (the ring's self-overwrite, SURVEY O4): drop whole
  day partitions older than the tier's retention. Sub-day precision is
  enforced at fetch time by R1's clamping, so expiry never has to
  rewrite a partition.
- **Catalog** (the index files, rurouni/storage.py:56-77): a tiny
  ``metrics`` Parquet dim table ``(metric, schema_name, created_ts)``.
"""

from __future__ import annotations

import json
import logging
import os
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

import threading
from contextlib import contextmanager

from kenshin_spark.commit import (  # _is_stale_read re-exported for tests
    CommitProtocol,
    ManifestCommitProtocol,
    ManifestTxn,
    SeqlockCommitProtocol,
    _is_stale_read,  # noqa: F401
)
from kenshin_spark.config import AGG_SQL, Schema
from kenshin_spark.fs import HadoopFS

_LOG = logging.getLogger(__name__)
from kenshin_spark.operators.align import align_ts

DAY = 86400
HOUR = 3600

#: Manifest scans pass EXPLICIT file lists; above the default threshold
#: (32 paths) Spark's InMemoryFileIndex launches a parallel-listing JOB
#: per scan, which FIFO-queues behind writer jobs — measured ~1 s added
#: to EVERY serving read at 300 live files (and a 2x phase-A writer wall
#: in the 1M load capture). Driver-side sequential stat of local/HDFS
#: paths is micro-seconds per file. The override is scoped to the
#: explicit-list planning call (set/restore under a refcount so stacked
#: store scans don't flap it) instead of mutating the session conf for
#: every other scan in the SparkSession (ADVICE r10).
_PPD_KEY = "spark.sql.sources.parallelPartitionDiscovery.threshold"
_ppd_lock = threading.Lock()
_ppd_depth: dict[int, tuple[int, str | None]] = {}  # id(spark) -> (n, prev)


@contextmanager
def _explicit_list_planning(spark):
    sid = id(spark)
    with _ppd_lock:
        depth, prev = _ppd_depth.get(sid, (0, None))
        if depth == 0:
            try:
                prev = spark.conf.get(_PPD_KEY)
            except Exception:
                prev = None
            spark.conf.set(_PPD_KEY, "1000000")
        _ppd_depth[sid] = (depth + 1, prev)
    try:
        yield
    finally:
        with _ppd_lock:
            depth, prev = _ppd_depth[sid]
            if depth == 1:
                del _ppd_depth[sid]
                if prev is None:
                    spark.conf.unset(_PPD_KEY)
                else:
                    spark.conf.set(_PPD_KEY, prev)
            else:
                _ppd_depth[sid] = (depth - 1, prev)

#: tiers whose whole retention fits in this many seconds partition hourly —
#: hot tiers get fine-grained partitions so a micro-batch upsert rewrites
#: ~an hour of data, not a whole day (the closest COW-parquet analog of the
#: reference's O(1) ring write, kenshin/storage.py:499-503)
HOT_RETENTION_CUTOFF = 2 * DAY

STORED_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("day", T.LongType(), False),
    ]
)

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("created_ts", T.LongType(), False),
    ]
)


class ParquetTieredStore:
    """``mode="cow"`` (default): every upsert merges and rewrites the
    touched partitions — reads are cheapest, writes pay partition-sized
    amplification. ``mode="mor"`` (merge-on-read): upserts APPEND rows
    stamped with a sequence number and reads resolve last-write-wins per
    slot — writes cost O(batch) like the reference's ring write
    (kenshin/storage.py:499-503), reads pay a resolve aggregation until
    ``compact()`` folds the log back to one row per slot. Pick per tier
    usage: mor for high-frequency hot ingest, cow for read-heavy tiers."""

    def __init__(
        self,
        spark: SparkSession,
        schema: Schema,
        root: str,
        mode: str = "cow",
        commit_protocol: CommitProtocol | str | None = None,
    ):
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown store mode {mode!r}")
        self.spark = spark
        self.schema = schema
        self.root = root
        self.mode = mode
        #: all non-Spark filesystem ops go through the Hadoop FS API so
        #: the store behaves identically on file:/hdfs:/object stores
        self.fs = HadoopFS(spark, root)
        # dynamic mode: .partitionBy().mode("overwrite") rewrites only the
        # partitions present in the written frame — the MERGE primitive here
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        #: the commit surface (swap guard / epoch / consistent_read) as a
        #: swappable protocol. Default (None) resolves per-root: a root
        #: with a manifest log — or a FRESH root — gets the manifest-log
        #: backend (snapshot isolation on plain parquet: readers plan
        #: from the committed file list, O(1) consistent reads, no
        #: retries, safe on object stores without atomic rename); a
        #: pre-existing root WITHOUT a manifest keeps the legacy seqlock
        #: (retrofitting a manifest onto a root with retired files would
        #: need a listing rebuild that can resurrect them — see
        #: init_manifest_from_tree). Pass ``"seqlock"``/``"manifest"``
        #: to force either; a Delta/Iceberg-backed store passes a
        #: SnapshotCommitProtocol and every primitive degenerates to the
        #: format's native feature (see kenshin_spark.commit).
        if commit_protocol is None:
            commit_protocol = (
                "manifest" if self._root_wants_manifest() else "seqlock"
            )
        if commit_protocol == "manifest":
            commit_protocol = ManifestCommitProtocol(self.fs, root, label=root)
        elif commit_protocol == "seqlock":
            commit_protocol = None
        self.commit: CommitProtocol = commit_protocol or SeqlockCommitProtocol(
            self.fs, os.path.join(root, "_swap_epoch"), label=root
        )

    def _root_wants_manifest(self) -> bool:
        """Protocol auto-selection for ``commit_protocol=None``: a root
        already under the manifest log, or a root with no prior write
        history at all, runs the manifest backend (the scale-safe
        default); a legacy root — data or seqlock sidecars but no
        manifest — stays on seqlock so its retired-but-undeleted files
        are never mistaken for live ones."""
        if self.fs.exists(posixpath.join(self.root, "_manifest", "_latest")):
            return True
        # legacy markers: any prior write leaves at least one of these
        for marker in ("_swap_epoch", "_seq.json", "_seq.d"):
            if self.fs.exists(posixpath.join(self.root, marker)):
                return False
        for i in range(len(self.schema.archives)):
            if self.fs.exists(self.tier_path(i)):
                return False
        if self.fs.exists(posixpath.join(self.root, "_catalog")):
            return False
        return True

    @property
    def _seq_sidecar(self) -> str:
        return os.path.join(self.root, "_seq.json")

    @property
    def _seq_claims(self) -> str:
        return os.path.join(self.root, "_seq.d")

    def _next_seq(self) -> int:
        """Monotonic write stamp (mor mode: later stamps win at read).

        Allocation is a filesystem CAS: stamp n is CLAIMED by exclusively
        creating marker ``_seq.d/<n>`` — two concurrent writers can never
        issue the same stamp (the loser's create fails and it probes the
        next n). The sidecar ``_seq.json`` is a monotonic hint re-read on
        every allocation, so a store open for hours doesn't trust a stale
        in-memory counter; it is written AFTER the claim, so a crash
        wastes a stamp instead of ever reusing one. No max(_seq) scan
        over the tier — at 100 TB that would be a full-table aggregate
        just to open the store. Legacy stores without a sidecar fall back
        to the tier scan once."""
        hint = self._last_seq_or_none()
        n = hint or 0
        if hint is None:
            for i in range(len(self.schema.archives)):
                path = self.tier_path(i)
                if not self._tier_empty(path):
                    df = self._scan_tier(path)
                    if "_seq" in df.columns:
                        row = df.agg(F.max("_seq")).collect()[0]
                        n = max(n, int(row[0] or 0))
        while True:
            n += 1
            if self.fs.create_exclusive(
                os.path.join(self._seq_claims, str(n))
            ):
                break
        self.fs.write_text_atomic(
            self._seq_sidecar, json.dumps({"last_seq": n})
        )
        return n

    # -- the commit surface (swap guard / epoch / consistent_read) --------
    # delegated to self.commit — SeqlockCommitProtocol on plain parquet,
    # SnapshotCommitProtocol on a transactional table format (see
    # kenshin_spark.commit for the primitive-by-primitive mapping)

    @property
    def _epoch_sidecar(self) -> str:
        return os.path.join(self.root, "_swap_epoch")

    @property
    def read_retry_stats(self) -> dict:
        """consistent_read observability (the S8 self-metrics shape): how
        often serving reads waited on / raced / degraded past the commit
        protocol — a silently-degrading replica shows up here."""
        return self.commit.stats

    def swap_epoch(self) -> int:
        """Monotonic version over DESTRUCTIVE file transitions (day-dir
        swaps, tier swaps, expiry deletes): under the default seqlock
        backend, ODD while one is in flight, EVEN when quiescent; under
        a table format, the table version/snapshot id. Plain Parquet has
        no snapshot isolation (fs.py's object-store caveat), so without
        the seqlock a serving read that lists files just before
        ``compact()`` promotes a day dir fails FAILED_READ_FILE mid-scan
        — or worse, reads the gap between the two renames and silently
        misses the day. Writers are single-process by design (the
        reference daemon's one writeForever thread, rurouni/writer.py);
        nesting inside one store object is handled by the protocol."""
        return self.commit.epoch()

    def _swap_guard(self):
        """Critical section around a destructive file transition —
        ``commit.guard_transition()``; a no-op under snapshot-isolated
        backends whose commits are atomic in the transaction log."""
        return self.commit.guard_transition()

    def consistent_read(
        self,
        fn,
        retries: int = 10,
        backoff_s: float = 0.05,
        deadline_s: float = 30.0,
        flags: dict | None = None,
    ):
        """Run driver-side read ``fn`` (build-DataFrame-and-collect; it is
        re-invoked from scratch on retry) so the result is never a torn
        view of an in-flight transition. The serving layer
        (serving.store_serving_fns) wraps every lookup in this — the
        analog of the reference daemon answering cache queries while
        writeForever flushes (rurouni/protocols.py:65-84). Degradation
        order, retry budgets, and the stale-marker scope live with the
        backend (kenshin_spark.commit.SeqlockCommitProtocol); on a table
        format this is one plain ``fn()``. ``flags`` (a dict, optional)
        receives per-read degradation markers — see
        ``CommitProtocol.consistent_read``."""
        return self.commit.consistent_read(
            fn, retries=retries, backoff_s=backoff_s, deadline_s=deadline_s,
            flags=flags,
        )

    def retry_metrics(self, now: int) -> list[tuple[str, int, float]]:
        """``read_retry_stats`` + the current swap epoch as self-metric
        points in the S8 shape (``rurouni.*`` instrumentation,
        rurouni/state/instrumentation.py:66-113) — feed through
        ``StreamingIngest.process_batch`` so a serving replica's seqlock
        pressure is queryable like any other metric. Name the replica
        via the store's schema so fleets aggregate per schema."""
        pts = [
            (f"rurouni.store.{self.schema.name}.read.{k}", now, float(v))
            for k, v in self.read_retry_stats.items()
        ]
        pts.append(
            (
                f"rurouni.store.{self.schema.name}.swap_epoch",
                now,
                float(self.swap_epoch()),
            )
        )
        return pts

    def prune_seq_claims(self) -> int:
        """GC the CAS claim markers below the committed sidecar hint —
        they are only load-bearing ABOVE it (a marker ≤ the persisted
        last_seq can never be probed again). Without this, one empty
        file accumulates per write forever: costly LIST growth on object
        stores, and a stale sidecar would pay O(gap) failed create
        probes. Runs with ``expire`` (off the hot path); returns the
        number of markers removed."""
        keep_above = self.last_seq()
        removed = 0
        for name in self.fs.list_names(self._seq_claims):
            try:
                stamp = int(name)
            except ValueError:
                continue
            if stamp <= keep_above:
                self.fs.delete(os.path.join(self._seq_claims, name))
                removed += 1
        return removed

    # -- paths ------------------------------------------------------------

    def tier_path(self, i: int) -> str:
        return os.path.join(self.root, f"tier={i}")

    def part_unit(self, i: int) -> int:
        """Partition granularity of tier i in seconds: hourly while the
        tier's retention is short (hot data, frequent upserts), daily for
        the long coarse tiers. The ``day`` column stores ``ts // unit``."""
        return HOUR if self.schema.archives[i].retention <= HOT_RETENTION_CUTOFF else DAY

    # -- manifest-mode plumbing --------------------------------------------

    @property
    def _manifest_mode(self) -> bool:
        """True when the commit protocol keeps a committed file list —
        reads then plan from it (never a directory listing) and every
        write stages invisibly + flips the manifest atomically."""
        return self.commit.plans_from_manifest

    def _rel(self, path: str) -> str:
        """``path`` relative to the store root — the manifest's key
        space (so a backed-up/restored store's manifest stays valid)."""
        return os.path.relpath(path, self.root)

    def _plan_abs(
        self, path: str, version: int | None = None
    ) -> list[str] | None:
        """The committed live files under ``path`` as absolute paths, or
        None when this backend plans from directory listings.
        ``version`` pins a historical manifest seq (time travel)."""
        if not self._manifest_mode:
            return None
        return [
            os.path.join(self.root, rel)
            for rel, _ in self.commit.live_files(
                self._rel(path), seq=version
            )
        ]

    def _check_version(self, version: int | None) -> None:
        """Validate a time-travel pin: manifest-backed stores only, and
        the seq must be a committed one (0 = 'before anything' is not a
        readable snapshot; > epoch does not exist yet)."""
        if version is None:
            return
        if not self._manifest_mode:
            raise ValueError(
                "version-pinned reads need the manifest commit protocol "
                "(listing-planned stores keep no file-list history)"
            )
        latest = self.commit.epoch()
        if not (1 <= version <= latest):
            raise ValueError(
                f"version {version} not in committed range [1, {latest}]"
            )

    def _adopt(
        self, df: DataFrame, dest_path: str, partitioned: bool = True
    ) -> list[tuple[str, int]]:
        """Manifest-mode write primitive: write ``df`` to a private
        ``_stage/<tag>`` directory (underscore-prefixed — invisible to
        partition discovery), then MOVE the data files into the live
        tree under tag-unique names. Readers plan from the committed
        manifest, so adopted files stay invisible until the caller's
        transaction flips the pointer; a crash at any point strands only
        invisible files for ``vacuum`` to reclaim. Returns
        ``(rel_path, size)`` pairs for the transaction."""
        import uuid

        tag = uuid.uuid4().hex[:12]
        stage = os.path.join(self.root, "_stage", tag)
        writer = df.write.mode("overwrite")
        if partitioned:
            writer = writer.partitionBy("day")
        writer.parquet(stage)
        adopted: list[tuple[str, int]] = []

        def _move(src_dir: str, dst_dir: str) -> None:
            self.fs.mkdirs(dst_dir)
            for fname, size in self.fs.list_files(src_dir):
                if not fname.endswith(".parquet"):
                    continue
                dst = os.path.join(dst_dir, f"{tag}-{fname}")
                if not self.fs.rename(os.path.join(src_dir, fname), dst):
                    raise IOError(f"adopt: could not move {fname} -> {dst}")
                adopted.append((self._rel(dst), size))

        if partitioned:
            for dname in self.fs.list_names(stage):
                if dname.startswith("day="):
                    _move(
                        os.path.join(stage, dname),
                        os.path.join(dest_path, dname),
                    )
        else:
            _move(stage, dest_path)
        self.fs.delete(stage)
        return adopted

    def init_manifest_from_tree(self) -> int:
        """Bootstrap the manifest for a tree written OUTSIDE the log — a
        schema-change REBUILD swaps in a root built by a fresh (seqlock)
        store, so a manifest-mode re-open would read epoch 0 and see
        every tier as empty (ADVICE r10). Enumerates every data file on
        disk into one commit. Refuses when a manifest already exists:
        after retirements, a listing would resurrect files awaiting
        vacuum."""
        if not self._manifest_mode:
            return 0
        if self.commit.epoch() != 0:
            raise RuntimeError(
                "init_manifest_from_tree: manifest already exists at "
                f"{self.root} (epoch {self.commit.epoch()}); a listing "
                "rebuild would resurrect retired files"
            )

        def _adopt_dir(tx, d: str) -> None:
            for fname, size in self.fs.list_files(d):
                if fname.endswith(".parquet"):
                    tx.add(self._rel(os.path.join(d, fname)), size)

        with self.commit.txn(op="init") as tx:
            roots = [
                self.tier_path(i)
                for i in range(len(self.schema.archives))
            ]
            roots.append(self.catalog_path)
            for r in roots:
                for dname in self.fs.list_names(r):
                    if dname.startswith("day="):
                        _adopt_dir(tx, os.path.join(r, dname))
                _adopt_dir(tx, r)
        return self.commit.epoch()

    def restore(self, version: int) -> int:
        """Roll the live file set back to manifest seq ``version`` —
        Delta's RESTORE TABLE: ONE forward commit (op=``restore``) that
        drops every file added after the pinned seq and re-adds every
        file it referenced that was since retired (clearing their
        tombstones — the files still exist physically until vacuum, so
        a restore within the grace window is pure metadata). History is
        preserved: the rollback is itself a commit, so a restore can be
        restored away. Raises when a required file was already
        reclaimed (restore past the vacuum horizon cannot be done
        safely) — checked BEFORE committing, so a failed restore
        changes nothing."""
        self._check_version(version)
        target = dict(self.commit.live_files("", seq=version))
        current = dict(self.commit.live_files(""))
        readds = {r: sz for r, sz in target.items() if r not in current}
        missing = [
            r for r in readds
            if not self.fs.exists(os.path.join(self.root, r))
        ]
        if missing:
            raise ValueError(
                f"restore to seq {version}: {len(missing)} required "
                f"file(s) already vacuumed (first: {missing[0]}) — "
                "the snapshot is past the retention horizon"
            )
        with self.commit.txn(op="restore") as tx:
            for rel in current:
                if rel not in target:
                    tx.drop(rel)
            for rel, sz in readds.items():
                tx.add(rel, sz)
        return self.commit.epoch()

    def vacuum(self, grace_s: float = 3600.0, now: float | None = None) -> list[str]:
        """Physically reclaim files no committed manifest references —
        superseded rewrites, logically-expired partitions, crash-stranded
        stage debris — that are older than ``grace_s`` (the VACUUM
        retention contract: a scan must finish within the grace window
        of the snapshot it planned, exactly like Delta's
        ``VACUUM ... RETAIN`` / Iceberg's ``expire_snapshots``). Also
        trims superseded manifest generations past the grace window.
        No-op under listing-planned backends (their mutations delete
        eagerly under the swap guard). Returns the paths removed."""
        import time as _time

        if not self._manifest_mode:
            return []
        cutoff = (now if now is not None else _time.time()) - grace_s
        live = {rel for rel, _ in self.commit.live_files("")}
        tombs = self.commit.tombstones()
        removed: list[str] = []

        # 1) tombstoned files age by their RETIREMENT stamp recorded in
        # the manifest (Delta's RemoveFile.deletionTimestamp), never by
        # file mtime: compact/expire/delete retire files that may have
        # been written long before, and a reader that planned from the
        # pre-retirement snapshot gets the full grace window to finish
        # (ADVICE r10). Reclaimed tombstones are then dropped from the
        # manifest in one transaction so the log doesn't grow forever.
        reclaimed: list[str] = []
        for rel, retired_at in sorted(tombs.items()):
            if retired_at >= cutoff:
                continue
            path = os.path.join(self.root, rel)
            if self.fs.exists(path):
                self.fs.delete(path)
            removed.append(rel)
            reclaimed.append(rel)
        if reclaimed:
            tx_ = ManifestTxn(op="vacuum")
            for rel in reclaimed:
                tx_.clear_tombstone(rel)
            self.commit.commit_txn(tx_)

        # 2) untracked debris — files neither live nor tombstoned
        # (crash-stranded adopts that never committed, or retirements
        # from a pre-tombstone manifest) — has no recorded retirement
        # time, so the file mtime gate is the only signal available
        def _sweep_dir(d: str) -> None:
            for fname, _sz, mtime in self.fs.list_file_status(d):
                rel = self._rel(os.path.join(d, fname))
                if rel not in live and rel not in tombs and mtime < cutoff:
                    self.fs.delete(os.path.join(d, fname))
                    removed.append(rel)

        roots = [self.tier_path(i) for i in range(len(self.schema.archives))]
        roots.append(self.catalog_path)
        for r in roots:
            for dname in self.fs.list_names(r):
                sub = os.path.join(r, dname)
                if dname.startswith("day="):
                    _sweep_dir(sub)
                    if not self.fs.list_names(sub):  # now-empty partition
                        self.fs.delete(sub)
            _sweep_dir(r)
        stage_root = os.path.join(self.root, "_stage")
        for dname in self.fs.list_names(stage_root):
            sub = os.path.join(stage_root, dname)
            # a crashed staged write may be partitioned (day= children)
            statuses = list(self.fs.list_file_status(sub))
            for child in self.fs.list_names(sub):
                statuses += self.fs.list_file_status(os.path.join(sub, child))
            if statuses and all(m < cutoff for _, _, m in statuses):
                self.fs.delete(sub)
                removed.append(self._rel(sub))
        # manifest-log trim: the reconstruction chain for the LATEST
        # commit is (anchor checkpoint ≤ latest) + the deltas between —
        # everything strictly older than the anchor is reclaimable
        # (same retention contract as the data files; time travel
        # below the anchor ends where Delta's VACUUM ends it)
        latest = self.commit.epoch()
        statuses = list(
            self.fs.list_file_status(os.path.join(self.root, "_manifest"))
        )

        def _seq_of(fname: str) -> tuple[int, bool] | None:
            if fname.endswith(".d.json"):
                try:
                    return int(fname[: -len(".d.json")]), False
                except ValueError:
                    return None
            if fname.endswith(".json"):
                try:
                    return int(fname[: -len(".json")]), True
                except ValueError:
                    return None
            return None

        anchor = 0
        for fname, _sz, _m in statuses:
            parsed = _seq_of(fname)
            if parsed and parsed[1] and anchor < parsed[0] <= latest:
                anchor = parsed[0]
        if anchor == 0:
            anchor = latest  # no checkpoint found: trim nothing extra
        for fname, _sz, mtime in statuses:
            if fname.endswith(".tmp"):
                # a writer's staged commit record that lost its CAS
                # race mid-crash — reclaim once safely old
                if mtime < cutoff:
                    self.fs.delete(
                        os.path.join(self.root, "_manifest", fname)
                    )
                    removed.append(
                        self._rel(os.path.join("_manifest", fname))
                    )
                continue
            parsed = _seq_of(fname)
            if parsed is None:
                continue
            seq, _full = parsed
            if seq < anchor and mtime < cutoff:
                self.fs.delete(os.path.join(self.root, "_manifest", fname))
                removed.append(self._rel(os.path.join("_manifest", fname)))
        return removed

    # -- read -------------------------------------------------------------

    def _resolve(self, df: DataFrame) -> DataFrame:
        """mor: collapse the append log to the winning row per slot."""
        if "_seq" not in df.columns:
            return df.select("metric", "ts", "value")
        return (
            df.groupBy("metric", "ts")
            .agg(F.max(F.struct("_seq", "value")).alias("_w"))
            .select("metric", "ts", F.col("_w.value").alias("value"))
        )

    def _last_seq_or_none(self) -> int | None:
        """Sidecar stamp, or None when the sidecar is missing OR
        unparsable (empty/truncated — e.g. power loss between create and
        fsync on a filesystem that doesn't order them). Unparsable maps
        to None, not 0, so ``_next_seq`` takes the same once-only
        tier-scan fallback as a legacy store instead of bricking writes
        or slow-probing the claims dir from 1 (ADVICE r8); the write
        path fsyncs before rename, so this is defense in depth."""
        if not self.fs.exists(self._seq_sidecar):
            return None
        try:
            return int(
                json.loads(self.fs.read_text(self._seq_sidecar))["last_seq"]
            )
        except (ValueError, KeyError, TypeError):
            _LOG.warning(
                "unparsable _seq sidecar at %s — falling back to the "
                "tier max(_seq) scan (torn write from a crash?)",
                self._seq_sidecar,
            )
            return None

    def last_seq(self) -> int:
        """The newest committed write stamp (0 if nothing written) — pass
        to ``read_at`` for a stable snapshot."""
        return self._last_seq_or_none() or 0

    def _tier_empty(self, path: str, version: int | None = None) -> bool:
        """True when the tier has no data partitions — absent entirely, or
        expiry dropped every day= child (schema inference would fail).
        Under a manifest backend the committed file list is the truth
        (the directory may hold retired files awaiting vacuum)."""
        if self._manifest_mode:
            return not self.commit.live_files(
                self._rel(path), seq=version
            )
        if not self.fs.exists(path):
            return True
        return not any(
            n.startswith("day=") for n in self.fs.list_names(path)
        )

    def _tier_schema(self) -> T.StructType:
        """The physical schema of every tier, known a priori from the
        store mode (mor tiers ALWAYS carry ``_seq`` — every write path
        stamps it; cow tiers never do). Handing it to the reader skips
        planning-time schema inference entirely: one less footer read
        per scan at 100 TB, and — load-tested to matter — no footer IO
        left to race a concurrent day-swap (inference reads a data file
        during ANALYSIS, before ``ignoreMissingFiles`` applies, so a
        swap there surfaced as an unretryable AnalysisException)."""
        if self.mode == "mor":
            return T.StructType(
                list(STORED_SCHEMA) + [T.StructField("_seq", T.LongType(), True)]
            )
        return STORED_SCHEMA

    def _scan_tier(self, path: str, version: int | None = None) -> DataFrame:
        reader = self.spark.read.schema(self._tier_schema())
        files = self._plan_abs(path, version=version)
        if files is None:
            return reader.parquet(path)
        # plan from the committed file list — partition values (day=) are
        # still derived from the paths via basePath; a retired file that
        # physically remains on disk (awaiting vacuum) is never scanned
        with _explicit_list_planning(self.spark):
            return reader.option("basePath", path).parquet(*files)

    def _dayless_schema(self) -> T.StructType:
        """``_tier_schema`` without the ``day`` partition column — the
        physical schema of files READ WITHOUT basePath (a single day
        partition's files carry no partition-derived column)."""
        return T.StructType(
            [f for f in self._tier_schema() if f.name != "day"]
        )

    def _scan_day(self, i: int, day: int) -> DataFrame | None:
        """One day partition of tier i WITHOUT the day column (the
        compaction-stage read shape), planned per the backend; None when
        the partition has no live data."""
        day_dir = os.path.join(self.tier_path(i), f"day={day}")
        if self._manifest_mode:
            files = self._plan_abs(day_dir)
            if not files:
                return None
            with _explicit_list_planning(self.spark):
                return self.spark.read.schema(
                    self._dayless_schema()
                ).parquet(*files)
        if not self.fs.exists(day_dir):
            return None
        return self.spark.read.parquet(day_dir)

    def read(self, i: int, version: int | None = None) -> DataFrame:
        """Tier i as ``(metric, ts, value)``; empty frame if never
        written. ``version`` pins a historical manifest seq (manifest
        stores only — Delta's ``versionAsOf``): the scan plans from the
        file list as committed at that seq, so it sees the tier exactly
        as it stood THEN — including through later compactions and
        expiries, which ``read_at``'s row-stamp MVCC cannot reach back
        across (compaction folds the log). The travel window is the
        vacuum retention: a pinned read older than ``vacuum``'s grace
        may hit physically reclaimed files (FileNotFound at execution)
        or a trimmed log (ValueError at planning) — the same contract
        as Delta's VACUUM."""
        self._check_version(version)
        path = self.tier_path(i)
        if self._tier_empty(path, version=version):
            return self.spark.createDataFrame([], STORED_SCHEMA).select(
                "metric", "ts", "value"
            )
        return self._resolve(self._scan_tier(path, version=version))

    def history(self, limit: int | None = None) -> list[dict]:
        """The retained commit log, newest first (manifest stores; ``[]``
        under listing-planned backends) — seq, unix ts, op label, and
        adds/drops counts per commit. History ends where vacuum trimmed
        the log, exactly like time travel."""
        if not self._manifest_mode:
            return []
        return self.commit.history(limit=limit)

    def touched_days(self, i: int, seq_a: int, seq_b: int) -> list[int]:
        """Day partitions of tier i holding log rows stamped in
        ``(seq_a, seq_b]`` — the partitions a between-snapshots diff
        must resolve; everything else provably contributed no change
        (a slot's rows all share its day, so a changed slot has a
        stamped row in its own partition).

        Cost: a single-column ``_seq`` scan (`ReadSchema:
        struct<_seq:bigint>`; ``day`` comes free from directory names)
        with the range predicate pushed to parquet row-group stats —
        compacted files (all ``_seq = 0``) and old appends are skipped
        at the footer, so the scan is metadata-bound, not data-bound.
        No manifest sidecar: the mor log itself is the record, which
        means no extra write-path work and no crash-consistency cases."""
        path = self.tier_path(i)
        if self._tier_empty(path):
            return []
        rows = (
            self._scan_tier(path)
            .where((F.col("_seq") > seq_a) & (F.col("_seq") <= seq_b))
            .select("day")
            .distinct()
            .collect()
        )
        return sorted(int(r["day"]) for r in rows)

    def read_at(
        self, i: int, as_of_seq: int, days: list[int] | None = None
    ) -> DataFrame:
        """Snapshot read (mor mode only): tier i as it stood after write
        stamp ``as_of_seq`` — rows appended later are excluded BEFORE the
        log is collapsed. Every upsert stamps its whole batch with one
        seq, so snapshots are batch-atomic: a long pipeline job pins
        ``last_seq()`` once and every read it does is consistent, while
        ingest keeps appending. History only reaches back to the last
        ``compact()`` (compaction folds the log and resets stamps) —
        snapshot-pinning jobs and compaction must be scheduled apart,
        like any MVCC vacuum. ``days`` restricts the read to those day
        partitions (partition-pruned at planning) — the CDC diff passes
        the touched set so both snapshot resolves scan only changed
        partitions."""
        if self.mode != "mor":
            raise ValueError("read_at requires mode='mor' (cow keeps no history)")
        path = self.tier_path(i)
        if self._tier_empty(path):
            return self.spark.createDataFrame([], STORED_SCHEMA).select(
                "metric", "ts", "value"
            )
        raw = self._scan_tier(path)
        if days is not None:
            raw = raw.where(F.col("day").isin([int(d) for d in days]))
        # NULL-tolerant as-of filter: with the explicit _tier_schema the
        # _seq column always EXISTS, but rows from files that physically
        # lack it (a tier written before this store ran in mor mode, or
        # imported data) read back as NULL. Those rows predate every
        # stamp, so they belong in every snapshot — a bare
        # `_seq <= as_of` would silently drop them all (ADVICE r8).
        # _resolve's max(struct(_seq, value)) already ranks NULL lowest,
        # so stamped rows still win LWW over legacy ones.
        raw = raw.where(
            (F.col("_seq") <= as_of_seq) | F.col("_seq").isNull()
        )
        return self._resolve(raw)

    def changed_between(
        self, i: int, seq_a: int, seq_b: int
    ) -> DataFrame:
        """CDC over the mor log: slots whose RESOLVED value differs
        between snapshot ``seq_a`` and the later ``seq_b`` — new metrics,
        overwritten slots, NULL-overwrites included (the store has no
        deletes below metric granularity). Implemented as
        ``read_at(b) EXCEPT ALL read_at(a)``: both sides collapse their
        log prefix first, so the diff is over resolved states, not raw
        appends. Feed downstream incremental jobs (re-downsample only
        changed slots) instead of re-reading the tier.

        Both resolves are pruned to ``touched_days(i, a, b)`` first
        (VERDICT r8 "What's missing" #4): a slot can only differ between
        the snapshots if a row stamped in ``(a, b]`` sits in its day
        partition, so at 100 TB the diff costs two resolves of the days
        actually written between the checkpoints — not two full-tier
        scans — plus one stats-pruned single-column day-discovery pass."""
        days = self.touched_days(i, seq_a, seq_b)
        if not days:
            return self.spark.createDataFrame([], STORED_SCHEMA).select(
                "metric", "ts", "value"
            )
        return self.read_at(i, seq_b, days=days).exceptAll(
            self.read_at(i, seq_a, days=days)
        )

    def read_range(
        self, i: int, from_ts: int, until_ts: int,
        version: int | None = None,
    ) -> DataFrame:
        """Tier i restricted to ``[from_ts, until_ts)`` — the ts filter is
        mirrored onto the ``day`` partition column so the scan prunes
        whole partitions (a ts-only filter cannot: Catalyst doesn't know
        day = ts // 86400). This is the read path every time-bounded
        query must take at 100 TB. ``version`` pins a historical
        manifest seq (see :meth:`read`)."""
        self._check_version(version)
        path = self.tier_path(i)
        if self._tier_empty(path, version=version):
            return self.spark.createDataFrame([], STORED_SCHEMA).select(
                "metric", "ts", "value"
            )
        unit = self.part_unit(i)
        return self._resolve(
            self._scan_tier(path, version=version).where(
                (F.col("day") >= from_ts // unit)
                & (F.col("day") <= (until_ts - 1) // unit)
                & (F.col("ts") >= from_ts)
                & (F.col("ts") < until_ts)
            )
        )

    def tiers(self) -> list[DataFrame]:
        return [self.read(i) for i in range(len(self.schema.archives))]

    # -- write ------------------------------------------------------------

    def _with_day(self, df: DataFrame, i: int) -> DataFrame:
        unit = self.part_unit(i)
        return df.select(
            F.col("metric").cast("string"),
            F.col("ts").cast("long"),
            F.col("value").cast("double"),
            (F.col("ts").cast("long") / unit).cast("long").alias("day"),
        )

    def overwrite(self, i: int, slots: DataFrame) -> None:
        """Full rewrite of a tier (initial load / schema-change rebuild)."""
        out = self._with_day(slots, i)
        if self.mode == "mor":
            out = out.withColumn("_seq", F.lit(self._next_seq()))
        if self._manifest_mode:
            # stage + adopt invisibly, then one atomic pointer flip that
            # retires the whole old tier — readers mid-scan keep their
            # snapshot's files (vacuum reclaims them after the grace)
            adds = self._adopt(out, self.tier_path(i))
            with self.commit.txn(op="overwrite") as tx:
                tx.replace(f"tier={i}", adds)
            return
        # destructive for the whole job (overwrite deletes in-commit), so
        # the guard spans the write — initial loads aren't the serving path
        with self._swap_guard():
            out.write.mode("overwrite").partitionBy("day").parquet(
                self.tier_path(i)
            )

    def upsert(
        self, i: int, slots: DataFrame, days: list[int] | None = None
    ) -> None:
        """Merge aligned slots into tier i, new values winning per
        (metric, ts) — NULLs included, matching the ring overwrite
        (kenshin/storage.py:468-480). Reads and rewrites ONLY the day
        partitions the batch touches.

        ``days``: the batch's exact touched-day set when the caller
        already knows it (StreamingIngest folds it into its combined
        bookkeeping pass) — skips the distinct-days probe job the cow
        merge path otherwise runs. Must equal what the probe would
        return; ignored on paths that never probe (mor append,
        first write)."""
        path = self.tier_path(i)
        new = self._with_day(slots, i)
        # every write path sorts within tasks by (metric, ts) — a free
        # in-task sort (no shuffle) that keeps parquet row-group min/max
        # stats tight, so metric-predicate scans skip row groups even
        # BETWEEN compactions (compact() re-sorts anyway)
        if self.mode == "mor":
            # O(batch) append; the read path resolves last-write-wins
            stamped = new.withColumn(
                "_seq", F.lit(self._next_seq())
            ).sortWithinPartitions("day", "metric", "ts")
            if self._manifest_mode:
                adds = self._adopt(stamped, path)
                with self.commit.txn(op="upsert") as tx:
                    for rel, size in adds:
                        tx.add(rel, size)
                return
            stamped.write.mode("append").partitionBy("day").parquet(path)
            return
        if self._tier_empty(path):
            shaped = new.sortWithinPartitions("day", "metric", "ts")
            if self._manifest_mode:
                adds = self._adopt(shaped, path)
                with self.commit.txn(op="upsert") as tx:
                    tx.replace(f"tier={i}", adds)
                return
            shaped.write.mode("overwrite").partitionBy("day").parquet(path)
            return
        if days is None:
            days = [r["day"] for r in new.select("day").distinct().collect()]
        else:
            days = [int(d) for d in days]
        # the merge below is planned from THIS snapshot — pin it so a
        # concurrent writer's commit into a touched day conflicts
        # loudly instead of being silently replaced un-merged
        read_seq = self.commit.epoch() if self._manifest_mode else 0
        existing = (
            self._scan_tier(path)
            .where(F.col("day").isin(days))
            .select("metric", "ts", "value", "day")
        )
        # last-write-wins: the new batch outranks stored rows; max(struct)
        # is NULL-safe in the payload position
        merged = (
            existing.withColumn("_seq", F.lit(0))
            .unionByName(new.withColumn("_seq", F.lit(1)))
            .groupBy("metric", "ts", "day")
            .agg(F.max(F.struct("_seq", "value")).alias("_w"))
            .select("metric", "ts", F.col("_w.value").alias("value"), "day")
        )
        if self._manifest_mode:
            # the merged frame carries exactly the touched days — adopt
            # its files, then one transaction retires those days' old
            # files and commits the rewrites; readers never see a
            # half-merged partition and nothing is deleted in-commit
            adds = self._adopt(
                merged.sortWithinPartitions("day", "metric", "ts"), path
            )
            with self.commit.txn(read_seq=read_seq, op="upsert") as tx:
                for d in days:
                    tx.drop(f"tier={i}/day={d}")
                for rel, size in adds:
                    tx.add(rel, size)
            return
        # cow rewrites the touched day partitions in-commit — destructive
        # for the job's duration, hence mor is the serve-under-writes mode
        with self._swap_guard():
            merged.sortWithinPartitions("day", "metric", "ts").write.mode(
                "overwrite"
            ).partitionBy("day").parquet(path)

    # -- retention (O4) ---------------------------------------------------

    def _live_days(self, i: int) -> list[int]:
        """Day partition values of tier i per the committed manifest."""
        days = set()
        for rel, _ in self.commit.live_files(f"tier={i}"):
            part = rel.split("/")[1]
            if part.startswith("day="):
                days.add(int(part[4:]))
        return sorted(days)

    def expire(self, now: int) -> dict[int, list[int]]:
        """Drop day partitions wholly outside each tier's retention.
        Returns {tier: [dropped days]} (the partition-drop DDL at scale).
        Under the manifest backend expiry is LOGICAL — one transaction
        retires every doomed partition across all tiers atomically, and
        ``vacuum`` reclaims the bytes after the grace window (so scans
        planned before the expiry keep reading their snapshot)."""
        dropped: dict[int, list[int]] = {}
        if self._manifest_mode:
            with self.commit.txn(op="expire") as tx:
                for i, arch in enumerate(self.schema.archives):
                    cutoff_day = (now - arch.retention) // self.part_unit(i)
                    gone = [
                        d for d in self._live_days(i) if d < cutoff_day
                    ]
                    for d in gone:
                        tx.drop(f"tier={i}/day={d}")
                    if gone:
                        dropped[i] = gone
            self.prune_seq_claims()
            return dropped
        for i, arch in enumerate(self.schema.archives):
            path = self.tier_path(i)
            if not self.fs.exists(path):
                continue
            cutoff_day = (now - arch.retention) // self.part_unit(i)
            doomed = [
                d for d in self.fs.list_names(path)
                if d.startswith("day=")
                and int(d.split("=", 1)[1]) < cutoff_day
            ]
            gone = []
            if doomed:
                with self._swap_guard():  # seqlock vs serving reads
                    for d in doomed:
                        self.fs.delete(os.path.join(path, d))
                        gone.append(int(d.split("=", 1)[1]))
            if gone:
                dropped[i] = sorted(gone)
        self.prune_seq_claims()
        return dropped

    # -- propagation (W7) -------------------------------------------------

    def propagate(
        self,
        batch_slots: DataFrame,
        from_tier: int = 0,
        bounds: "tuple[int | None, int | None] | None" = None,
    ) -> None:
        """Cascade an upsert into tier ``from_tier`` through the coarser
        tiers: for each tier i>from_tier re-aggregate the *touched coarse
        slots* from tier i-1 — the write-time downsample of
        kenshin/storage.py:510-586, bounded to the affected window exactly
        like the reference's propagation range.

        ``bounds``: the batch's (min ts, max ts) when the caller already
        knows them (StreamingIngest folds them into the upsert's write
        action via ``observe``) — skips the bounds job here. ``(None,
        None)`` means a provably empty batch (no-op), ``None`` means
        unknown (compute them).

        Shape (r12, guide §1.3/§2.4): every tier's touched coarse-slot
        set is derived by aligning the ORIGINAL batch slots — coarser
        steps are validated integer multiples of finer ones
        (config.py: "each coarser step is an integer multiple of the
        next finer step"), so ``align(align(ts, s_fine), s_coarse) ==
        align(ts, s_coarse)`` and the set is identical to the former
        chain off the previous tier's re-aggregate. That makes each
        re-aggregate single-consumer (its own upsert write), so the
        per-tier persist + count job are gone: the mor append is
        written straight from the plan and AQE's partition coalescing
        shapes the output files by SIZE (scale-adaptive) instead of an
        explicit coalesce sized by a dedicated count job. Cow tiers pin
        the re-aggregate around their read-merge-rewrite (two
        consumers: the touched-days probe and the merge)."""
        agg = AGG_SQL[self.schema.agg_method]
        touched = batch_slots.select(
            "metric", F.col("ts").cast("long")
        )
        # the batch projection is consumed once per coarser tier (each
        # tier's slot set aligns it down) plus once for the bounds job —
        # pin it when there is more than one consumer so the upstream
        # plan (e.g. a CDC exceptAll diff, or a foreachBatch frame that
        # re-executes its stateful source per action) runs once. pin,
        # NOT persist: the per-tier broadcast builds of the slot sets
        # were measured missing the SQL cache (each tier's write
        # re-evaluated the full upstream plan — 4 extra evaluations of
        # the CDC diff per propagate_from_seq), while checkpoint blocks
        # are reused unconditionally.
        n_consumers = (len(self.schema.archives) - from_tier - 1) + (
            1 if bounds is None else 0
        )
        if n_consumers > 1:
            from kenshin_spark.session import pin

            touched = pin(touched, eager=False)
        try:
            if bounds is None:
                row = touched.agg(
                    F.min("ts").alias("lo"), F.max("ts").alias("hi")
                ).collect()[0]
                bounds = (row["lo"], row["hi"])
            if bounds[0] is None:
                return
            lo, hi = int(bounds[0]), int(bounds[1])
            for i in range(from_tier + 1, len(self.schema.archives)):
                step = self.schema.archives[i].sec_per_point
                slots = touched.select(
                    "metric", align_ts(F.col("ts"), step).alias("slot")
                ).distinct()
                # bound the finer-tier scan to the touched coarse-slot
                # range — partition pruning keeps propagation cost
                # ∝ batch, not table
                finer = self.read_range(
                    i - 1, lo - lo % step, hi - hi % step + step
                )
                window = finer.join(
                    F.broadcast(slots),
                    (finer["metric"] == slots["metric"])
                    & (align_ts(finer["ts"], step) == slots["slot"]),
                ).select(finer["metric"], finer["ts"], finer["value"])
                re_agg = window.groupBy(
                    "metric", align_ts(F.col("ts"), step).alias("ts")
                ).agg(
                    F.expr(agg.format(v="value", t="ts")).alias("value")
                )
                if self.mode == "cow" and not self._tier_empty(
                    self.tier_path(i)
                ):
                    # cow's merge probes the touched days, then unions
                    # against them — two consumers; pin so the
                    # re-aggregate evaluates once
                    re_agg = re_agg.persist()
                    try:
                        self.upsert(i, re_agg)
                    finally:
                        re_agg.unpersist()
                else:
                    # mor append (or first cow write): single consumer —
                    # written straight from the plan; AQE coalesces the
                    # output partitions by size (guide §2.2/§6)
                    self.upsert(i, re_agg)
        finally:
            # no-op unless a (replicated-persist) pin mode left the frame
            # cached; localCheckpoint blocks are reclaimed by the
            # ContextCleaner once the RDD is unreachable (session.py pins
            # the periodic-GC cadence at 45 s)
            touched.unpersist()

    def backup_to(self, dest_root: str) -> list[str]:
        """Copy every tier, the catalog, and the seq sidecar to
        ``dest_root`` (same filesystem semantics as the store root —
        local, file:, hdfs:, s3a). A plain recursive copy is a CRASH-
        CONSISTENT backup here because tier data is immutable-once-
        written parquet plus an append log; for a point-in-time snapshot
        under concurrent writes, pin ``last_seq()`` first and restore
        with ``read_at`` semantics. Returns the paths copied."""
        copied = []
        for i in range(len(self.schema.archives)):
            p = self.tier_path(i)
            if self.fs.exists(p):
                self.fs.copy_tree(p, os.path.join(dest_root, f"tier={i}"))
                copied.append(p)
        if self.fs.exists(self.catalog_path):
            self.fs.copy_tree(
                self.catalog_path, os.path.join(dest_root, "_catalog")
            )
            copied.append(self.catalog_path)
        if self.fs.exists(self._seq_sidecar):
            self.fs.copy_tree(
                self._seq_sidecar, os.path.join(dest_root, "_seq.json")
            )
            copied.append(self._seq_sidecar)
        manifest_dir = os.path.join(self.root, "_manifest")
        if self.fs.exists(manifest_dir):
            # the manifest keys are root-relative, so the copied log is
            # valid at the new root as-is (retired files come along in
            # the tier copies — harmless; vacuum reclaims them there too)
            self.fs.copy_tree(
                manifest_dir, os.path.join(dest_root, "_manifest")
            )
            copied.append(manifest_dir)
        return copied

    def propagate_from_seq(self, since_seq: int, from_tier: int = 0) -> int:
        """Catch-up propagation (mor): re-downsample ONLY the slots tier
        ``from_tier`` changed since write stamp ``since_seq`` — the
        recovery path when writes bypassed the per-batch cascade
        (imports, restored ``.bak`` tiers, manual upserts, a crashed
        ingest that flushed tier0 but died before cascading). Cost is
        ∝ changed slots, not tier size: the CDC diff collapses the log
        prefix on both sides and ``propagate`` re-aggregates only the
        touched coarse windows. Returns the stamp to pass as
        ``since_seq`` next time (checkpoint it).

        The cascade's scan bounds come from the touched-day probe the
        diff already ran (day extents × the partition unit) instead of
        a dedicated min/max job over the resolved diff — bounds only
        prune the finer-tier scans (the slot join filters exactly), so
        day-granular bounds change nothing but the job count."""
        upto = self.last_seq()
        days = self.touched_days(from_tier, since_seq, upto)
        if not days:
            return upto
        changed = self.read_at(from_tier, upto, days=days).exceptAll(
            self.read_at(from_tier, since_seq, days=days)
        )
        unit = self.part_unit(from_tier)
        self.propagate(
            changed.select("metric", "ts"),
            from_tier,
            bounds=(min(days) * unit, (max(days) + 1) * unit - 1),
        )
        return upto

    # -- fetch (R1-R3) ----------------------------------------------------

    def fetch(
        self, metrics, from_time: int, until_time: int, now: int,
        version: int | None = None,
    ) -> DataFrame | None:
        """Tier-selected, clamped, grid-filled read — the scan goes
        through ``read_range`` so the day partitions outside the window
        are pruned before any IO (R1-R3 with partition pruning).
        ``version`` pins a historical manifest seq (see :meth:`read`):
        the same render query replayed against yesterday's committed
        snapshot."""
        from kenshin_spark.operators.fetch import (
            clamp_range,
            grid_fill,
            roundup,
            select_archive,
        )

        archives = list(self.schema.archives)
        clamped = clamp_range(
            from_time, until_time, now, archives[-1].retention
        )
        if clamped is None:
            return None
        from_time, until_time = clamped
        idx = select_archive(archives, from_time, now)
        step = archives[idx].sec_per_point
        pts = self.read_range(
            idx, roundup(from_time, step), roundup(until_time, step),
            version=version,
        )
        return grid_fill(pts, metrics, from_time, until_time, step)

    def fetch_glob(
        self, target: str, from_time: int, until_time: int, now: int
    ) -> DataFrame | None:
        """Graphite render-target entry point: resolve a glob target
        (``sys.cpu.*``, ``app.{web,api}.latency``) against the metric
        namespace — the catalog when present (tiny dim scan), else the
        tier-0 metric column — then fetch the matching series. The
        resolved set stays a DataFrame end-to-end (no driver collect);
        grid-fill crosses it with the slot sequence."""
        from kenshin_spark.operators.maintenance import glob_to_regex

        pat = glob_to_regex(target)
        src = self.catalog() if self._has_catalog() else self.read(0)
        metrics = (
            src.select("metric").where(F.col("metric").rlike(pat)).distinct()
        )
        return self.fetch(metrics, from_time, until_time, now)

    # -- compaction -------------------------------------------------------

    def file_report(self, i: int) -> list[dict]:
        """Small-file audit for tier i: one row per day partition with
        ``{"day", "n_files", "bytes", "min_file_bytes"}``, sorted by
        day. This is the IO-shape health check the reference never
        needs (its preallocated .hs files can't fragment,
        README.md:63-71) but a COW/MOR parquet store must watch:
        every micro-batch upsert adds ~one file per touched (day ×
        shuffle task), and scan cost degrades with file COUNT long
        before it degrades with bytes (per-file open + footer read ≈
        ``openCostInBytes`` each). Driver cost is one listing per day
        partition — bounded by retention/partition-unit, not data."""
        path = self.tier_path(i)
        if self._manifest_mode:
            # the manifest already knows every live file and size — the
            # audit is a dict walk, no listing at all (and retired files
            # awaiting vacuum never pollute the shape)
            by_day: dict[int, list[int]] = {}
            for rel, size in self.commit.live_files(f"tier={i}"):
                part = rel.split("/")[1]
                if part.startswith("day="):
                    by_day.setdefault(int(part[4:]), []).append(size)
            return [
                {
                    "day": d,
                    "n_files": len(sizes),
                    "bytes": sum(sizes),
                    "min_file_bytes": min(sizes),
                }
                for d, sizes in sorted(by_day.items())
            ]
        report = []
        for name in sorted(self.fs.list_names(path)):
            if not name.startswith("day="):
                continue
            files = [
                (n, sz)
                for n, sz in self.fs.list_files(os.path.join(path, name))
                if n.endswith(".parquet")
            ]
            if not files:
                continue
            sizes = [sz for _, sz in files]
            report.append(
                {
                    "day": int(name.split("=", 1)[1]),
                    "n_files": len(files),
                    "bytes": sum(sizes),
                    "min_file_bytes": min(sizes),
                }
            )
        return report

    @staticmethod
    def day_degraded(
        r: dict,
        max_files_per_day: int = 8,
        min_file_bytes: int = 8 << 20,
    ) -> bool:
        """The audit predicate over one ``file_report`` row: more than
        ``max_files_per_day`` files, or any file smaller than
        ``min_file_bytes`` while the partition has more than one (a
        lone small file is just a small day)."""
        return r["n_files"] > max_files_per_day or (
            r["n_files"] > 1 and r["min_file_bytes"] < min_file_bytes
        )

    def needs_compaction(
        self,
        i: int,
        max_files_per_day: int = 8,
        min_file_bytes: int = 8 << 20,
        report: list[dict] | None = None,
    ) -> list[int]:
        """Days of tier i whose file shape has degraded
        (``day_degraded``). Feed the result to ``compact(i, days=...)``
        — the maintenance loop's predicate. Pass a precomputed
        ``report`` to avoid re-listing the tier."""
        if report is None:
            report = self.file_report(i)
        return [
            r["day"]
            for r in report
            if self.day_degraded(r, max_files_per_day, min_file_bytes)
        ]

    def compact(
        self,
        i: int,
        target_files_per_day: int = 1,
        days: list[int] | None = None,
    ) -> list[int] | None:
        """Rewrite tier i's day partitions into ``target_files_per_day``
        files each. Repeated micro-batch upserts leave one file per
        (day × shuffle task × batch); compaction restores the
        one-sequential-file-per-period shape the reference gets for free
        from its preallocated format (README.md:63-66). Run it like the
        reference's maintenance scripts — off the hot path.

        ``days`` bounds the rewrite to those day partitions, each
        swapped independently under the ``.bak`` protocol — the
        production shape: under steady streaming ingest only the
        last hour/day fragments (``needs_compaction`` finds them), and
        compacting a 90-day tier to fix one hot day would rewrite 90×
        the necessary bytes. ``days=None`` keeps the full-tier rewrite
        (initial cleanup / schema maintenance).

        Returns the days actually compacted when ``days`` is given
        (requested days absent from this tier are skipped, not
        reported), else None for the full rewrite."""
        path = self.tier_path(i)
        if self._tier_empty(path):
            return [] if days is not None else None
        if self._manifest_mode:
            return self._compact_manifest(i, target_files_per_day, days)
        if days is not None:
            # two-phase: stage every day's rewrite first (the expensive
            # Spark jobs, non-destructive), then promote ALL of them
            # under ONE guard. A maintenance pass compacting ~190
            # fragmented days used to flip the epoch 380 times — with a
            # transition every ~200 ms, any serving scan longer than
            # that raced SOME swap on every attempt and went retry-bound
            # (~20 s p95 in the 1M load capture). Batched, readers see
            # at most one transition per maintenance pass, and the guard
            # window is the renames only (ms per day), never the writes.
            staged = []
            for d in days:
                prep = self._stage_day_compact(i, d, target_files_per_day)
                if prep is not None:
                    staged.append((d, prep))
            if not staged:
                return []
            with self._swap_guard():
                for _, prep in staged:
                    self._promote_day_compact(*prep)
            return [d for d, _ in staged]
        raw = self.spark.read.parquet(path)
        if "_seq" in raw.columns:
            # fold the mor append log to one row per slot, stamp 0
            df = (
                raw.groupBy("metric", "ts", "day")
                .agg(F.max(F.struct("_seq", "value")).alias("_w"))
                .select(
                    "metric", "ts", F.col("_w.value").alias("value"),
                    "day", F.lit(0).alias("_seq"),
                )
            )
        else:
            df = raw.select("metric", "ts", "value", "day")
        tmp = path + ".compact"
        if target_files_per_day == 1:
            shaped = df.repartition("day")  # each day → exactly one task
        else:
            shaped = df.repartition(
                "day", F.pmod(F.xxhash64("metric"), F.lit(target_files_per_day))
            )
        (
            # day first: the partitioned writer's required ordering is a
            # day prefix — satisfying it keeps the writer from inserting
            # its own (unstable) re-sort that would undo (metric, ts)
            shaped.sortWithinPartitions("day", "metric", "ts")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(tmp)
        )
        # .bak swap protocol (fs.py): a crash mid-swap is recoverable via
        # recover(), never a half-deleted tier
        with self._swap_guard():
            self.fs.swap(path, tmp)

    def _fold_log(self, raw: DataFrame, with_day: bool) -> DataFrame:
        """Collapse a mor append log to one row per slot (stamp 0); pass
        cow frames through. The shared kernel of every compaction path."""
        keys = ["metric", "ts"] + (["day"] if with_day else [])
        if "_seq" not in raw.columns:
            cols = keys[:2] + ["value"] + (["day"] if with_day else [])
            return raw.select(*cols)
        return (
            raw.groupBy(*keys)
            .agg(F.max(F.struct("_seq", "value")).alias("_w"))
            .select(
                "metric", "ts", F.col("_w.value").alias("value"),
                *(["day"] if with_day else []),
                F.lit(0).alias("_seq"),
            )
        )

    def _compact_manifest(
        self, i: int, target_files_per_day: int, days: list[int] | None
    ) -> list[int] | None:
        """Manifest-mode compaction: every rewrite is staged + adopted
        invisibly, then ONE transaction retires the old files and
        commits the new — no ``.bak`` dance, no guard, and readers
        mid-scan keep their snapshot (old files persist until
        ``vacuum``). ``days=None`` rewrites the whole tier shaped like
        the listing-mode full compact; ``days=[...]`` folds each day to
        ``target_files_per_day`` files."""
        path = self.tier_path(i)
        # the folds below are planned from THIS snapshot: pin it so a
        # concurrent writer's append to a folded partition raises
        # ManifestConflict instead of being silently retired un-folded
        read_seq = self.commit.epoch()
        if days is None:
            raw = self._scan_tier(path)
            df = self._fold_log(raw, with_day=True)
            if target_files_per_day == 1:
                shaped = df.repartition("day")
            else:
                shaped = df.repartition(
                    "day",
                    F.pmod(F.xxhash64("metric"), F.lit(target_files_per_day)),
                )
            adds = self._adopt(
                shaped.sortWithinPartitions("day", "metric", "ts"), path
            )
            with self.commit.txn(read_seq=read_seq, op="compact") as tx:
                tx.replace(f"tier={i}", adds)
            return None
        # ONE fold job over every requested day (was: one scan + fold +
        # write job PER day — a maintenance pass over ~90 fragmented
        # days paid ~90 sequential Spark jobs; the measured 1M-point
        # bench maintenance spent >3 min here). The day-partitioned
        # rewrite keeps the exact per-day output shape: repartition by
        # day (plus a metric hash for target>1) gives each day its own
        # task(s), and the transaction still retires/commits each day
        # independently, so crash/conflict semantics are unchanged.
        live = set(self._live_days(i))
        wanted = sorted(d for d in days if d in live)
        if not wanted:
            return []
        raw = self._scan_tier(path).where(F.col("day").isin(wanted))
        df = self._fold_log(raw, with_day=True)
        if target_files_per_day == 1:
            shaped = df.repartition("day")
        else:
            shaped = df.repartition(
                "day",
                F.pmod(F.xxhash64("metric"), F.lit(target_files_per_day)),
            )
        adds = self._adopt(
            shaped.sortWithinPartitions("day", "metric", "ts"), path
        )
        by_day: dict[int, list[tuple[str, int]]] = {}
        for rel, size in adds:
            day_part = rel.split("/")[1]
            by_day.setdefault(int(day_part[4:]), []).append((rel, size))
        with self.commit.txn(read_seq=read_seq, op="compact") as tx:
            for d in wanted:
                tx.replace(f"tier={i}/day={d}", by_day.get(d, []))
        return wanted

    def _stage_day_compact(
        self, i: int, day: int, target_files_per_day: int
    ) -> tuple[str, str, str] | None:
        """Phase 1 of a day compaction — the EXPENSIVE, non-destructive
        part, run outside any guard: read just that ``day=`` directory
        (files inside it don't carry the partition column), fold the mor
        log if present, rewrite as ``target_files_per_day`` sorted files
        into an underscore-staged tmp dir. Slots never span days, so
        folding one day's log is exactly as correct as folding the
        tier's. Returns ``(day_dir, tmp, bak)`` for phase 2, or None
        when the partition doesn't exist."""
        path = self.tier_path(i)
        day_dir = os.path.join(path, f"day={day}")
        if not self.fs.exists(day_dir):
            return None
        raw = self.spark.read.parquet(day_dir)
        if "_seq" in raw.columns:
            df = (
                raw.groupBy("metric", "ts")
                .agg(F.max(F.struct("_seq", "value")).alias("_w"))
                .select(
                    "metric", "ts", F.col("_w.value").alias("value"),
                    F.lit(0).alias("_seq"),
                )
            )
        else:
            df = raw.select("metric", "ts", "value")
        # staging names are underscore-prefixed so Spark's partition
        # discovery never sees them (a literal "day=5.bak" sibling
        # would poison day's inferred type for the whole tier)
        tmp = os.path.join(path, f"_day_{day}.compact")
        bak = os.path.join(path, f"_day_{day}.bak")
        (
            df.repartition(target_files_per_day)
            .sortWithinPartitions("metric", "ts")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        if self.fs.exists(bak):  # debris from a crash after promote
            self.fs.delete(bak)
        return day_dir, tmp, bak

    def _promote_day_compact(self, day_dir: str, tmp: str, bak: str) -> None:
        """Phase 2 — the destructive renames; caller holds the guard."""
        if not self.fs.rename(day_dir, bak):
            raise IOError(f"compact: could not stage {day_dir} -> {bak}")
        if not self.fs.rename(tmp, day_dir):
            self.fs.rename(bak, day_dir)  # roll back
            raise IOError(f"compact: could not promote {tmp} -> {day_dir}")
        self.fs.delete(bak)

    def _compact_day(
        self, i: int, day: int, target_files_per_day: int
    ) -> bool:
        """Compact ONE day partition in place (stage + promote under its
        own guard). ``compact(days=[...])`` batches the promotes of many
        days under a single guard instead — see there."""
        prep = self._stage_day_compact(i, day, target_files_per_day)
        if prep is None:
            return False
        with self._swap_guard():  # seqlock: renames only, not the write
            self._promote_day_compact(*prep)
        return True

    # -- delete (M5) ------------------------------------------------------

    def delete_metrics(self, metrics: list[str]) -> None:
        """M5 — delete metrics' rows from every tier
        (bin/kenshin-delete.py:39-96 blanks header slots; with real tables
        we actually remove the rows). Plain-Parquet implementation rewrites
        each tier without the deleted metrics; on Delta/Iceberg this is a
        metadata-level ``DELETE WHERE metric IN (...)``."""
        if self._manifest_mode:
            # one transaction across every tier AND the catalog — the
            # delete is all-or-nothing, which the per-directory swap
            # protocol below can't promise
            with self.commit.txn(op="delete") as tx:
                for i in range(len(self.schema.archives)):
                    path = self.tier_path(i)
                    if self._tier_empty(path):
                        continue
                    kept = self._scan_tier(path).where(
                        ~F.col("metric").isin(metrics)
                    )
                    tx.replace(f"tier={i}", self._adopt(kept, path))
                if self.commit.live_files("_catalog"):
                    kept_cat = self.catalog().where(
                        ~F.col("metric").isin(metrics)
                    )
                    tx.replace(
                        "_catalog",
                        self._adopt(
                            kept_cat, self.catalog_path, partitioned=False
                        ),
                    )
            return
        for i in range(len(self.schema.archives)):
            path = self.tier_path(i)
            if self._tier_empty(path):
                continue
            raw = self._scan_tier(path)
            kept = raw.where(~F.col("metric").isin(metrics)).select(
                *raw.columns
            )
            tmp = path + ".tmp"
            kept.write.mode("overwrite").partitionBy("day").parquet(tmp)
            with self._swap_guard():
                self.fs.swap(path, tmp)
        cat_path = self.catalog_path
        if self.fs.exists(cat_path):
            kept_cat = self.catalog().where(~F.col("metric").isin(metrics))
            tmp = cat_path + ".tmp"
            kept_cat.write.mode("overwrite").parquet(tmp)
            with self._swap_guard():
                self.fs.swap(cat_path, tmp)

    def recover(self) -> list[str]:
        """Crash recovery for interrupted ``compact``/``delete_metrics``
        swaps: restore any ``.bak`` whose live directory is missing
        (reference analog: the change-schema .bak dance,
        bin/kenshin-change-schema.py:103-112). Returns restored paths.
        Call on store open after an unclean shutdown."""
        restored = []
        for i in range(len(self.schema.archives)):
            p = self.tier_path(i)
            if self.fs.recover_swap(p):
                restored.append(p)
            # per-day compaction swaps: a crash between stage and
            # promote leaves _day_<d>.bak with no day=<d> — without
            # recovery the tier read silently drops that day
            for name in self.fs.list_names(p):
                if name.startswith("_day_") and name.endswith(".bak"):
                    d = name[len("_day_"): -len(".bak")]
                    live = os.path.join(p, f"day={d}")
                    bak = os.path.join(p, name)
                    if not self.fs.exists(live):
                        if self.fs.rename(bak, live):
                            restored.append(live)
                    else:  # crash after promote, before bak delete
                        self.fs.delete(bak)
                elif name.startswith("_day_") and name.endswith(".compact"):
                    self.fs.delete(os.path.join(p, name))  # stale tmp
        if self.fs.recover_swap(self.catalog_path):
            restored.append(self.catalog_path)
        return restored

    # -- catalog (M1, the index) ------------------------------------------

    @property
    def catalog_path(self) -> str:
        return os.path.join(self.root, "_catalog")

    def _has_catalog(self) -> bool:
        if self._manifest_mode:
            return bool(self.commit.live_files("_catalog"))
        return self.fs.exists(self.catalog_path)

    def catalog(self) -> DataFrame:
        if self._manifest_mode:
            files = self._plan_abs(self.catalog_path)
            if not files:
                return self.spark.createDataFrame([], CATALOG_SCHEMA)
            with _explicit_list_planning(self.spark):
                return self.spark.read.schema(CATALOG_SCHEMA).parquet(
                    *files
                )
        if not self.fs.exists(self.catalog_path):
            return self.spark.createDataFrame([], CATALOG_SCHEMA)
        # explicit schema: no planning-time footer read (see _tier_schema)
        return self.spark.read.schema(CATALOG_SCHEMA).parquet(
            self.catalog_path
        )

    def catalog_add(self, rows: DataFrame) -> None:
        shaped = rows.select(
            F.col("metric").cast("string"),
            F.col("schema_name").cast("string"),
            F.col("created_ts").cast("long"),
        )
        if self._manifest_mode:
            adds = self._adopt(shaped, self.catalog_path, partitioned=False)
            with self.commit.txn(op="catalog") as tx:
                for rel, size in adds:
                    tx.add(rel, size)
            return
        shaped.write.mode("append").parquet(self.catalog_path)
