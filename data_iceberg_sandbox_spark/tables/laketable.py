"""Snapshot-versioned lakehouse tables over parquet ("LakeTable").

Re-expresses the reference's Iceberg table lifecycle (SURVEY §2.1-2.8;
reference: etl/src/apps/load_people/create_table.py:92-104 partitioned
create + mergeInto; etl/src/apps/analytics/count_clients.py:29-44 keyed
upsert + identifier fields; infra/README.md:85 snapshots & compaction;
etl/dbtrisingwave/models/finance/sink_iceberg_fraud_alerts_client.sql:23-26
compaction cadence + retain-last-5 snapshot expiry) as a self-contained
Spark-first layer — the image ships no Iceberg runtime jar (when one is
present, session.py wires the real `SparkCatalog` instead).

Design — a deliberately small subset of the Iceberg spec:

    <warehouse>/<namespace>/<table>/
        data/<commit-uuid>/...parquet      immutable data files
        _manifests/v<N>.json               immutable snapshot manifests
        _current                           pointer file, atomic os.replace

A manifest lists the *complete* file set of its snapshot plus schema,
partition spec, properties, operation and parent version. Readers resolve
``_current`` (or an explicit version / timestamp → time travel, D6) and
hand the file list to one ``spark.read.parquet(*files)`` call — listing
is O(manifest), not O(directory), and partition values are recovered via
``basePath`` so Catalyst still prunes hive-style partition directories.

Commits are optimistic: writers stage data files under a fresh uuid dir,
write manifest v(N+1), then atomically swing ``_current`` from the
version they read — a concurrent commit in between raises
``CommitConflict`` (retry at the caller, same contract as Iceberg's
REST-catalog CAS).

Scale notes (100 TB): data-file writes are plain distributed parquet
writes (no driver data path); MERGE is copy-on-write implemented as
anti/inner/anti joins shuffled on the merge key — the same shape
Iceberg's COW MERGE produces — with the small source side broadcast by
AQE when it fits. Manifest JSON on the driver holds file paths only;
at 100 TB with ~1 GB files that's ~10^5 entries — fine. Compaction
(D7) and snapshot expiry (D8) mirror ``rewrite_data_files`` /
``expire_snapshots`` procedures.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field, replace as _dc_replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# How long a tag writer waits for the tags lock before declaring a
# conflict (module-level so tests can shrink it).
TAGS_LOCK_TIMEOUT_SEC = 10.0
# a manifest slot ahead of the pointer, untouched this long, is a dead
# writer's debris and may be reclaimed by the next committer
STALE_MANIFEST_GRACE_SEC = 60.0


class CommitConflict(RuntimeError):
    """Another writer committed since this snapshot was read."""


class NoSuchTable(RuntimeError):
    pass


class MergeCardinalityError(RuntimeError):
    """MERGE source matched a target row more than once (Iceberg
    cardinality contract: each target row may match at most one source
    row; duplicate source keys would silently fan out the target)."""


class IncrementalReadError(RuntimeError):
    """The snapshot range contains a non-append commit: its file delta
    rewrites existing rows, so it is not an append changelog (Iceberg's
    incremental scan has the same appends-only restriction)."""


def _hive_layout(f: str) -> tuple:
    """A file's partition layout = its hive path segment column names.
    Partition-spec evolution (metadata-only) leaves files of older
    layouts in place, and Spark needs a consistent directory structure
    per scan, so mixed-spec file lists scan one group per layout."""
    return tuple(seg.split("=", 1)[0] for seg in f.split("/") if "=" in seg)


@dataclass
class Manifest:
    version: int
    parent: int | None
    operation: str
    timestamp_ms: int
    schema_json: str
    partition_by: list[str]
    files: list[str]  # relative to table root
    properties: dict[str, str] = field(default_factory=dict)
    # per-file column ranges for scan pruning: path → col → [min, max]
    # (numeric/string columns; Iceberg manifest-stats analog)
    file_stats: dict[str, dict[str, list]] = field(default_factory=dict)
    # merge-on-read equality deletes (Iceberg v2 analog): sidecar path →
    # sequence number; a sidecar suppresses matching rows in every data
    # file whose own sequence is STRICTLY BELOW the sidecar's — so rows
    # appended after the delete, or written by the sidecar's own
    # upsert commit, are never suppressed by it
    delete_files: dict[str, int] = field(default_factory=dict)
    # data file → sequence (the version that first added it); files from
    # manifests predating this field default to their manifest's version
    file_seq: dict[str, int] = field(default_factory=dict)
    # per-commit writer fence (r13): a uuid stamped by the committing
    # writer, making every manifest payload unique. The stale-slot
    # reclaim in `_commit` is a LEASE, and leases need fencing — a
    # slow-but-alive writer whose slot was reclaimed must not delete
    # the competitor's committed manifest nor swing the pointer onto
    # it. Old manifests (pre-field) parse with the "" default.
    writer: str = ""

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---- paths -----------------------------------------------------------
    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    @property
    def _current_path(self) -> str:
        return os.path.join(self.root, "_current")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"v{version}.json")

    # ---- snapshot access -------------------------------------------------
    def exists(self) -> bool:
        return os.path.exists(self._current_path)

    def current_version(self) -> int:
        if not self.exists():
            raise NoSuchTable(self.root)
        with open(self._current_path, encoding="utf-8") as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> Manifest:
        v = self.current_version() if version is None else version
        path = self._manifest_path(v)
        if not os.path.exists(path):
            raise NoSuchTable(f"snapshot v{v} of {self.root} (expired or absent)")
        with open(path, encoding="utf-8") as f:
            return Manifest.from_json(f.read())

    def snapshots(self) -> list[Manifest]:
        """D6 snapshot metadata (like Iceberg's `t.snapshots` table).

        Only versions at or below the current pointer are snapshots: a
        v(N+1).json with the pointer still at N is the debris of a
        writer that crashed between the manifest write and the pointer
        swing — it was never committed, must not be time-travel-visible,
        and must not count toward expire_snapshots' retain window (r12
        review; _commit reclaims the slot after a staleness grace)."""
        if not os.path.isdir(self._manifest_dir):
            return []
        cur = self.current_version() if self.exists() else -1
        out = []
        for fn in sorted(os.listdir(self._manifest_dir)):
            if fn.startswith("v") and fn.endswith(".json"):
                with open(os.path.join(self._manifest_dir, fn), encoding="utf-8") as f:
                    m = Manifest.from_json(f.read())
                if cur < 0 or m.version <= cur:
                    out.append(m)
        return sorted(out, key=lambda m: m.version)

    def version_as_of_timestamp(self, ts_ms: int) -> int:
        """D6 `TIMESTAMP AS OF` resolution."""
        eligible = [m.version for m in self.snapshots() if m.timestamp_ms <= ts_ms]
        if not eligible:
            raise NoSuchTable(f"no snapshot of {self.root} at/before {ts_ms}")
        return max(eligible)

    # ---- read ------------------------------------------------------------
    def read(
        self,
        version: int | None = None,
        as_of_timestamp_ms: int | None = None,
        prune: list[tuple[str, str, object]] | None = None,
    ) -> DataFrame:
        """S1 scan / D6 time travel.

        `prune` = [(col, op, value), ...] with op in <,<=,>,>=,= —
        manifest-stats file skipping (the Iceberg min/max-pruning
        analog): files whose [min,max] range cannot satisfy every
        predicate are dropped from the scan BEFORE Spark lists them.
        Purely an optimization — callers still apply the real filter;
        a file without stats is conservatively kept."""
        if as_of_timestamp_ms is not None:
            version = self.version_as_of_timestamp(as_of_timestamp_ms)
        man = self.manifest(version)
        return self._scan_manifest(man, prune)

    def _scan_manifest(
        self,
        man: "Manifest",
        prune: list[tuple[str, str, object]] | None = None,
    ) -> DataFrame:
        """Shared scan body for read() and read_staged(): file pruning,
        layout grouping, and merge-on-read delete application."""
        schema = T.StructType.fromJson(json.loads(man.schema_json))
        files = man.files
        if prune:
            files = [
                f for f in files if _file_may_match(man.file_stats.get(f), prune)
            ]
        if not files:
            return self.spark.createDataFrame([], schema)
        cols = [f.name for f in schema.fields]
        layouts = {_hive_layout(f) for f in files}
        if not man.delete_files and len(layouts) == 1:
            return self._scan_files(schema, files)
        # Group data files by (partition layout, applicable delete set)
        # and scan each group once.
        # - layout: files written under different partition specs cannot
        #   share one scan (mixed hive depths under one basePath).
        # - deletes (merge-on-read): each group LEFT ANTI joins the
        #   equality-delete sidecars that apply to it (file seq <
        #   sidecar seq) — the Iceberg v2 read shape (the sidecar side
        #   is small and broadcasts). Files appended after a delete
        #   carry a higher seq, so re-inserted keys are never
        #   suppressed by older deletes.
        groups: dict[tuple, list[str]] = {}
        for f in files:
            fseq = man.file_seq.get(f, man.version)
            key = (
                _hive_layout(f),
                tuple(
                    sorted(d for d, ds in man.delete_files.items() if fseq < ds)
                ),
            )
            groups.setdefault(key, []).append(f)
        parts = []
        for (_lay, dels), flist in groups.items():
            df = self._scan_files(schema, flist)
            for d in dels:
                keys = self.spark.read.parquet(os.path.join(self.root, d))
                missing = [c for c in keys.columns if c not in cols]
                if missing:
                    raise RuntimeError(
                        f"equality-delete sidecar {d} references dropped "
                        f"column(s) {missing}; compact() before dropping "
                        "delete-key columns"
                    )
                # Size-gated hint (r13, q8 fix class): a sidecar is
                # usually tiny, but a bulk delete/upsert can write a
                # huge one — past the cap leave the anti-join unhinted
                # so AQE picks a shuffle join instead of blowing the
                # broadcast limit. path_bytes fails CLOSED (+inf) on
                # anything unstatable (r13 review: a hand-rolled walk
                # here returned 0 for a vanished dir — fail-open).
                from ..functions.sizing import (
                    BROADCAST_DIM_CAP_BYTES,
                    path_bytes,
                )

                if (
                    path_bytes(os.path.join(self.root, d))
                    <= BROADCAST_DIM_CAP_BYTES
                ):
                    keys = F.broadcast(keys)
                df = df.join(
                    keys, on=list(keys.columns), how="left_anti"
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_incremental(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Iceberg-style incremental append scan: the rows ADDED by the
        snapshots in ``(from_version, to_version]`` (to defaults to
        current) — the CDC feed a downstream consumer reads to catch up
        from a checkpointed version.

        Scans ONLY each snapshot's newly-added files (set difference vs
        its parent manifest), never the table history — at 100 TB a
        catch-up of 3 appends reads 3 appends' worth of data, not the
        table. Raises :class:`IncrementalReadError` if the range holds a
        non-append commit with a file delta (merge/overwrite/delete/
        compact rewrite rows in place; their delta is not an append
        changelog — Iceberg's incremental scan has the same
        restriction). Metadata-only commits (schema evolution, property
        changes) add no files and pass through. Raises
        :class:`NoSuchTable` if a manifest in the range was expired."""
        to_v = self.current_version() if to_version is None else to_version
        if to_v < from_version:
            raise ValueError(f"to_version {to_v} < from_version {from_version}")
        prev = set(self.manifest(from_version).files)
        new_files: list[str] = []
        for v in range(from_version + 1, to_v + 1):
            man = self.manifest(v)
            delta = [f for f in man.files if f not in prev]
            if man.operation == "delete-mor":
                # metadata-only commit, but it REMOVES rows: an
                # appends-only changelog cannot represent it
                raise IncrementalReadError(
                    f"snapshot v{v} is a merge-on-read delete; "
                    "incremental read supports appends only"
                )
            # publish_staged_append is an append by construction (the
            # WAP publish promotes staged new files; changes_between
            # already classifies it as insert-kind) — r12 review
            if delta and man.operation not in (
                "create", "append", "publish_staged_append"
            ):
                raise IncrementalReadError(
                    f"snapshot v{v} is a '{man.operation}' commit; "
                    "incremental read supports appends only"
                )
            new_files.extend(delta)
            prev = set(man.files)
        schema = T.StructType.fromJson(
            json.loads(self.manifest(to_v).schema_json)
        )
        if not new_files:
            return self.spark.createDataFrame([], schema)
        return self._scan_files(schema, new_files)

    def _scan_files(self, schema: T.StructType, flist: list[str]) -> DataFrame:
        """One distributed scan over a concrete file list (single hive
        layout); column order pinned to the table schema."""
        reader = self.spark.read.schema(schema).option(
            "basePath", os.path.join(self.root, "data")
        )
        paths = [os.path.join(self.root, f) for f in flist]
        return reader.parquet(*paths).select([f.name for f in schema.fields])

    def _scan_file_subset(self, man: "Manifest", files: list[str]) -> DataFrame:
        """One distributed scan over a manifest file subset, grouped by
        hive partition layout (mixed-spec tables carry files of older
        layouts; read() handles the delete-sidecar grouping on top of
        the same helpers)."""
        schema = T.StructType.fromJson(json.loads(man.schema_json))
        if not files:
            return self.spark.createDataFrame([], schema)
        groups: dict[tuple, list[str]] = {}
        for f in files:
            groups.setdefault(_hive_layout(f), []).append(f)
        parts = [self._scan_files(schema, flist) for flist in groups.values()]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # Commits whose rewrite is row-identical by construction: they
    # re-shape files (clustering, sizing, partition layout) or
    # materialize already-visible deletes without changing table
    # CONTENT, so they contribute no changelog rows.
    _REWRITE_OPS = frozenset(
        {"compact", "rewrite-sorted", "rewrite-zorder", "evolve-partition"}
    )

    def changes_between(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level CDC changelog for ``(from_version, to_version]`` —
        the Iceberg ``create_changelog_view`` / Delta Change Data Feed
        analog: every table column plus ``_change_type``
        ('insert' | 'delete'; an update surfaces as its delete+insert
        pair) and ``_commit_version``. Unlike :meth:`read_incremental`
        (appends only), this replays EVERY commit kind.

        Cost model, per commit in the range — sized for 100 TB tables:
        - create/append/staged publish: scans ONLY the appended files
          (an append never suppresses or rewrites existing rows).
        - copy-on-write merge/delete/overwrite with no live equality
          sidecars: net multiset diff (``exceptAll``) of the commit's
          FILE DELTA — unchanged files are never read, and rewritten-
          but-identical rows cancel out of the changelog.
        - merge-on-read commits, rollbacks, and COW under live
          sidecars: multiset diff of the two adjacent snapshot reads.
          Equality sidecars store KEYS, not rows — recovering deleted
          row content inherently re-reads the rows they erased
          (Iceberg's changelog for equality deletes pays the same).
        - compact / clustering rewrites / partition-spec evolution:
          row-identical by construction — skipped, no scan at all.

        Raises :class:`IncrementalReadError` if the range crosses a
        schema change (one frame cannot carry two schemas — split the
        range at that version) and :class:`NoSuchTable` if a manifest
        in the range was expired."""
        to_v = self.current_version() if to_version is None else to_version
        if to_v < from_version:
            raise ValueError(
                f"to_version {to_v} < from_version {from_version}"
            )
        if from_version == 0:
            # versions start at 1 (create); from=0 means "from the
            # empty table", so the create commit itself is in range.
            # Schema/partitioning for the synthetic empty base come from
            # the FIRST LIVE manifest ≤ to_v (v1 itself may be expired;
            # r12 review — the old expression was an obfuscated
            # manifest(1) that failed after expiry).
            first = next(
                (m for m in self.snapshots() if m.version <= to_v),
                None,
            ) or self.manifest(to_v)
            base = Manifest(
                version=0,
                parent=None,
                operation="empty",
                timestamp_ms=0,
                schema_json=first.schema_json,
                partition_by=first.partition_by,
                files=[],
            )
        else:
            base = self.manifest(from_version)
        schema = T.StructType.fromJson(json.loads(base.schema_json))
        out_schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_version", T.IntegerType(), False),
            ]
        )

        def _tag(df: DataFrame, kind: str, v: int) -> DataFrame:
            return df.select(
                *[f.name for f in schema.fields],
                F.lit(kind).alias("_change_type"),
                F.lit(v).cast("int").alias("_commit_version"),
            )

        parts: list[DataFrame] = []
        prev_man = base
        for v in range(from_version + 1, to_v + 1):
            man = self.manifest(v)
            if man.schema_json != base.schema_json:
                raise IncrementalReadError(
                    f"snapshot v{v} ({man.operation}) changes the table "
                    "schema; a changelog across schema versions is not "
                    f"representable as one frame — split the range at v{v}"
                )
            op = man.operation
            prev_files = set(prev_man.files)
            cur_files = set(man.files)
            adds = [f for f in man.files if f not in prev_files]
            drops = [f for f in prev_man.files if f not in cur_files]
            if op in self._REWRITE_OPS or (
                not adds
                and not drops
                and man.delete_files == prev_man.delete_files
            ):
                prev_man = man
                continue
            if op in ("create", "append", "publish_staged_append"):
                if adds:
                    parts.append(
                        _tag(self._scan_file_subset(man, adds), "insert", v)
                    )
            elif op in ("overwrite", "merge", "delete") and not (
                man.delete_files or prev_man.delete_files
            ):
                a = self._scan_file_subset(man, adds)
                d = self._scan_file_subset(prev_man, drops)
                parts.append(_tag(a.exceptAll(d), "insert", v))
                parts.append(_tag(d.exceptAll(a), "delete", v))
            else:
                cur_df = self.read(version=v)
                old_df = self.read(version=v - 1)
                parts.append(_tag(cur_df.exceptAll(old_df), "insert", v))
                parts.append(_tag(old_df.exceptAll(cur_df), "delete", v))
            prev_man = man
        if not parts:
            return self.spark.createDataFrame([], out_schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def snapshot_diff(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Candidate rows for a version-to-version content diff, tagged
        ``_src`` = +1 (rows scanned from to-version-only files) / −1
        (from-version-only files). Files present in BOTH manifests carry
        identical rows, contribute zero net under any keyed/multiset
        netting, and are NEVER read — on a 100 TB table where a few
        commits touched a few files, the diff scans the file delta, not
        two table snapshots. Callers net by key (Σ_src = 0 drops) or by
        whole row. Falls back to two full version reads only under live
        equality-delete sidecars (suppression is version-dependent
        per-row, not per-file). Raises IncrementalReadError across a
        schema change, like :meth:`changes_between`."""
        to_v = self.current_version() if to_version is None else to_version
        m_from, m_to = self.manifest(from_version), self.manifest(to_v)
        if m_from.schema_json != m_to.schema_json:
            raise IncrementalReadError(
                f"snapshot v{from_version}→v{to_v} crosses a schema "
                "change; diff each schema era separately"
            )
        if m_from.delete_files or m_to.delete_files:
            plus = self.read(version=to_v)
            minus = self.read(version=from_version)
        else:
            from_set, to_set = set(m_from.files), set(m_to.files)
            plus = self._scan_file_subset(
                m_to, [f for f in m_to.files if f not in from_set]
            )
            minus = self._scan_file_subset(
                m_from, [f for f in m_from.files if f not in to_set]
            )
        return plus.withColumn("_src", F.lit(1)).unionByName(
            minus.withColumn("_src", F.lit(-1))
        )

    def remove_orphan_files(self, older_than_ms: int | None = None) -> list[str]:
        """Iceberg ``remove_orphan_files`` analog: delete data files on
        disk that no live snapshot references — the debris of writes
        whose commit lost a CAS race or crashed between the data write
        and the manifest commit.

        ``older_than_ms`` (epoch millis) protects in-flight writers: a
        file younger than the cutoff is kept even if unreferenced,
        because its commit may simply not have happened yet (Iceberg's
        ``older_than`` has the same role; default keeps only files older
        than the newest live snapshot's timestamp).

        Live set = committed snapshots ∪ staged WAP manifests ∪ branch
        refs: a staged-but-unpublished append and an unlanded branch are
        referenced metadata (Iceberg treats wap/branch snapshots the
        same way), so their data files are NOT orphans regardless of
        cutoff. To GC an abandoned stage, drop its token first via
        ``expire_staged``; branches via ``drop_branch``."""
        mans = self.snapshots()
        if not mans:
            return []
        if older_than_ms is None:
            older_than_ms = mans[-1].timestamp_ms
        live = self._referenced_files(mans)
        removed: list[str] = []
        data_dir = os.path.join(self.root, "data")
        if not os.path.isdir(data_dir):
            return []
        for dirpath, _dirnames, filenames in os.walk(data_dir):
            for fn in filenames:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.root)
                if rel in live:
                    continue
                if os.path.getmtime(full) * 1000 >= older_than_ms:
                    continue  # possibly an in-flight commit's data
                os.remove(full)
                removed.append(rel)
        # a commit dir with no parquet left holds only write sidecars
        # (_SUCCESS, .crc) — debris; age-guarded like the files above
        self._prune_empty_commit_dirs(older_than_ms)
        return sorted(removed)

    def _referenced_files(self, mans: list["Manifest"]) -> set:
        """Every file any referenced metadata points at: committed
        snapshots' data files AND merge-on-read delete sidecars, plus
        the same for staged WAP manifests and branch refs (r12 review:
        the first cut omitted delete sidecars, so GC could delete a
        live MoR sidecar and every later read would crash — or, worse,
        resurrect the deleted rows)."""
        live: set = set()

        def add(m: "Manifest") -> None:
            live.update(m.files)
            for d in m.delete_files:
                # an equality-delete sidecar is a parquet DIRECTORY —
                # expand it so the per-file GC walk sees its parts
                full = os.path.join(self.root, d)
                if os.path.isdir(full):
                    for dp, _dn, fns in os.walk(full):
                        for fn in fns:
                            live.add(
                                os.path.relpath(os.path.join(dp, fn), self.root)
                            )
                live.add(d)

        for m in mans:
            add(m)
        for fn in os.listdir(self._manifest_dir):
            if fn.startswith(("staged_", "branch_")) and fn.endswith(".json"):
                try:
                    with open(
                        os.path.join(self._manifest_dir, fn), encoding="utf-8"
                    ) as fh:
                        add(Manifest.from_json(fh.read()))
                except (ValueError, OSError):
                    # truncated/corrupt ref = crash debris from a writer
                    # that never returned a token (stage/branch writes
                    # are tmp+rename, so this file was not produced by
                    # this code path completing). Its files can't be
                    # enumerated and were never referenced by a
                    # completed operation — skip it so GC keeps working;
                    # the age cutoff still protects anything genuinely
                    # in flight.
                    continue
        return live

    def files_scanned(self, prune: list[tuple[str, str, object]]) -> int:
        """How many current files a pruned scan would touch (test/metrics
        hook)."""
        man = self.manifest()
        return sum(
            1 for f in man.files if _file_may_match(man.file_stats.get(f), prune)
        )

    # ---- commit machinery ------------------------------------------------
    def _write_data_files(
        self,
        df: DataFrame,
        partition_by: list[str],
        properties: dict[str, str] | None = None,
    ) -> list[str]:
        """Write a commit's data files. The ``bloom.columns`` table
        property (comma-separated) turns on parquet-native split-block
        bloom filters for those columns — the point-lookup complement to
        manifest min/max stats: min/max skips whole FILES when the key
        is clustered (rewrite_sorted/rewrite_zorder layouts), blooms let
        the scan skip row groups for a pushed ``=`` predicate even when
        the key is scattered across every file (the GDPR / CDC
        single-key probe on an unclustered 100 TB table). Sizing comes
        from ``bloom.ndv.<col>`` (expected distinct keys per file;
        parquet defaults to 1M / ~1% FPR when absent). Bloom bytes live
        in the parquet footers, NOT the JSON manifest — manifests stay
        O(files), and readers that ignore blooms still read the files
        normally."""
        commit_dir = f"data/{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.root, commit_dir)
        writer = df.write.mode("overwrite")
        props = properties or {}
        bloom_cols = [
            c.strip()
            for c in props.get("bloom.columns", "").split(",")
            if c.strip()
        ]
        if bloom_cols:
            missing = [c for c in bloom_cols if c not in df.columns]
            if missing:
                raise ValueError(
                    f"bloom.columns {missing} not in table schema "
                    f"{df.columns}"
                )
            # partitionBy strips partition columns from the data files, so
            # a bloom on one would validate here but write zero bloom
            # bytes — the point lookup is already served by partition
            # pruning anyway, so this is always a config mistake
            shadowed = [c for c in bloom_cols if c in (partition_by or [])]
            if shadowed:
                raise ValueError(
                    f"bloom.columns {shadowed} are partition columns: "
                    "partition values never reach the parquet column "
                    "chunks (partition pruning already serves equality "
                    "probes on them)"
                )
            for c in bloom_cols:
                writer = writer.option(
                    f"parquet.bloom.filter.enabled#{c}", "true"
                )
                ndv = props.get(f"bloom.ndv.{c}")
                if ndv:
                    writer = writer.option(
                        f"parquet.bloom.filter.expected.ndv#{c}", ndv
                    )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        files = []
        for dirpath, _dirnames, filenames in os.walk(out):
            for fn in filenames:
                if fn.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(dirpath, fn), self.root)
                    files.append(rel)
        return sorted(files)

    def _collect_file_stats(
        self, files: list[str], schema_json: str, partition_by: list[str]
    ) -> dict[str, dict[str, list]]:
        """Per-file min/max for numeric and string columns, one Spark job
        (input_file_name groupBy) — written into the manifest, Iceberg-
        manifest-stats style. Partition columns are skipped (directory
        pruning already covers them)."""
        if not files:
            return {}
        schema = T.StructType.fromJson(json.loads(schema_json))
        stat_cols = [
            f.name
            for f in schema.fields
            if f.name not in partition_by
            and f.dataType.typeName()
            in ("integer", "long", "short", "byte", "float", "double", "string")
        ]
        if not stat_cols:
            return {}
        paths = [os.path.join(self.root, f) for f in files]
        # explicit schema: files predating an add_column lack the new
        # column (schema-on-read null-fills it; min=NULL → no stat entry),
        # and empty part-files simply produce no stats row (conservative)
        df = (
            self.spark.read.schema(schema)
            .option("basePath", os.path.join(self.root, "data"))
            .parquet(*paths)
            .withColumn("_file", F.input_file_name())
        )
        aggs = []
        for c in stat_cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        rows = df.groupBy("_file").agg(*aggs).collect()
        # O(1) uri→relpath: part filenames embed a per-task UUID and are
        # unique, so a basename lookup (endswith-verified) replaces the
        # old per-row linear suffix scan (r12 review: O(rows×files)
        # driver work on large manifests)
        by_name = {os.path.basename(f): f for f in files}
        out: dict[str, dict[str, list]] = {}
        for r in rows:
            uri = r["_file"]
            rel = by_name.get(os.path.basename(uri))
            if rel is not None and not uri.endswith(rel):
                rel = next((f for f in files if uri.endswith(f)), None)
            if rel is None:
                continue
            out[rel] = {
                c: [r[f"min_{c}"], r[f"max_{c}"]]
                for c in stat_cols
                if r[f"min_{c}"] is not None
            }
        return out

    def _commit(
        self,
        operation: str,
        files: list[str],
        schema_json: str,
        partition_by: list[str],
        properties: dict[str, str],
        expected_parent: int | None,
        delete_files: dict[str, int] | None = None,
        file_seq: dict[str, int] | None = None,
    ) -> Manifest:
        os.makedirs(self._manifest_dir, exist_ok=True)
        new_version = (expected_parent or 0) + 1
        # carry forward stats for retained files; stat only the new ones.
        # `stats.enabled=false` table property skips the per-commit stats
        # job (one extra Spark pass, ~30% on raw-load throughput) for
        # ingest-heavy tables that never benefit from file skipping.
        inherited: dict[str, dict[str, list]] = {}
        parent_man: Manifest | None = None
        if expected_parent is not None:
            try:
                parent_man = self.manifest(expected_parent)
                inherited = parent_man.file_stats
            except NoSuchTable:
                inherited = {}
        stats = {f: s for f, s in inherited.items() if f in set(files)}
        if properties.get("stats.enabled", "true") != "false":
            new_files = [f for f in files if f not in inherited]
            stats.update(
                self._collect_file_stats(new_files, schema_json, partition_by)
            )
        # Sequence threading (Iceberg v2): retained files keep the seq of
        # the commit that added them; new files get this commit's. A
        # delete sidecar is inherited only while at least one data file
        # it applies to survives — a full content rewrite (compact/COW
        # delete/merge/overwrite, whose input came from read() with
        # deletes applied) therefore drops materialized sidecars
        # automatically.
        if file_seq is None:
            parent_seq = (parent_man.file_seq if parent_man else {}) or {}
            pv = parent_man.version if parent_man else new_version
            file_seq = {
                f: parent_seq.get(f, pv)
                if parent_man and f in set(parent_man.files)
                else new_version
                for f in files
            }
        if delete_files is None:
            delete_files = {}
            if parent_man and parent_man.delete_files:
                fset = set(files)
                delete_files = {
                    d: seq
                    for d, seq in parent_man.delete_files.items()
                    if any(
                        f in fset and file_seq.get(f, new_version) < seq
                        for f in parent_man.files
                    )
                }
        man = Manifest(
            version=new_version,
            parent=expected_parent,
            operation=operation,
            timestamp_ms=int(time.time() * 1000),
            schema_json=schema_json,
            partition_by=partition_by,
            files=files,
            properties=properties,
            file_stats=stats,
            delete_files=delete_files,
            file_seq=file_seq,
            writer=uuid.uuid4().hex,
        )
        payload = man.to_json()
        mpath = self._manifest_path(new_version)

        def _owns_slot() -> bool:
            # Fence check: the slot is ours only if it still holds the
            # exact bytes we wrote (writer uuid makes them unique).
            try:
                with open(mpath, encoding="utf-8") as f:
                    return f.read() == payload
            except OSError:
                return False
        # O_EXCL create: two racing writers with the same expected_parent
        # both want v(N+1); exactly one wins the manifest slot, the loser
        # gets FileExistsError → CommitConflict (true CAS, not
        # check-then-write). One exception: if the occupying manifest's
        # version is AHEAD of the pointer and stale (older than the
        # grace window), it is the debris of a writer that died between
        # manifest write and pointer swing — without reclaim the table
        # is wedged forever (every retry conflicts on the same slot,
        # r12 review). A LIVE racer is inside a milliseconds-wide window
        # and younger than the grace; it is never reclaimed.
        try:
            fd = os.open(mpath, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            try:
                stale = (
                    time.time() - os.path.getmtime(mpath)
                    > STALE_MANIFEST_GRACE_SEC
                )
                ahead = (
                    expected_parent is not None
                    and self.current_version() == expected_parent
                )
            except OSError:
                stale = ahead = False
            if not (stale and ahead):
                raise CommitConflict(f"{mpath} already exists") from None
            # reclaim the dead writer's slot — two reclaimers can race
            # here (r13 review): the loser's remove must surface as
            # CommitConflict, not FileNotFoundError, and a re-check of
            # staleness right before the remove keeps a racer from
            # deleting the winner's FRESH manifest (the residual µs
            # TOCTOU window is made safe — conflict, never corruption —
            # by the writer fence below).
            try:
                if (
                    time.time() - os.path.getmtime(mpath)
                    <= STALE_MANIFEST_GRACE_SEC
                ):
                    raise CommitConflict(f"{mpath} already exists")
                os.remove(mpath)
            except FileNotFoundError:
                raise CommitConflict(f"{mpath} already exists") from None
            try:
                fd = os.open(mpath, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            except FileExistsError:
                raise CommitConflict(f"{mpath} already exists") from None
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(payload)
        # CAS on the pointer: re-check parent then atomic replace.
        # Both the cleanup delete and the swing are FENCED on slot
        # ownership (r13, ADVICE): if this writer stalled past the
        # grace window its slot may have been reclaimed by a competitor
        # — deleting then would destroy the competitor's committed
        # manifest, and swinging would acknowledge a commit whose files
        # the slot's manifest does not reference (lost commit).
        if expected_parent is not None:
            if self.current_version() != expected_parent:
                if _owns_slot():
                    os.remove(mpath)
                raise CommitConflict(
                    f"{self.root}: expected parent v{expected_parent}"
                )
        if not _owns_slot():
            raise CommitConflict(
                f"{mpath}: slot reclaimed by a competing writer"
            )
        tmp = self._current_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(str(new_version))
        os.replace(tmp, self._current_path)
        return man

    # ---- write operations ------------------------------------------------
    def create(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = False,
    ) -> "LakeTable":
        """S2 partitioned create (`writeTo(t).partitionedBy(col).create()`,
        reference create_table.py:92-94) / D2 create-if-not-exists."""
        if self.exists():
            if if_not_exists:
                return self
            raise RuntimeError(f"table exists: {self.root}")
        partition_by = partition_by or []
        files = self._write_data_files(df, partition_by, properties or {})
        self._commit(
            "create",
            files,
            json.dumps(df.schema.jsonValue()),
            partition_by,
            properties or {},
            expected_parent=None,
        )
        return self

    def append(
        self, df: DataFrame, extra_properties: dict[str, str] | None = None
    ) -> "LakeTable":
        """S3 append (`df.writeTo(t).append()` / INSERT INTO).

        ``extra_properties`` commit atomically with the data — e.g. a
        streaming sink's last-applied epoch marker, which is what makes a
        foreachBatch append idempotent under micro-batch retry."""
        cur = self.manifest()
        new_files = self._write_data_files(
            _align(df, cur.schema_json), cur.partition_by, cur.properties
        )
        props = dict(cur.properties)
        if extra_properties:
            props.update(extra_properties)
        self._commit(
            "append",
            sorted(cur.files + new_files),
            cur.schema_json,
            cur.partition_by,
            props,
            expected_parent=cur.version,
        )
        return self

    def overwrite(self, df: DataFrame) -> "LakeTable":
        cur = self.manifest()
        files = self._write_data_files(
            _align(df, cur.schema_json), cur.partition_by, cur.properties
        )
        self._commit(
            "overwrite",
            files,
            cur.schema_json,
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
        )
        return self

    def merge(
        self,
        source: DataFrame,
        on: list[str] | None = None,
        update_exclude: tuple[str, ...] = (),
        insert_not_matched: bool = True,
        assume_unique_source: bool = False,
    ) -> "LakeTable":
        """S4/S5 MERGE upsert, copy-on-write.

        Semantics follow the reference merge builder (create_table.py:
        63-69,96-104): matched target rows take every source column except
        ``update_exclude`` (those keep target values, e.g. ``id``,
        ``created_at``); unmatched source rows are inserted whole. ``on``
        defaults to the table's ``identifier.fields`` property (D10,
        count_clients.py:43-44 analog).

        Plan shape: three joins on the merge key (inner for updates,
        left-anti each way for untouched/inserts) unioned and rewritten —
        the COW MERGE shuffle; AQE broadcasts the source side when small.

        Duplicate merge-key rows in the source raise MergeCardinalityError
        (Iceberg's "multiple matching rows" contract) instead of silently
        fanning out matched target rows; the check is one grouped count
        over the source keys. Callers whose source is unique-keyed BY
        CONSTRUCTION (e.g. a foreachBatch upsert of a groupBy aggregate,
        where the merge keys ARE the grouping keys) pass
        ``assume_unique_source=True`` to skip that extra per-commit job —
        a micro-batch loop pays it once per batch otherwise.
        """
        cur = self.manifest()
        keys = on or [
            k.strip()
            for k in cur.properties.get("identifier.fields", "").split(",")
            if k.strip()
        ]
        if not keys:
            raise ValueError("merge needs `on` keys or identifier.fields property")
        target = self.read()
        source = _align(source, cur.schema_json)
        cols = target.columns

        dup = (
            []
            if assume_unique_source
            else source.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key_vals = {k: dup[0][k] for k in keys}
            raise MergeCardinalityError(
                f"source has multiple rows for merge key {key_vals}"
            )

        untouched = target.join(source, keys, "left_anti")
        updated = target.alias("t").join(source.alias("s"), keys, "inner").select(
            *[
                F.col(f"t.{c}") if (c in keys or c in update_exclude) else F.col(f"s.{c}")
                for c in cols
            ]
        )
        merged = untouched.unionByName(updated)
        if insert_not_matched:
            inserted = source.join(target, keys, "left_anti").select(*cols)
            merged = merged.unionByName(inserted)

        files = self._write_data_files(merged, cur.partition_by, cur.properties)
        self._commit(
            "merge",
            files,
            cur.schema_json,
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
        )
        return self

    def merge_conditional(
        self,
        source: DataFrame,
        on: list[str],
        delete_when=None,
        update_when=None,
        insert_when=None,
        update_exclude: tuple[str, ...] = (),
    ) -> "LakeTable":
        """Multi-clause conditional MERGE (the full Iceberg/Delta
        ``MERGE ... WHEN MATCHED AND <cond> THEN DELETE / WHEN MATCHED
        THEN UPDATE / WHEN NOT MATCHED [AND <cond>] THEN INSERT`` form;
        :meth:`merge` is the unconditional-upsert special case).

        Clause order follows the SQL contract: for a matched pair,
        ``delete_when`` is evaluated FIRST (TRUE → the target row is
        dropped); otherwise ``update_when`` (None → always) gates the
        update, failing clauses keep the target row unchanged.
        Unmatched source rows insert when ``insert_when`` (None →
        always) holds. ``delete_when``/``update_when`` are Column
        expressions over the joined row (target columns as ``t.<col>``,
        source as ``s.<col>``); ``insert_when`` sees only the source
        row (plain column names — there is no target side). NULL
        conditions count as not-matched-by-the-clause (SQL three-valued
        logic), never as TRUE.

        Plan shape: identical to :meth:`merge` — one key-partitioned
        join pass (anti for untouched, inner for matched, anti for
        inserts) unioned into the COW rewrite; the clause conditions are
        row-local projections on the joined frame, adding no extra
        shuffle. Duplicate source keys raise MergeCardinalityError."""
        cur = self.manifest()
        target = self.read()
        source = _align(source, cur.schema_json)
        cols = target.columns

        dup = (
            source.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key_vals = {k: dup[0][k] for k in on}
            raise MergeCardinalityError(
                f"source has multiple rows for merge key {key_vals}"
            )

        untouched = target.join(source, on, "left_anti")
        joined = target.alias("t").join(source.alias("s"), on, "inner")
        is_del = (
            delete_when.eqNullSafe(F.lit(True))
            if delete_when is not None
            else F.lit(False)
        )
        is_upd = (
            update_when.eqNullSafe(F.lit(True))
            if update_when is not None
            else F.lit(True)
        )
        matched_kept = joined.filter(~is_del).select(
            *[
                F.when(
                    is_upd & F.lit(c not in on and c not in update_exclude),
                    F.col(f"s.{c}"),
                )
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in cols
            ]
        )
        merged = untouched.unionByName(matched_kept)
        inserts = source.join(target, on, "left_anti")
        if insert_when is not None:
            inserts = inserts.filter(insert_when.eqNullSafe(F.lit(True)))
        merged = merged.unionByName(inserts.select(*cols))

        files = self._write_data_files(merged, cur.partition_by, cur.properties)
        self._commit(
            "merge",
            files,
            cur.schema_json,
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
        )
        return self

    def delete_where(self, condition) -> "LakeTable":
        """DELETE (D5-adjacent DML; OPA op list allow_table.rego:73-80),
        copy-on-write with FILE-LEVEL pruning: one column-pruned
        discovery pass finds the files that actually contain matches
        (``input_file_name`` groupBy — the predicate columns are the
        only data read); files with no match are RETAINED untouched (no
        rewrite, they keep their sequence), and only the blast radius is
        rewritten — the Iceberg COW-delete shape; a selective DELETE on
        a 100 TB table rewrites its matched files, not the table. Under
        live equality-delete sidecars the rewrite falls back to a full
        pass of ``read()`` (which materializes the sidecars, exactly as
        ``compact`` does).

        SQL DELETE semantics: only rows where the predicate is TRUE are
        deleted — rows where it evaluates to NULL are RETAINED (a plain
        ``filter(~cond)`` would silently drop them)."""
        cur = self.manifest()
        cond_true = condition.eqNullSafe(F.lit(True))
        if cur.delete_files:
            remaining = self.read().filter(~cond_true)
            files = sorted(
                self._write_data_files(remaining, cur.partition_by, cur.properties)
            )
        else:
            hit_uris = [
                r["_file"]
                for r in self._scan_file_subset(cur, cur.files)
                .withColumn("_file", F.input_file_name())
                .filter(cond_true)
                .select("_file")
                .distinct()
                .collect()  # bounded by the file count (manifest-grade)
            ]
            # basename index (unique per-task UUID filenames) instead of
            # the O(files×hits) suffix scan — same fix as
            # _collect_file_stats (r12 review)
            hit_by_name = {os.path.basename(u): u for u in hit_uris}
            matched = [
                f
                for f in cur.files
                if hit_by_name.get(os.path.basename(f), "").endswith(f)
            ]
            kept = [f for f in cur.files if f not in set(matched)]
            if matched:
                remaining = self._scan_file_subset(cur, matched).filter(~cond_true)
                new_files = self._write_data_files(
                    remaining, cur.partition_by, cur.properties
                )
            else:  # nothing matched: metadata-only commit, zero rewrites
                new_files = []
            files = sorted(kept + new_files)
        self._commit(
            "delete",
            files,
            cur.schema_json,
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
        )
        return self

    def delete_keys_mor(self, keys: DataFrame) -> "LakeTable":
        """Merge-on-read DELETE by equality keys (Iceberg v2 equality-
        delete analog). Writes the distinct key rows as a parquet
        sidecar and commits METADATA ONLY — no data file is rewritten,
        so a delete of k keys costs O(k) regardless of table size (the
        CDC/GDPR-erasure shape at 100 TB). ``read()`` suppresses
        matching rows in every data file whose sequence predates the
        sidecar's via a broadcast anti-join; rows appended AFTER the
        delete carry a higher sequence and are never suppressed.
        ``compact()`` (or any full rewrite) materializes the deletes and
        drops the sidecar. The key columns must be a subset of the table
        schema; NULL key values are ignored (SQL equality never matches
        NULL — use delete_where for predicate deletes)."""
        cur = self.manifest()
        schema = T.StructType.fromJson(json.loads(cur.schema_json))
        table_cols = {f.name for f in schema.fields}
        bad = [c for c in keys.columns if c not in table_cols]
        if bad:
            raise ValueError(
                f"equality-delete key columns {bad} not in table schema"
            )
        rel = f"data/{uuid.uuid4().hex[:12]}-eqdelete"
        cond = None
        for c in keys.columns:
            cn = F.col(c).isNotNull()
            cond = cn if cond is None else (cond & cn)
        keys.filter(cond).distinct().write.mode("overwrite").parquet(
            os.path.join(self.root, rel)
        )
        new_seq = cur.version + 1  # CAS in _commit guarantees this slot
        self._commit(
            "delete-mor",
            cur.files,
            cur.schema_json,
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
            delete_files={**cur.delete_files, rel: new_seq},
        )
        return self

    def evolve_partition_spec(
        self, new_partition_by: list[str]
    ) -> "LakeTable":
        """Partition-spec evolution (Iceberg `REPLACE PARTITION FIELD`
        analog): a METADATA-ONLY commit — zero data files rewritten.
        Existing files keep their old hive layout; writes after this
        commit use the new spec; ``read()`` groups files by layout and
        scans each group with its own partition recovery, so mixed
        layouts coexist indefinitely. ``compact()`` (any full rewrite)
        unifies everything under the current spec. At 100 TB this is
        how a table follows its query patterns (e.g. daily → hourly
        partitioning) without an O(table) migration."""
        cur = self.manifest()
        schema = T.StructType.fromJson(json.loads(cur.schema_json))
        cols = {f.name for f in schema.fields}
        bad = [c for c in new_partition_by if c not in cols]
        if bad:
            raise ValueError(f"partition columns {bad} not in table schema")
        self._commit(
            "evolve-partition",
            cur.files,
            cur.schema_json,
            new_partition_by,
            cur.properties,
            expected_parent=cur.version,
        )
        return self

    def upsert_keys_mor(
        self, df: DataFrame, key_cols: list[str]
    ) -> "LakeTable":
        """Merge-on-read UPSERT (Iceberg v2 CDC write shape): ONE commit
        carrying both an equality-delete sidecar for the source keys and
        the source rows as new data files. Existing rows with matching
        keys are suppressed at read (the sidecar applies to every data
        file with a lower sequence), while the commit's own data files
        share the sidecar's sequence and are exempt — so the new
        versions win without rewriting a single existing file. This is
        the O(batch) streaming-CDC ingest path; `merge()` is the
        copy-on-write equivalent. Enforces the MERGE cardinality
        contract (distinct source keys)."""
        cur = self.manifest()
        schema = T.StructType.fromJson(json.loads(cur.schema_json))
        table_cols = {f.name for f in schema.fields}
        bad = [c for c in key_cols if c not in table_cols or c not in df.columns]
        if bad:
            raise ValueError(
                f"upsert key columns {bad} must exist in table and source"
            )
        dup = (
            df.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1)
        ).collect()
        if dup:
            raise MergeCardinalityError(
                f"duplicate source key {tuple(dup[0][c] for c in key_cols)}"
            )
        rel = f"data/{uuid.uuid4().hex[:12]}-eqdelete"
        df.select(*key_cols).distinct().write.mode("overwrite").parquet(
            os.path.join(self.root, rel)
        )
        new_files = self._write_data_files(
            _align(df, cur.schema_json), cur.partition_by, cur.properties
        )
        new_seq = cur.version + 1  # CAS in _commit guarantees this slot
        self._commit(
            "upsert-mor",
            sorted(cur.files + new_files),
            cur.schema_json,
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
            delete_files={**cur.delete_files, rel: new_seq},
        )
        return self

    # ---- maintenance (D7, D8) -------------------------------------------
    def compact(self, target_file_size_bytes: int = 128 * 1024 * 1024) -> "LakeTable":
        """D7 small-files compaction (`rewrite_data_files`; reference sink
        compaction cadence sink_iceberg_fraud_alerts_client.sql:23-24).
        Content-preserving: coalesces to ceil(bytes/target) files."""
        cur = self.manifest()
        total = sum(
            os.path.getsize(os.path.join(self.root, f)) for f in cur.files
        )
        n = max(1, -(-total // target_file_size_bytes))
        df = self.read()
        if cur.partition_by:
            df = df.repartition(int(n), *cur.partition_by)
        else:
            df = df.repartition(int(n))
        files = self._write_data_files(df, cur.partition_by, cur.properties)
        self._commit(
            "compact",
            files,
            cur.schema_json,
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
        )
        return self

    def rewrite_sorted(
        self, by: list[str], target_file_size_bytes: int = 128 * 1024 * 1024
    ) -> "LakeTable":
        """Sort-based clustering rewrite (the Iceberg `sort_order` /
        `rewrite_data_files(strategy => 'sort')` analog): range-partition
        on `by` then sort within files, so per-file min/max stats become
        DISJOINT ranges and manifest-stats file skipping (`read(prune=)`)
        can drop most files for a selective predicate. Content-preserving
        like compact(); at scale this is the scan-amplification fix for
        point/range-heavy tables."""
        cur = self.manifest()
        total = sum(
            os.path.getsize(os.path.join(self.root, f)) for f in cur.files
        )
        n = int(max(1, -(-total // target_file_size_bytes)))
        df = (
            self.read()
            .repartitionByRange(n, *[F.col(c) for c in by])
            .sortWithinPartitions(*by)
        )
        files = self._write_data_files(df, cur.partition_by, cur.properties)
        props = dict(cur.properties)
        props["sort.order"] = ",".join(by)
        self._commit(
            "rewrite-sorted",
            files,
            cur.schema_json,
            cur.partition_by,
            props,
            expected_parent=cur.version,
        )
        return self

    def rewrite_zorder(
        self,
        by: list[str],
        bits: int = 16,
        target_file_size_bytes: int = 128 * 1024 * 1024,
    ) -> "LakeTable":
        """Z-order clustering rewrite (the Iceberg
        `rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`
        analog): each column is min-max scaled to `bits` bits, the bit
        planes are interleaved into one z-value, and files are
        range-partitioned + sorted by it. Every file then covers a
        compact k-D tile, so per-file min/max stats shrink on EVERY
        z-ordered column and `read(prune=)` skips files for predicates
        on any of them — where a 1-D sort only serves its leading
        column. The z-value is a pure generated column expression
        (2·bits·k shift/mask terms, whole-stage-codegen'd, no UDF);
        min/max normalization bounds come from one aggregate job
        (2k scalars to the driver — bounded by construction).
        Content-preserving like compact()/rewrite_sorted()."""
        cur = self.manifest()
        total = sum(
            os.path.getsize(os.path.join(self.root, f)) for f in cur.files
        )
        n = int(max(1, -(-total // target_file_size_bytes)))
        df = self.read()
        bounds = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in by],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in by],
        ).collect()[0]
        top = (1 << bits) - 1
        scaled = []
        for c in by:
            mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
            rng = (mx - mn) if (mx is not None and mn is not None and mx > mn) else 1.0
            scaled.append(
                F.least(
                    F.lit(top).cast("bigint"),
                    F.greatest(
                        F.lit(0).cast("bigint"),
                        (
                            (F.col(c).cast("double") - F.lit(mn or 0.0))
                            / F.lit(rng)
                            * F.lit(float(top))
                        ).cast("bigint"),
                    ),
                )
            )
        k = len(by)
        z = F.lit(0).cast("bigint")
        for b in range(bits):
            for j, s in enumerate(scaled):
                z = z.bitwiseOR(
                    F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * k + j)
                )
        dfz = (
            df.withColumn("__z", z)
            .repartitionByRange(n, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        files = self._write_data_files(dfz, cur.partition_by, cur.properties)
        props = dict(cur.properties)
        props["sort.order"] = f"zorder({','.join(by)})"
        self._commit(
            "rewrite-zorder",
            files,
            cur.schema_json,
            cur.partition_by,
            props,
            expected_parent=cur.version,
        )
        return self

    # ---- tags (Iceberg refs analog) --------------------------------------
    @property
    def _tags_path(self) -> str:
        return os.path.join(self.root, "tags.json")

    def tags(self, strict: bool = False) -> dict[str, int]:
        """Tag refs. ``strict=True`` (the expire_snapshots path) raises
        on a corrupt/unreadable tags.json instead of returning {} —
        failing open there would un-pin every tagged snapshot and let
        expiry delete them (r12 review)."""
        if not os.path.exists(self._tags_path):
            return {}
        try:
            with open(self._tags_path, encoding="utf-8") as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except (OSError, ValueError):
            if strict:
                raise
            return {}

    @contextmanager
    def _tags_lock(self):
        """O_EXCL lock file serializing tag read-modify-write AND the
        expire_snapshots critical section (same CAS discipline as
        `_commit`): two concurrent tag writers can no longer silently
        lose an update, and a tag() racing expire_snapshots() can no
        longer pin a just-deleted manifest."""
        lock = self._tags_path + ".lock"
        token = uuid.uuid4().hex  # fence: only the owner removes (r13)
        deadline = time.time() + TAGS_LOCK_TIMEOUT_SEC
        while True:
            try:
                fd = os.open(lock, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
                os.write(fd, token.encode())
                break
            except FileExistsError:
                # stale-lock takeover: a holder killed between os.open
                # and the finally-removal would otherwise disable
                # tag()/expire_snapshots forever (r12 review). The
                # critical sections are sub-second; a lock older than
                # the grace window belongs to a dead process. The
                # takeover itself is serialized by an flock'd guard
                # file (r13 review): two waiters that both observed a
                # stale lock could otherwise both remove-and-acquire —
                # the second remove deleting the first's FRESH lock and
                # putting two holders inside the critical section. The
                # guard file is never removed, so there is no race on
                # the guard itself; flock is process-scoped and the
                # table layer is local-FS by design.
                try:
                    if (
                        time.time() - os.path.getmtime(lock)
                        > STALE_MANIFEST_GRACE_SEC
                    ):
                        import fcntl

                        gfd = os.open(lock + ".guard", os.O_CREAT | os.O_RDWR)
                        try:
                            fcntl.flock(gfd, fcntl.LOCK_EX)
                            # re-check under the guard: only the first
                            # waiter sees it still stale
                            if (
                                time.time() - os.path.getmtime(lock)
                                > STALE_MANIFEST_GRACE_SEC
                            ):
                                os.remove(lock)
                        finally:
                            os.close(gfd)  # releases the flock
                        continue
                except OSError:
                    continue  # holder just released/raced — retry
                if time.time() > deadline:
                    raise CommitConflict(f"tag lock held: {lock}") from None
                time.sleep(0.01)
        try:
            yield
        finally:
            os.close(fd)
            # Fenced release: if we stalled past the grace window the
            # lock may have been taken over — removing it then would
            # free a lock a competitor is still holding (r13, same
            # lease-fencing discipline as `_commit`).
            try:
                with open(lock, encoding="utf-8") as lf:
                    if lf.read() == token:
                        os.remove(lock)
            except OSError:
                pass

    def _write_tags(self, t: dict[str, int]) -> None:
        tmp = self._tags_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(t, f, sort_keys=True)
        os.replace(tmp, self._tags_path)

    def tag(self, name: str, version: int | None = None) -> "LakeTable":
        """Pin a named, immutable ref to a snapshot (Iceberg tag analog).
        Tagged snapshots survive expire_snapshots."""
        v = self.current_version() if version is None else version
        with self._tags_lock():
            self.manifest(v)  # raises NoSuchTable if absent (or expired)
            t = self.tags()
            t[name] = v
            self._write_tags(t)
        return self

    def drop_tag(self, name: str) -> "LakeTable":
        with self._tags_lock():
            t = self.tags()
            t.pop(name, None)
            self._write_tags(t)
        return self

    def read_tag(self, name: str) -> DataFrame:
        try:
            version = self.tags()[name]
        except KeyError:
            raise NoSuchTable(f"{self.root}: no tag {name!r}") from None
        return self.read(version=version)

    def expire_snapshots(self, retain_last: int = 5) -> list[int]:
        """D8 snapshot expiration (`expire_snapshots(retain_last => 5)`,
        reference sink options :25-26). Deletes expired manifests and any
        data file referenced only by them. Tagged snapshots (refs) are
        always retained, as in Iceberg."""
        mans = self.snapshots()
        if len(mans) <= retain_last:
            return []
        removed = []
        # tags lock: the tagged-set read and the deletes form one
        # critical section, so a concurrent tag() cannot pin a manifest
        # this call is about to delete (ADVICE r2).
        with self._tags_lock():
            # strict: a corrupt tags.json must abort expiry (fail-open
            # would un-pin every tagged snapshot and delete it — r12
            # review), unlike read paths where {} is a fine degrade
            tagged = set(self.tags(strict=True).values())
            # staged WAP / branch refs pin their PARENT manifests too:
            # read_staged/read_branch need the fork point's manifest
            # (delete sidecars, stats) until the ref lands or is dropped
            pinned = self._ref_parent_versions()
            keep = mans[-retain_last:] + [
                m
                for m in mans[:-retain_last]
                if m.version in tagged or m.version in pinned
            ]
            drop = [
                m
                for m in mans[:-retain_last]
                if m.version not in tagged and m.version not in pinned
            ]
            # referenced set includes staged/branch files + delete
            # sidecars — same rule as remove_orphan_files
            live = self._referenced_files(keep)
            for m in drop:
                for f in list(m.files) + list(m.delete_files):
                    if f not in live:
                        p = os.path.join(self.root, f)
                        if os.path.isdir(p):  # equality-delete sidecar dir
                            shutil.rmtree(p)
                        elif os.path.exists(p):
                            os.remove(p)
                os.remove(self._manifest_path(m.version))
                removed.append(m.version)
        # prune empty commit dirs (age-guarded: a dir newer than the
        # newest kept snapshot may be another writer's in-flight output
        # whose first part file hasn't landed yet — r12 review)
        self._prune_empty_commit_dirs(mans[-1].timestamp_ms)
        return removed

    def _ref_parent_versions(self) -> set:
        """Versions that staged WAP tokens / branch refs fork from."""
        pinned: set = set()
        for fn in os.listdir(self._manifest_dir):
            if fn.startswith(("staged_", "branch_")) and fn.endswith(".json"):
                try:
                    with open(
                        os.path.join(self._manifest_dir, fn), encoding="utf-8"
                    ) as fh:
                        m = Manifest.from_json(fh.read())
                except (ValueError, OSError):
                    continue
                if m.parent is not None:
                    pinned.add(m.parent)
        return pinned

    def _prune_empty_commit_dirs(self, older_than_ms: int) -> None:
        """Remove commit dirs holding zero parquet files — write debris
        (_SUCCESS, .crc) — but only dirs older than the cutoff, so a
        concurrent writer's just-created output dir is never deleted."""
        data_dir = os.path.join(self.root, "data")
        if not os.path.isdir(data_dir):
            return
        for d in os.listdir(data_dir):
            full = os.path.join(data_dir, d)
            if not os.path.isdir(full):
                continue
            if os.path.getmtime(full) * 1000 >= older_than_ms:
                continue
            if not any(
                fn.endswith(".parquet")
                for _, _, fns in os.walk(full)
                for fn in fns
            ):
                shutil.rmtree(full)

    # ---- metadata tables (D6: `t.snapshots` / `t.files` analogs) --------
    def snapshots_df(self) -> DataFrame:
        """Snapshot history as a queryable DataFrame."""
        rows = [
            (
                m.version,
                m.parent,
                m.operation,
                m.timestamp_ms,
                len(m.files),
                json.dumps(m.properties, sort_keys=True),
            )
            for m in self.snapshots()
        ]
        return self.spark.createDataFrame(
            rows,
            "version: int, parent: int, operation: string, "
            "timestamp_ms: long, n_files: int, properties: string",
        )

    def files_df(self, version: int | None = None) -> DataFrame:
        """Current (or historical) data-file inventory with sizes."""
        man = self.manifest(version)
        rows = [
            (f, os.path.getsize(os.path.join(self.root, f)))
            for f in man.files
        ]
        return self.spark.createDataFrame(rows, "path: string, size_bytes: long")

    # ---- rollback / write-audit-publish ---------------------------------
    def rollback(self, version: int) -> "LakeTable":
        """Restore a past snapshot as the new current version (history is
        retained — the rollback is itself a new commit, Iceberg
        `rollback_to_snapshot` semantics)."""
        cur = self.manifest()
        past = self.manifest(version)
        self._commit(
            f"rollback_to_v{version}",
            past.files,
            past.schema_json,
            past.partition_by,
            past.properties,
            expected_parent=cur.version,
            # restore the past snapshot's MoR state verbatim — content
            # fidelity requires its sidecars and sequences, not cur's
            delete_files=dict(past.delete_files),
            file_seq=dict(past.file_seq) or {f: past.version for f in past.files},
        )
        return self

    def _staged_path(self, token: str) -> str:
        return os.path.join(self._manifest_dir, f"staged_{token}.json")

    def stage_append(self, df: DataFrame) -> str:
        """Write-audit-publish step 1: write data files + a manifest in
        the staging namespace WITHOUT touching the pointer or the version
        sequence (other writers commit freely meanwhile). Returns the
        stage token; audit via ``read_staged(token)``."""
        cur = self.manifest()
        new_files = self._write_data_files(
            _align(df, cur.schema_json), cur.partition_by, cur.properties
        )
        token = uuid.uuid4().hex[:12]
        staged = Manifest(
            version=-1,  # assigned at publish
            parent=cur.version,
            operation="staged_append",
            timestamp_ms=int(time.time() * 1000),
            schema_json=cur.schema_json,
            partition_by=cur.partition_by,
            files=sorted(cur.files + new_files),
            properties=cur.properties,
        )
        # Atomic token write (same discipline as branch refs / the main
        # pointer): a crash mid-write must never leave a truncated
        # staged manifest for GC or publish to choke on.
        path = self._staged_path(token)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(staged.to_json())
        os.replace(tmp, path)
        return token

    def _staged_manifest(self, token: str) -> Manifest:
        path = self._staged_path(token)
        if not os.path.exists(path):
            raise NoSuchTable(f"no staged snapshot {token} in {self.root}")
        with open(path, encoding="utf-8") as f:
            return Manifest.from_json(f.read())

    def read_staged(self, token: str) -> DataFrame:
        """Audit view of a staged (unpublished) snapshot.

        Applies the parent snapshot's merge-on-read delete sidecars the
        same way read() does (Iceberg wap.branch reads see deletes):
        retained files keep the parent's sequence so older sidecars
        still suppress their rows; the staged new files get a sequence
        above every sidecar, so the fresh append is never filtered."""
        staged = self._staged_manifest(token)
        parent = self.manifest(staged.parent)
        staged_seq = parent.version + 1
        parent_set = set(parent.files)
        file_seq = {
            f: parent.file_seq.get(f, parent.version)
            if f in parent_set
            else staged_seq
            for f in staged.files
        }
        view = _dc_replace(
            staged,
            version=staged_seq,
            delete_files=dict(parent.delete_files),
            file_seq=file_seq,
            file_stats=dict(parent.file_stats),
        )
        return self._scan_manifest(view)

    def expire_staged(self, token: str) -> "LakeTable":
        """Abandon a staged (unpublished) snapshot: drop the stage token
        so the stage's data files become unreferenced and eligible for
        ``remove_orphan_files`` (the crash/lost-CAS debris case is
        modeled as stage → expire → GC; a live stage is never GC'd)."""
        path = self._staged_path(token)
        if not os.path.exists(path):
            raise NoSuchTable(f"no staged snapshot {token} in {self.root}")
        os.remove(path)
        return self

    def publish(self, token: str) -> "LakeTable":
        """Write-audit-publish step 2: promote the staged snapshot to the
        next version (CAS against the parent it was staged from)."""
        staged = self._staged_manifest(token)
        if self.current_version() != staged.parent:
            raise CommitConflict(
                f"{self.root}: staged {token} parented at v{staged.parent}, "
                f"current is v{self.current_version()}"
            )
        self._commit(
            "publish_staged_append",
            staged.files,
            staged.schema_json,
            staged.partition_by,
            staged.properties,
            expected_parent=staged.parent,
        )
        os.remove(self._staged_path(token))
        return self

    # ---- branches (Iceberg branch-ref analog) -----------------------------
    # A branch is a NAMED, MULTI-COMMIT staging line: it forks from a main
    # snapshot, accumulates its own appends invisible to main readers, and
    # lands via fast_forward — a CAS that succeeds only if main has not
    # moved past the fork point (git/Iceberg fast-forward semantics; a
    # diverged main raises CommitConflict and the caller re-branches or
    # rebases by hand). Single-writer per branch (the branch pointer file
    # is overwritten, not CAS'd) — the documented contract, matching
    # Iceberg where concurrent commits to ONE branch also serialize.

    def _branch_path(self, name: str) -> str:
        if not name or not all(c.isalnum() or c in "_-" for c in name):
            raise ValueError(f"invalid branch name: {name!r}")
        return os.path.join(self._manifest_dir, f"branch_{name}.json")

    def _branch_manifest(self, name: str) -> Manifest:
        path = self._branch_path(name)
        if not os.path.exists(path):
            raise NoSuchTable(f"no branch {name!r} on {self.root}")
        with open(path, encoding="utf-8") as f:
            return Manifest.from_json(f.read())

    def create_branch(self, name: str) -> "LakeTable":
        """Fork a branch from the CURRENT snapshot. O_EXCL creation —
        a concurrent create of the same name raises CommitConflict."""
        cur = self.manifest()
        bm = Manifest(
            version=-1,  # assigned at fast_forward
            parent=cur.version,
            operation="branch_create",
            timestamp_ms=int(time.time() * 1000),
            schema_json=cur.schema_json,
            partition_by=cur.partition_by,
            files=list(cur.files),
            properties=cur.properties,
            delete_files=dict(cur.delete_files),
            file_seq=dict(cur.file_seq) or {f: cur.version for f in cur.files},
        )
        os.makedirs(self._manifest_dir, exist_ok=True)
        try:
            with open(self._branch_path(name), "x", encoding="utf-8") as f:
                f.write(bm.to_json())
        except FileExistsError:
            raise CommitConflict(f"branch {name!r} already exists on {self.root}")
        return self

    def branch_append(self, name: str, df: DataFrame) -> "LakeTable":
        """Append a batch to the branch (invisible to main readers).
        Data files write through normal distributed jobs; only the
        branch pointer update is driver-side."""
        bm = self._branch_manifest(name)
        new_files = self._write_data_files(
            _align(df, bm.schema_json), bm.partition_by, bm.properties
        )
        updated = _dc_replace(
            bm,
            operation="branch_append",
            timestamp_ms=int(time.time() * 1000),
            files=sorted(bm.files + new_files),
        )
        # Atomic pointer update: write a temp file then os.replace(), so a
        # crash mid-write never leaves a truncated branch ref (same
        # discipline as _commit's atomic pointer replace for main).
        path = self._branch_path(name)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(updated.to_json())
        os.replace(tmp, path)
        return self

    def read_branch(self, name: str) -> DataFrame:
        """Scan the branch head: fork-point content (with the fork
        snapshot's MoR delete sidecars applied, as read() would) plus
        every branch append."""
        bm = self._branch_manifest(name)
        fork = self.manifest(bm.parent)
        branch_seq = fork.version + 1
        fork_set = set(fork.files)
        file_seq = {
            f: fork.file_seq.get(f, fork.version)
            if f in fork_set
            else branch_seq
            for f in bm.files
        }
        view = _dc_replace(
            bm,
            version=branch_seq,
            file_seq=file_seq,
            file_stats=dict(fork.file_stats),
        )
        return self._scan_manifest(view)

    def fast_forward(self, name: str) -> "LakeTable":
        """Land the branch on main: CAS against the fork point. If main
        advanced past the fork, the branch has DIVERGED and fast-forward
        is impossible (CommitConflict) — same contract as Iceberg's
        fast_forward procedure. The branch's commits land as ONE main
        snapshot (squash); the branch ref is deleted on success."""
        bm = self._branch_manifest(name)
        if self.current_version() != bm.parent:
            raise CommitConflict(
                f"{self.root}: branch {name!r} forked at v{bm.parent}, "
                f"main is at v{self.current_version()} — cannot fast-forward"
            )
        self._commit(
            f"fast_forward_branch:{name}",
            bm.files,
            bm.schema_json,
            bm.partition_by,
            bm.properties,
            expected_parent=bm.parent,
            delete_files=dict(bm.delete_files),
        )
        os.remove(self._branch_path(name))
        return self

    def drop_branch(self, name: str) -> "LakeTable":
        """Abandon a branch; its unpublished data files become orphans
        (collected by remove_orphan_files)."""
        os.remove(self._branch_path(name))
        return self

    # ---- schema evolution (D5) ------------------------------------------
    def add_column(self, name: str, dtype: str) -> "LakeTable":
        cur = self.manifest()
        schema = T.StructType.fromJson(json.loads(cur.schema_json))
        if name in schema.fieldNames():
            raise ValueError(f"column exists: {name}")
        new = T.StructType(
            schema.fields + [T.StructField(name, _parse_type(dtype), True)]
        )
        self._commit_schema(cur, new, f"add_column:{name}")
        return self

    def drop_column(self, name: str) -> "LakeTable":
        cur = self.manifest()
        schema = T.StructType.fromJson(json.loads(cur.schema_json))
        new = T.StructType([f for f in schema.fields if f.name != name])
        if len(new.fields) == len(schema.fields):
            raise ValueError(f"no such column: {name}")
        self._commit_schema(cur, new, f"drop_column:{name}")
        return self

    def alter_column_type(self, name: str, dtype: str) -> "LakeTable":
        """Type widening (e.g. int→long, float→double). Narrowing is
        rejected — it would corrupt existing data.

        Divergence note: Iceberg does this metadata-only because its
        readers promote types per file; plain-parquet Spark scans error on
        mixed footers, so this implementation rewrites the data files with
        the cast (a compaction-sized COW job, not a pointer flip)."""
        _WIDENINGS = {
            "integer": {"long", "double", "decimal"},
            "long": {"double", "decimal"},
            "float": {"double"},
        }
        cur = self.manifest()
        schema = T.StructType.fromJson(json.loads(cur.schema_json))
        if name not in schema.fieldNames():
            raise ValueError(f"no such column: {name}")
        old_t = schema[name].dataType.typeName()
        new_type = _parse_type(dtype)
        new_t = new_type.typeName()
        if new_t != old_t and new_t not in _WIDENINGS.get(old_t, set()):
            raise ValueError(f"cannot narrow {name}: {old_t} → {new_t}")
        new_schema = T.StructType(
            [
                T.StructField(
                    f.name,
                    new_type if f.name == name else f.dataType,
                    f.nullable,
                )
                for f in schema.fields
            ]
        )
        recast = self.read().withColumn(name, F.col(name).cast(new_type))
        files = self._write_data_files(recast, cur.partition_by, cur.properties)
        self._commit(
            f"alter_column:{name}:{dtype}",
            files,
            json.dumps(new_schema.jsonValue()),
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
        )
        return self

    def _commit_schema(self, cur: Manifest, new_schema: T.StructType, op: str):
        # metadata-only commit: rewrite no data, reads project/null-fill
        self._commit(
            op,
            cur.files,
            json.dumps(new_schema.jsonValue()),
            cur.partition_by,
            cur.properties,
            expected_parent=cur.version,
        )


def _file_may_match(
    stats: dict[str, list] | None, prune: list[tuple[str, str, object]]
) -> bool:
    """Range-intersection check: can a file with these column ranges hold
    a row satisfying ALL predicates? Missing stats → conservatively yes."""
    if not stats:
        return True
    for col, op, value in prune:
        rng = stats.get(col)
        if not rng:
            continue
        lo, hi = rng
        if lo is None or hi is None:
            continue
        if op == "=" and not (lo <= value <= hi):
            return False
        if op in ("<", "<=") and not (lo < value or (op == "<=" and lo <= value)):
            return False
        if op in (">", ">=") and not (hi > value or (op == ">=" and hi >= value)):
            return False
    return True


def _parse_type(dtype: str) -> T.DataType:
    return T._parse_datatype_string(dtype)


def _align(df: DataFrame, schema_json: str) -> DataFrame:
    """Project/cast a frame to the table schema (null-fill added columns)."""
    schema = T.StructType.fromJson(json.loads(schema_json))
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(cols)


class LakeCatalog:
    """Namespace → table catalog over a warehouse directory (D1-D4).

    Mirrors the reference's catalog→namespace→table hierarchy
    (infra/README.md:60-63; nested namespaces in 01-Management.ipynb)
    with filesystem directories; `spark.table`-style access via
    ``catalog.table("ns.t").read()``.
    """

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, ident: str) -> str:
        parts = ident.split(".")
        return os.path.join(self.warehouse, *parts)

    def table(self, ident: str) -> LakeTable:
        return LakeTable(self.spark, self._path(ident))

    def table_exists(self, ident: str) -> bool:  # D2
        return self.table(ident).exists()

    def create_namespace(self, ns: str) -> None:  # D3
        os.makedirs(os.path.join(self.warehouse, *ns.split(".")), exist_ok=True)

    def list_namespaces(self, parent: str = "") -> list[str]:  # D4
        base = os.path.join(self.warehouse, *parent.split(".")) if parent else self.warehouse
        if not os.path.isdir(base):
            return []
        return sorted(
            d
            for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d))
            and not LakeTable(self.spark, os.path.join(base, d)).exists()
        )

    def list_tables(self, ns: str) -> list[str]:  # D4
        base = os.path.join(self.warehouse, *ns.split(".")) if ns else self.warehouse
        if not os.path.isdir(base):
            return []
        return sorted(
            d
            for d in os.listdir(base)
            if LakeTable(self.spark, os.path.join(base, d)).exists()
        )

    def drop_table(self, ident: str) -> None:
        path = self._path(ident)
        if not os.path.isdir(path):
            return
        # only ever delete a TABLE directory — an identifier that
        # resolves to a namespace (no table pointer inside) would
        # recursively destroy every table under it on a one-segment
        # typo (r12 review)
        if not os.path.exists(os.path.join(path, "_current")):
            raise ValueError(
                f"{ident!r} is not a table (no _current pointer at "
                f"{path}); refusing to recursively delete a namespace"
            )
        shutil.rmtree(path)
