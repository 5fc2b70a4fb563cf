"""Snapshot-versioned table catalog (Iceberg-style, parquet-backed).

SURVEY.md §7 stack note: the production target is Iceberg via
``iceberg-spark-runtime`` with a hadoop catalog; this sandbox has no
network, so the catalog is the spec'd fallback — parquet data files plus a
JSON manifest emulating snapshot ids, kept behind this one module so the
Iceberg swap touches nothing else. The API mirrors what the crawl plan
needs from Iceberg:

- atomic ``commit`` of a new snapshot (overwrite or append),
- snapshot properties (wave id, per-partition counters — the north_rule's
  "per-partition lineage + metrics"),
- time travel / rollback to a snapshot id (resume-from-checkpoint).

Reference analogue: KVS ``pt-`` persistent tables + the progress tables'
``__meta__`` rows (``src/kvs/Worker.java:33-77``,
``src/jobs/PageRank.java:33-47``).

Commit protocol: data dirs are written first, then the manifest is
replaced via atomic ``os.replace`` of a temp file — a reader never sees a
half-written manifest, and a crash before the rename leaves the previous
snapshot current (orphan data dirs are harmless and reclaimed by
``vacuum``).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Catalog", "Snapshot", "CommitConflict", "STALE_GUARD_SECONDS"]

# A live writer holds a commit guard only between the O_EXCL claim and
# the manifest os.replace (no IO in between); anything older than this
# with no committed snapshot is a crash leftover.
STALE_GUARD_SECONDS = 10.0


class CommitConflict(RuntimeError):
    """Another writer committed this snapshot id first (optimistic
    concurrency, the catalog's CAS — reference analogue: the KVS
    conditional PUT, ``src/kvs/Worker.java:318-331``). The loser should
    reload the current snapshot, rebase its update, and retry."""


@dataclass
class Snapshot:
    snapshot_id: int
    data_dirs: list[str]
    properties: dict[str, Any] = field(default_factory=dict)
    parent_id: int | None = None

    def to_json(self) -> dict[str, Any]:
        return {
            "snapshot_id": self.snapshot_id,
            "data_dirs": self.data_dirs,
            "properties": self.properties,
            "parent_id": self.parent_id,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Snapshot":
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            data_dirs=list(d["data_dirs"]),
            properties=dict(d.get("properties", {})),
            parent_id=d.get("parent_id"),
        )


class Catalog:
    """A directory of snapshot-versioned tables."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "manifest.json")

    # -- manifest io ------------------------------------------------------
    def _load_manifest(self, name: str) -> dict[str, Any]:
        path = self._manifest_path(name)
        if not os.path.exists(path):
            return {"current": None, "snapshots": []}
        with open(path) as f:
            return json.load(f)

    def _store_manifest(self, name: str, manifest: dict[str, Any]) -> None:
        path = self._manifest_path(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, path)

    # -- public api -------------------------------------------------------
    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def snapshots(self, name: str) -> list[Snapshot]:
        return [Snapshot.from_json(s) for s in self._load_manifest(name)["snapshots"]]

    def current_snapshot(self, name: str) -> Snapshot | None:
        m = self._load_manifest(name)
        if m["current"] is None:
            return None
        for s in m["snapshots"]:
            if s["snapshot_id"] == m["current"]:
                return Snapshot.from_json(s)
        return None

    def stage_data(self, name: str, df: DataFrame) -> str:
        """Write a data dir WITHOUT committing it to the manifest —
        Iceberg-style staged files. A later ``write(..., staged_dirs=...)``
        makes them visible atomically; dirs staged by a crashed run are
        invisible orphans reclaimed by ``vacuum``."""
        data_dir = os.path.join(
            self._table_dir(name), f"data-staged-{uuid.uuid4().hex[:12]}"
        )
        df.write.mode("overwrite").parquet(data_dir)
        return data_dir

    def write(
        self,
        name: str,
        df: DataFrame | None,
        mode: str = "overwrite",
        properties: dict[str, Any] | None = None,
        partition_by: list[str] | None = None,
        staged_dirs: list[str] | None = None,
    ) -> Snapshot:
        """Commit a new snapshot. ``append`` unions the parent's data
        dirs; ``staged_dirs`` (from ``stage_data``) are included before
        the freshly written dir (``df=None`` commits staged dirs only)."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        if df is None and not staged_dirs:
            raise ValueError("write needs a DataFrame and/or staged_dirs")
        manifest = self._load_manifest(name)
        parent = self.current_snapshot(name)
        snap_id = (max((s["snapshot_id"] for s in manifest["snapshots"]), default=0)) + 1
        os.makedirs(self._table_dir(name), exist_ok=True)
        # Data first, guard last: the expensive parquet write happens
        # BEFORE the CAS claim, under a writer-unique dir name (no
        # collision between racing writers), so a crash mid-write leaves
        # only an orphan data dir (vacuumed later) — never a stale guard
        # that blocks resume. The O_EXCL guard is claimed immediately
        # before the manifest replace, shrinking the stale-guard window
        # from the whole data write to one os.replace.
        dirs = list(staged_dirs or [])
        if df is not None:
            data_dir = os.path.join(
                self._table_dir(name), f"data-{snap_id:06d}-{uuid.uuid4().hex[:8]}"
            )
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(data_dir)
            dirs.append(data_dir)
        # CAS guard: exactly one writer may claim snap_id — an O_EXCL
        # marker makes the claim atomic; a concurrent writer that loaded
        # the same parent fails HERE instead of silently replacing the
        # winner's snapshot at manifest-replace time. A guard whose id is
        # uncommitted AND old (crash between claim and replace — a
        # microseconds-wide window, so age is a safe tell vs a live
        # claimant) is reclaimed so a restarted run can re-commit.
        guard = os.path.join(self._table_dir(name), f".commit-{snap_id:06d}")
        try:
            os.close(os.open(guard, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        except FileExistsError:
            # The data write above can take arbitrarily long, so the
            # manifest loaded at the top of write() may be stale — judging
            # "orphan" from it could erase a commit that landed mid-write.
            # Re-load from disk before deciding anything.
            fresh = self._load_manifest(name)
            committed = {s["snapshot_id"] for s in fresh["snapshots"]}
            if snap_id in committed:
                raise CommitConflict(
                    f"table {name!r}: snapshot {snap_id} was committed by a "
                    "concurrent writer — reload and retry"
                ) from None
            try:
                st = os.stat(guard)
                stale = time.time() - st.st_mtime > STALE_GUARD_SECONDS
            except OSError:
                stale = False  # guard vanished mid-check: treat as live claim
            if not stale:
                raise CommitConflict(
                    f"table {name!r}: snapshot {snap_id} already claimed by a "
                    "concurrent writer — reload and retry"
                ) from None
            # Orphan guard from a crashed writer: take it over ATOMICALLY.
            # An unconditional unlink is NOT safe — two resumed writers can
            # both judge the guard stale, and the slower one's unlink would
            # remove the faster one's freshly re-created (live) guard,
            # letting both claim the same snapshot id. Instead, takeover is
            # serialized on the IDENTITY of the specific dead guard we
            # judged — (st_ino, st_mtime_ns) names that one file instance —
            # via an O_EXCL marker: exactly one claimant per dead instance
            # wins the marker; the loser never touches the guard path. A
            # writer that stats a FRESH guard never enters this branch, and
            # any replacement of the guard path requires winning the marker
            # for the previous instance first, so the winner's unlink below
            # provably removes only the file it judged stale.
            marker = f"{guard}.takeover-{st.st_ino}-{st.st_mtime_ns}"
            try:
                os.close(os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            except FileExistsError:
                raise CommitConflict(
                    f"table {name!r}: lost the takeover race for orphaned "
                    f"snapshot guard {snap_id} — reload and retry"
                ) from None
            try:
                os.unlink(guard)
            except OSError:
                pass
            try:
                os.close(os.open(guard, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            except FileExistsError:
                # a third writer claimed snap_id fresh between our
                # unlink and re-create — a legitimate live claim
                raise CommitConflict(
                    f"table {name!r}: snapshot {snap_id} was re-claimed "
                    "during orphan takeover — reload and retry"
                ) from None
            # The marker is NOT removed here: a slow racer that statted the
            # same dead instance before our takeover must keep losing its
            # O_EXCL even if it arrives after our commit — deleting the
            # marker early would let it win a "fresh" marker and unlink our
            # LIVE guard. Markers are swept with the consumed guards by
            # ``vacuum`` (ids are never reused once committed).
        # Post-claim verification: between our top-of-write() manifest load
        # and the claim, another writer's guard for snap_id may have been
        # claimed, committed, AND vacuumed away (so our O_EXCL succeeded on
        # a recycled name). Re-load and bail if the snapshot chain moved.
        manifest = self._load_manifest(name)
        if any(s["snapshot_id"] >= snap_id for s in manifest["snapshots"]):
            raise CommitConflict(
                f"table {name!r}: snapshot {snap_id} was committed while this "
                "writer was staging data — reload and retry"
            )
        parent = self.current_snapshot(name)
        if mode == "append" and parent is not None:
            dirs = parent.data_dirs + dirs
        snap = Snapshot(
            snapshot_id=snap_id,
            data_dirs=dirs,
            properties={"committed_at": time.time(), **(properties or {})},
            parent_id=parent.snapshot_id if parent else None,
        )
        manifest["snapshots"].append(snap.to_json())
        manifest["current"] = snap_id
        self._store_manifest(name, manifest)
        return snap

    def read(
        self, spark: SparkSession, name: str, snapshot_id: int | None = None
    ) -> DataFrame:
        """Read the current (or a time-travel) snapshot."""
        snap = (
            self.current_snapshot(name)
            if snapshot_id is None
            else self._snapshot_by_id(name, snapshot_id)
        )
        if snap is None:
            raise FileNotFoundError(f"table {name!r} has no current snapshot")
        return spark.read.parquet(*snap.data_dirs)

    def _snapshot_by_id(self, name: str, snapshot_id: int) -> Snapshot | None:
        for s in self.snapshots(name):
            if s.snapshot_id == snapshot_id:
                return s
        return None

    def update_properties(self, name: str, props: dict[str, Any]) -> None:
        """Merge extra properties into the CURRENT snapshot (post-commit
        metric patching, e.g. counters only known once a write's
        observation resolves)."""
        manifest = self._load_manifest(name)
        cur = manifest["current"]
        for s in manifest["snapshots"]:
            if s["snapshot_id"] == cur:
                s["properties"].update(props)
                break
        self._store_manifest(name, manifest)

    def rollback(self, name: str, snapshot_id: int) -> None:
        """Point ``current`` at an older snapshot (Iceberg rollback)."""
        manifest = self._load_manifest(name)
        ids = {s["snapshot_id"] for s in manifest["snapshots"]}
        if snapshot_id not in ids:
            raise KeyError(f"snapshot {snapshot_id} not found for table {name!r}")
        manifest["current"] = snapshot_id
        self._store_manifest(name, manifest)

    def drop(self, name: str) -> None:
        shutil.rmtree(self._table_dir(name), ignore_errors=True)

    def vacuum(self, name: str) -> None:
        """Delete data dirs unreachable from the current snapshot chain."""
        cur = self.current_snapshot(name)
        if cur is None:
            return
        keep: set[str] = set()
        snap: Snapshot | None = cur
        by_id = {s.snapshot_id: s for s in self.snapshots(name)}
        while snap is not None:
            keep.update(snap.data_dirs)
            snap = by_id.get(snap.parent_id) if snap.parent_id else None
        tdir = self._table_dir(name)
        max_committed = max((s.snapshot_id for s in self.snapshots(name)), default=0)
        for entry in os.listdir(tdir):
            full = os.path.join(tdir, entry)
            if entry.startswith("data-") and full not in keep:
                shutil.rmtree(full, ignore_errors=True)
            elif entry.startswith(".commit-"):
                # consumed CAS guards and their takeover markers (ids are
                # never reused once in the manifest); an in-flight claim
                # (> max committed) survives, and so do its markers
                try:
                    stem = entry.split(".takeover-", 1)[0]
                    if int(stem.rsplit("-", 1)[1]) <= max_committed:
                        os.unlink(full)
                except (ValueError, OSError):
                    pass
