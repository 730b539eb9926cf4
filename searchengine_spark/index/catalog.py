"""Snapshot catalog: atomic publish + rollback for index artifacts.

Production target is an Iceberg catalog (atomic ``REPLACE TABLE`` /
snapshot rollback); this sandbox has no Iceberg jars, so the same
contract is provided over plain parquet directories + JSON manifests:

- every build lands in ``<root>/snap-<id>/`` (postings/, docmap/,
  terms/, stats.json, ledger.json);
- ``<root>/CURRENT`` names the live snapshot and is swapped with
  ``os.replace`` (atomic on POSIX) — readers never observe a torn
  index, mirroring the reference's tmp-dir + ``os.Rename`` swap
  (reference ``internal/index/index.go:356-375``);
- old snapshots are retained → ``rollback()`` is the analogue of the
  reference's config revert (``internal/server/handler.go:363-396``).

Only the pointer file is mutated in place; all data is write-once.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass


@dataclass(frozen=True)
class Snapshot:
    snap_id: int
    path: str
    manifest: dict
    # Iceberg backend only (index/iceberg.py): artifact → {"table":
    # identifier, "snapshot_id": pin}. None = parquet-dir artifacts.
    tables: dict | None = None

    @property
    def postings_dir(self) -> str:
        return os.path.join(self.path, "postings")

    @property
    def docmap_dir(self) -> str:
        return os.path.join(self.path, "docmap")

    @property
    def terms_dir(self) -> str:
        return os.path.join(self.path, "terms")

    @property
    def stats(self) -> dict:
        return self.manifest["stats"]


class IndexCatalog:
    """One catalog per logical index (reference `indexName`)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- pointer -----------------------------------------------------------
    def _current_file(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def current_id(self) -> int | None:
        try:
            with open(self._current_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def current(self) -> Snapshot | None:
        sid = self.current_id()
        return self.load(sid) if sid is not None else None

    def load(self, snap_id: int) -> Snapshot:
        path = os.path.join(self.root, f"snap-{snap_id}")
        with open(os.path.join(path, "manifest.json")) as f:
            return Snapshot(snap_id, path, json.load(f))

    def history(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("snap-"):
                try:
                    out.append(int(name[5:]))
                except ValueError:
                    continue
        return sorted(out)

    # -- staging / publish -------------------------------------------------
    def next_id(self) -> int:
        hist = self.history()
        return (hist[-1] + 1) if hist else 1

    def staging_dir(self, snap_id: int) -> str:
        """Work area for an in-flight build; survives a crash → resume."""
        path = os.path.join(self.root, f"stage-{snap_id}")
        os.makedirs(path, exist_ok=True)
        return path

    def publish(self, snap_id: int, manifest: dict) -> Snapshot:
        """stage-<id> → snap-<id> rename, manifest write, CURRENT swap."""
        stage = os.path.join(self.root, f"stage-{snap_id}")
        final = os.path.join(self.root, f"snap-{snap_id}")
        manifest = dict(manifest)
        manifest.setdefault("snap_id", snap_id)
        manifest.setdefault("published_at", time.time())
        with open(os.path.join(stage, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(stage, final)  # atomic: manifest travels with the dir
        tmp = self._current_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap_id))
        os.replace(tmp, self._current_file())
        return Snapshot(snap_id, final, manifest)

    def rollback(self, snap_id: int) -> Snapshot:
        snap = self.load(snap_id)  # raises if snapshot missing
        tmp = self._current_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap_id))
        os.replace(tmp, self._current_file())
        return snap

    def expire(self, keep_last: int = 3) -> list[int]:
        """Drop all but the newest `keep_last` snapshots (never CURRENT)."""
        cur = self.current_id()
        victims = [s for s in self.history()[:-keep_last] if s != cur]
        for sid in victims:
            shutil.rmtree(os.path.join(self.root, f"snap-{sid}"), ignore_errors=True)
        return victims
