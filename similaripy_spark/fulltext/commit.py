"""Commit protocol: atomic-publish abstraction for index artifacts.

The build writes three kinds of artifacts — JSON manifests (meta, lineage),
parquet directories (segments, stats tables) — and needs exactly one
guarantee from the storage layer: *publish is all-or-nothing*, so a crashed
build never leaves a half-visible artifact and resume can trust what it
reads (write-then-commit, FIXTURES.md §6).

``LocalFSCommitProtocol`` realizes that with POSIX rename (atomic on one
filesystem). An object store (S3/GCS) has no atomic directory rename — its
implementation of this same interface instead writes each artifact under a
unique staged prefix and publishes by atomically swapping a small pointer
object (conditional PUT), the standard table-format commit design (e.g.
Iceberg's metadata-pointer swap). The engine only ever calls the methods
below, so that backend is a drop-in: nothing in index_build.py or
index_merge.py knows about rename.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional


class CommitProtocol:
    """Interface. Paths are engine-level logical paths (strings); whether
    they are POSIX paths or object-store keys is the implementation's
    business."""

    # --- reads -------------------------------------------------------------
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_json(self, path: str) -> dict:
        raise NotImplementedError

    def try_read_json(self, path: str) -> Optional[dict]:
        """None on missing OR torn/corrupt artifact (a torn manifest must
        read as 'not committed', never as an error)."""
        raise NotImplementedError

    def list_committed_json(self, directory: str, prefix: str) -> list[dict]:
        raise NotImplementedError

    # --- writes ------------------------------------------------------------
    def ensure_dir(self, path: str) -> None:
        raise NotImplementedError

    def publish_json(self, path: str, obj: dict) -> None:
        """Atomically make `obj` visible at `path` (readers see the old
        content or the new content, never a prefix)."""
        raise NotImplementedError

    def stage_path(self, final_path: str) -> str:
        """A scratch location for writing a directory artifact destined for
        `final_path`; cleared of any torn previous attempt."""
        raise NotImplementedError

    def commit_dir(self, staged_path: str, final_path: str) -> None:
        """Atomically publish the staged directory at `final_path`,
        replacing any previous committed version."""
        raise NotImplementedError

    def discard(self, staged_path: str) -> None:
        """Drop leftover staged scratch (idempotent; missing path is fine)."""
        raise NotImplementedError


class LocalFSCommitProtocol(CommitProtocol):
    """POSIX implementation: temp + rename. Suffix-based staging keeps the
    temp on the same filesystem so `os.replace` stays atomic."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_json(self, path: str) -> dict:
        with open(path) as f:
            return json.load(f)

    def try_read_json(self, path: str) -> Optional[dict]:
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def list_committed_json(self, directory: str, prefix: str) -> list[dict]:
        if not os.path.isdir(directory):
            return []
        out = []
        for f in sorted(os.listdir(directory)):
            if f.startswith(prefix) and f.endswith(".json"):
                rec = self.try_read_json(os.path.join(directory, f))
                if rec is not None:
                    out.append(rec)
        return out

    def ensure_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def publish_json(self, path: str, obj: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, path)

    def stage_path(self, final_path: str) -> str:
        staged = final_path + "__tmp"
        if os.path.isdir(staged):
            shutil.rmtree(staged)  # torn previous attempt
        return staged

    def commit_dir(self, staged_path: str, final_path: str) -> None:
        if os.path.isdir(final_path):
            shutil.rmtree(final_path)  # replace previous committed version
        os.replace(staged_path, final_path)

    def discard(self, staged_path: str) -> None:
        if os.path.isdir(staged_path):
            shutil.rmtree(staged_path)
