"""Storage I/O abstraction for the versioned GraphStore.

The store's *data* files are written/read by Spark through Hadoop's
FileSystem layer (parquet scans and writes work against HDFS/S3A/local
alike); what this module abstracts is the store's own *metadata and
maintenance* traffic — manifest/meta JSON, the commit pointer swap,
the size gate, vacuum relocation, and the single-writer lock — which
the store otherwise issues as raw POSIX calls.

Why it exists (the 100 TB posture): on an object store
- ``rename`` is a COPY+DELETE (vacuum "relocation" re-writes bytes; on
  S3-class stores prefer a longer retention so relocation stays rare,
  or run vacuum where a rename-capable layer — HDFS, a metadata DB —
  fronts the objects);
- directory listing is paged (LIST calls), so manifest discovery must
  not assume a cheap readdir of millions of entries — the store only
  lists version directories (one per commit, bounded by retention);
- there is no atomic ``rename``-onto semantics: the ``meta.json``
  pointer swap must map to the store's conditional-put primitive
  (put-if-match on the previous ETag gives the same single-commit-
  point guarantee that ``os.replace`` gives locally);
- the advisory lock maps to a lease object (put-if-absent with TTL).

``LocalFS`` is the default, POSIX implementation. Tests inject
recording/failing implementations to pin which primitives the store
depends on (tests/test_storage.py::TestInjectedIO).
"""

from __future__ import annotations

import os
import shutil
import time


class StorageIO:
    """Minimal contract the GraphStore needs from its metadata store.

    Implementations must provide atomicity on ``replace_file`` (the
    commit point) and mutual exclusion on ``acquire_lock`` /
    ``release_lock`` (the single-writer contract between commits and
    vacuum). Everything else is plain read/write/list.
    """

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text_atomic(self, path: str, text: str) -> None:
        """Write so readers see either the old or the new content,
        never a torn file, and the swap is the commit point."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        raise NotImplementedError

    def tree_size_at_least(self, path: str, bound: int) -> int:
        """Total bytes under ``path``, short-circuiting once ``bound``
        is reached (returns a value >= bound in that case)."""
        raise NotImplementedError

    def rename_tree(self, src: str, dst: str) -> None:
        """Move a directory tree (vacuum relocation). POSIX: a rename.
        Object stores: a copy — see module docstring."""
        raise NotImplementedError

    def remove_tree(self, path: str) -> None:
        raise NotImplementedError

    def acquire_lock(self, path: str, timeout_s: float = 30.0) -> None:
        """Take the store's writer lock or raise TimeoutError. Local:
        O_CREAT|O_EXCL lock file. Object store: put-if-absent lease."""
        raise NotImplementedError

    def release_lock(self, path: str) -> None:
        raise NotImplementedError


class LocalFS(StorageIO):
    """POSIX implementation (the test/default substrate)."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)  # atomic on POSIX — the commit point

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def list_dir(self, path: str) -> list[str]:
        return os.listdir(path)

    def tree_size_at_least(self, path: str, bound: int) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    continue  # racing vacuum/compaction: file already gone
                if total >= bound:
                    return total
        return total

    def rename_tree(self, src: str, dst: str) -> None:
        os.renames(src, dst)

    def remove_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def acquire_lock(self, path: str, timeout_s: float = 30.0) -> None:
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return
            except FileExistsError:
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"writer lock {path} held past {timeout_s}s — "
                        "another commit/vacuum is running (or crashed; "
                        "delete the lock file to recover)"
                    )
                time.sleep(0.02)

    def release_lock(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
