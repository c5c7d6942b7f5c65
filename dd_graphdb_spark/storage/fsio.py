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
- the advisory lock maps to a lease object: put-if-absent WITH an
  expiry recorded in the object body, broken by conditional-delete-
  if-match on the observed stale body (the ETag guard closes the
  read→delete race that POSIX ``unlink`` can only narrow — see
  ``LocalFS.acquire_lock``).

``LocalFS`` is the default, POSIX implementation. Tests inject
recording/failing implementations to pin which primitives the store
depends on (tests/test_storage.py::TestInjectedIO).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

#: default writer-lease duration. A lock whose lease is past this
#: window is breakable even when the holder cannot be pid-probed
#: (e.g. it ran on another host against a shared mount). MUST exceed
#: the longest legitimate commit/vacuum — a live writer past its lease
#: can be fenced out mid-write (the documented lease contract; Spark
#: diff+write jobs have been measured over 120 s at scale, hence the
#: 1 h default).
DEFAULT_LEASE_S = 3600.0


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
        O_CREAT|O_EXCL lock file recording ``{writer, pid, expires}``,
        with takeover of dead-holder / expired-lease locks. Object
        store: put-if-absent lease with expiry in the body."""
        raise NotImplementedError

    def release_lock(self, path: str) -> None:
        raise NotImplementedError


class LocalFS(StorageIO):
    """POSIX implementation (the test/default substrate).

    ``lease_s`` is the writer-lease duration stamped into lock files
    this instance creates (see ``acquire_lock``); it is an instance
    policy, not a per-call argument, so injected test doubles that
    override ``acquire_lock(path, timeout_s)`` keep working."""

    def __init__(self, lease_s: float = DEFAULT_LEASE_S):
        self.lease_s = lease_s

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

    @staticmethod
    def _lock_is_stale(body: bytes) -> bool:
        """A lock body is stale when its holder process is dead (same-
        host pid probe) or its lease has expired. Legacy bodies (a bare
        pid from pre-lease stores) carry no lease and are stale only on
        a dead pid."""
        try:
            info = json.loads(body.decode() or "{}")
        except (ValueError, UnicodeDecodeError):
            info = {}
        if not isinstance(info, dict):
            info = {}
        pid = info.get("pid")
        if pid is None:  # legacy bare-pid content
            try:
                pid = int(body.decode().strip())
            except (ValueError, UnicodeDecodeError):
                return False  # unreadable foreign lock: never break it
        expires = info.get("expires")
        if expires is not None and time.time() > float(expires):
            return True
        try:
            os.kill(int(pid), 0)
        except ProcessLookupError:
            return True  # holder died without releasing
        except PermissionError:
            pass  # alive, owned by another uid
        return False

    def acquire_lock(self, path: str, timeout_s: float = 30.0) -> None:
        """O_CREAT|O_EXCL lock with a lease. The lock body records
        ``{writer, pid, expires}``; a waiter that finds the lock STALE
        (holder pid dead, or lease expired) breaks it and retries.

        Break protocol: re-read immediately before ``unlink`` and only
        remove the lock if its bytes still equal the stale body first
        observed (a fresh lock has a new writer uuid + future expiry, so
        it never byte-matches), then race the O_EXCL create like any
        other waiter. A microsecond read→unlink TOCTOU window remains —
        POSIX unlink is unconditional; the object-store mapping closes
        it with conditional-delete-if-match on the observed body (module
        docstring). The post-create fence (re-read and verify our own
        writer uuid) makes a lock lost to that window detectable by its
        new holder rather than silently shared.

        The lease (``self.lease_s``) exists for crashed holders that
        cannot be pid-probed; a LIVE writer must finish inside it or
        risk being fenced — size it above the longest commit/vacuum."""
        my_body = json.dumps(
            {
                "writer": uuid.uuid4().hex,
                "pid": os.getpid(),
                "expires": time.time() + self.lease_s,
            }
        ).encode()
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, my_body)
                os.close(fd)
            except FileExistsError:
                try:
                    with open(path, "rb") as f:
                        body = f.read()
                except FileNotFoundError:
                    continue  # released between create and read: retry now
                if self._lock_is_stale(body):
                    try:
                        with open(path, "rb") as f:
                            if f.read() == body:  # still the observed stale body
                                os.unlink(path)
                    except FileNotFoundError:
                        pass  # another waiter broke it first
                    continue
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"writer lock {path} held past {timeout_s}s by a "
                        "LIVE holder within its lease — another commit/"
                        "vacuum is running (crashed/expired holders are "
                        "taken over automatically)"
                    )
                time.sleep(0.02)
                continue
            # post-create fence: verify the lock on disk is OURS — a
            # racing breaker could have unlinked our fresh lock inside
            # its TOCTOU window and a third writer re-created it.
            try:
                with open(path, "rb") as f:
                    if f.read() == my_body:
                        return
            except FileNotFoundError:
                pass
            time.sleep(0.02)  # lost the fence: behave as a plain waiter

    def release_lock(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
