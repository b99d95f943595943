"""Pluggable filesystem for metadata I/O (commit log, refs, manifests).

The reference abstracts its storage backends behind provider classes
(``muller/core/storage/s3.py``, ``huawei_obs.py``, ``local.py``); data
files here already go through Spark's own Hadoop-FS readers/writers, but
the *metadata* layer (commit records, branch refs, snapshot and index
manifests — kilobytes of JSON) was plain ``open()``/``os``.  This module
gives those call sites one seam:

- :class:`LocalFS` — the default, plain POSIX.
- :func:`register_fs` — install a factory for a URL scheme
  (``memfs://`` in tests; ``s3://``/``obs://`` in a real deployment).
- An **fsspec bridge**: if a path has a scheme with no registered
  factory and ``fsspec`` is importable, the matching fsspec filesystem
  is adapted automatically — so ``s3://`` works wherever s3fs is
  installed, with zero code here.

Deliberately NOT routed through this seam: ``versioning/locks.py``.
Leases rely on atomic exclusive-create / rename / link, which generic
object stores don't all provide (S3 needs if-none-match puts); the lock
module documents that assumption and stays a local/POSIX (or
conditional-write) concern rather than pretending a blind PUT is a lock.

Rename semantics note: ``rename`` here is a *metadata* move (small
files/dirs).  Object-store adapters implement it as copy+delete, which
is fine at manifest scale and never on the data path.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Callable


class LocalFS:
    """POSIX filesystem (default)."""

    # O_APPEND writes of one small record are atomic on POSIX, so the
    # commit log may safely append to a single jsonl file here
    atomic_append = True

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as fh:
            fh.write(text)

    def append_text(self, path: str, text: str) -> None:
        with open(path, "a") as fh:
            fh.write(text)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)


class FsspecFS:
    """Adapter over an ``fsspec`` filesystem instance (import-gated)."""

    def __init__(self, fs: Any) -> None:
        self._fs = fs

    def read_text(self, path: str) -> str:
        with self._fs.open(path, "r") as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        with self._fs.open(path, "w") as fh:
            fh.write(text)

    # Object stores have no append: append_text below is a non-atomic
    # read-modify-write, and two concurrent writers can interleave and
    # silently drop a record.  Callers that may race (the commit-log
    # audit trail) must check this flag and write one object per record
    # instead — CommitLog._append_commit_record does exactly that.
    atomic_append = False

    def append_text(self, path: str, text: str) -> None:
        # non-atomic read-modify-write; see atomic_append above
        prev = self.read_text(path) if self.exists(path) else ""
        self.write_text(path, prev + text)

    def exists(self, path: str) -> bool:
        return self._fs.exists(path)

    def isdir(self, path: str) -> bool:
        return self._fs.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return [p.rstrip("/").rsplit("/", 1)[-1] for p in self._fs.ls(path, detail=False)]

    def makedirs(self, path: str) -> None:
        self._fs.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        self._fs.rm(path)

    def rename(self, src: str, dst: str) -> None:
        self._fs.mv(src, dst, recursive=True)

    def rmtree(self, path: str) -> None:
        self._fs.rm(path, recursive=True)


_REGISTRY: dict[str, Callable[[], Any]] = {}


def register_fs(scheme: str, factory: Callable[[], Any]) -> None:
    """Install a filesystem factory for ``scheme`` (e.g. ``"memfs"``)."""
    _REGISTRY[scheme] = factory


def scheme_of(path: str) -> str | None:
    if "://" in path:
        return path.split("://", 1)[0]
    return None


def get_fs(path: str):
    """Filesystem for ``path``: registered scheme → its factory; unknown
    scheme → fsspec (if importable); no scheme → LocalFS."""
    scheme = scheme_of(path)
    if scheme is None:
        return LocalFS()
    if scheme in _REGISTRY:
        return _REGISTRY[scheme]()
    try:
        import fsspec  # type: ignore

        return FsspecFS(fsspec.filesystem(scheme))
    except ImportError as e:
        raise ValueError(
            f"no filesystem registered for scheme {scheme!r} and fsspec "
            "is not installed; register one with muller_spark.fs.register_fs"
        ) from e


def read_json(fs, path: str) -> dict:
    return json.loads(fs.read_text(path))


def write_json(fs, path: str, obj: dict) -> None:
    fs.write_text(path, json.dumps(obj))
