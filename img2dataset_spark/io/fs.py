"""Scheme-dispatching filesystem layer for sinks and incremental state.

The reference routes ALL output IO through fsspec so `output_folder`
accepts s3://, gs://, hdfs://, etc. (reference README.md:261-266,
img2dataset/writer.py:107-113: `fsspec.core.url_to_fs(output_folder)`).
This module re-creates that contract without a hard fsspec dependency:

  - bare paths / file://  -> local filesystem (zero-overhead passthrough,
    parent dirs auto-created on write);
  - memory://             -> process-local in-memory filesystem, used by
    tests and useful for dry-runs.  NOTE: per-process — under a real
    cluster (or local-mode Python workers) each executor sees its own
    instance, so it is a unit-test/dry-run scheme, not a sink for
    distributed runs;
  - any other scheme      -> fsspec if importable (s3fs/gcsfs etc. bring
    their own schemes), else a clear error.

Writers hold only file-object handles, so every sink (tar, parquet,
tfrecord, json, raw files) works unchanged over any scheme.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import posixpath
import shutil
from contextlib import contextmanager


def _split_scheme(path: str) -> tuple[str, str]:
    """('memory', 'a/b') for 'memory://a/b'; ('', p) for plain paths."""
    if "://" in path:
        scheme, rest = path.split("://", 1)
        return scheme.lower(), rest
    return "", path


# ---------------------------------------------------------------------------
# memory:// — dict-backed, process-local
# ---------------------------------------------------------------------------

_MEMORY: dict[str, bytes] = {}


class _MemoryWriter(io.BytesIO):
    def __init__(self, key: str):
        super().__init__()
        self._key = key

    def close(self) -> None:
        if not self.closed:
            _MEMORY[self._key] = self.getvalue()
        super().close()


def memory_fs_snapshot() -> dict[str, bytes]:
    """The current contents of the memory:// filesystem (for tests)."""
    return dict(_MEMORY)


def memory_fs_clear() -> None:
    _MEMORY.clear()


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _fsspec():
    try:
        import fsspec  # type: ignore

        return fsspec
    except ImportError as e:  # pragma: no cover - fsspec absent in sandbox
        raise ImportError(
            "non-local output paths need fsspec (plus the scheme's backend, "
            "e.g. s3fs for s3://, gcsfs for gs://): pip install fsspec"
        ) from e


@contextmanager
def open_write(path: str, text: bool = False):
    """Writable file object for any supported scheme.  Parent directories
    are created automatically (local) / implied (object stores)."""
    scheme, rest = _split_scheme(path)
    if scheme in ("", "file"):
        parent = os.path.dirname(rest)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(rest, "w" if text else "wb") as fh:
            yield fh
    elif scheme == "memory":
        buf = _MemoryWriter(rest)
        out = io.TextIOWrapper(buf, encoding="utf-8") if text else buf
        try:
            yield out
        finally:
            out.close()  # closing the text wrapper flushes into buf first
    else:  # pragma: no cover - exercised only with fsspec installed
        with _fsspec().open(path, "w" if text else "wb") as fh:
            yield fh


@contextmanager
def open_read(path: str, text: bool = False):
    scheme, rest = _split_scheme(path)
    if scheme in ("", "file"):
        with open(rest, "r" if text else "rb") as fh:
            yield fh
    elif scheme == "memory":
        data = _MEMORY[rest]
        yield io.StringIO(data.decode("utf-8")) if text else io.BytesIO(data)
    else:  # pragma: no cover
        with _fsspec().open(path, "r" if text else "rb") as fh:
            yield fh


def makedirs(path: str) -> None:
    scheme, rest = _split_scheme(path)
    if scheme in ("", "file"):
        os.makedirs(rest, exist_ok=True)
    # memory:// and object stores have no directories


def isdir(path: str) -> bool:
    scheme, rest = _split_scheme(path)
    if scheme in ("", "file"):
        return os.path.isdir(rest)
    if scheme == "memory":
        prefix = rest.rstrip("/") + "/"
        return any(k.startswith(prefix) for k in _MEMORY)
    return _fsspec().url_to_fs(path)[0].isdir(path)  # pragma: no cover


def glob(pattern: str) -> list[str]:
    """Glob within one scheme; returns full URLs (scheme preserved)."""
    scheme, rest = _split_scheme(pattern)
    if scheme in ("", "file"):
        found = _glob.glob(rest)
        return [f"file://{p}" if scheme == "file" else p for p in sorted(found)]
    if scheme == "memory":
        import fnmatch

        return [
            f"memory://{k}" for k in sorted(_MEMORY) if fnmatch.fnmatch(k, rest)
        ]
    fs, _ = _fsspec().url_to_fs(pattern)  # pragma: no cover
    return [f"{scheme}://{p}" for p in fs.glob(pattern)]  # pragma: no cover


def rmtree(path: str) -> None:
    """Remove a directory tree / key prefix."""
    scheme, rest = _split_scheme(path)
    if scheme in ("", "file"):
        if os.path.isdir(rest):
            shutil.rmtree(rest)
    elif scheme == "memory":
        prefix = rest.rstrip("/") + "/"
        for k in [k for k in _MEMORY if k.startswith(prefix) or k == rest]:
            del _MEMORY[k]
    else:  # pragma: no cover
        fs, p = _fsspec().url_to_fs(path)
        if fs.exists(p):
            fs.rm(p, recursive=True)


def join(base: str, *parts: str) -> str:
    """Path join that keeps URL schemes intact (posix separators)."""
    scheme, rest = _split_scheme(base)
    joined = posixpath.join(rest.replace(os.sep, "/"), *parts)
    return f"{scheme}://{joined}" if scheme else joined


def basename(path: str) -> str:
    return posixpath.basename(_split_scheme(path)[1])
