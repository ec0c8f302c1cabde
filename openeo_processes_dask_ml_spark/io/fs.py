"""Executor-side filesystem routing for the binary sinks.

Reference analog: the reference writes wherever fsspec reaches
(`minibackend/custom_processes.py:191-219` hands paths straight to
xarray/zarr, which resolve s3://... through fsspec). Our binary sinks
(WARC/zarr/gtiff/netCDF3) run INSIDE executor tasks where the JVM
Hadoop FileSystem is unreachable (Python workers have no py4j
gateway), so the driver-side `spark._jvm...FileSystem` pattern used
by `compact_table` (io/load.py:822) cannot serve them. `pyarrow.fs`
is the executor-usable equivalent: pure C++ filesystem handlers for
local, s3://, gs://, and hdfs:// paths that ship inside the pyarrow
wheel every worker already imports for Arrow batches.

Commit semantics by scheme (the part sinks must get right):
- local / file:// — POSIX rename is atomic: write `.tmp`, then
  `replace()` onto the deterministic final name. hdfs:// renames are
  atomic too and take the same path.
- s3:// / gs:// — object stores have NO rename, but a
  PUT/multipart-complete is atomic: an object never appears
  half-written. Sinks therefore write a `.tmp` KEY the readers' glob
  never matches, and `commit()` promotes it with a SERVER-SIDE copy
  (S3 CopyObject / GCS rewrite via pyarrow `copy_file`) + delete of
  the tmp key. An earlier design wrote the final key directly and
  relied on byte-identical retries, but its error path could
  `close()` — i.e. COMPLETE — a truncated multipart upload at the
  final name before the abort delete ran (ADVICE r14 medium): if the
  delete failed or the worker died in between, a corrupt shard
  persisted where readers look. With the tmp-key protocol a failed
  attempt can at worst leave a truncated `.tmp` object no reader
  matches. Duplicate/speculative commits remain last-writer-wins
  idempotent because every attempt produces byte-identical content
  (deterministic record IDs — ADVICE r13).

Local *bare* paths (no scheme) are resolved relative to the worker's
cwd — correct under local[*] and shared-NFS clusters, silently wrong
on multi-node clusters with independent disks. That trade-off is
documented at each sink; this module keeps bare paths working
because every test and the driver contract use them.
"""

from __future__ import annotations

import os
from typing import BinaryIO

try:  # pyarrow is a baked-in dependency, but keep the gate explicit
    from pyarrow import fs as _pafs
except ImportError:  # pragma: no cover
    _pafs = None

# schemes whose FileSystem.move is an atomic rename
_RENAME_SCHEMES = ("local", "hdfs")


class SinkPath:
    """One resolved sink location: scheme-aware open/commit/delete.

    `tmp_path()` returns the per-attempt name a sink should write —
    never the final name on ANY scheme — and `commit()` promotes it
    (atomic rename where the scheme has one, server-side copy +
    delete on object stores; see module docstring). All byte counting
    is done by the caller (object-store streams don't all support
    tell())."""

    def __init__(self, fs, path: str, scheme: str, uri: str | None = None):
        self.fs = fs
        self.path = path  # the filesystem-internal path (no scheme)
        self.scheme = scheme
        # scheme-PRESERVING address: what manifests/indexes should
        # record so a later resolve() round-trips to the same store
        # (sp.path for s3 is "bucket/key", which a naive re-resolve
        # would treat as a local path — caught in review)
        self.uri = uri if uri is not None else path
        self.atomic_rename = scheme in _RENAME_SCHEMES

    def tmp_path(self, attempt: str) -> str:
        d, name = os.path.split(self.path)
        return f"{d}/.{name}-{attempt}.tmp"

    def open_write(self, path: str) -> BinaryIO:
        return self.fs.open_output_stream(path)

    def commit(self, tmp: str) -> None:
        if tmp == self.path:
            return
        if self.atomic_rename:
            self.fs.move(tmp, self.path)
            return
        # object stores: server-side copy (atomic PUT at the final
        # key — readers never see a partial object) then drop the tmp
        # key; a failed delete leaves only an ignored .tmp object.
        # S3 caps a single CopyObject at 5 GiB (r15 review); when the
        # copy fails, fall back to a bounded-memory stream re-upload —
        # a multipart PUT has no size ceiling and its completion is
        # just as atomic. Slower than a server-side copy, but shards
        # that large are already outside every sink's sizing guidance.
        try:
            self.fs.copy_file(tmp, self.path)
        except Exception as copy_err:
            # Retry the cheap server-side copy once: transient network
            # or throttling faults are far more common than the
            # genuine >5 GiB EntityTooLarge case, and a retry avoids
            # silently paying a full re-transfer for them (ADVICE r15).
            try:
                self.fs.copy_file(tmp, self.path)
            except Exception:
                self._stream_copy(tmp, copy_err)
        self.abort(tmp)

    def _stream_copy(self, tmp: str, copy_err: Exception) -> None:
        """Bounded-memory re-upload fallback for object-store commits
        whose server-side copy failed twice. A mid-copy failure must
        NOT let the context manager close() — i.e. COMPLETE — a
        truncated multipart upload at the FINAL key (ADVICE r15
        medium: that would re-open the corrupt-shard hazard the
        tmp-key protocol exists to eliminate). On any failure the
        final key is best-effort deleted, the tmp object is left in
        place for the retry, and the error is re-raised chained to
        the original copy_file failure."""
        try:
            with self.fs.open_input_stream(tmp) as src, (
                self.fs.open_output_stream(self.path)
            ) as dst:
                while True:
                    buf = src.read(8 << 20)
                    if not buf:
                        break
                    dst.write(buf)
        except Exception as stream_err:
            try:
                self.fs.delete_file(self.path)
            except Exception:  # pragma: no cover - best-effort cleanup
                pass
            raise stream_err from copy_err

    def abort(self, tmp: str) -> None:
        try:
            self.fs.delete_file(tmp)
        except (FileNotFoundError, OSError):  # pragma: no cover
            pass

    def open_read(self):
        return self.fs.open_input_stream(self.path)

    def open_read_random(self):
        """Seekable handle (ranged reads on object stores) — the CDX
        random-access path; open_read streams are sequential-only."""
        return self.fs.open_input_file(self.path)


def resolve(path: str) -> SinkPath:
    """Resolve a URI or bare path to a SinkPath. Bare and file://
    paths get the local handler; s3:// gs:// hdfs:// get pyarrow's
    native handlers; anything else raises with the supported list."""
    if _pafs is None:  # pragma: no cover
        raise ImportError("pyarrow.fs is required for sink routing")
    scheme, sep, rest = path.partition("://")
    if not sep:
        ap = os.path.abspath(path)
        return SinkPath(_pafs.LocalFileSystem(), ap, "local", ap)
    if scheme == "file":
        p = rest or "/"
        return SinkPath(_pafs.LocalFileSystem(), p, "local", p)
    if scheme in ("s3", "s3a", "gs", "hdfs"):
        try:
            fs, p = _pafs.FileSystem.from_uri(
                path.replace("s3a://", "s3://", 1)
            )
        except Exception as exc:  # credentials / endpoint problems
            raise IOError(
                f"cannot initialise {scheme}:// filesystem for "
                f"{path!r}: {exc}"
            ) from exc
        return SinkPath(
            fs, p, "hdfs" if scheme == "hdfs" else scheme, path
        )
    raise ValueError(
        f"unsupported sink scheme {scheme!r} in {path!r}: supported "
        "are bare/absolute local paths, file://, s3://, s3a://, "
        "gs://, hdfs://"
    )


def makedirs(path: str) -> SinkPath:
    """resolve() + create the directory tree (no-op namespace on
    object stores, where create_dir is cheap metadata)."""
    sp = resolve(path)
    sp.fs.create_dir(sp.path, recursive=True)
    return sp
