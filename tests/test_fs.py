"""Sink filesystem routing (io/fs.py): scheme resolution, tmp/commit
semantics per scheme, and rejection of unsupported schemes."""

import pytest

from openeo_processes_dask_ml_spark.io import fs


def test_bare_path_resolves_local_absolute(tmp_path):
    sp = fs.resolve(str(tmp_path / "x.bin"))
    assert sp.scheme == "local" and sp.atomic_rename
    assert sp.path.startswith("/")


def test_file_uri_resolves_local(tmp_path):
    sp = fs.resolve(f"file://{tmp_path}/y.bin")
    assert sp.scheme == "local"
    assert sp.path == f"{tmp_path}/y.bin"


def test_local_tmp_commit_roundtrip(tmp_path):
    sp = fs.makedirs(str(tmp_path / "d"))
    target = fs.resolve(str(tmp_path / "d" / "part-0"))
    tmp = target.tmp_path("7")
    assert tmp != target.path and "/." in tmp and tmp.endswith(".tmp")
    with target.open_write(tmp) as fh:
        fh.write(b"abc123")
    target.commit(tmp)
    with target.open_read() as fh:
        assert fh.read() == b"abc123"
    assert sp.scheme == "local"


def test_abort_removes_tmp(tmp_path):
    import os

    target = fs.resolve(str(tmp_path / "part-1"))
    tmp = target.tmp_path("9")
    with target.open_write(tmp) as fh:
        fh.write(b"junk")
    target.abort(tmp)
    assert not os.path.exists(tmp)
    target.abort(tmp)  # idempotent on missing files


def test_object_store_commit_is_copy_then_delete():
    """On stores without atomic rename, attempts write a .tmp KEY the
    reader glob never matches; commit promotes it with a server-side
    copy then deletes the tmp (ADVICE r14: writing the final key
    directly let an error-path close() publish a truncated shard)."""

    class FakeFS:
        def __init__(self):
            self.calls = []

        def copy_file(self, src, dst):
            self.calls.append(("copy", src, dst))

        def delete_file(self, path):
            self.calls.append(("delete", path))

    fake = FakeFS()
    sp = fs.SinkPath(fs=fake, path="bucket/k/part-0", scheme="s3")
    assert not sp.atomic_rename
    tmp = sp.tmp_path("3")
    assert tmp == "bucket/k/.part-0-3.tmp"  # never the final key
    sp.commit(tmp)
    assert fake.calls == [
        ("copy", tmp, "bucket/k/part-0"),
        ("delete", tmp),
    ]


def test_unsupported_scheme_rejected():
    with pytest.raises(ValueError, match="unsupported sink scheme"):
        fs.resolve("ftp://host/path")
    with pytest.raises(ValueError, match="supported"):
        fs.resolve("webdav://x/y")


def test_object_store_commit_falls_back_to_stream_copy():
    """r15 review: S3 caps single CopyObject at 5 GiB — when the
    server-side copy fails, commit re-uploads the tmp object through
    bounded-memory streams instead of failing the task forever."""
    import io

    class FakeFS:
        def __init__(self):
            self.objects = {"k/.part-0-1.tmp": b"x" * (3 << 20)}
            self.deleted = []

        def copy_file(self, src, dst):
            raise OSError("CopyObject: object too large")

        def open_input_stream(self, path):
            return io.BytesIO(self.objects[path])

        def open_output_stream(self, path):
            buf = io.BytesIO()
            close = buf.close
            fsref = self

            def capture():
                fsref.objects[path] = buf.getvalue()
                close()

            buf.close = capture
            return buf

        def delete_file(self, path):
            self.deleted.append(path)
            self.objects.pop(path, None)

    fake = FakeFS()
    sp = fs.SinkPath(fs=fake, path="k/part-0", scheme="s3")
    sp.commit("k/.part-0-1.tmp")
    assert fake.objects["k/part-0"] == b"x" * (3 << 20)
    assert "k/.part-0-1.tmp" in fake.deleted


def test_object_store_copy_retried_before_stream_fallback():
    """ADVICE r15: a transient server-side copy fault is retried once
    (cheap) instead of paying a full stream re-upload."""

    class FakeFS:
        def __init__(self):
            self.copies = 0
            self.deleted = []
            self.streamed = False

        def copy_file(self, src, dst):
            self.copies += 1
            if self.copies == 1:
                raise OSError("throttled")

        def open_input_stream(self, path):
            self.streamed = True
            raise AssertionError("stream fallback must not run")

        def delete_file(self, path):
            self.deleted.append(path)

    fake = FakeFS()
    sp = fs.SinkPath(fs=fake, path="k/part-0", scheme="s3")
    sp.commit("k/.part-0-1.tmp")
    assert fake.copies == 2
    assert not fake.streamed
    assert fake.deleted == ["k/.part-0-1.tmp"]


def test_stream_fallback_failure_never_publishes_partial_final_key():
    """ADVICE r15 medium: if the stream re-upload dies mid-copy, the
    context manager must not complete a truncated multipart upload at
    the FINAL key — commit deletes the partial final object, leaves
    the tmp in place for the retry, and re-raises chained to the
    original copy_file error."""
    import io

    class FakeFS:
        def __init__(self):
            self.objects = {"k/.part-0-1.tmp": b"x" * 100}
            self.deleted = []

        def copy_file(self, src, dst):
            raise OSError("CopyObject: object too large")

        def open_input_stream(self, path):
            class DyingReader(io.BytesIO):
                reads = 0

                def read(self, n=-1):
                    DyingReader.reads += 1
                    if DyingReader.reads > 1:
                        raise ConnectionError("socket reset mid-copy")
                    return b"x" * 10

            return DyingReader(self.objects[path])

        def open_output_stream(self, path):
            buf = io.BytesIO()
            close = buf.close
            fsref = self

            def capture():  # close() == multipart COMPLETE on S3
                fsref.objects[path] = buf.getvalue()
                close()

            buf.close = capture
            return buf

        def delete_file(self, path):
            self.deleted.append(path)
            self.objects.pop(path, None)

    fake = FakeFS()
    sp = fs.SinkPath(fs=fake, path="k/part-0", scheme="s3")
    with pytest.raises(ConnectionError) as exc_info:
        sp.commit("k/.part-0-1.tmp")
    # chained to the original copy error so the root cause survives
    assert isinstance(exc_info.value.__cause__, OSError)
    # the truncated final object was removed; whether the context
    # manager published it first is pyarrow's business — what matters
    # is it does not persist where readers look
    assert "k/part-0" not in fake.objects
    assert "k/part-0" in fake.deleted
    # the tmp object survives for the task retry
    assert "k/.part-0-1.tmp" in fake.objects
