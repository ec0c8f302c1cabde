"""Distributed WARC (ISO 28500 / Common Crawl layout) source and sink.

Reference analog: none — the reference engine has no web-archive path
at all; this is a beyond-reference crawl-ingest capability on the
SURVEY §2.9 source surface, built from public format knowledge only
(ISO 28500:2017 record grammar + the Common Crawl convention of one
gzip member per record, concatenated into ~1 GB shards).

Scale design: shards are read ONE FILE PER TASK through Spark's
``binaryFile`` source — Common Crawl ships hundreds of thousands of
shards per snapshot, so file-level parallelism saturates any cluster
without intra-file splitting (a gzip member stream has no cheap split
points anyway). Record parsing is a ``mapInPandas`` generator that
emits bounded Arrow batches, so a 1 GB shard never materializes more
than ``batch_records`` parsed records at once on an executor. The
sink writes the standard member-per-record gzip layout (warcinfo
record first), so stock readers (warcio et al.) can consume the
output; the gate re-reads it with this module's own reader — the
gtiff/zarr/netcdf own-roundtrip discipline — and unit tests verify
the reader against hand-built spec bytes and the writer against
stdlib gzip, independently of each other.

Format boundaries (explicit, like the codecs'): chunked
transfer-encoding inside HTTP payloads is NOT decoded (Common Crawl
stores payloads unchunked; a chunked record surfaces its raw body),
and ``Transfer-Encoding: gzip`` HTTP bodies pass through undecoded.
"""

from __future__ import annotations

import gzip
import os
import uuid
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF2 = b"\r\n\r\n"

# one row per WARC record; http_* populated for application/http
# payloads, payload = the HTTP body (response) or raw block (other).
WARC_ROW_SCHEMA = (
    "shard string, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, http_content_type string, payload binary"
)


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a (possibly concatenated-member) gzip stream. WARC
    records are self-delimiting (Content-Length framing), so member
    boundaries carry no information — the whole stream decompresses
    in ONE C-speed pass (``gzip.decompress`` walks every member).
    The first cut iterated members with per-member ``decompressobj``
    calls, which re-copied the remaining shard per member: O(members
    x shard bytes) — quadratic, ~hours on a real 25k-member Common
    Crawl shard (caught in review by a 2k/4k/8k-member benchmark).
    Plain (uncompressed) input yields itself whole."""
    if not data[:2] == b"\x1f\x8b":
        yield data
        return
    yield gzip.decompress(data)


def _parse_http(payload: bytes):
    """Split an application/http block into (status, content_type,
    body). Returns (None, None, payload) when no HTTP head parses."""
    head_end = payload.find(_CRLF2)
    if head_end < 0 or not payload[:5] in (b"HTTP/", b"GET /", b"POST "):
        return None, None, payload
    head = payload[:head_end].decode("latin-1", "replace")
    lines = head.split("\r\n")
    status = None
    first = lines[0].split(" ", 2)
    if first[0].startswith("HTTP/") and len(first) >= 2:
        try:
            status = int(first[1])
        except ValueError:
            status = None
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[head_end + 4 :]


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield record dicts from raw shard bytes (gzip-member or plain
    concatenated WARC). Strict on the parts that carry data (version
    line, Content-Length), lenient on unknown headers."""
    for member in _iter_gzip_members(data):
        pos = 0
        n = len(member)
        while pos < n:
            # skip inter-record CRLFs (plain concatenation)
            while pos < n and member[pos : pos + 2] == b"\r\n":
                pos += 2
            if pos >= n:
                break
            if not member[pos : pos + 5] == b"WARC/":
                raise ValueError(
                    f"not a WARC record at offset {pos}: "
                    f"{member[pos : pos + 16]!r}"
                )
            head_end = member.find(_CRLF2, pos)
            if head_end < 0:
                raise ValueError("unterminated WARC header block")
            headers: dict[str, str] = {}
            for ln in member[pos:head_end].split(b"\r\n")[1:]:
                k, _, v = ln.partition(b":")
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                    "latin-1"
                )
            if "content-length" not in headers:
                raise ValueError(
                    f"record at offset {pos} has no Content-Length "
                    "header (folded/continuation headers are not "
                    "supported)"
                )
            length = int(headers["content-length"])
            body_start = head_end + 4
            payload = member[body_start : body_start + length]
            if len(payload) != length:
                raise ValueError(
                    f"truncated record: want {length} bytes, "
                    f"have {len(payload)}"
                )
            pos = body_start + length
            ctype = headers.get("content-type", "")
            status = http_ctype = None
            if ctype.split(";")[0].strip() == "application/http":
                status, http_ctype, payload = _parse_http(payload)
            yield {
                "warc_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": ctype,
                "http_status": status,
                "http_content_type": http_ctype,
                "payload": payload,
            }


def _records_gen(batch_records: int):
    """mapInPandas generator factory shared by the batch and streaming
    sources: (path, content) file rows -> bounded record batches."""
    cols = [
        "shard",
        "warc_type",
        "record_id",
        "target_uri",
        "warc_date",
        "content_type",
        "http_status",
        "http_content_type",
        "payload",
    ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for shard, content in zip(pdf["path"], pdf["content"]):
                buf: list[dict] = []
                for rec in parse_warc_records(bytes(content)):
                    rec["shard"] = shard
                    buf.append(rec)
                    if len(buf) >= batch_records:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=cols)

    return gen


def load_warc(
    spark: SparkSession,
    path: str,
    batch_records: int = 1024,
    glob: str = "*.warc.gz",
) -> DataFrame:
    """Distributed WARC source: one shard per task via binaryFile,
    records streamed out in bounded Arrow batches. ``path`` is a
    directory matched against ``glob`` (a pathGlobFilter, quieter
    than a wildcard path), or any exact/wildcard path with
    ``glob=None``."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _records_gen(batch_records), schema=WARC_ROW_SCHEMA
    )


def build_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    warc_date: str = "2024-01-01T00:00:00Z",
    content_type: str = "application/octet-stream",
    record_id: str | None = None,
) -> bytes:
    """One spec-layout record: version line, named headers,
    Content-Length, CRLFCRLF, payload, CRLFCRLF trailer. Record IDs
    default to uuid4 — ISO 28500 requires GLOBAL uniqueness (a
    content-derived uuid5 would collide for re-crawls of the same URI
    and for every warcinfo record; caught in review). IDs never enter
    the oracle gates, so writer determinism is not required."""
    rid = record_id or f"<urn:uuid:{uuid.uuid4()}>"
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: " + warc_date.encode(),
    ]
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    lines += [
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(lines) + _CRLF2 + payload + _CRLF2


def build_http_response(
    body: bytes, status: int = 200, content_type: str = "text/plain"
) -> bytes:
    """The application/http payload block for a response record."""
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode()
    return head + b"\r\n" + body


def write_warc_shards(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "uri",
    body_col: str = "body",
    status_col: str | None = None,
    n_shards: int | None = None,
    http_content_type: str = "text/plain",
    record_kind: str = "response",
) -> DataFrame:
    """Distributed WARC sink: each partition streams its rows into ONE
    ``part-<n>.warc.gz`` shard (gzip member per record, a warcinfo
    record leading — the Common Crawl layout), written executor-side;
    returns the collected manifest as a DataFrame (shard path, record
    count, byte size). ``record_kind="response"`` wraps bodies as HTTP
    response records (the WARC crawl product); ``"conversion"`` writes
    them raw with Content-Type text/plain — the WET extracted-text
    product; ``"metadata"`` writes them raw with Content-Type
    application/json — the WAT metadata product
    (status_col/http_content_type ignored for both raw kinds).

    Commit protocol (task retries / speculative execution — caught in
    review): every attempt writes to a ``.part-<n>-<attempt>.tmp``
    name the reader's ``*.warc.gz`` glob never matches, then
    os.replace()s onto the DETERMINISTIC final name — a failed
    attempt leaves only an ignored temp file, a duplicate attempt
    overwrites the final shard with identical content."""
    spark = df.sparkSession
    if record_kind not in ("response", "conversion", "metadata"):
        raise ValueError(
            f"record_kind must be 'response', 'conversion' or "
            f"'metadata', got {record_kind!r}"
        )
    cols = [uri_col, body_col] + ([status_col] if status_col else [])
    src = df.select(*cols)
    if n_shards:
        src = src.repartition(n_shards)
    os.makedirs(out_dir, exist_ok=True)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        tmp = os.path.join(
            out_dir, f".part-{pid:05d}-{ctx.taskAttemptId()}.tmp"
        )
        n = 0
        with open(tmp, "wb", buffering=1 << 20) as fh:
            info = build_record(
                "warcinfo",
                b"software: openeo_processes_dask_ml_spark.io.warc\r\n",
                content_type="application/warc-fields",
            )
            fh.write(gzip.compress(info, 6))
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    uri = getattr(row, uri_col)
                    body = getattr(row, body_col)
                    if isinstance(body, str):
                        body = body.encode()
                    if record_kind == "conversion":
                        rec = build_record(
                            "conversion",
                            bytes(body),
                            target_uri=uri,
                            content_type="text/plain",
                        )
                    elif record_kind == "metadata":
                        rec = build_record(
                            "metadata",
                            bytes(body),
                            target_uri=uri,
                            content_type="application/json",
                        )
                    else:
                        status = (
                            int(getattr(row, status_col))
                            if status_col
                            else 200
                        )
                        rec = build_record(
                            "response",
                            build_http_response(
                                bytes(body), status, http_content_type
                            ),
                            target_uri=uri,
                            content_type=(
                                'application/http; msgtype="response"'
                            ),
                        )
                    fh.write(gzip.compress(rec, 6))
                    n += 1
            size = fh.tell()
        if n == 0:
            os.unlink(tmp)  # no empty shards (barrier-free layout)
            yield pd.DataFrame(
                [], columns=["shard", "n_records", "n_bytes"]
            )
            return
        os.replace(tmp, path)  # commit: atomic on POSIX
        yield pd.DataFrame(
            [{"shard": path, "n_records": n, "n_bytes": size}]
        )

    manifest = src.mapInPandas(
        sink, schema="shard string, n_records long, n_bytes long"
    ).collect()
    return spark.createDataFrame(
        [tuple(r) for r in manifest] or [("", 0, 0)],
        "shard string, n_records long, n_bytes long",
    ).filter(F.col("n_records") > 0)


def read_warc_file(path: str) -> list[dict]:
    """Driver-side convenience (tests): parse one shard from disk."""
    with open(path, "rb") as fh:
        return list(parse_warc_records(fh.read()))


def stream_warc(
    spark: SparkSession,
    path: str,
    batch_records: int = 1024,
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC source: shards arriving in a directory become
    micro-batches (the live-crawl ingest shape — Common Crawl drops
    finished shards into a prefix; maxFilesPerTrigger bounds batch
    size). Identical record schema and parse path as ``load_warc``,
    so batch and streaming plans share every downstream operator."""
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, "
        "content binary"
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _records_gen(batch_records), schema=WARC_ROW_SCHEMA
    )
