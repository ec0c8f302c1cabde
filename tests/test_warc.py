"""WARC source/sink (io/warc.py): the reader verified against
hand-built ISO 28500 spec bytes (NOT this module's writer), the writer
verified against stdlib gzip (member-per-record layout), then the
distributed roundtrip."""

import gzip
import zlib

import pytest

from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.io.warc import (
    build_http_response,
    build_record,
    load_warc,
    parse_warc_records,
    write_warc_shards,
)


def _spec_record(warc_type, headers, payload):
    """Hand-assembled per ISO 28500 — independent of build_record."""
    head = f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
    for k, v in headers.items():
        head += f"{k}: {v}\r\n"
    head += f"Content-Length: {len(payload)}\r\n"
    return head.encode() + b"\r\n" + payload + b"\r\n\r\n"


HTTP_BLOCK = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    b"Server: x\r\n\r\n<html>hello</html>"
)

SPEC_BYTES = (
    _spec_record(
        "warcinfo",
        {"Content-Type": "application/warc-fields"},
        b"software: test\r\n",
    )
    + _spec_record(
        "response",
        {
            "WARC-Target-URI": "https://a.example/x",
            "WARC-Date": "2024-03-04T05:06:07Z",
            "WARC-Record-ID": "<urn:uuid:abc>",
            "Content-Type": 'application/http; msgtype="response"',
        },
        HTTP_BLOCK,
    )
    + _spec_record(
        "resource",
        {"WARC-Target-URI": "https://a.example/raw"},
        b"\x00\x01binary\xff",
    )
)


def test_reader_parses_plain_spec_bytes():
    recs = list(parse_warc_records(SPEC_BYTES))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo",
        "response",
        "resource",
    ]
    resp = recs[1]
    assert resp["target_uri"] == "https://a.example/x"
    assert resp["warc_date"] == "2024-03-04T05:06:07Z"
    assert resp["record_id"] == "<urn:uuid:abc>"
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html; charset=utf-8"
    assert resp["payload"] == b"<html>hello</html>"
    # non-http payload passes through untouched, binary-safe
    assert recs[2]["payload"] == b"\x00\x01binary\xff"
    assert recs[2]["http_status"] is None


def test_reader_parses_gzip_member_stream():
    """Common Crawl layout: one gzip member per record."""
    data = b"".join(
        gzip.compress(
            _spec_record(
                "resource",
                {"WARC-Target-URI": f"u{i}"},
                f"payload-{i}".encode(),
            ),
            6,
        )
        for i in range(5)
    )
    recs = list(parse_warc_records(data))
    assert [r["target_uri"] for r in recs] == [f"u{i}" for i in range(5)]
    assert recs[3]["payload"] == b"payload-3"


def test_reader_rejects_truncation_and_garbage():
    rec = _spec_record("resource", {}, b"0123456789")
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_records(rec[:-8]))  # cut inside the payload
    with pytest.raises(ValueError, match="not a WARC record"):
        list(parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_writer_layout_is_stock_gzip_member_per_record():
    """Every record is its own gzip member (so range readers can stream
    member-at-a-time) and stock gzip can decode the concatenation."""
    recs = [
        build_record(
            "response",
            build_http_response(f"body{i}".encode()),
            target_uri=f"https://e/{i}",
            content_type='application/http; msgtype="response"',
        )
        for i in range(3)
    ]
    blob = b"".join(gzip.compress(r, 6) for r in recs)
    # member count == record count, found by walking unused_data
    members, pos = 0, 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        d.decompress(blob[pos:])
        members += 1
        if not d.unused_data:
            break
        pos = len(blob) - len(d.unused_data)
    assert members == 3
    assert gzip.decompress(blob) == b"".join(recs)
    parsed = list(parse_warc_records(blob))
    assert [r["target_uri"] for r in parsed] == [
        "https://e/0",
        "https://e/1",
        "https://e/2",
    ]


def test_distributed_roundtrip(spark, tmp_path):
    src = spark.range(40).select(
        F.concat(F.lit("https://crawl.example/doc/"), F.col("id")).alias(
            "uri"
        ),
        F.concat(F.lit("text body "), F.col("id") * 17).alias("body"),
    )
    out = str(tmp_path / "shards")
    manifest = write_warc_shards(src, out, n_shards=4)
    rows = manifest.collect()
    assert sum(r["n_records"] for r in rows) == 40
    assert all(r["shard"].endswith(".warc.gz") for r in rows)

    back = load_warc(spark, out)
    got = {
        r["target_uri"]: r
        for r in back.filter(F.col("warc_type") == "response").collect()
    }
    assert len(got) == 40
    r7 = got["https://crawl.example/doc/7"]
    assert bytes(r7["payload"]) == b"text body 119"
    assert r7["http_status"] == 200
    # warcinfo leads every shard
    infos = back.filter(F.col("warc_type") == "warcinfo").count()
    assert infos == len(rows)


def test_sink_skips_empty_partitions(spark, tmp_path):
    """Over-partitioned input must not leave empty shards behind."""
    src = spark.range(2).select(
        F.concat(F.lit("u"), F.col("id")).alias("uri"),
        F.lit("b").alias("body"),
    )
    out = str(tmp_path / "sparse")
    manifest = write_warc_shards(src, out, n_shards=8)
    rows = manifest.collect()
    assert sorted(r["n_records"] for r in rows) == [1, 1]
    import os

    assert len(os.listdir(out)) == 2  # no zero-record files on disk


def test_stream_warc_matches_batch(spark, tmp_path):
    """Micro-batched shard arrival (2 files per trigger) must surface
    the identical record set as the batch source."""
    import uuid

    from openeo_processes_dask_ml_spark.io.warc import stream_warc

    src = spark.range(30).select(
        F.concat(F.lit("https://s/"), F.col("id")).alias("uri"),
        F.concat(F.lit("b"), F.col("id")).alias("body"),
    )
    out = str(tmp_path / "stream_shards")
    write_warc_shards(src, out, n_shards=4)
    table = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        stream_warc(spark, out, max_files_per_trigger=2)
        .filter(F.col("warc_type") == "response")
        .select("target_uri", "payload")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["target_uri"]: bytes(r["payload"])
        for r in spark.table(table).collect()
    }
    want = {
        r["target_uri"]: bytes(r["payload"])
        for r in load_warc(spark, out)
        .filter(F.col("warc_type") == "response")
        .collect()
    }
    assert got == want and len(got) == 30


def test_warc_fuzz_roundtrip_framing():
    """Property: ANY payload bytes — including ones containing the
    record delimiter and fake 'WARC/' magics — roundtrip exactly
    through build -> concatenate -> parse, plain AND gzipped
    (Content-Length framing must never scan for delimiters)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.lists(
        st.binary(min_size=0, max_size=400),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(payloads)
    def run(bodies):
        recs = [
            build_record(
                "resource",
                b + (b"\r\n\r\nWARC/1.0\r\n" if i % 3 == 0 else b""),
                target_uri=f"u{i}",
            )
            for i, b in enumerate(bodies)
        ]
        want = [
            b + (b"\r\n\r\nWARC/1.0\r\n" if i % 3 == 0 else b"")
            for i, b in enumerate(bodies)
        ]
        for blob in (
            b"".join(recs),
            b"".join(gzip.compress(r, 1) for r in recs),
        ):
            got = list(parse_warc_records(blob))
            assert [r["payload"] for r in got] == want
            assert [r["target_uri"] for r in got] == [
                f"u{i}" for i in range(len(bodies))
            ]

    run()


def test_wet_conversion_records(spark, tmp_path):
    """record_kind='conversion' writes raw text/plain records (no HTTP
    head) that parse back byte-exact."""
    src = spark.range(10).select(
        F.concat(F.lit("https://w/"), F.col("id")).alias("uri"),
        F.concat(F.lit("extracted text "), F.col("id")).alias("body"),
    )
    out = str(tmp_path / "wet")
    write_warc_shards(src, out, n_shards=2, record_kind="conversion")
    recs = load_warc(spark, out).filter(
        F.col("warc_type") == "conversion"
    ).collect()
    assert len(recs) == 10
    by_uri = {r["target_uri"]: r for r in recs}
    r3 = by_uri["https://w/3"]
    assert bytes(r3["payload"]) == b"extracted text 3"
    assert r3["content_type"] == "text/plain"
    assert r3["http_status"] is None  # no HTTP head on conversion


def test_sink_rejects_unknown_record_kind(spark, tmp_path):
    src = spark.range(1).select(
        F.lit("u").alias("uri"), F.lit("b").alias("body")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="record_kind"):
        write_warc_shards(src, str(tmp_path / "x"), record_kind="wet")


def test_large_member_streams_in_bounded_chunks():
    """A single gzip member far larger than the per-call output cap
    must decode correctly through the unconsumed_tail re-feed path,
    and arrive split into capped chunks."""
    from openeo_processes_dask_ml_spark.io.warc import (
        _OUT_CHUNK,
        _iter_decompressed_chunks,
    )

    body = b"x" * (3 * _OUT_CHUNK + 12345)
    rec = _spec_record("resource", {"WARC-Target-URI": "big"}, body)
    chunks = list(_iter_decompressed_chunks(gzip.compress(rec, 1)))
    assert all(len(c) <= _OUT_CHUNK for c in chunks)
    assert len(chunks) >= 3
    assert b"".join(chunks) == rec
    (got,) = parse_warc_records(gzip.compress(rec, 1))
    assert got["payload"] == body


def test_parse_memory_is_bounded_not_shard_sized():
    """VERDICT r13 #1: peak parse memory must be O(chunk + record),
    not O(decompressed shard). A ~192 MB-decompressed shard parsed
    record-at-a-time must peak far below the decompressed size
    (tracemalloc sees every bytes/bytearray the pipeline allocates)."""
    import tracemalloc

    member = gzip.compress(
        _spec_record("resource", {"WARC-Target-URI": "u"}, b"a" * (1 << 20)),
        1,
    )
    data = member * 192  # identical members: cheap to build, 192 MB out
    tracemalloc.start()
    n = 0
    for rec in parse_warc_records(data):
        assert len(rec["payload"]) == 1 << 20
        n += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 192
    # bound: in+out chunk budgets + a few records of slack << 192 MB
    assert peak < 48 * (1 << 20), f"peak {peak / 1e6:.1f} MB"


def test_sink_recommit_is_byte_identical(spark, tmp_path):
    """Deterministic record IDs (ADVICE r13): running the sink twice
    at the same out_dir — the speculative/retry shape — must produce
    byte-identical shards, so a late commit can never contradict the
    manifest."""
    import os

    src = spark.range(12).select(
        F.concat(F.lit("https://d/"), F.col("id")).alias("uri"),
        F.concat(F.lit("b"), F.col("id")).alias("body"),
    )
    out = str(tmp_path / "det")
    write_warc_shards(src, out, n_shards=3).collect()
    first = {
        f: open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out))
    }
    write_warc_shards(src, out, n_shards=3).collect()
    second = {
        f: open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out))
    }
    assert first == second and len(first) == 3


def test_sink_accepts_file_uri(spark, tmp_path):
    """file:// out_dirs route through io.fs and roundtrip."""
    src = spark.range(6).select(
        F.concat(F.lit("https://f/"), F.col("id")).alias("uri"),
        F.lit("payload").alias("body"),
    )
    out_local = str(tmp_path / "file_uri")
    manifest = write_warc_shards(src, f"file://{out_local}", n_shards=2)
    assert sum(r["n_records"] for r in manifest.collect()) == 6
    back = load_warc(spark, out_local)
    assert back.filter(F.col("warc_type") == "response").count() == 6


def test_cdx_rows_address_members_exactly(spark, tmp_path):
    """emit_cdx offsets/lengths must frame standalone gzip members:
    seek+read+gunzip with stdlib alone yields the one record, and the
    digest matches the payload."""
    import hashlib
    import os

    src = spark.range(20).select(
        F.concat(F.lit("https://www.s"), F.col("id"), F.lit(".com/p")).alias(
            "uri"
        ),
        F.concat(F.lit("body-"), F.col("id")).alias("body"),
    )
    out = str(tmp_path / "cdx_shards")
    rows = write_warc_shards(src, out, n_shards=3, emit_cdx=True).collect()
    assert len(rows) == 20
    for r in rows[:8]:
        with open(r["shard"], "rb") as fh:
            fh.seek(r["offset"])
            member = gzip.decompress(fh.read(r["length"]))
        (rec,) = parse_warc_records(member)
        assert rec["target_uri"] == r["url"]
        assert hashlib.md5(rec["payload"]).hexdigest() == r["digest"]
    # offsets start past the warcinfo member and lengths tile the file
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["offset"])
        assert rs[0]["offset"] > 0  # warcinfo leads
        for a, b in zip(rs, rs[1:]):
            assert a["offset"] + a["length"] == b["offset"]
        assert rs[-1]["offset"] + rs[-1]["length"] == os.path.getsize(shard)


def test_cdx_export_surt_order_and_line(spark, tmp_path):
    """cdx_export: SURT urlkey reverses host components, idx is the
    dense 0-based global SURT ordinal, cdx_line carries
    urlkey/timestamp/json."""
    import json

    from openeo_processes_dask_ml_spark.io.warc import cdx_export

    src = spark.createDataFrame(
        [
            ("https://b.example.org/x", "b1"),
            ("https://a.example.org/y", "a1"),
            ("https://example.com/z", "c1"),
        ],
        "uri string, body string",
    )
    out = str(tmp_path / "shards")
    cdx_raw = write_warc_shards(src, out, n_shards=2, emit_cdx=True)
    pdir = str(tmp_path / "cdxrows")
    cdx_raw.write.parquet(pdir)
    got = {
        r["url"]: r
        for r in cdx_export(spark.read.parquet(pdir)).collect()
    }
    assert got["https://a.example.org/y"]["urlkey"] == "org,example,a)/y"
    assert got["https://example.com/z"]["urlkey"] == "com,example)/z"
    order = sorted(got.values(), key=lambda r: r["idx"])
    assert [r["urlkey"] for r in order] == sorted(
        r["urlkey"] for r in got.values()
    )
    assert [r["idx"] for r in order] == [0, 1, 2]
    key, ts, js = got["https://example.com/z"]["cdx_line"].split(" ", 2)
    assert key == "com,example)/z" and ts == "20240101000000"
    meta = json.loads(js)
    assert meta["url"] == "https://example.com/z"
    assert meta["filename"].endswith(".warc.gz")
    assert meta["length"] > 0 and meta["offset"] > 0


def test_wat_metadata_records(spark, tmp_path):
    """record_kind='metadata' writes raw application/json records."""
    src = spark.range(5).select(
        F.concat(F.lit("https://m/"), F.col("id")).alias("uri"),
        F.to_json(F.struct(F.col("id").alias("n"))).alias("body"),
    )
    out = str(tmp_path / "wat")
    write_warc_shards(src, out, n_shards=2, record_kind="metadata")
    recs = load_warc(spark, out).filter(
        F.col("warc_type") == "metadata"
    ).collect()
    assert len(recs) == 5
    r2 = next(r for r in recs if r["target_uri"] == "https://m/2")
    assert bytes(r2["payload"]) == b'{"n":2}'
    assert r2["content_type"] == "application/json"


def test_load_warc_fs_route_matches_binaryfile(spark, tmp_path):
    """via='fs' (pyarrow.fs listing + streaming fetch, the
    object-store route) must surface the identical record set as the
    binaryFile route — same schema, same payloads, same shard
    attribution."""
    src = spark.range(25).select(
        F.concat(F.lit("https://r/"), F.col("id")).alias("uri"),
        F.concat(F.lit("pay"), F.col("id")).alias("body"),
    )
    out = str(tmp_path / "fsroute")
    write_warc_shards(src, out, n_shards=3)

    def snap(df):
        return sorted(
            (
                r["shard"].rsplit("/", 1)[-1],
                r["warc_type"],
                r["target_uri"],
                bytes(r["payload"]),
            )
            for r in df.collect()
        )

    a = snap(load_warc(spark, out, via="binaryfile"))
    b = snap(load_warc(spark, out, via="fs"))
    assert a == b and len(a) == 28  # 25 responses + 3 warcinfo

    import pytest as _pytest

    with _pytest.raises(ValueError, match="via"):
        load_warc(spark, out, via="http")
    # nonexistent dir: pyarrow's own FileNotFoundError surfaces
    with _pytest.raises(FileNotFoundError):
        load_warc(spark, str(tmp_path / "empty_nowhere"), via="fs")
    # existing dir, nothing matching the glob: our explicit error
    empty = tmp_path / "existing_empty"
    empty.mkdir()
    with _pytest.raises(FileNotFoundError, match="no shards"):
        load_warc(spark, str(empty), via="fs")


def test_cdx_revisit_scopes_and_row_preservation(spark, tmp_path):
    """Revisit resolution: per-URL scope keeps mirrors independent,
    global scope dedups them; earliest capture wins; output is
    row-preserving."""
    from openeo_processes_dask_ml_spark.io.warc import cdx_revisit_resolve

    rows = [
        # url, ts, shard, offset, length, digest
        ("u1", "20240101", "s1", 10, 5, "AAA"),
        ("u1", "20240601", "s2", 10, 5, "AAA"),  # unchanged re-crawl
        ("u1", "20240901", "s3", 10, 5, "BBB"),  # changed content
        ("u2", "20240601", "s2", 99, 5, "AAA"),  # mirror of u1's AAA
    ]
    cdx = spark.createDataFrame(
        rows,
        "url string, cdx_ts string, shard string, offset bigint, "
        "length bigint, digest string",
    )
    by_url = {
        (r["url"], r["cdx_ts"]): (r["verdict"], r["orig_ts"])
        for r in cdx_revisit_resolve(cdx).collect()
    }
    assert len(by_url) == 4
    assert by_url[("u1", "20240101")] == ("response", "20240101")
    assert by_url[("u1", "20240601")] == ("revisit", "20240101")
    assert by_url[("u1", "20240901")] == ("response", "20240901")
    assert by_url[("u2", "20240601")] == ("response", "20240601")

    g = {
        (r["url"], r["cdx_ts"]): r["verdict"]
        for r in cdx_revisit_resolve(cdx, scope="global").collect()
    }
    assert g[("u2", "20240601")] == "revisit"  # mirror dedups globally

    import pytest as _pytest

    with _pytest.raises(ValueError, match="scope"):
        cdx_revisit_resolve(cdx, scope="per-domain")


def test_stream_warc_sink_matches_batch_corpus(spark, tmp_path):
    """The streaming write path (foreachBatch, one batch-<id> prefix
    per micro-batch) must surface the identical record corpus as a
    batch write of the same rows."""
    from openeo_processes_dask_ml_spark.io.warc import stream_warc_sink

    staging = str(tmp_path / "staging")
    for p in range(3):
        (
            spark.range(p * 10, p * 10 + 10)
            .select(
                F.concat(F.lit("https://s/"), F.col("id")).alias("uri"),
                F.concat(F.lit("b"), F.col("id")).alias("body"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(staging)
        )
    out = str(tmp_path / "stream_out")
    q = stream_warc_sink(
        spark.readStream.schema("uri string, body string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging),
        out,
        str(tmp_path / "ckpt"),
        n_shards=2,
    )
    q.awaitTermination()
    import os

    batches = sorted(os.listdir(out))
    assert len(batches) == 3 and all(b.startswith("batch-") for b in batches)
    back = load_warc(spark, f"{out}/batch-*")
    got = {
        r["target_uri"]: bytes(r["payload"])
        for r in back.filter(F.col("warc_type") == "response").collect()
    }
    assert got == {f"https://s/{i}": f"b{i}".encode() for i in range(30)}


def test_truncation_at_deflate_block_boundary_raises():
    """ADVICE r14: a shard cut at a deflate-block boundary leaves the
    decompressor with NO pending output — the old `flush()` guard
    returned silently (silent record loss when the cut also aligned
    with a record boundary). A member that never reaches its
    end-of-stream marker must raise regardless."""
    rec = _spec_record("resource", {"WARC-Target-URI": "u"}, b"abc")
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    # valid gzip prefix, ends exactly at a block boundary, all record
    # bytes recoverable, but no end-of-stream marker / trailer
    cut = co.compress(rec) + co.flush(zlib.Z_FULL_FLUSH)
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(parse_warc_records(cut))
    # a COMPLETE member followed by the same cut prefix also raises
    whole = gzip.compress(rec, 6) + cut
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(parse_warc_records(whole))
    # complete members alone still parse (no false positive from the
    # fresh decompressobj seeded after the last member)
    assert len(list(parse_warc_records(gzip.compress(rec, 6)))) == 1


def test_shard_uri_prefix_preserves_authority():
    """ADVICE r14: hdfs:// FileInfo paths drop the authority; the
    rebuilt shard URI must keep the namenode the caller named."""
    from openeo_processes_dask_ml_spark.io.warc import _shard_uri_prefix

    # hdfs: internal path has no authority -> re-attach it
    assert (
        _shard_uri_prefix("hdfs://nn:8020/crawl", "/crawl")
        == "hdfs://nn:8020"
    )
    # s3/gs: bucket (== netloc) already embedded in the internal path
    assert _shard_uri_prefix("s3://bkt/crawl", "bkt/crawl") == "s3://"
    assert _shard_uri_prefix("gs://bkt/c", "bkt/c") == "gs://"
    # local bare / file:// need no prefix
    assert _shard_uri_prefix("/data/crawl", "/data/crawl") == ""
    assert _shard_uri_prefix("file:///data/c", "/data/c") == ""


def test_cdx_rows_only_reference_committed_shards(spark, tmp_path):
    """ADVICE r14: CDX rows must be yielded only AFTER the shard
    commits, so an early-terminated consumer (limit / aborted scan)
    can never hold index rows for shards that were then deleted."""
    import os

    src = spark.range(200).select(
        F.concat(F.lit("https://x/"), F.col("id")).alias("uri"),
        F.concat(F.lit("body"), F.col("id")).alias("body"),
    )
    out = str(tmp_path / "cdx_commit")
    cdx = write_warc_shards(src, out, n_shards=4, emit_cdx=True)
    few = cdx.limit(3).collect()  # early-terminated consumption
    assert len(few) == 3
    for r in few:
        assert os.path.exists(r["shard"]), (
            "CDX row references a shard that is not committed"
        )
    # no half-written tmp shard left visible to the reader glob
    names = os.listdir(out)
    assert all(not n.endswith(".tmp") for n in names)


def test_stream_warc_sink_trigger_is_configurable(spark, tmp_path):
    """ADVICE r14: the trigger really is the caller's choice."""
    from openeo_processes_dask_ml_spark.io.warc import stream_warc_sink

    staging = str(tmp_path / "stage_trig")
    spark.range(5).select(
        F.concat(F.lit("https://t/"), F.col("id")).alias("uri"),
        F.col("id").cast("string").alias("body"),
    ).coalesce(1).write.parquet(staging)
    out = str(tmp_path / "trig_out")
    q = stream_warc_sink(
        spark.readStream.schema("uri string, body string").parquet(staging),
        out,
        str(tmp_path / "trig_ckpt"),
        n_shards=1,
        trigger={"processingTime": "1 seconds"},
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            import os

            if os.path.isdir(out) and any(
                f.endswith(".warc.gz")
                for b in os.listdir(out)
                for f in os.listdir(os.path.join(out, b))
            ):
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    got = {
        bytes(r["payload"])
        for r in load_warc(spark, f"{out}/batch-*")
        .filter(F.col("warc_type") == "response")
        .collect()
    }
    assert got == {str(i).encode() for i in range(5)}


def test_shard_uri_prefix_hdfs_path_starting_with_hostname():
    """r15 review: the decision is keyed on the scheme — an internal
    path whose first component merely STARTS with the host name must
    still get the authority re-attached."""
    from openeo_processes_dask_ml_spark.io.warc import _shard_uri_prefix

    assert (
        _shard_uri_prefix("hdfs://prod/prod-data/warcs", "/prod-data/warcs")
        == "hdfs://prod"
    )
    assert (
        _shard_uri_prefix("hdfs://prod:8020/prod-data", "/prod-data")
        == "hdfs://prod:8020"
    )
    assert _shard_uri_prefix("s3://bkt/bkt-data", "bkt/bkt-data") == "s3://"


def test_cdx_buffer_spills_to_local_disk(spark, tmp_path, monkeypatch):
    """ADVICE r15: the per-shard CDX buffer must stay bounded in
    executor Python memory — with the spill threshold forced tiny,
    rows round-trip through the executor-local spill file and come
    back complete, ordered, and identical to the unspilled run."""
    from openeo_processes_dask_ml_spark.io import warc as warc_mod

    src = spark.range(50).select(
        F.concat(F.lit("https://www.s"), F.col("id"), F.lit(".com/p")).alias(
            "uri"
        ),
        F.concat(F.lit("body-"), F.col("id")).alias("body"),
    )
    # record IDs embed out_dir, so byte offsets are only comparable
    # within one run — compare the dir-independent columns across runs
    key = lambda r: (r["url"], r["cdx_ts"], r["digest"])  # noqa: E731
    out_plain = str(tmp_path / "no_spill")
    baseline = sorted(
        map(key, write_warc_shards(
            src, out_plain, n_shards=2, emit_cdx=True
        ).collect())
    )
    monkeypatch.setattr(warc_mod, "_CDX_SPILL_ROWS", 4)
    out_spill = str(tmp_path / "spill")
    rows = write_warc_shards(
        src, out_spill, n_shards=2, emit_cdx=True
    ).collect()
    assert sorted(map(key, rows)) == baseline
    assert len(rows) == 50
    # spilled offsets/lengths still frame standalone gzip members
    for r in rows[:6]:
        with open(r["shard"], "rb") as fh:
            fh.seek(r["offset"])
            member = gzip.decompress(fh.read(r["length"]))
        (rec,) = parse_warc_records(member)
        assert rec["target_uri"] == r["url"]
