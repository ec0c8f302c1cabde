"""Pure-numpy uncompressed GeoTIFF encode/decode + a distributed tile
writer.

The reference exports real rasters via rioxarray
(``minibackend/custom_processes.py:115-219`` writes COG/netcdf/zarr) and
loads them through odc-stac/stackstac (``get_datacube.py``). Neither
rasterio nor PIL exists in this environment, but the classic TIFF
container (public spec: TIFF 6.0 + the GeoTIFF tag set) is simple
enough to read and write directly for the uncompressed striped case —
which is what makes the WHOLE raster chain (decode -> cube ops ->
save_result -> reload) runnable and testable offline, in the same
spirit as the injected-transport STAC client.

Scope, stated honestly: classic (non-Big) TIFF, little- or big-endian,
strip- or tile-organized, uncompressed / LZW (TIFF 6.0 §13, pure
stdlib) / DEFLATE (zlib is stdlib) / PackBits (TIFF 6.0 §9 byte RLE),
predictor 1/2 (integer horizontal differencing) and 3 (TechNote-3
floating-point byte-plane differencing — the float DEM/reflectance
layout), single- or multi-sample pixels in either chunky
(PlanarConfiguration=1) or planar (=2, plane-major chunk runs)
organization, with ModelPixelScale/ModelTiepoint/GeoKeyDirectory
georeferencing — i.e. the interior layout of real deflate or LZW COGs
(the decoder reads IFD 0, the full-resolution image; overview IFDs
are pyramid copies), in classic or BigTIFF (magic 43, 64-bit offset)
containers. New-style JPEG (compression 7 + JPEGTables) decodes
through the pure-numpy baseline decoder in ``io/jpeg.py``; only
old-style JPEG (6, deprecated by TIFF-EP) still raises a clear
``NotImplementedError`` pointing at rasterio — the format is never
faked.

The distributed writer is the scale path: one GeoTIFF per (item, band)
group via ``applyInPandas``, encoded and written ON THE EXECUTORS to a
shared directory — the driver only sees the manifest. At 100 TB the
pixel mass never congregates; file count == group count by
construction.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from . import fs

# TIFF tag ids (public TIFF 6.0 / GeoTIFF spec constants)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_SAMPLE_FORMAT = 339
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_JPEG_TABLES = 347
_T_PIXEL_SCALE = 33550
_T_TIEPOINT = 33922
_T_GEOKEYS = 34735

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_DOUBLE = 12
_TYPE_LONG8 = 16  # BigTIFF u64 (17 = s64, 18 = IFD8)

_TYPE_SIZES = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
    11: 4, 12: 8, 16: 8, 17: 8, 18: 8,
}
_TYPE_FMT = {3: "H", 4: "I", 12: "d", 8: "h", 9: "i", 11: "f", 16: "Q", 17: "q", 18: "Q"}

# IFD walk geometry: (count_size, count_fmt, entry_size, offset_size,
# offset_fmt, inline_value_limit). Classic TIFF counts entries in a
# u16 and packs 12-byte entries with u32 offsets and 4 inline value
# bytes; BigTIFF (magic 43, public Adobe/AWare spec) widens to u64
# counts, 20-byte entries, u64 offsets, 8 inline bytes — the layout
# that lifts the 4 GiB file cap, which a 100 TB mosaic sink WILL hit.
_GEOM_CLASSIC = (2, "H", 12, 4, "I", 4)
_GEOM_BIG = (8, "Q", 20, 8, "Q", 8)


def _tiff_header(rd) -> tuple[str, bool, int]:
    """(byte_order, is_bigtiff, first_ifd_offset) from the file head;
    accepts classic (magic 42) and BigTIFF (magic 43)."""
    head = rd(0, 16)
    bo = {b"II": "<", b"MM": ">"}.get(head[:2])
    if bo is None:
        raise ValueError("not a TIFF payload (no II/MM byte-order mark)")
    (magic,) = struct.unpack(bo + "H", head[2:4])
    if magic == 42:
        (off,) = struct.unpack(bo + "I", head[4:8])
        return bo, False, off
    if magic == 43:
        if len(head) < 16:
            raise ValueError("truncated BigTIFF header")
        osize, zero = struct.unpack(bo + "HH", head[4:8])
        if osize != 8 or zero != 0:
            raise NotImplementedError(
                f"BigTIFF offset size {osize} is not supported (spec fixes 8)"
            )
        (off,) = struct.unpack(bo + "Q", head[8:16])
        return bo, True, off
    raise NotImplementedError(f"TIFF magic {magic} is not supported")


def _parse_entry(e: bytes, bo: str, big: bool) -> tuple[int, int, int, bytes]:
    """(tag, type, count, inline-value-field) of one IFD entry."""
    if big:
        tag, typ, count = struct.unpack(bo + "HHQ", e[:12])
        return tag, typ, count, e[12:20]
    tag, typ, count = struct.unpack(bo + "HHI", e[:8])
    return tag, typ, count, e[8:12]

# numpy dtype -> (bits, sample_format); sample_format per TIFF 6.0:
# 1 unsigned int, 2 signed int, 3 IEEE float
_DTYPES = {
    np.dtype("uint8"): (8, 1),
    np.dtype("uint16"): (16, 1),
    np.dtype("uint32"): (32, 1),
    np.dtype("int16"): (16, 2),
    np.dtype("int32"): (32, 2),
    np.dtype("float32"): (32, 3),
    np.dtype("float64"): (64, 3),
}
_SF_KINDS = {1: "u", 2: "i", 3: "f"}


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW decode (TIFF 6.0 §13, pure stdlib): MSB-first
    bit packing, Clear=256 / EOI=257, 9→12-bit codes with the TIFF
    "early change" — the decoder widens one code EARLIER than plain
    (GIF-style) LZW, i.e. when its table holds ``(1 << bits) - 2``
    entries, so it stays in lockstep with encoders that widen upon
    assigning code 511/1023/2047. A truncated stream (missing EOI)
    returns the bytes decoded so far, matching lenient readers."""
    clear, eoi = 256, 257
    out = bytearray()
    nbits = 9
    # implicit clear at start: conforming streams open with Clear, but
    # lenient readers (and garbage inputs) must not index an empty table
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    acc = navail = pos = 0
    n = len(data)
    while True:
        while navail < nbits:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            navail += 8
        navail -= nbits
        code = (acc >> navail) & ((1 << nbits) - 1)
        if code == eoi:
            return bytes(out)
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError(
                    "corrupt LZW stream: non-literal first code after clear"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        if len(table) > 4095:
            raise ValueError("corrupt LZW stream: table overflow without clear")
        out += entry
        prev = entry
        if len(table) == (1 << nbits) - 2 and nbits < 12:
            nbits += 1


def _packbits_decode(data: bytes) -> bytes:
    """PackBits (TIFF compression 32773, TIFF 6.0 §9): a sequential
    byte-RLE — header n in 0..127 copies n+1 literal bytes, n in
    129..255 repeats the next byte 257-n times, 128 is a no-op. Files
    that restart the coder per scanline (the spec's recommendation)
    decode identically here because a concatenation of PackBits
    streams is itself a valid stream."""
    out = bytearray()
    i, end = 0, len(data)
    while i < end:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits encode: emit a repeat record for every run of
    >= 2 equal bytes, literal records otherwise (breaking a literal
    when a >= 3 run starts, the standard heuristic)."""
    out = bytearray()
    i, end = 0, len(data)
    while i < end:
        run = 1
        while i + run < end and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        j = i + 1
        while j < end and (j - i) < 128:
            if j + 2 < end and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encode: the mirror of :func:`_lzw_decode`
    (width grows immediately after assigning code ``(1 << bits) - 1``,
    so codes from 511/1023/2047 on are written at the wider size), with
    a table reset (Clear emitted at the current width) before code
    4094 would be assigned — the libtiff convention."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nacc = 0
    nbits = 9

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc = (acc << nbits) | code
        nacc += nbits
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)

    table: dict[bytes, int] = {}
    next_code = 258
    emit(clear)
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if len(wc) == 1 or wc in table:
            w = wc
            continue
        emit(table[w] if len(w) > 1 else w[0])
        if next_code >= 4094:
            emit(clear)
            table = {}
            next_code = 258
            nbits = 9
        else:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << nbits) - 1 and nbits < 12:
                nbits += 1
        w = c
    if w:
        emit(table[w] if len(w) > 1 else w[0])
    emit(eoi)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _apply_predictor2(chunk: np.ndarray) -> np.ndarray:
    """Horizontal differencing (TIFF predictor 2): each pixel stores
    the delta to its left neighbor, per row (and per sample). Integer
    wraparound is the spec's modular arithmetic."""
    out = chunk.copy()
    out[:, 1:] = chunk[:, 1:] - chunk[:, :-1]
    return out


def _apply_predictor3(chunk: np.ndarray) -> np.ndarray:
    """Floating-point horizontal differencing (TIFF predictor 3, TIFF
    Technical Note 3 — the layout real float DEM/reflectance COGs
    ship): per row, the IEEE bytes are laid out BIG-endian, split into
    byte planes (all MSBs first, then the next byte, ...), and the
    plane buffer is byte-differenced. Exponent bytes of neighboring
    floats are near-equal, so the deltas compress the way integer
    predictor-2 deltas do — deflate on raw floats barely compresses at
    all. Returns a (rows, cols*itemsize) uint8 array; byte order of
    the differenced stream is big-endian by spec regardless of the
    file's byte order."""
    rows, cols = chunk.shape
    s = chunk.dtype.itemsize
    be = np.ascontiguousarray(chunk.astype(chunk.dtype.newbyteorder(">")))
    b = np.frombuffer(be.tobytes(), dtype=np.uint8).reshape(rows, cols, s)
    planes = np.ascontiguousarray(b.transpose(0, 2, 1)).reshape(rows, s * cols)
    out = planes.copy()
    out[:, 1:] = planes[:, 1:] - planes[:, :-1]  # uint8 modular wrap
    return out


def _undo_predictor3(
    raw: bytes, rows: int, cols: int, dtype: np.dtype
) -> np.ndarray:
    """Inverse of :func:`_apply_predictor3`: byte cumsum per row, then
    reassemble floats from the big-endian byte planes."""
    s = dtype.itemsize
    b = (
        np.frombuffer(raw, dtype=np.uint8, count=rows * cols * s)
        .reshape(rows, s * cols)
    )
    planes = np.add.accumulate(b, axis=1, dtype=np.uint8)
    m = np.ascontiguousarray(planes.reshape(rows, s, cols).transpose(0, 2, 1))
    be = np.dtype(dtype).newbyteorder(">")
    return np.frombuffer(m.tobytes(), dtype=be).reshape(rows, cols).astype(
        dtype.newbyteorder("=")
    )


def _image_chunks(
    arr: np.ndarray,
    dt: np.dtype,
    comp: int,
    tile: tuple[int, int] | None,
    predictor: int,
) -> list[bytes]:
    """Serialized (and optionally differenced/compressed) data chunks
    for one image: one strip, or row-major full-size tiles. ``comp`` is
    the TIFF compression tag value (1 none, 5 LZW, 8 deflate)."""
    import zlib

    h, w = arr.shape
    arr = arr.astype(dt, copy=False)
    if tile is not None:
        th, tw = int(tile[0]), int(tile[1])
        blocks = []
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                block = np.zeros((th, tw), dt)
                sub = arr[ty : ty + th, tx : tx + tw]
                block[: sub.shape[0], : sub.shape[1]] = sub
                blocks.append(block)
    else:
        blocks = [arr]
    if predictor == 2:
        blocks = [_apply_predictor2(b) for b in blocks]
    elif predictor == 3:
        blocks = [_apply_predictor3(b) for b in blocks]
    raw = [b.tobytes() for b in blocks]
    if comp == 8:
        return [zlib.compress(b) for b in raw]
    if comp == 5:
        return [_lzw_encode(b) for b in raw]
    if comp == 32773:
        return [_packbits_encode(b) for b in raw]
    return raw


def _image_entries(
    arr_shape: tuple[int, int],
    bits: int,
    sfmt: int,
    comp: int,
    tile: tuple[int, int] | None,
    predictor: int,
    offsets: list[int],
    counts: list[int],
    bbox,
    epsg,
    reduced: bool,
    big: bool = False,
) -> list[tuple[int, int, int, bytes | int]]:
    h, w = arr_shape
    # chunk offsets are the one field that must outgrow u32 in a
    # BigTIFF — emit them as LONG8; everything else keeps its classic
    # type (BigTIFF only widens the ENTRY fields, not value types)
    off_type = _TYPE_LONG8 if big else _TYPE_LONG
    off_fmt = "Q" if big else "I"

    def _offs(vals: list[int]) -> bytes:
        return struct.pack(f"<{len(vals)}{off_fmt}", *vals)

    def _longs(vals: list[int]) -> bytes:
        return struct.pack(f"<{len(vals)}I", *vals)

    entries: list[tuple[int, int, int, bytes | int]] = [
        (_T_WIDTH, _TYPE_LONG, 1, w),
        (_T_LENGTH, _TYPE_LONG, 1, h),
        (_T_BITS, _TYPE_SHORT, 1, bits),
        (_T_COMPRESSION, _TYPE_SHORT, 1, comp),
        (_T_PHOTOMETRIC, _TYPE_SHORT, 1, 1),
        (_T_SPP, _TYPE_SHORT, 1, 1),
        (_T_SAMPLE_FORMAT, _TYPE_SHORT, 1, sfmt),
    ]
    if reduced:
        # NewSubfileType = 1: reduced-resolution image (COG overview)
        entries.append((254, _TYPE_LONG, 1, 1))
    if predictor in (2, 3):
        entries.append((_T_PREDICTOR, _TYPE_SHORT, 1, predictor))
    if tile is not None:
        th, tw = int(tile[0]), int(tile[1])
        entries.append((_T_TILE_WIDTH, _TYPE_LONG, 1, tw))
        entries.append((_T_TILE_LENGTH, _TYPE_LONG, 1, th))
        entries.append((_T_TILE_OFFSETS, off_type, len(offsets), _offs(offsets)))
        entries.append((_T_TILE_COUNTS, _TYPE_LONG, len(counts), _longs(counts)))
    else:
        entries.append((_T_STRIP_OFFSETS, off_type, 1, _offs(offsets)))
        entries.append((_T_ROWS_PER_STRIP, _TYPE_LONG, 1, h))
        entries.append((_T_STRIP_COUNTS, _TYPE_LONG, 1, _longs(counts)))
    if bbox is not None:
        minx, miny, maxx, maxy = (float(v) for v in bbox)
        # same geographic cover at every pyramid level — the pixel
        # scale grows as the level shrinks
        scale = struct.pack("<3d", (maxx - minx) / w, (maxy - miny) / h, 0.0)
        tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, minx, maxy, 0.0)
        entries.append((_T_PIXEL_SCALE, _TYPE_DOUBLE, 3, scale))
        entries.append((_T_TIEPOINT, _TYPE_DOUBLE, 6, tiepoint))
    if epsg is not None:
        geographic = int(epsg) == 4326
        keys = [
            (1, 1, 0, 3),  # version, revision, minor, key count
            (1024, 0, 1, 2 if geographic else 1),  # GTModelType
            (1025, 0, 1, 1),  # GTRasterType = PixelIsArea
            (2048 if geographic else 3072, 0, 1, int(epsg)),
        ]
        flat = [v for k in keys for v in k]
        entries.append((_T_GEOKEYS, _TYPE_SHORT, len(flat), struct.pack(f"<{len(flat)}H", *flat)))
    entries.sort(key=lambda e: e[0])
    return entries


def _entry_extra_size(entries, big: bool = False) -> int:
    inline = 8 if big else 4
    return sum(
        _TYPE_SIZES[typ] * count
        for _, typ, count, val in entries
        if isinstance(val, bytes) and _TYPE_SIZES[typ] * count > inline
    )


def _ifd_block_size(entries, big: bool = False) -> int:
    csz, _, esz, osz, _, _ = _GEOM_BIG if big else _GEOM_CLASSIC
    return csz + esz * len(entries) + osz + _entry_extra_size(entries, big)


def _emit_ifd(entries, ifd_offset: int, next_offset: int, big: bool = False) -> bytes:
    csz, cfmt, esz, osz, ofmt, inline = _GEOM_BIG if big else _GEOM_CLASSIC
    head_fmt = "<HHQ" if big else "<HHI"
    extra_offset = ifd_offset + csz + esz * len(entries) + osz
    ifd = struct.pack("<" + cfmt, len(entries))
    extra = b""
    for tag, typ, count, val in entries:
        size = _TYPE_SIZES[typ] * count
        if isinstance(val, bytes):
            if size <= inline:
                ifd += struct.pack(head_fmt, tag, typ, count) + val.ljust(inline, b"\0")
            else:
                ifd += struct.pack(head_fmt, tag, typ, count) + struct.pack(
                    "<" + ofmt, extra_offset + len(extra)
                )
                extra += val
        else:
            packed = struct.pack("<" + _TYPE_FMT[typ], val).ljust(inline, b"\0")
            ifd += struct.pack(head_fmt, tag, typ, count) + packed
    ifd += struct.pack("<" + ofmt, next_offset)
    return ifd + extra


def encode_gtiff(
    arr: np.ndarray,
    bbox: tuple[float, float, float, float] | list | None = None,
    epsg: int | None = None,
    compression: str | None = None,
    tile: tuple[int, int] | None = None,
    predictor: int = 1,
    overviews: list[np.ndarray] | None = None,
    bigtiff: bool | None = None,
) -> bytes:
    """Encode a 2-D array as a single-band little-endian GeoTIFF.
    ``bbox`` is (minx, miny, maxx, maxy) in CRS units covering the full
    raster north-up (row 0 at maxy), the same convention
    ``decode_assets_to_cube`` uses; ``epsg`` tags the CRS (projected
    codes; 4326 is emitted as geographic).

    Layout options mirror what real COG interiors use:
    ``compression='deflate'`` (zlib per chunk) or ``'lzw'`` (TIFF-variant
    LZW per chunk — the other ubiquitous archival layout), ``tile=(th,
    tw)`` for
    tile organization instead of one strip, ``predictor=2`` for
    horizontal differencing (integer dtypes only — deflate compresses
    smooth rasters far better on deltas), and ``overviews`` — a list of
    reduced-resolution copies written as chained IFDs tagged
    NewSubfileType=1 (the COG pyramid; readers that want level k pass
    ``ifd=k`` to :func:`decode_gtiff`). All levels share dtype, layout
    options, and the geographic cover.

    ``bigtiff``: ``None`` (default) writes classic TIFF and
    auto-upgrades to BigTIFF (magic 43, 64-bit offsets) when the
    layout outgrows the classic 4 GiB offset space; ``True`` forces
    BigTIFF; ``False`` pins classic and raises on overflow (for
    consumers that cannot read BigTIFF)."""
    images = [np.asarray(arr)] + [np.asarray(o) for o in (overviews or [])]
    for im in images:
        if im.ndim != 2:
            raise ValueError(
                f"encode_gtiff writes single-band 2-D arrays, got shape {im.shape}"
            )
        if im.dtype != images[0].dtype:
            raise ValueError("overviews must share the base image dtype")
    dt = images[0].dtype.newbyteorder("<")
    if dt.newbyteorder("=") not in _DTYPES:
        raise ValueError(
            f"unsupported dtype {images[0].dtype}; supported: "
            f"{sorted(str(d) for d in _DTYPES)}"
        )
    if compression not in (None, "none", "deflate", "lzw", "packbits"):
        raise ValueError(
            "compression must be None, 'deflate', 'lzw' or 'packbits', "
            f"got {compression!r}"
        )
    if predictor not in (1, 2, 3):
        raise ValueError(f"predictor must be 1, 2 or 3, got {predictor}")
    if predictor == 2 and dt.kind == "f":
        raise ValueError("predictor 2 (horizontal differencing) is integer-only")
    if predictor == 3 and dt.kind != "f":
        raise ValueError(
            "predictor 3 (floating-point differencing) is float-only"
        )
    if tile is not None and (int(tile[0]) <= 0 or int(tile[1]) <= 0):
        raise ValueError(f"tile dims must be positive, got {tile}")
    bits, sfmt = _DTYPES[dt.newbyteorder("=")]
    comp = {"deflate": 8, "lzw": 5, "packbits": 32773}.get(
        compression or "none", 1
    )

    per = []
    for im in images:
        chunks = _image_chunks(im, dt, comp, tile, predictor)
        per.append((im.shape, chunks, [len(c) for c in chunks]))

    # CLOUD-OPTIMIZED layout: header, then ALL IFDs, then chunk data —
    # a ranged reader learns every chunk offset from one header-sized
    # read and fetches only the ranges it needs (decode_gtiff_ranged).
    # IFD block sizes don't depend on the offset VALUES (fixed-width
    # fields), so size the blocks with placeholder offsets first, then
    # assign real chunk offsets after the last IFD.
    def _layout(big: bool) -> bytes | None:
        ifd_offsets = []
        ifd_pos = 16 if big else 8
        for i, (shape, chunks, counts) in enumerate(per):
            probe = _image_entries(
                shape, bits, sfmt, comp, tile, predictor,
                [0] * len(chunks), counts, bbox, epsg, reduced=i > 0, big=big,
            )
            ifd_offsets.append(ifd_pos)
            ifd_pos += _ifd_block_size(probe, big)

        data_pos = ifd_pos
        all_entries = []
        for i, (shape, chunks, counts) in enumerate(per):
            offsets = []
            for c in chunks:
                offsets.append(data_pos)
                data_pos += len(c)
            all_entries.append(
                _image_entries(
                    shape, bits, sfmt, comp, tile, predictor,
                    offsets, counts, bbox, epsg, reduced=i > 0, big=big,
                )
            )
        if not big and data_pos >= 2**32:
            # the FINAL offset must fit u32 in classic TIFF — caller
            # decides between BigTIFF upgrade and a hard error
            return None
        header = (
            struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_offsets[0])
            if big
            else struct.pack("<2sHI", b"II", 42, ifd_offsets[0])
        )
        out = [header]
        for i, entries in enumerate(all_entries):
            nxt = ifd_offsets[i + 1] if i + 1 < len(ifd_offsets) else 0
            out.append(_emit_ifd(entries, ifd_offsets[i], nxt, big=big))
        out.extend(c for _, chunks, _ in per for c in chunks)
        return b"".join(out)

    if bigtiff is True:
        return _layout(True)
    payload = _layout(False)
    if payload is not None:
        return payload
    if bigtiff is False:
        total_data = sum(sum(counts) for _, _, counts in per)
        raise ValueError(
            f"raster payload {total_data} B exceeds the classic-TIFF 4 GiB "
            "offset space and bigtiff=False pins classic — split the group "
            "(finer group_cols) or allow BigTIFF"
        )
    return _layout(True)  # auto-upgrade (bigtiff=None)


def gtiff_ifd_count(payload: bytes) -> int:
    """Number of chained IFDs (1 + overview levels); classic or BigTIFF."""
    rd = lambda o, sz: payload[o : o + sz]  # noqa: E731
    bo, big, off = _tiff_header(rd)
    csz, cfmt, esz, osz, ofmt, _ = _GEOM_BIG if big else _GEOM_CLASSIC
    count = 0
    while off:
        count += 1
        n = struct.unpack(bo + cfmt, rd(off, csz))[0]
        (off,) = struct.unpack(bo + ofmt, rd(off + csz + esz * n, osz))
    return count


def decode_gtiff(payload: bytes, ifd: int = 0) -> tuple[np.ndarray, dict]:
    """Decode a classic or BigTIFF payload: strip- or tile-organized,
    uncompressed, LZW (5), deflate (8/32946) or PackBits (32773),
    predictor 1/2/3, chunky or planar
    sample organization, either endianness. Returns
    ``(array, meta)`` — array is (H, W) for one sample per pixel,
    (H, W, SPP) otherwise (planar planes are interleaved to the same
    chunky output shape); meta carries ``bbox``/``epsg``/``pixel_scale``
    when the GeoTIFF tags are present. Other compressions (JPEG)
    raise ``NotImplementedError`` (those
    profiles need rasterio). ``ifd`` addresses the chained-IFD pyramid: 0 (default)
    is the full-resolution image, k>0 the k-th COG overview level."""
    return _decode_from(lambda o, sz: payload[o : o + sz], ifd)


class _CachedRangeReader:
    """read(off, size) over a range fetcher, with the first
    ``head_bytes`` cached up front — header + IFD tag tables live there
    in cloud-optimized layout, so metadata parsing costs ONE range
    request and only chunk data adds more. Tracks request count/bytes
    for observability."""

    def __init__(self, fetch_range, head_bytes: int = 16384):
        self._fetch = fetch_range
        self.requests = 0
        self.bytes_fetched = 0
        self._head = self._fetched(0, head_bytes)

    def _fetched(self, off: int, size: int) -> bytes:
        self.requests += 1
        out = self._fetch(off, size)
        self.bytes_fetched += len(out)
        return out

    def __call__(self, off: int, size: int) -> bytes:
        if off + size <= len(self._head):
            return self._head[off : off + size]
        return self._fetched(off, size)


def decode_gtiff_ranged(
    fetch_range,
    ifd: int = 0,
    head_bytes: int = 16384,
) -> tuple[np.ndarray, dict]:
    """Decode WITHOUT the whole payload: ``fetch_range(offset, size) ->
    bytes`` supplies byte ranges (HTTP Range / S3 ranged GET in
    production). With the cloud-optimized layout ``encode_gtiff``
    writes (header + all IFDs first), metadata parsing is served from
    one head read and only the target level's chunks are fetched — an
    overview read of a large raster moves a few KB, which is the
    entire point of the COG layout."""
    return _decode_from(_CachedRangeReader(fetch_range, head_bytes), ifd)


def _decode_from(rd, ifd: int = 0) -> tuple[np.ndarray, dict]:
    bo, big, ifd_offset = _tiff_header(rd)
    csz, cfmt, esz, osz, ofmt, inline = _GEOM_BIG if big else _GEOM_CLASSIC
    for _ in range(ifd):
        k = struct.unpack(bo + cfmt, rd(ifd_offset, csz))[0]
        (ifd_offset,) = struct.unpack(
            bo + ofmt, rd(ifd_offset + csz + esz * k, osz)
        )
        if ifd_offset == 0:
            raise ValueError(f"TIFF has no IFD {ifd} (chain ended early)")
    n = struct.unpack(bo + cfmt, rd(ifd_offset, csz))[0]
    table = rd(ifd_offset + csz, esz * n)
    tags: dict[int, tuple] = {}
    for i in range(n):
        tag, typ, count, vfield = _parse_entry(
            table[esz * i : esz * (i + 1)], bo, big
        )
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= inline:
            raw = vfield[:size]
        else:
            (voff,) = struct.unpack(bo + ofmt, vfield[:osz])
            raw = rd(voff, size)
        if len(raw) != size:
            # a corrupt count field can claim gigabytes of values; the
            # read comes back short — raise BEFORE building the struct
            # format string (fmt * count on a hostile count is itself
            # a multi-GB allocation, found by the codec fuzz suite)
            raise ValueError(
                f"truncated TIFF: tag {tag} claims {size} value bytes, "
                f"got {len(raw)}"
            )
        fmt = _TYPE_FMT.get(typ)
        vals = struct.unpack(bo + fmt * count, raw) if fmt else (raw,)
        tags[tag] = vals

    import zlib

    compression = tags.get(_T_COMPRESSION, (1,))[0]
    # none, lzw, new-style JPEG, deflate (+legacy code), packbits
    if compression not in (1, 5, 7, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} needs rasterio (uncompressed, "
            "LZW, deflate, PackBits and baseline JPEG are implemented)"
        )
    predictor = tags.get(_T_PREDICTOR, (1,))[0]
    if predictor not in (1, 2, 3):
        raise NotImplementedError(
            f"TIFF predictor {predictor} needs rasterio (1/2/3 implemented)"
        )
    w = tags[_T_WIDTH][0]
    h = tags[_T_LENGTH][0]
    spp = tags.get(_T_SPP, (1,))[0]
    bits = tags.get(_T_BITS, (8,) * spp)
    if len(set(bits)) != 1:
        raise NotImplementedError(f"mixed bits-per-sample {bits}")
    sfmt = tags.get(_T_SAMPLE_FORMAT, (1,) * spp)[0]
    planar_cfg = tags.get(_T_PLANAR, (1,))[0]
    if planar_cfg not in (1, 2):
        raise NotImplementedError(
            f"TIFF planar configuration {planar_cfg} is not supported"
        )
    # PlanarConfiguration=2 stores each sample's plane as its own run
    # of chunks (plane 0's strips/tiles first, then plane 1's, ...);
    # with one sample it is byte-identical to chunky
    planar = planar_cfg == 2 and spp > 1
    kind = _SF_KINDS.get(sfmt)
    if kind is None:
        raise NotImplementedError(f"TIFF sample format {sfmt} is not supported")
    dtype = np.dtype(f"{bo}{kind}{bits[0] // 8}")
    if predictor == 2 and dtype.kind == "f":
        raise NotImplementedError("predictor 2 on float samples")
    if predictor == 3 and dtype.kind != "f":
        raise NotImplementedError("predictor 3 on non-float samples")
    if predictor == 3 and spp > 1 and not planar:
        raise NotImplementedError(
            "predictor 3 with chunky multi-sample pixels (single-sample "
            "chunks — spp=1 or planar — are implemented)"
        )
    jpeg_tables = b""
    if compression == 7:
        # new-style JPEG (TIFF-EP): every strip/tile is an independent
        # baseline JPEG stream; shared DQT/DHT segments may live in the
        # JPEGTables tag as a T.81 abbreviated table stream (SOI,
        # tables, EOI) to be spliced after each chunk's SOI
        if bits[0] != 8:
            raise NotImplementedError("JPEG-in-TIFF with non-8-bit samples")
        if predictor != 1:
            raise ValueError("corrupt TIFF: predictor with JPEG compression")
        if planar:
            raise NotImplementedError("planar JPEG-in-TIFF")
        jt = tags.get(_T_JPEG_TABLES)
        if jt is not None:
            jpeg_tables = bytes(jt[0])
        # PhotometricInterpretation decides the chunk color space
        # (ADVICE r10 #4): 6 = YCbCr (libtiff default, BT.601 matrix
        # applies), 2 = RGB-mode JPEG (JPEGCOLORMODE_RAW writers — the
        # planes ARE the channels, no matrix), 1/0 = grayscale. Other
        # values (palette, CMYK, CIELab) would silently decode wrong
        # colors, so they raise instead.
        jpeg_photometric = tags.get(_T_PHOTOMETRIC, (1,))[0]
        if jpeg_photometric not in (0, 1, 2, 6):
            raise NotImplementedError(
                f"JPEG-in-TIFF photometric {jpeg_photometric} "
                "(0/1 grayscale, 2 RGB, 6 YCbCr supported)"
            )

    def _jpeg_block(raw: bytes, rows: int, cols: int, nspp: int) -> np.ndarray:
        from openeo_processes_dask_ml_spark.io.jpeg import decode_jpeg

        if len(jpeg_tables) > 4 and raw[:2] == b"\xff\xd8":
            raw = b"\xff\xd8" + jpeg_tables[2:-2] + raw[2:]
        a = decode_jpeg(raw, color_transform=jpeg_photometric == 6)
        got = 1 if a.ndim == 2 else a.shape[2]
        if got != nspp:
            raise ValueError(
                f"JPEG chunk decodes {got} channel(s), SamplesPerPixel={nspp}"
            )
        # edge chunks may be encoded unpadded: pad to the declared
        # chunk geometry so the assembly grid stays rectangular
        if a.shape[0] < rows or a.shape[1] < cols:
            pad = [(0, rows - a.shape[0]), (0, cols - a.shape[1])]
            if a.ndim == 3:
                pad.append((0, 0))
            a = np.pad(a, pad)
        return a[:rows, :cols]

    def _chunk(o: int, c: int) -> bytes:
        raw = rd(o, c)
        if compression in (1, 7):  # JPEG chunks decode in _block
            return raw
        if compression == 5:
            return _lzw_decode(raw)
        if compression == 32773:
            return _packbits_decode(raw)
        return zlib.decompress(raw)

    def _undiff(block: np.ndarray) -> np.ndarray:
        # inverse of horizontal differencing: cumulative sum per row
        # (per sample), with the dtype's modular wraparound
        return np.add.accumulate(block, axis=1, dtype=block.dtype)

    def _block(raw: bytes, rows: int, cols: int, nspp: int) -> np.ndarray:
        # one decompressed chunk -> pixel block, applying the inverse
        # predictor (3 only reaches here single-sample, guarded above)
        if compression == 7:
            return _jpeg_block(raw, rows, cols, nspp)
        if predictor == 3:
            return _undo_predictor3(raw, rows, cols, dtype)
        a = np.frombuffer(raw, dtype=dtype, count=rows * cols * nspp)
        a = a.reshape((rows, cols) if nspp == 1 else (rows, cols, nspp))
        if predictor == 2:
            a = _undiff(a)
        return a

    if _T_TILE_OFFSETS in tags:
        tw = tags[_T_TILE_WIDTH][0]
        tl = tags[_T_TILE_LENGTH][0]
        across = -(-w // tw)
        down = -(-h // tl)
        offs = tags[_T_TILE_OFFSETS]
        counts = tags[_T_TILE_COUNTS]
        if planar:
            # plane-major tile order: spp runs of across*down tiles,
            # each tile carrying ONE sample — decode each plane like a
            # single-band image, then interleave to the chunky (h, w,
            # spp) output shape so callers never see the layout
            per_plane = across * down
            planes = []
            for s in range(spp):
                full = np.zeros((down * tl, across * tw), dtype=dtype)
                for i in range(per_plane):
                    o = offs[s * per_plane + i]
                    c = counts[s * per_plane + i]
                    block = _block(_chunk(o, c), tl, tw, 1)
                    ty, tx = divmod(i, across)
                    full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = block
                planes.append(full[:h, :w])
            arr = np.stack(planes, axis=-1)
        else:
            shape = (
                (down * tl, across * tw)
                if spp == 1
                else (down * tl, across * tw, spp)
            )
            full = np.zeros(shape, dtype=dtype)
            for i, (o, c) in enumerate(zip(offs, counts)):
                block = _block(_chunk(o, c), tl, tw, spp)
                ty, tx = divmod(i, across)
                full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = block
            arr = full[:h, :w]
    else:
        offs = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
        if planar:
            # plane-major strips: spp contiguous runs of
            # strips-per-plane, one sample per strip run
            per_plane = len(offs) // spp
            planes = []
            for s in range(spp):
                data = b"".join(
                    _chunk(o, c)
                    for o, c in zip(
                        offs[s * per_plane : (s + 1) * per_plane],
                        counts[s * per_plane : (s + 1) * per_plane],
                    )
                )
                # strips never split a row, so the per-row inverse is
                # safe on the assembled per-plane buffer
                planes.append(_block(data, h, w, 1))
            arr = np.stack(planes, axis=-1)
        elif compression == 7:
            # each strip is an INDEPENDENT JPEG stream — decode per
            # strip and stack (a byte-joined decode would misparse)
            rows_per = tags.get(_T_ROWS_PER_STRIP, (h,))[0]
            parts = [
                _block(
                    _chunk(o, c),
                    min(rows_per, h - si * rows_per),
                    w,
                    spp,
                )
                for si, (o, c) in enumerate(zip(offs, counts))
            ]
            arr = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
        else:
            # strips never split a row, so the per-row inverse is safe
            # on the assembled buffer
            data = b"".join(_chunk(o, c) for o, c in zip(offs, counts))
            arr = _block(data, h, w, spp)

    meta: dict = {}
    if _T_PIXEL_SCALE in tags and _T_TIEPOINT in tags:
        sx, sy = tags[_T_PIXEL_SCALE][0], tags[_T_PIXEL_SCALE][1]
        tp = tags[_T_TIEPOINT]
        # tiepoint maps raster (i, j) -> model (x, y); standard usage
        # anchors (0, 0) at the raster's top-left = (minx, maxy)
        minx = tp[3] - tp[0] * sx
        maxy = tp[4] + tp[1] * sy
        meta["pixel_scale"] = (sx, sy)
        meta["bbox"] = (minx, maxy - sy * h, minx + sx * w, maxy)
    if _T_GEOKEYS in tags:
        geo = tags[_T_GEOKEYS]
        for k in range(4, len(geo), 4):
            if geo[k] in (2048, 3072) and geo[k + 1] == 0:
                meta["epsg"] = geo[k + 3]
    return arr, meta


GTIFF_MANIFEST_SCHEMA = (
    "path string, n_rows int, n_cols int, n_bytes long, minx double, "
    "miny double, maxx double, maxy double"
)


def write_gtiff_tiles(
    df,
    out_dir: str,
    group_cols: list[str],
    value_col: str = "value",
    x_col: str = "x",
    y_col: str = "y",
    epsg: int | None = None,
    dtype: str = "float64",
    compression: str | None = None,
    tile: tuple[int, int] | None = None,
    predictor: int = 1,
    overview_levels: int = 0,
):
    """Distributed GeoTIFF sink: one single-band tile per ``group_cols``
    group (typically (item_id, time, band)), encoded and written on the
    EXECUTORS — the returned DataFrame is the manifest (path, shape,
    bbox), the only thing the driver materializes. Pixel-center x/y
    coordinates (the ``decode_assets_to_cube`` layout) reconstruct the
    cover bbox exactly, so write -> fetch -> decode round-trips.

    ``out_dir`` must be shared storage in a real cluster (each executor
    writes its own groups); file count == group count by construction —
    no small-files explosion beyond the group granularity the caller
    picked.
    """
    import pandas as pd

    fs.makedirs(out_dir)  # io.fs-routed (r14): local/file/s3/gs/hdfs
    key_fields = ", ".join(f"`{c}` string" for c in group_cols)
    schema = f"{key_fields}, {GTIFF_MANIFEST_SCHEMA}"
    np_dtype = np.dtype(dtype)

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = [str(pdf[c].iloc[0]) for c in group_cols]
        xs = np.sort(pdf[x_col].unique())
        ys = np.sort(pdf[y_col].unique())[::-1]  # north-up: row 0 = max y
        if pdf.duplicated([y_col, x_col]).any():
            # pivot_table would silently AVERAGE duplicates — a sink
            # must never alter data; duplicate cells mean the caller's
            # group_cols are too coarse (e.g. time missing). Exact
            # per-cell check: a row-count test would miss a duplicate
            # masked by a coverage hole.
            raise ValueError(
                f"duplicate (y, x) cells in group {keys}: {len(pdf)} rows "
                f"over a {len(ys)}x{len(xs)} grid — add the missing "
                "dimension to group_cols"
            )
        grid = (
            pdf.pivot_table(index=y_col, columns=x_col, values=value_col)
            .reindex(index=ys, columns=xs)
            .to_numpy()
        )
        if np_dtype.kind != "f" and np.isnan(grid).any():
            # sparse coverage -> NaN holes; float dtypes carry them as
            # nodata, but an integer cast would turn them into garbage
            raise ValueError(
                f"group {keys} does not cover the full {len(ys)}x{len(xs)} "
                f"grid and dtype {np_dtype} has no NaN — use a float "
                "dtype or densify first"
            )
        grid = grid.astype(np_dtype)
        # pixel centers -> cover bbox (uniform grids; single row/col
        # falls back to unit pixel size, mirroring grid_params)
        sx = float(xs[1] - xs[0]) if len(xs) > 1 else 1.0
        sy = float(ys[0] - ys[1]) if len(ys) > 1 else 1.0
        bbox = (
            float(xs[0]) - sx / 2,
            float(ys[-1]) - sy / 2,
            float(xs[-1]) + sx / 2,
            float(ys[0]) + sy / 2,
        )
        # COG-style pyramid: nearest-subsampled halvings as chained
        # overview IFDs (dtype-exact, deterministic)
        ovs = []
        lvl = grid
        for _ in range(overview_levels):
            if min(lvl.shape) < 2:
                break
            lvl = lvl[::2, ::2]
            ovs.append(lvl)
        payload = encode_gtiff(
            grid,
            bbox=bbox,
            epsg=epsg,
            compression=compression,
            tile=tile,
            predictor=predictor,
            overviews=ovs or None,
        )
        # readable sanitized keys + a digest of the RAW keys: two
        # groups whose keys differ only in sanitized-away characters
        # ("a:b" vs "a-b") must not collide on one path
        import hashlib

        digest = hashlib.md5("\x00".join(keys).encode()).hexdigest()[:8]
        safe = "_".join(
            k.replace(os.sep, "-").replace(":", "-") for k in keys
        )
        path = os.path.join(out_dir, f"{safe}_{digest}.tif")
        # direct final-name write: payload bytes are deterministic,
        # so retry/speculative overwrites are idempotent per scheme
        sp = fs.resolve(path)
        with sp.open_write(sp.path) as f:
            f.write(payload)
        return pd.DataFrame(
            [
                keys
                + [path, grid.shape[0], grid.shape[1], len(payload)]
                + list(bbox)
            ],
            columns=group_cols
            + ["path", "n_rows", "n_cols", "n_bytes", "minx", "miny", "maxx", "maxy"],
        )

    return df.groupBy(*group_cols).applyInPandas(encode_group, schema=schema)


def gtiff_ifd_dims(payload: bytes) -> list[tuple[int, int]]:
    """(width, height) of every chained IFD — a tag-table-only walk
    (no chunk decode), cheap enough to run per asset before choosing
    which pyramid level to actually decode."""
    return _ifd_dims_from(lambda o, sz: payload[o : o + sz])


def _ifd_dims_from(rd) -> list[tuple[int, int]]:
    bo, big, off = _tiff_header(rd)
    csz, cfmt, esz, osz, ofmt, _ = _GEOM_BIG if big else _GEOM_CLASSIC
    dims: list[tuple[int, int]] = []
    while off:
        n = struct.unpack(bo + cfmt, rd(off, csz))[0]
        table = rd(off + csz, esz * n)
        w = h = None
        for i in range(n):
            tag, typ, count, vfield = _parse_entry(
                table[esz * i : esz * (i + 1)], bo, big
            )
            if tag in (_T_WIDTH, _T_LENGTH):
                fmt = _TYPE_FMT[typ]
                v = struct.unpack(bo + fmt, vfield[: _TYPE_SIZES[typ]])[0]
                if tag == _T_WIDTH:
                    w = v
                else:
                    h = v
        dims.append((int(w), int(h)))
        (off,) = struct.unpack(bo + ofmt, rd(off + csz + esz * n, osz))
    return dims


def gtiff_level_for_resolution(
    payload: bytes, bbox, target_resolution: float
) -> int:
    """The pyramid level a reader should decode for ``target_resolution``
    (CRS units per pixel): the COARSEST level whose pixel size is still
    <= the target — the standard COG overview selection, reading the
    fewest pixels that can exactly produce the requested grid. Level 0
    when no overview qualifies (or none exist)."""
    return _level_for(gtiff_ifd_dims(payload), bbox, target_resolution)


def _level_for(dims, bbox, target_resolution: float) -> int:
    minx, _, maxx, _ = (float(v) for v in bbox)
    best = 0
    for k, (w, _) in enumerate(dims):
        if w <= 0:
            continue
        if (maxx - minx) / w <= float(target_resolution):
            best = k
        else:
            break  # levels only get coarser down the chain
    return best
