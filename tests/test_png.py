"""Pure-numpy PNG codec (io/png.py): ground truth from the public W3C
spec — the test-side FILTERER implements each scanline filter from
the spec formulas independently (per-byte Python, no shared code with
the module's vectorized inverse), so a decode that reproduces the
original proves the inverse against the spec, not against itself.
"""

import struct
import zlib

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.png import (
    _SIGNATURE,
    decode_png,
    encode_png,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _spec_filter(rows: np.ndarray, bpp: int, ftypes) -> bytes:
    """Apply the spec's filter FORWARD per scanline (spec §6), byte by
    byte: Sub, Up, Average, Paeth exactly as written in the standard."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    h, stride = rows.shape
    out = bytearray()
    prev = [0] * stride
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        cur = [int(v) for v in rows[y]]
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            x = cur[i]
            if ft == 0:
                f = x
            elif ft == 1:
                f = (x - a) & 0xFF
            elif ft == 2:
                f = (x - b) & 0xFF
            elif ft == 3:
                f = (x - (a + b) // 2) & 0xFF
            else:
                f = (x - paeth(a, b, c)) & 0xFF
            out.append(f)
        prev = cur
    return bytes(out)


def _png(w, h, depth, color, scanlines: bytes, plte=None, trns=None,
         interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    body = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", bytes(plte))
    if trns is not None:
        body += _chunk(b"tRNS", bytes(trns))
    # split the compressed stream over two IDAT chunks to prove
    # multi-IDAT concatenation
    comp = zlib.compress(scanlines)
    mid = len(comp) // 2
    body += _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    return body + _chunk(b"IEND", b"")


@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_filters_against_spec_formulas(ftypes):
    """Every filter type (and a mixed-per-row stream) inverts to the
    original bytes — forward filtering done independently from the
    spec text."""
    rng = np.random.default_rng(sum(ftypes) + 1)
    img = rng.integers(0, 256, (7, 11, 3)).astype(np.uint8)
    rows = img.reshape(7, 33)
    payload = _png(11, 7, 8, 2, _spec_filter(rows, 3, ftypes))
    np.testing.assert_array_equal(decode_png(payload), img)


def test_roundtrip_color_types_and_depths():
    """encode_png(filter 0) -> decode_png is the identity for every
    supported layout."""
    rng = np.random.default_rng(2)
    cases = [
        rng.integers(0, 256, (5, 9)).astype(np.uint8),          # gray 8
        rng.integers(0, 65536, (5, 9)).astype(np.uint16),       # gray 16
        rng.integers(0, 256, (4, 6, 2)).astype(np.uint8),       # gray+alpha
        rng.integers(0, 256, (4, 6, 3)).astype(np.uint8),       # rgb 8
        rng.integers(0, 65536, (4, 6, 3)).astype(np.uint16),    # rgb 16
        rng.integers(0, 256, (4, 6, 4)).astype(np.uint8),       # rgba
    ]
    for img in cases:
        out = decode_png(encode_png(img))
        assert out.dtype == img.dtype, img.shape
        np.testing.assert_array_equal(out, img)


def test_palette_with_trns_and_subbyte_depths():
    """Palette images: 8-bit and sub-byte (4/2/1) indices expand
    through PLTE; tRNS adds the alpha channel."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    # depth 8
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    scan = _spec_filter(idx, 1, [0])
    out = decode_png(_png(4, 2, 8, 3, scan, plte=plte))
    assert out.shape == (2, 4, 3)
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0])
    # tRNS alpha
    out = decode_png(_png(4, 2, 8, 3, scan, plte=plte, trns=bytes([10, 200])))
    assert out.shape == (2, 4, 4)
    assert out[0, 0, 3] == 10 and out[0, 1, 3] == 200 and out[0, 2, 3] == 255
    # depth 4: two indices per byte, MSB first
    packed = np.array([[0x01, 0x23], [0x32, 0x10]], dtype=np.uint8)
    out = decode_png(_png(4, 2, 4, 3, _spec_filter(packed, 1, [0]), plte=plte))
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[0, 3], [7, 8, 9])
    # depth 1: eight indices per byte
    packed1 = np.array([[0b01011010]], dtype=np.uint8)
    out = decode_png(_png(8, 1, 1, 3, _spec_filter(packed1, 1, [0]), plte=plte))
    np.testing.assert_array_equal(
        out[0, :, 0], [255, 0, 255, 0, 0, 255, 0, 255]
    )


def test_sixteen_bit_big_endian_samples():
    """16-bit samples are big-endian in the stream (spec §7.1)."""
    img = np.array([[0x0102, 0xFFFE]], dtype=np.uint16)
    raw = b"\x00" + struct.pack(">2H", 0x0102, 0xFFFE)
    out = decode_png(_png(2, 1, 16, 0, raw))
    np.testing.assert_array_equal(out, img)


def test_rejections_and_truncations():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")
    img = np.zeros((4, 4), dtype=np.uint8)
    payload = encode_png(img)
    with pytest.raises(ValueError, match="interlace"):
        # interlace methods beyond 0/1 are undefined by the spec
        i = payload.index(b"IHDR")
        bad = payload[: i + 16] + b"\x02" + payload[i + 17 :]
        decode_png(bad)
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_png(payload[: len(payload) - 20])
    # unknown filter type
    raw = b"\x07" + b"\x00" * 4
    with pytest.raises(ValueError, match="filter type"):
        decode_png(_png(4, 1, 8, 0, raw))


def test_declared_huge_ihdr_rejected_before_inflate():
    """Hostile-header cap (ADVICE r10 #3): a small payload whose IHDR
    declares a 60000x60000 image is rejected from the header alone —
    before the bounded-but-large (up to ~1030x input) inflate runs or
    the h*(1+stride) buffer allocates."""
    with pytest.raises(ValueError, match="max_pixels"):
        decode_png(_png(60000, 60000, 8, 0, b""))
    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_png(encode_png(img), max_pixels=8)
    assert decode_png(encode_png(img), max_pixels=16).shape == (4, 4)


# Adam7 pass grid straight from the spec table (§8.2): starting
# offsets and intervals per pass, (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _pack_rows(sub: np.ndarray, depth: int) -> np.ndarray:
    """Per-pixel sub-image -> (ph, stride) byte rows: 8-bit channels
    flatten, 16-bit go big-endian, sub-byte palette indices pack
    MSB-first."""
    ph = sub.shape[0]
    if depth == 16:
        return np.frombuffer(
            sub.astype(">u2").tobytes(), dtype=np.uint8
        ).reshape(ph, -1)
    if depth == 8:
        return sub.reshape(ph, -1)
    per = 8 // depth
    rows = []
    for r in sub:
        out = bytearray()
        for i in range(0, len(r), per):
            b = 0
            for j, v in enumerate(r[i : i + per]):
                b |= int(v) << (8 - depth * (j + 1))
            out.append(b)
        rows.append(bytes(out))
    return np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(ph, -1)


def _adam7_scanlines(samples: np.ndarray, depth: int, bpp: int) -> bytes:
    """FORWARD Adam7 interleave per spec: extract each pass's
    sub-image on the (x0, y0, dx, dy) grid, filter its scanlines
    independently (cycling through all five filters), concatenate."""
    out = b""
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
        sub = samples[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        rows = _pack_rows(sub, depth)
        out += _spec_filter(rows, bpp, [p % 5, (p + 1) % 5])
    return out


def test_adam7_rgb_odd_size_matches_sequential():
    rng = np.random.default_rng(20)
    img = rng.integers(0, 256, (9, 10, 3), dtype=np.uint8)
    scan = _adam7_scanlines(img, 8, 3)
    out = decode_png(_png(10, 9, 8, 2, scan, interlace=1))
    np.testing.assert_array_equal(out, img)
    # and the interlaced decode equals the sequential decode bit-exact
    np.testing.assert_array_equal(out, decode_png(encode_png(img)))


def test_adam7_16bit_grayscale():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 1 << 16, (5, 7), dtype=np.uint16)
    scan = _adam7_scanlines(img[:, :, None], 16, 2)
    out = decode_png(_png(7, 5, 16, 0, scan, interlace=1))
    np.testing.assert_array_equal(out, img)


def test_adam7_palette_4bit_with_trns():
    rng = np.random.default_rng(22)
    palette = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    trns = bytes([255, 255, 0, 255, 128, 255, 255])
    idx = rng.integers(0, 7, (6, 9), dtype=np.uint8)
    scan = _adam7_scanlines(idx, 4, 1)
    out = decode_png(
        _png(9, 6, 4, 3, scan, plte=palette.tobytes(), trns=trns, interlace=1)
    )
    alpha = np.frombuffer(trns, np.uint8)[idx]
    expect = np.dstack([palette[idx], alpha])
    np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (8, 8), (3, 17)])
def test_adam7_small_and_empty_passes(shape):
    """Sizes below the 8x8 tile leave whole passes EMPTY (zero
    scanlines contributed) — the stream layout must still line up."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    scan = _adam7_scanlines(img[:, :, None], 8, 1)
    out = decode_png(_png(shape[1], shape[0], 8, 0, scan, interlace=1))
    np.testing.assert_array_equal(out, img)


def test_decode_image_dispatches_png():
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    img = (np.arange(12).reshape(3, 4) * 7 % 251).astype(np.uint8)
    np.testing.assert_array_equal(decode_image(encode_png(img), "png"), img)
