"""Lossless-WebP decoder (io/webp.py) against an INDEPENDENT
test-side VP8L encoder built from the public bitstream spec: LSB-first
value writing, MSB-first canonical-code writing, literal streams with
all-length-8 codes, and forward applications of each transform
(subtract-green, cross-color, palette with bundling, all 14
predictors) implemented here from the spec text — sharing no code
with the module's inverse."""

import struct

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.webp import decode_webp


class _W:
    """VP8L bit writer: values LSB-first, prefix codes MSB-first."""

    def __init__(self):
        self.bits = []

    def val(self, v: int, n: int):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _riff(vp8l: bytes, extra_chunks=()) -> bytes:
    chunks = b""
    for fourcc, body in extra_chunks:
        chunks += fourcc + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    chunks += b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def _header(w, h, alpha=0):
    bw = _W()
    bw.val(w - 1, 14)
    bw.val(h - 1, 14)
    bw.val(alpha, 1)
    bw.val(0, 3)  # version
    return bw


def _byte_code(bw: _W, alphabet: int):
    """A 'normal' prefix code giving every byte symbol 0..255 length 8
    — canonical assignment then makes code(symbol) == symbol, so
    literals are written as plain 8-bit MSB-first bytes. The
    code-length code uses two 1-bit symbols {0, 8}; writing '8' is a
    single 1-bit. For alphabets > 256 the max_symbol field caps the
    read at 256 (the >255 symbols get no code)."""
    bw.val(0, 1)  # normal
    # order = [17,18,0,1,2,3,4,5,16,6,7,8,...]; we need slots for 0 and 8
    bw.val(12 - 4, 4)  # num_code_lengths = 12 (through symbol 8)
    cl = {0: 1, 8: 1}
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8)
    for sym in order:
        bw.val(cl.get(sym, 0), 3)
    if alphabet > 256:
        bw.val(1, 1)  # use max_symbol
        bw.val(3, 3)  # length_nbits = 2 + 2*3 = 8
        bw.val(254, 8)  # max_symbol = 2 + 254 = 256
    else:
        bw.val(0, 1)
    # 256 code lengths of 8: symbol '8' has canonical 1-bit code 1
    for _ in range(256):
        bw.code(1, 1)


def _single(bw: _W, symbol: int):
    """Simple prefix code with ONE symbol — zero bits per decode."""
    bw.val(1, 1)  # simple
    bw.val(0, 1)  # num_symbols = 1
    bw.val(1, 1)  # 8-bit first symbol
    bw.val(symbol, 8)


def _cache_info(bw: _W, cache_bits=0):
    """Color-cache info — the FIRST field of every entropy-coded image
    stream (before the meta-prefix bit, which only level 0 carries)."""
    bw.val(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.val(cache_bits, 4)


def _literal_codes(bw: _W, cache_bits=0, alpha_fixed=255):
    """One prefix-code group: byte codes for G/R/B, single-symbol
    alpha + distance. Does NOT include the cache-info / meta bits —
    callers write those per the stream level."""
    _byte_code(bw, 256 + 24 + ((1 << cache_bits) if cache_bits else 0))
    _byte_code(bw, 256)  # red
    _byte_code(bw, 256)  # blue
    _single(bw, alpha_fixed)
    _single(bw, 0)  # distance (never used)


def _const_len_code(bw: _W, length: int):
    """Normal code whose code-length code has ONE symbol (`length`) —
    zero bits per decode, so the reader fills the WHOLE alphabet with
    that length and canonical assignment makes code(sym) == sym.
    Usable for any alphabet <= 2**length."""
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    num = order.index(length) + 1
    bw.val(0, 1)  # normal
    bw.val(num - 4, 4)
    for sym in order[:num]:
        bw.val(1 if sym == length else 0, 3)
    bw.val(0, 1)  # no explicit max_symbol: fill the full alphabet


def _put_rgb(bw: _W, r, g, b):
    bw.code(g, 8)
    bw.code(r, 8)
    bw.code(b, 8)


def _spatial_rgb(bw: _W, img: np.ndarray, cache_bits=0):
    """The level-0 spatially-coded image: cache info, then the
    meta-prefix bit (0), then one code group + literal pixels."""
    _cache_info(bw, cache_bits)
    bw.val(0, 1)  # no meta prefix
    _literal_codes(bw, cache_bits=cache_bits)
    for px in img.reshape(-1, 3):
        _put_rgb(bw, int(px[0]), int(px[1]), int(px[2]))


def _simple_lossless(img: np.ndarray, transforms_bits=None) -> bytes:
    h, w = img.shape[:2]
    bw = _header(w, h)
    if transforms_bits:
        transforms_bits(bw)
    bw.val(0, 1)  # no (more) transforms
    _spatial_rgb(bw, img)
    return _riff(b"\x2f" + bw.tobytes())


def test_literal_roundtrip_rgb():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    out = decode_webp(_simple_lossless(img))
    assert out.shape == (7, 9, 3)
    np.testing.assert_array_equal(out, img)


def test_literal_roundtrip_rgba():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (3, 5, 4), dtype=np.uint8)
    bw = _header(5, 3, alpha=1)
    bw.val(0, 1)  # no transforms
    bw.val(0, 1)  # no cache
    bw.val(0, 1)  # no meta prefix
    _byte_code(bw, 256 + 24)
    _byte_code(bw, 256)
    _byte_code(bw, 256)
    _byte_code(bw, 256)  # alpha as a full byte code too
    _single(bw, 0)
    for px in img.reshape(-1, 4):
        bw.code(int(px[1]), 8)  # G
        bw.code(int(px[0]), 8)  # R
        bw.code(int(px[2]), 8)  # B
        bw.code(int(px[3]), 8)  # A
    out = decode_webp(_riff(b"\x2f" + bw.tobytes()))
    assert out.shape == (3, 5, 4)
    np.testing.assert_array_equal(out, img)


def test_subtract_green_transform():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    stored = img.astype(np.int16).copy()
    stored[:, :, 0] = (stored[:, :, 0] - stored[:, :, 1]) % 256  # r -= g
    stored[:, :, 2] = (stored[:, :, 2] - stored[:, :, 1]) % 256  # b -= g

    def tr(bw):
        bw.val(1, 1)  # a transform follows
        bw.val(2, 2)  # subtract green

    out = decode_webp(_simple_lossless(stored.astype(np.uint8), tr))
    np.testing.assert_array_equal(out, img)


def _delta(t: int, c: int) -> int:
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def test_color_transform():
    """Forward cross-color per spec (deltas SUBTRACTED on encode,
    red's delta from green, blue's from green and ORIGINAL red), one
    4x4 tile with known multipliers."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    g2r, g2b, r2b = 0x12, 0xF0, 0x33  # mixed signs as int8
    stored = img.astype(np.int32).copy()
    for y in range(4):
        for x in range(4):
            r, g, b = (int(v) for v in img[y, x])
            stored[y, x, 0] = (r - _delta(g2r, g)) % 256
            # r2b's delta is from the ORIGINAL red (libwebp
            # VP8LTransformColor passes the untransformed red)
            stored[y, x, 2] = (b - _delta(g2b, g) - _delta(r2b, r)) % 256

    def tr(bw):
        bw.val(1, 1)
        bw.val(1, 2)  # color transform
        bw.val(0, 3)  # bits = 2 -> 4x4 tile, sub-image 1x1
        # sub-image: 1 literal pixel (a=255, r=r2b, g=g2b, b=g2r)
        bw.val(0, 1)  # no cache
        _literal_codes(bw)
        _put_rgb(bw, r2b, g2b, g2r)

    out = decode_webp(_simple_lossless(stored.astype(np.uint8), tr))
    np.testing.assert_array_equal(out, img)


def test_palette_no_bundling():
    rng = np.random.default_rng(7)
    palette = rng.integers(0, 256, (20, 3), dtype=np.uint8)
    idx = rng.integers(0, 20, (5, 8), dtype=np.uint8)
    img = palette[idx]

    def tr(bw):
        bw.val(1, 1)
        bw.val(3, 2)  # color indexing
        bw.val(19, 8)  # n_colors - 1
        # palette image: 1 row of component-wise DELTAS
        bw.val(0, 1)  # no cache
        _literal_codes(bw)
        prev = np.zeros(3, np.int16)
        for c in palette:
            d = (c.astype(np.int16) - prev) % 256
            _put_rgb(bw, int(d[0]), int(d[1]), int(d[2]))
            prev = c.astype(np.int16)

    h, w = idx.shape
    bw = _header(w, h)
    tr(bw)
    bw.val(0, 1)  # no more transforms
    # spatial image at FULL width (no bundling for >16 colors):
    # indices ride in the green channel
    bw.val(0, 1)  # no cache
    bw.val(0, 1)  # no meta
    _literal_codes(bw)
    for i in idx.reshape(-1):
        _put_rgb(bw, 0, int(i), 0)
    out = decode_webp(_riff(b"\x2f" + bw.tobytes()))
    np.testing.assert_array_equal(out, img)


def test_palette_bundled_4_colors():
    """<=4 colors bundle 4 two-bit indices per green byte (LSB-first),
    and the spatially-coded image shrinks to ceil(w/4)."""
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3, 3, 1], [2, 2, 0, 1, 0, 3]], np.uint8)
    img = palette[idx]
    h, w = idx.shape
    bw = _header(w, h)
    bw.val(1, 1)
    bw.val(3, 2)
    bw.val(3, 8)  # n_colors - 1
    bw.val(0, 1)  # palette image: no cache
    _literal_codes(bw)
    prev = np.zeros(3, np.int16)
    for c in palette:
        d = (c.astype(np.int16) - prev) % 256
        _put_rgb(bw, int(d[0]), int(d[1]), int(d[2]))
        prev = c.astype(np.int16)
    bw.val(0, 1)  # no more transforms
    bw.val(0, 1)  # no cache
    bw.val(0, 1)  # no meta
    _literal_codes(bw)
    packed_w = (w + 3) // 4
    for row in idx:
        for gx in range(packed_w):
            byte = 0
            for k in range(4):
                x = gx * 4 + k
                if x < w:
                    byte |= int(row[x]) << (2 * k)
            _put_rgb(bw, 0, byte, 0)
    out = decode_webp(_riff(b"\x2f" + bw.tobytes()))
    np.testing.assert_array_equal(out, img)


def _spec_predict(mode, L, T, TL, TR):
    """Independent spec evaluation of the 14 predictor modes, on
    (a, r, g, b) int tuples."""

    def avg(p, q):
        return tuple((pc + qc) >> 1 for pc, qc in zip(p, q))

    def clamp(v):
        return max(0, min(255, v))

    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return avg(avg(L, TR), T)
    if mode == 6:
        return avg(L, TL)
    if mode == 7:
        return avg(L, T)
    if mode == 8:
        return avg(TL, T)
    if mode == 9:
        return avg(T, TR)
    if mode == 10:
        return avg(avg(L, TL), avg(T, TR))
    if mode == 11:
        p = tuple(lc + tc - jc for lc, tc, jc in zip(L, T, TL))
        pl = sum(abs(pc - lc) for pc, lc in zip(p, L))
        pt = sum(abs(pc - tc) for pc, tc in zip(p, T))
        return L if pl < pt else T
    if mode == 12:
        return tuple(
            clamp(lc + tc - jc) for lc, tc, jc in zip(L, T, TL)
        )
    ave = avg(L, T)
    return tuple(
        clamp(ac + int((ac - jc) / 2)) for ac, jc in zip(ave, TL)
    )


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_transform_all_modes(mode):
    """One 8x8 image, predictor blocks of 4 -> a 2x2 mode sub-image
    all set to ``mode``; residuals computed by a test-side FORWARD
    predictor from the spec, decode must reconstruct exactly."""
    rng = np.random.default_rng(100 + mode)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    # forward pass: residual = pixel - prediction (mod 256), scanning
    # in raster order against the RECONSTRUCTED (= original) pixels
    res = np.zeros_like(img)
    for y in range(8):
        for x in range(8):
            cur = (255, int(img[y, x, 0]), int(img[y, x, 1]), int(img[y, x, 2]))
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = (255, *(int(v) for v in img[y, x - 1]))
            elif x == 0:
                pred = (255, *(int(v) for v in img[y - 1, x]))
            else:
                L = (255, *(int(v) for v in img[y, x - 1]))
                T = (255, *(int(v) for v in img[y - 1, x]))
                TL = (255, *(int(v) for v in img[y - 1, x - 1]))
                TR = (
                    (255, *(int(v) for v in img[y - 1, x + 1]))
                    if x + 1 < 8
                    else (255, *(int(v) for v in img[y, 0]))
                )
                pred = _spec_predict(mode, L, T, TL, TR)
            res[y, x] = [(c - p) % 256 for c, p in zip(cur[1:], pred[1:])]

    def tr(bw):
        bw.val(1, 1)
        bw.val(0, 2)  # predictor
        bw.val(0, 3)  # bits = 2 -> 4px blocks, sub-image 2x2
        bw.val(0, 1)  # sub-image: no cache
        _literal_codes(bw)
        for _ in range(4):
            _put_rgb(bw, 0, mode, 0)  # mode rides in green

    out = decode_webp(_simple_lossless(res, tr))
    np.testing.assert_array_equal(out, img)


def _put_rgb_wide(bw: _W, r, g, b):
    """Literal with a 9-bit constant-length green code (see
    _const_len_code: code(sym) == sym)."""
    bw.code(g, 9)
    bw.code(r, 8)
    bw.code(b, 8)


def test_lz77_backward_reference():
    """Literals 'A B', then a length-4 distance-2 copy (overlapping
    source and destination), then one more literal:
    A B A B A B C on a 7x1 canvas."""
    A, B, C = (10, 20, 30), (40, 50, 60), (70, 80, 90)
    bw = _header(7, 1)
    bw.val(0, 1)  # no transforms
    bw.val(0, 1)  # no cache
    bw.val(0, 1)  # no meta
    _const_len_code(bw, 9)  # green+length alphabet (280), 9-bit flat
    _byte_code(bw, 256)
    _byte_code(bw, 256)
    _single(bw, 255)  # alpha
    _const_len_code(bw, 8)  # distance alphabet (40), 8-bit flat
    _put_rgb_wide(bw, *A)
    _put_rgb_wide(bw, *B)
    # copy length 4 -> length prefix code 3 (codes 0..3 = lengths
    # 1..4, no extra bits) -> green symbol 256 + 3
    bw.code(256 + 3, 9)
    # linear distance 2 -> dist_code 122 -> prefix symbol 13 with
    # extra = (13-2)>>1 = 5 bits, offset (2+1)<<5 = 96: 97 + 25 = 122
    bw.code(13, 8)
    bw.val(25, 5)
    _put_rgb_wide(bw, *C)
    out = decode_webp(_riff(b"\x2f" + bw.tobytes()))
    expect = np.array([[A, B, A, B, A, B, C]], np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_color_cache():
    """A literal pixel, then a cache reference to it: cache index =
    (0x1e35a7bd * ARGB) >> (32 - cache_bits), cache symbol =
    256 + 24 + index."""
    px = (123, 45, 67)
    argb = (255 << 24) | (px[0] << 16) | (px[1] << 8) | px[2]
    cache_bits = 4
    index = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _header(2, 1)
    bw.val(0, 1)  # no transforms
    _cache_info(bw, cache_bits)
    bw.val(0, 1)  # no meta
    _const_len_code(bw, 9)  # 256 + 24 + 16 = 296 symbols, 9-bit flat
    _byte_code(bw, 256)
    _byte_code(bw, 256)
    _single(bw, 255)
    _single(bw, 0)
    _put_rgb_wide(bw, *px)
    bw.code(256 + 24 + index, 9)
    out = decode_webp(_riff(b"\x2f" + bw.tobytes()))
    expect = np.array([[px, px]], np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_meta_prefix_two_groups():
    """An 8x4 image with 4px meta tiles: two prefix groups, each made
    of single-symbol codes (zero bits per pixel) painting a constant
    color — left half group 0, right half group 1."""
    bw = _header(8, 4)
    bw.val(0, 1)  # no transforms
    bw.val(0, 1)  # main image: no cache (cache info precedes meta bit)
    bw.val(1, 1)  # meta prefix present
    bw.val(0, 3)  # meta bits = 2 -> tiles of 4 -> meta image 2x1
    # meta image (entropy-coded, level != 0): no cache, literal codes;
    # meta pixel green = group index (red = high byte = 0)
    bw.val(0, 1)
    _literal_codes(bw)
    _put_rgb(bw, 0, 0, 0)  # tile 0 -> group 0
    _put_rgb(bw, 0, 1, 0)  # tile 1 -> group 1
    # group 0: all single-symbol codes -> constant (10, 200, 30)
    _single_group(bw, 200, 10, 30)
    # group 1: constant (90, 60, 250)
    _single_group(bw, 60, 90, 250)
    out = decode_webp(_riff(b"\x2f" + bw.tobytes()))
    expect = np.zeros((4, 8, 3), np.uint8)
    expect[:, :4] = (10, 200, 30)
    expect[:, 4:] = (90, 60, 250)
    np.testing.assert_array_equal(out, expect)


def _single_group(bw: _W, g, r, b):
    _single(bw, g)
    _single(bw, r)
    _single(bw, b)
    _single(bw, 255)
    _single(bw, 0)


def test_container_and_guards():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    good = _simple_lossless(img)
    # VP8X metadata chunk before VP8L is skipped
    vp8l = good[good.index(b"VP8L") :]
    with_vp8x = (
        b"RIFF"
        + struct.pack("<I", 4 + 18 + len(vp8l))
        + b"WEBP"
        + b"VP8X"
        + struct.pack("<I", 10)
        + b"\x00" * 10
        + vp8l
    )
    np.testing.assert_array_equal(decode_webp(with_vp8x), img)
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"not a webp")
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(
            b"RIFF" + struct.pack("<I", 12) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 0)
        )
    with pytest.raises(ValueError, match="truncated WebP"):
        decode_webp(good[: len(good) - 4])
    # declared-huge canvas rejected before the pixel loop
    bw = _header(16000, 16000)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_webp(_riff(b"\x2f" + bw.tobytes() + b"\x00" * 8))


def test_decode_image_dispatches_webp():
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_simple_lossless(img), "webp"), img)
