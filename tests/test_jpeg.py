"""Baseline JPEG decoder (io/jpeg.py) against GROUND TRUTH derived
from the public T.81 spec itself:

- hand-assembled streams whose expected pixels follow from the spec's
  IDCT formula evaluated independently (math.cos loops in the test,
  not the module's matrix path);
- a TEST-ONLY encoder (forward DCT by the textbook formula, simple
  canonical Huffman tables) for roundtrip coverage of multi-MCU
  layouts, 4:2:0 color, and restart markers. The encoder lives here,
  not in the package — the product never fakes an encode it doesn't
  need.
"""

import math
import struct

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.jpeg import ZIGZAG, decode_jpeg

# ---------------------------------------------------------- assembly


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt(tq: int, table64) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes(int(v) for v in table64))


def _dht(tc: int, th: int, counts, symbols) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols))


def _sof0(h: int, w: int, comps) -> bytes:
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return _seg(0xC0, body)


def _sos(comps) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([0, 63, 0])
    return _seg(0xDA, body)


class _Bits:
    def __init__(self):
        self.bits = []

    def put(self, value: int, width: int):
        for i in range(width - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)  # pad with 1s
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        # byte stuffing
        return bytes(out).replace(b"\xff", b"\xff\x00")


# test tables: DC categories 0..15 as 5-bit codes, AC symbols 0..255
# as 9-bit codes — valid canonical Huffman (left-packed)
_DC_COUNTS = [0, 0, 0, 0, 16] + [0] * 11
_DC_SYMBOLS = list(range(16))
# a DHT length count is one byte, so 256 symbols split 255 at length
# 9 + 1 at length 10 (canonical: symbol 255 gets 10-bit code 510)
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_AC_SYMBOLS = list(range(256))


def _put_ac_sym(bw: "_Bits", sym: int):
    if sym < 255:
        bw.put(sym, 9)
    else:
        bw.put(510, 10)


def _put_dc(bw: _Bits, diff: int):
    diff = int(diff)
    t = 0 if diff == 0 else max(1, diff.bit_length() if diff > 0 else (-diff).bit_length())
    bw.put(t, 5)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _put_ac_block(bw: _Bits, zz_coeffs):
    """zz_coeffs: 63 AC values in zig-zag order."""
    run = 0
    last_nz = -1
    for i, v in enumerate(zz_coeffs):
        if v != 0:
            last_nz = i
    for i in range(last_nz + 1):
        v = int(zz_coeffs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            _put_ac_sym(bw, 0xF0)
            run -= 16
        t = v.bit_length() if v > 0 else (-v).bit_length()
        _put_ac_sym(bw, (run << 4) | t)
        bw.put(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 62:
        _put_ac_sym(bw, 0x00)  # EOB


def _spec_idct(F: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 evaluated literally — independent of the module."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def _gray_jpeg(coeff_blocks, h, w, q=None, restart=0, sampling=(1, 1)):
    """Assemble a grayscale baseline JPEG whose blocks carry the given
    zig-zag DCT coefficient lists (DC first). ``sampling`` sets the
    component's (hs, vs) factors — spec-valid for a single-component
    file even when >1 (the scan is then still non-interleaved and the
    block count is the component raster, T.81 A.2)."""
    q = [1] * 64 if q is None else q
    bw = _Bits()
    pred = 0
    chunks = []
    for i, zz in enumerate(coeff_blocks):
        if restart and i and i % restart == 0:
            chunks.append(bw.tobytes())
            bw = _Bits()
            pred = 0
        dc = int(zz[0])
        _put_dc(bw, dc - pred)
        pred = dc
        _put_ac_block(bw, zz[1:])
    chunks.append(bw.tobytes())
    entropy = b""
    for i, c in enumerate(chunks):
        if i:
            entropy += bytes([0xFF, 0xD0 + (i - 1) % 8])
        entropy += c
    payload = (
        b"\xff\xd8"
        + _dqt(0, q)
        + _sof0(h, w, [(1, sampling[0], sampling[1], 0)])
        + _dht(0, 0, _DC_COUNTS, _DC_SYMBOLS)
        + _dht(1, 0, _AC_COUNTS, _AC_SYMBOLS)
        + (_seg(0xDD, struct.pack(">H", restart)) if restart else b"")
        + _sos([(1, 0, 0)])
        + entropy
        + b"\xff\xd9"
    )
    return payload


# ------------------------------------------------------------- tests


def test_dc_only_block_flat_value():
    """A DC-only block decodes to the flat value DC*q/8 + 128 — exact
    per the spec IDCT with F[0,0] the only nonzero coefficient."""
    q = [16] + [1] * 63
    zz = [8] + [0] * 63  # DC coefficient 8, quantized
    out = decode_jpeg(_gray_jpeg([zz], 8, 8, q=q))
    assert out.shape == (8, 8) and out.dtype == np.uint8
    assert (out == 8 * 16 // 8 + 128).all()  # 144 everywhere


def test_single_ac_coefficient_matches_spec_idct():
    """One AC coefficient produces the cosine pattern of the T.81
    formula — evaluated independently in the test."""
    zz = [0] * 64
    zz[1] = 5  # zig-zag index 1 -> F[0, 1]
    out = decode_jpeg(_gray_jpeg([zz], 8, 8))
    F = np.zeros((8, 8))
    F.flat[ZIGZAG[1]] = 5.0
    expect = np.clip(np.round(_spec_idct(F) + 128.0), 0, 255)
    np.testing.assert_array_equal(out.astype(np.float64), expect)


def test_negative_coefficients_and_zrl():
    """Sign extension (EXTEND) and the ZRL (16-zero-run) symbol."""
    zz = [0] * 64
    zz[0] = -24        # negative DC
    zz[20] = -3        # after a >16 zero run from index 1 -> needs ZRL
    out = decode_jpeg(_gray_jpeg([zz], 8, 8))
    F = np.zeros((8, 8))
    F.flat[ZIGZAG[0]] = -24.0
    F.flat[ZIGZAG[20]] = -3.0
    expect = np.clip(np.round(_spec_idct(F) + 128.0), 0, 255)
    np.testing.assert_array_equal(out.astype(np.float64), expect)


def _fdct_blocks(img: np.ndarray):
    """Forward DCT per 8x8 block (textbook formula), integer-rounded
    coefficients in zig-zag order — the test-side encoder core."""
    h, w = img.shape
    blocks = []
    C = np.array([
        [
            (1 / math.sqrt(2) if u == 0 else 1.0) / 2.0
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ])
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = img[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            F = C @ blk @ C.T
            zz = np.round(F.flatten()[ZIGZAG]).astype(int)
            blocks.append(list(zz))
    return blocks


def test_noninterleaved_baseline_single_component_2x2_sampling():
    """T.81 A.2 (ADVICE r10 #1): a single-component scan is ALWAYS
    non-interleaved, baseline included — it traverses the component's
    own block raster (nbw x nbh), not the MCU grid. A 24x24 grayscale
    baseline file with 2x2 sampling factors has a 16x16 MCU grid (2x2
    MCUs x 4 blocks = 16 blocks) but only ceil(24/8)^2 = 9 actual
    blocks; routing it through the interleaved loop read 16 blocks and
    died with 'entropy data exhausted'. Value-checked against the
    spec IDCT block-by-block."""
    rng = np.random.default_rng(7)
    blocks = []
    for _ in range(9):  # nbw*nbh = 3*3, component raster order
        zz = [0] * 64
        zz[0] = int(rng.integers(-40, 40))
        zz[1] = int(rng.integers(-10, 10))
        zz[5] = int(rng.integers(-10, 10))
        blocks.append(zz)
    out = decode_jpeg(_gray_jpeg(blocks, 24, 24, sampling=(2, 2)))
    assert out.shape == (24, 24)
    for i, zz in enumerate(blocks):
        by, bx = divmod(i, 3)
        F = np.zeros((8, 8))
        for k, v in enumerate(zz):
            F.flat[ZIGZAG[k]] = float(v)
        expect = np.clip(np.round(_spec_idct(F) + 128.0), 0, 255)
        got = out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        np.testing.assert_array_equal(got.astype(np.float64), expect)


def test_multi_mcu_grayscale_roundtrip_and_dimension_crop():
    """A 14x21 image (non-multiple-of-8 both ways) encoded by the
    test-side forward DCT decodes back within coefficient-rounding
    tolerance, cropped to the declared frame size."""
    rng = np.random.default_rng(4)
    img = np.clip(
        128 + np.cumsum(rng.normal(0, 4, (16, 24)), axis=1), 30, 220
    ).astype(np.uint8)
    blocks = _fdct_blocks(img)
    out = decode_jpeg(_gray_jpeg(blocks, 14, 21))
    assert out.shape == (14, 21)
    assert np.abs(out.astype(int) - img[:14, :21].astype(int)).max() <= 3


def test_restart_markers_equal_unrestarted():
    """DRI/RSTn segmentation (DC predictors reset per interval) decodes
    identically to the same blocks without restarts."""
    rng = np.random.default_rng(6)
    img = np.clip(
        128 + np.cumsum(rng.normal(0, 4, (16, 32)), axis=0), 30, 220
    ).astype(np.uint8)
    blocks = _fdct_blocks(img)
    plain = decode_jpeg(_gray_jpeg(blocks, 16, 32))
    restarted = decode_jpeg(_gray_jpeg(blocks, 16, 32, restart=3))
    np.testing.assert_array_equal(plain, restarted)


def _color_jpeg_420(img_rgb: np.ndarray) -> bytes:
    """Test-side 4:2:0 color encoder: BT.601 RGB->YCbCr, box-mean
    chroma downsample, interleaved MCU order (4 Y blocks, 1 Cb, 1 Cr
    per MCU) — the layout virtually every camera JPEG uses."""
    h, w, _ = img_rgb.shape
    assert h % 16 == 0 and w % 16 == 0
    r = img_rgb[..., 0].astype(np.float64)
    g = img_rgb[..., 1].astype(np.float64)
    b = img_rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb2 = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    C = np.array([
        [
            (1 / math.sqrt(2) if u == 0 else 1.0) / 2.0
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ])

    def zzb(plane, by, bx):
        blk = plane[by : by + 8, bx : bx + 8] - 128.0
        return list(np.round((C @ blk @ C.T).flatten()[ZIGZAG]).astype(int))

    bw = _Bits()
    preds = [0, 0, 0]

    def put(ci, zz):
        _put_dc(bw, zz[0] - preds[ci])
        preds[ci] = zz[0]
        _put_ac_block(bw, zz[1:])

    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    put(0, zzb(y, my * 16 + by * 8, mx * 16 + bx * 8))
            put(1, zzb(cb2, my * 8, mx * 8))
            put(2, zzb(cr2, my * 8, mx * 8))

    return (
        b"\xff\xd8"
        + _dqt(0, [1] * 64)
        + _sof0(h, w, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + _dht(0, 0, _DC_COUNTS, _DC_SYMBOLS)
        + _dht(1, 0, _AC_COUNTS, _AC_SYMBOLS)
        + _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)])
        + bw.tobytes()
        + b"\xff\xd9"
    )


def test_color_420_roundtrip():
    """4:2:0 YCbCr color decodes to RGB within the tolerance of
    coefficient rounding + chroma subsampling on a smooth image."""
    rng = np.random.default_rng(11)
    base = np.cumsum(rng.normal(0, 2, (32, 32)), axis=1)
    img = np.stack(
        [
            np.clip(120 + base, 40, 215),
            np.clip(100 + base * 0.5, 40, 215),
            np.clip(140 - base * 0.25, 40, 215),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(_color_jpeg_420(img))
    assert out.shape == (32, 32, 3)
    # smooth image: chroma averaging over 2x2 + rounding stays small
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.5
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_unsupported_profiles_raise():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # lossless (SOF3) is a clear NotImplementedError, never a wrong
    # decode (progressive SOF2 is SUPPORTED since r10)
    payload = _gray_jpeg([[0] * 64], 8, 8)
    assert b"\xff\xc0" in payload
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(payload.replace(b"\xff\xc0", b"\xff\xc3"))
    with pytest.raises(NotImplementedError, match="precision"):
        # flip the precision byte (first SOF0 body byte) to 12
        i = payload.index(b"\xff\xc0")
        bad = payload[: i + 4] + bytes([12]) + payload[i + 5 :]
        decode_jpeg(bad)


def test_decode_image_dispatches_jpeg():
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    q = [16] + [1] * 63
    zz = [8] + [0] * 63
    out = decode_image(_gray_jpeg([zz], 8, 8, q=q), "jpg")
    assert (out == 144).all()


def test_fill_bytes_before_marker():
    """B.1.1.2: any number of 0xFF fill bytes may precede a marker."""
    q = [16] + [1] * 63
    zz = [8] + [0] * 63
    payload = _gray_jpeg([zz], 8, 8, q=q)
    # inject fill bytes before the SOF0 marker
    padded = payload.replace(b"\xff\xc0", b"\xff\xff\xff\xc0")
    assert (decode_jpeg(padded) == 144).all()


def test_truncated_payload_clear_error():
    """A crawl-truncated payload must raise a descriptive ValueError
    (survivable by decode_assets_to_cube(on_error='skip')), never a
    raw IndexError from header indexing."""
    rng = np.random.default_rng(1)
    img = np.clip(
        128 + np.cumsum(rng.normal(0, 4, (16, 16)), axis=1), 30, 220
    ).astype(np.uint8)
    p = _gray_jpeg(_fdct_blocks(img), 16, 16)
    for cut in (3, 8, len(p) // 4):
        with pytest.raises(ValueError, match="JPEG"):
            decode_jpeg(p[:cut])
    # a stream that merely loses its EOI still decodes (lenient pad
    # bits, F.2.2.5)
    assert decode_jpeg(p[:-2]).shape == (16, 16)


# ------------------------------------------------ progressive (SOF2)


def _sof2(h, w, comps):
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return _seg(0xC2, body)


def _sos_prog(comps, ss, se, ah, al):
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _put_dc_scan(blocks, al):
    """DC-first scan bits: diffs of (dc >> al), arithmetic shift."""
    bw = _Bits()
    pred = 0
    for zz in blocks:
        t = int(zz[0]) >> al
        _put_dc(bw, t - pred)
        pred = t
    return bw.tobytes()


def _put_dc_refine_scan(blocks, al):
    bw = _Bits()
    for zz in blocks:
        bw.put((int(zz[0]) >> al) & 1, 1)
    return bw.tobytes()


def _trunc_div(v, al):
    """Toward-zero division by 2^al (G.1.2.2 AC coding)."""
    return int(v) // (1 << al) if v >= 0 else -((-int(v)) // (1 << al))


def _put_ac_first_scan(blocks, ss, se, al):
    """AC-first scan of band ss..se at precision al: per-block run
    coding with EOB0 (no cross-block EOB runs in this variant)."""
    bw = _Bits()
    for zz in blocks:
        band = [_trunc_div(zz[k], al) for k in range(ss, se + 1)]
        last_nz = -1
        for i, v in enumerate(band):
            if v:
                last_nz = i
        run = 0
        for i in range(last_nz + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                _put_ac_sym(bw, 0xF0)
                run -= 16
            t = v.bit_length() if v > 0 else (-v).bit_length()
            _put_ac_sym(bw, (run << 4) | t)
            bw.put(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last_nz < se - ss:
            _put_ac_sym(bw, 0x00)  # EOB0
    return bw.tobytes()


def _put_ac_refine_scan(blocks, ss, se, ah, al):
    """AC-refinement scan written in the all-EOB-run form: one EOBn
    symbol covering every block, then each block's correction bits for
    coefficients already nonzero at precision ah. Valid only when NO
    coefficient becomes newly significant (|c| >> al == 1 excluded by
    the fixture)."""
    nblocks = len(blocks)
    bw = _Bits()
    r = nblocks.bit_length() - 1  # floor(log2)
    extra = nblocks - (1 << r)
    _put_ac_sym(bw, r << 4)
    if r:
        bw.put(extra, r)
    for zz in blocks:
        for k in range(ss, se + 1):
            if _trunc_div(zz[k], ah) != 0:
                bw.put((abs(int(zz[k])) >> al) & 1, 1)
    return bw.tobytes()


def _progressive_jpeg(blocks, h, w, plan, q=None):
    """Assemble a progressive grayscale JPEG: ``plan`` is a list of
    (kind, ss, se, ah, al) with kind in dc/dcr/ac/acr."""
    q = [1] * 64 if q is None else q
    out = (
        b"\xff\xd8"
        + _dqt(0, q)
        + _sof2(h, w, [(1, 1, 1, 0)])
        + _dht(0, 0, _DC_COUNTS, _DC_SYMBOLS)
        + _dht(1, 0, _AC_COUNTS, _AC_SYMBOLS)
    )
    for kind, ss, se, ah, al in plan:
        if kind == "dc":
            data = _put_dc_scan(blocks, al)
        elif kind == "dcr":
            data = _put_dc_refine_scan(blocks, al)
        elif kind == "ac":
            data = _put_ac_first_scan(blocks, ss, se, al)
        else:
            data = _put_ac_refine_scan(blocks, ss, se, ah, al)
        out += _sos_prog([(1, 0, 0)], ss, se, ah, al) + data
    return out + b"\xff\xd9"


def test_progressive_spectral_selection_equals_baseline():
    """Spectral-selection-only progression (DC scan + two AC band
    scans, Ah=Al=0) decodes identically to the baseline encoding of
    the same coefficients."""
    rng = np.random.default_rng(31)
    img = np.clip(
        128 + np.cumsum(rng.normal(0, 4, (16, 24)), axis=1), 30, 220
    ).astype(np.uint8)
    blocks = _fdct_blocks(img)
    base = decode_jpeg(_gray_jpeg(blocks, 16, 24))
    plan = [
        ("dc", 0, 0, 0, 0),
        ("ac", 1, 20, 0, 0),
        ("ac", 21, 63, 0, 0),
    ]
    prog = decode_jpeg(_progressive_jpeg(blocks, 16, 24, plan))
    np.testing.assert_array_equal(prog, base)


def test_progressive_successive_approximation_equals_baseline():
    """Full successive approximation: DC first at Al=1 + DC refinement,
    AC bands first at Al=1 + EOB-run refinement scans — the layout real
    progressive encoders emit — reconstructs the exact coefficients
    (fixture excludes |c| = 1 so no coefficient turns newly significant
    in the refinement, which the simple test-side encoder doesn't
    emit)."""
    rng = np.random.default_rng(33)
    img = np.clip(
        128 + np.cumsum(rng.normal(0, 5, (16, 16)), axis=0), 30, 220
    ).astype(np.uint8)
    blocks = _fdct_blocks(img)
    for zz in blocks:  # remove magnitude-1 AC coefficients
        for k in range(1, 64):
            if zz[k] == 1:
                zz[k] = 2
            elif zz[k] == -1:
                zz[k] = -2
    base = decode_jpeg(_gray_jpeg(blocks, 16, 16))
    plan = [
        ("dc", 0, 0, 0, 1),
        ("ac", 1, 10, 0, 1),
        ("ac", 11, 63, 0, 1),
        ("dcr", 0, 0, 1, 0),
        ("acr", 1, 10, 1, 0),
        ("acr", 11, 63, 1, 0),
    ]
    prog = decode_jpeg(_progressive_jpeg(blocks, 16, 16, plan))
    np.testing.assert_array_equal(prog, base)


def test_progressive_dc_only_prefix_decodes():
    """A progressive stream truncated after only its DC scan still
    decodes (every AC coefficient zero) — the defining property of
    progressive delivery."""
    zz = [16] + [0] * 63
    blocks = [zz]
    plan = [("dc", 0, 0, 0, 0)]
    out = decode_jpeg(_progressive_jpeg(blocks, 8, 8, plan))
    assert (out == 16 // 8 + 128).all()
