"""Pure-numpy baseline JPEG (JFIF) decoder.

The reference reads JPEG imagery for free through rasterio/PIL; this
environment has neither, and the multimodal pipeline treats image
bytes as opaque ``binary`` columns decoded executor-side
(``scale/multimodal.py::decode_image``). Everything here derives from
the public ITU-T T.81 spec: baseline sequential DCT, 8-bit samples,
Huffman entropy coding (Annex F), the zig-zag order of Figure 5, the
IDCT of A.3.3, restart markers (E.2.4), and the JFIF YCbCr -> RGB
matrix (BT.601). Scope, stated honestly:

- SOF0 (baseline) only — progressive (SOF2), extended sequential,
  arithmetic coding, lossless and 12-bit raise ``NotImplementedError``.
- 1- or 3-component scans, any sampling factors up to 2x2 (covers
  4:4:4, 4:2:2, 4:2:0); chroma upsampling is sample replication, the
  JFIF-recommended simple upsampler.
- One scan per image (baseline interleaved), DRI/RSTn honored.

The entropy loop is per-coefficient Python (a JPEG bitstream is
inherently sequential), vectorizing dequant/IDCT/upsample/color in
numpy per block plane. At pipeline scale this runs inside the Arrow
batches of ``mapInPandas`` fan-out like every other decoder — the
parallelism is across images, not within one.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag index order (T.81 Figure 5): ZIGZAG[k] = (row, col) flattened
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 IDCT basis (T.81 A.3.3): B[u, x] = alpha(u)/2 * cos((2x+1) u pi / 16)
_IDCT_B = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D 8x8 inverse DCT: f = B^T . F . B (separable A.3.3 form)."""
    return _IDCT_B.T @ block @ _IDCT_B


class _Huff:
    """Canonical Huffman table from a DHT segment (T.81 Annex C):
    ``lookup[(length, code)] -> symbol`` plus per-length code bounds
    for the sequential decode of F.2.2.3."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        for length in range(1, 17):
            self.min_code[length] = code
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            self.max_code[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment (0xFF00
    already collapsed to 0xFF by the caller)."""

    __slots__ = ("d", "p", "acc", "n", "fab")

    def __init__(self, data: bytes):
        self.d = data
        self.p = 0
        self.acc = 0
        self.n = 0
        self.fab = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.p >= len(self.d):
                # F.2.2.5 allows pad bits (read as 1s) — but only the
                # final byte's worth. Fabricating more means the scan
                # genuinely ran out of data: raise instead of decoding
                # garbage for every remaining MCU (on a hostile header
                # that is hours of Python loop — a crawl DoS)
                self.fab += 1
                if self.fab > 7:
                    raise ValueError(
                        "truncated JPEG: entropy data exhausted mid-scan"
                    )
                return 1
            self.acc = self.d[self.p]
            self.p += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if code <= table.max_code[length]:
                sym = table.lookup.get((length, code))
                if sym is not None:
                    return sym
        raise ValueError("corrupt JPEG: Huffman code not in table")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _unstuff(data: bytes) -> bytes:
    """Collapse byte stuffing (0xFF 0x00 -> 0xFF) in an entropy run."""
    return data.replace(b"\xff\x00", b"\xff")


def decode_jpeg(payload: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Decode a baseline JFIF/JPEG payload to uint8 ``(H, W)``
    (grayscale) or ``(H, W, 3)`` RGB.

    ``max_pixels`` (default 64M — an 8192x8192 frame) bounds the
    declared frame size: the entropy loop is per-coefficient Python,
    so a hostile header declaring a 65535x65535 frame would otherwise
    turn into a multi-hour decode of garbage bits — on a crawl decode
    path that is a denial of service, not an image. Raise the cap
    deliberately for genuinely huge frames."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI marker)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _Huff] = {}
    ac_tables: dict[int, _Huff] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq), ...])
    restart_interval = 0
    n = len(payload)

    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        # optional 0xFF fill bytes before a marker (B.1.1.2)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= n:
            raise ValueError("truncated JPEG: payload ends mid-marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / bare RSTn outside a scan
        if pos + 2 > n:
            raise ValueError("truncated JPEG: payload ends mid-segment")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    q = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                else:  # 16-bit table
                    q = np.frombuffer(seg[i : i + 128], dtype=">u2")
                    i += 128
                qtables[tq] = q.astype(np.float64)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                total = sum(counts)
                syms = seg[i + 17 : i + 17 + total]
                if len(counts) < 16 or len(syms) < total:
                    raise ValueError("truncated JPEG: short DHT segment")
                (dc_tables if tc == 0 else ac_tables)[th] = _Huff(counts, syms)
                i += 17 + total
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG precision {precision} (baseline is 8-bit)"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            if h * w > max_pixels:
                raise ValueError(
                    f"JPEG frame {w}x{h} exceeds max_pixels={max_pixels} "
                    "(raise the cap for genuinely huge frames)"
                )
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} is not baseline sequential "
                "(progressive/extended/arithmetic/lossless need PIL)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 15))
            data_start = pos + seglen
            return _decode_scan(
                payload, data_start, frame, scan_comps,
                qtables, dc_tables, ac_tables, restart_interval,
            )
        # APPn / COM / others: skipped
        pos += seglen
    raise ValueError("corrupt JPEG: no scan (SOS) found")


def _decode_scan(
    payload, data_start, frame, scan_comps,
    qtables, dc_tables, ac_tables, restart_interval,
) -> np.ndarray:
    h, w, comps = frame
    if len(scan_comps) != len(comps):
        raise NotImplementedError(
            "multi-scan (non-interleaved) JPEG is not baseline-typical"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError(
            f"sampling factors up to 2x2 supported, got {hmax}x{vmax}"
        )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # split the entropy data into restart intervals, unstuffed
    segments: list[bytes] = []
    i = data_start
    n = len(payload)
    seg_start = i
    while i < n - 1:
        if payload[i] == 0xFF and payload[i + 1] != 0x00:
            m = payload[i + 1]
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(_unstuff(payload[seg_start:i]))
                i += 2
                seg_start = i
                continue
            segments.append(_unstuff(payload[seg_start:i]))
            seg_start = None
            break
        i += 1
    if seg_start is not None:  # ran to end of payload without a marker
        segments.append(_unstuff(payload[seg_start:]))

    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    # per-component coefficient planes (in 8x8 block units)
    planes = []
    meta = []  # (hs, vs, qt, dc_table, ac_table, bw)
    for cs, td, ta in scan_comps:
        hs, vs, tq = by_id[cs]
        bw = mcux * hs
        bh = mcuy * vs
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float64))
        if tq not in qtables:
            raise ValueError(f"corrupt JPEG: missing quant table {tq}")
        if td not in dc_tables or ta not in ac_tables:
            raise ValueError("corrupt JPEG: missing Huffman table")
        meta.append((hs, vs, qtables[tq], dc_tables[td], ac_tables[ta]))

    reader = _BitReader(segments[0])
    seg_idx = 0
    preds = [0] * len(meta)
    coef = np.zeros(64, dtype=np.float64)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("corrupt JPEG: missing restart segment")
                reader = _BitReader(segments[seg_idx])
                preds = [0] * len(meta)
            for ci, (hs, vs, q, dct, act) in enumerate(meta):
                for by in range(vs):
                    for bx in range(hs):
                        coef[:] = 0.0
                        t = reader.decode(dct)
                        diff = _extend(reader.bits(t), t)
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = reader.decode(act)
                            if sym == 0:  # EOB
                                break
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run != 15:
                                    raise ValueError(
                                        "corrupt JPEG: bad AC symbol"
                                    )
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC run past block end"
                                )
                            coef[k] = _extend(reader.bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coef * q
                        px = _idct2(block.reshape(8, 8))
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # level shift, upsample to full resolution, crop, color transform
    out_planes = []
    for ci, (hs, vs, _, _, _) in enumerate(meta):
        p = planes[ci] + 128.0
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
