"""Pure-numpy PNG codec (RFC 2083 / W3C PNG spec; inflate via stdlib
zlib).

PNG is the most common lossless image format in a web crawl, and the
multimodal pipeline decodes image bytes executor-side
(``scale/multimodal.py::decode_image``) — this closes the PIL gate
for it. Scope, stated honestly:

- decode: 8- and 16-bit grayscale (color type 0), RGB (2), palette
  (3, bit depth 1/2/4/8, with optional tRNS), gray+alpha (4) and RGBA
  (6); all five scanline filters (None/Sub/Up/Average/Paeth);
  multiple IDAT chunks; Adam7 interlace (7 independently-filtered
  sub-images scattered back on the pass grid). Sub-byte grayscale
  raises ``NotImplementedError``.
- encode: filter-0 rows + zlib, 8/16-bit gray, RGB, RGBA — enough to
  round-trip every decode path and emit artifacts.

Filter inversion is vectorized where the data flow allows (None/Up
fully; Sub as a per-pixel cumulative add) and falls back to a per-
pixel loop only for Average/Paeth rows, whose reconstruction is
inherently left-neighbor-sequential. Parallelism at pipeline scale is
across images inside the mapInPandas fan-out, like every decoder
here.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .limits import ImageLimitError

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert the per-scanline filters: ``raw`` is h * (1 + stride)
    bytes (filter byte + scanline); returns (h, stride) uint8."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: add the pixel bpp bytes to the left
            n = stride // bpp
            tail = stride - n * bpp
            body = row[: n * bpp].reshape(n, bpp)
            np.add.accumulate(body, axis=0, dtype=np.uint8, out=body)
            if tail:
                # stride not a bpp multiple cannot happen for the
                # supported layouts, but stay safe
                for i in range(n * bpp, stride):
                    row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                row[i] = (int(row[i]) + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {ftype}")
        out[y] = row
        prev = row
    return out


def decode_png(payload: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Decode a PNG payload to uint8/uint16 ``(H, W)`` (grayscale),
    ``(H, W, 2)`` (gray+alpha), ``(H, W, 3)`` (RGB / palette) or
    ``(H, W, 4)`` (RGBA / palette+tRNS). ``max_pixels`` (default 64M)
    rejects a declared-huge IHDR before any inflate happens — the
    same hostile-header cap as ``decode_jpeg`` (ADVICE r10 #3)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    n = len(payload)
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= n:
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG: chunk data cut short")
        pos += 12 + length  # length + type + data + crc (crc not checked)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("corrupt PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if w * h > max_pixels:
        raise ImageLimitError(
            f"PNG image {w}x{h} exceeds max_pixels={max_pixels} "
            "(raise the cap for genuinely huge images)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("corrupt PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"corrupt PNG: interlace method {interlace}")
    if color not in _CHANNELS:
        raise ValueError(f"corrupt PNG: color type {color}")
    ch = _CHANNELS[color]
    if color == 3:
        if plte is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"corrupt PNG: palette bit depth {depth}")
    elif depth not in (8, 16):
        raise NotImplementedError(
            f"bit depth {depth} for color type {color} (8/16 supported; "
            "1/2/4 only for palette images)"
        )

    bits_per_px = depth * ch
    bpp = max(1, bits_per_px // 8)

    def sub_stride(pw: int) -> int:
        return (pw * bits_per_px + 7) // 8

    def samples(grid: np.ndarray, ph: int, pw: int) -> np.ndarray:
        """Unfiltered rows -> per-pixel samples: palette index grid
        (ph, pw) or channel grid (ph, pw, ch)."""
        if color == 3 and depth < 8:
            # unpack sub-byte palette indices, MSB-first
            bits = np.unpackbits(grid, axis=1)[:, : pw * depth]
            idx = bits.reshape(ph, pw, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            return (idx * weights).sum(axis=2).astype(np.uint8)
        if color == 3:
            return grid[:, :pw]
        if depth == 16:
            return (
                grid.reshape(ph, sub_stride(pw))
                .view(">u2")
                .astype(np.uint16)
                .reshape(ph, pw, ch)
            )
        return grid[:, : pw * ch].reshape(ph, pw, ch)

    # Adam7 passes: (x0, y0, dx, dy); the deflate stream concatenates
    # the 7 independently-filtered sub-images (empty passes contribute
    # no scanlines). interlace 0 is the single full pass.
    passes = (
        [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]
        if interlace == 1
        else [(0, 0, 1, 1)]
    )
    dims = []
    needed = 0
    for x0, y0, dx, dy in passes:
        pw = max(0, -(-(w - x0) // dx))
        ph = max(0, -(-(h - y0) // dy))
        if pw == 0 or ph == 0:
            pw = ph = 0
        dims.append((pw, ph))
        needed += ph * (1 + sub_stride(pw))
    # bounded inflate: the image geometry fixes the exact output size,
    # so a decompression bomb (tiny IDAT inflating to GBs) can never
    # allocate past the declared image — the crawl-safety property a
    # bare zlib.decompress does not have
    raw = zlib.decompressobj().decompress(bytes(idat), needed)
    if len(raw) < needed:
        raise ValueError("truncated PNG: inflated data shorter than image")

    if color == 3:
        full = np.zeros((h, w), dtype=np.uint8)
    else:
        full = np.zeros(
            (h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8
        )
    pos = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(passes, dims):
        if pw == 0:
            continue
        st = sub_stride(pw)
        size = ph * (1 + st)
        grid = _unfilter(raw[pos : pos + size], ph, st, bpp)
        pos += size
        full[y0::dy, x0::dx] = samples(grid, ph, pw)

    if color == 3:
        rgb = plte[full]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            t = np.frombuffer(trns, dtype=np.uint8)
            alpha[: len(t)] = t
            return np.dstack([rgb, alpha[full]])
        return rgb
    return full[:, :, 0] if ch == 1 else full


def encode_png(arr: np.ndarray) -> bytes:
    """Encode uint8/uint16 grayscale (H, W), gray+alpha (H, W, 2), RGB
    (H, W, 3) or RGBA (H, W, 4) as a filter-0 PNG."""
    a = np.asarray(arr)
    if a.dtype == np.uint8:
        depth = 8
    elif a.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"encode_png writes uint8/uint16, got {a.dtype}")
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        ch = a.shape[2]
        color = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    body = a.astype(">u2" if depth == 16 else np.uint8).tobytes()
    stride = w * ch * (depth // 8)
    scan = bytearray()
    for y in range(h):
        scan.append(0)  # filter 0
        scan += body[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )
