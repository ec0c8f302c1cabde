"""Pure-numpy GIF decoder (GIF87a/89a, public CompuServe/W3C spec).

Completes the web-crawl image trio (JPEG/PNG/GIF) for the multimodal
pipeline's executor-side ``decode_image``. Scope, stated honestly:

- First image of the stream (for animations that is the first frame);
  global and local color tables; interlaced row order (the 4-pass
  scheme of spec §23); GIF89a extensions skipped, except the Graphic
  Control Extension's transparency index, which upgrades the output
  to RGBA.
- GIF-variant LZW: LSB-first bit packing, code width grows when the
  table reaches ``1 << width`` (NO TIFF-style early change), 12-bit
  cap with explicit Clear handling, data carried in 255-byte
  sub-blocks.

Returns uint8 ``(H, W, 3)`` RGB, or ``(H, W, 4)`` RGBA when a
transparent index is declared.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF LZW (spec Appendix F): LSB-first packing, Clear/EOI codes,
    width grows AFTER the table fills the current code space."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = navail = pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while navail < width:
            if pos >= n:
                return bytes(out)  # truncated stream: lenient
            acc |= data[pos] << navail  # LSB-first
            pos += 1
            navail += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        navail -= width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: code beyond table")
        out += entry
        prev = entry
        # grow width when the NEXT code to assign would not fit; the
        # table freezes at 4096 until the encoder emits Clear
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block sequence; returns (data, next_pos)."""
    out = bytearray()
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF: unterminated sub-blocks")
        size = payload[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ValueError("truncated GIF: sub-block cut short")
        out += payload[pos : pos + size]
        pos += size


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    if payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF: missing screen descriptor")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        if pos + 3 * size > len(payload):
            raise ValueError("truncated GIF: global color table cut short")
        gct = np.frombuffer(
            payload[pos : pos + 3 * size], dtype=np.uint8
        ).reshape(-1, 3)
        pos += 3 * size
    transparent = None
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated GIF: bare extension introducer")
            label = payload[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= n and payload[pos] == 4:
                # Graphic Control Extension: transparency flag + index
                if payload[pos + 1] & 0x01:
                    transparent = payload[pos + 4]
            _, pos = _subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > n:
            raise ValueError("truncated GIF: short image descriptor")
        _, _, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        # hostile-header cap (ADVICE r10 #3, same crawl-DoS posture as
        # decode_jpeg's): the declared frame geometry drives both the
        # LZW output bound and the frame allocation, so reject a
        # declared-huge frame BEFORE the per-code decode loop runs
        if w * h > max_pixels:
            raise ValueError(
                f"GIF frame {w}x{h} exceeds max_pixels={max_pixels} "
                "(raise the cap for genuinely huge frames)"
            )
        table = gct
        if iflags & 0x80:  # local color table
            size = 2 << (iflags & 0x07)
            if pos + 3 * size > n:
                raise ValueError("truncated GIF: local color table cut short")
            table = np.frombuffer(
                payload[pos : pos + 3 * size], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * size
        if table is None:
            raise ValueError("corrupt GIF: image without any color table")
        if pos >= n:
            raise ValueError("truncated GIF: missing LZW code size")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"corrupt GIF: LZW min code size {mcs}")
        data, pos = _subblocks(payload, pos)
        idx_stream = _lzw_decode_gif(data, mcs, w * h)
        if len(idx_stream) < w * h:
            raise ValueError("truncated GIF: pixel data cut short")
        indices = np.frombuffer(
            idx_stream, dtype=np.uint8, count=w * h
        ).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, h, step)
            ]
            deinterlaced = np.zeros_like(indices)
            deinterlaced[order] = indices
            indices = deinterlaced
        indices = np.minimum(indices, len(table) - 1)
        rgb = table[indices]
        if transparent is not None:
            alpha = np.where(indices == transparent, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb
    raise ValueError("corrupt GIF: no image descriptor found")
