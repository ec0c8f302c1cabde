"""GIF decoder (io/gif.py) against an INDEPENDENT test-side encoder:
the forward LZW (LSB-first packing, width growth on table fill, Clear
resets) is implemented here from the spec's Appendix F description,
sharing no code with the module's inverse — a decode that reproduces
the source indices proves the inverse against the spec.
"""

import struct

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.gif import decode_gif


class _LsbBits:
    def __init__(self):
        self.bits = []

    def put(self, value: int, width: int):
        for i in range(width):  # LSB first
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _lzw_encode_gif(indices: bytes, mcs: int, clear_every: int = 0) -> bytes:
    """Forward GIF LZW per spec Appendix F: dictionary of strings,
    Clear emitted at start (and optionally every ``clear_every``
    output codes, to exercise decoder resets), EOI at end; code width
    grows when the NEXT assignable code would not fit."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _LsbBits()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, mcs + 1

    table, nxt, width = fresh()
    bw.put(clear, width)
    emitted = 0
    s = b""
    for ch in indices:
        s2 = s + bytes([ch])
        if s2 in table:
            s = s2
            continue
        bw.put(table[s], width)
        emitted += 1
        if nxt < 4096:
            table[s2] = nxt
            nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                # the just-assigned code nxt-1 == 1<<width requires the
                # wider size for the NEXT emitted code
                width += 1
        s = bytes([ch])
        if clear_every and emitted % clear_every == 0:
            bw.put(table[s], width)
            bw.put(clear, width)
            table, nxt, width = fresh()
            s = b""
    if s:
        bw.put(table[s], width)
    bw.put(eoi, width)
    return bw.tobytes()


def _blocks(data: bytes, size: int = 255) -> bytes:
    out = bytearray()
    for i in range(0, len(data), size):
        part = data[i : i + size]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def _gif(indices: np.ndarray, palette: list, *, mcs=None, interlace=False,
         transparent=None, local_table=False, sub_block=255,
         clear_every=0) -> bytes:
    h, w = indices.shape
    n_bits = max(2, (len(palette) - 1).bit_length())
    table_size = 1 << n_bits
    pal = bytes(
        v for c in (list(palette) + [(0, 0, 0)] * table_size)[:table_size]
        for v in c
    )
    mcs = mcs if mcs is not None else max(2, n_bits)
    rows = indices
    if interlace:
        order = [
            y
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
            for y in range(start, h, step)
        ]
        rows = indices[order]
    lzw = _lzw_encode_gif(rows.astype(np.uint8).tobytes(), mcs,
                          clear_every=clear_every)
    flags = 0x80 | (n_bits - 1) if not local_table else 0
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, flags, 0, 0)
    if not local_table:
        out += pal
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    # an unrelated comment extension the decoder must skip
    out += bytes([0x21, 0xFE]) + _blocks(b"made by hand")
    iflags = (0x40 if interlace else 0) | (0x80 | (n_bits - 1) if local_table else 0)
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if local_table:
        out += pal
    out += bytes([mcs]) + _blocks(lzw, sub_block) + bytes([0x3B])
    return bytes(out)


_PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]


def test_basic_decode_and_extension_skip():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    out = decode_gif(_gif(idx, _PAL4))
    assert out.shape == (2, 4, 3)
    np.testing.assert_array_equal(out, np.array(_PAL4, np.uint8)[idx])


@pytest.mark.parametrize("sub_block", [255, 3])
@pytest.mark.parametrize("clear_every", [0, 7])
def test_lzw_growth_clears_and_subblocks(sub_block, clear_every):
    """A stream long enough to grow the code width, optionally with
    mid-stream Clear resets, split into tiny sub-blocks."""
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 4, (24, 32)).astype(np.uint8)
    out = decode_gif(
        _gif(idx, _PAL4, sub_block=sub_block, clear_every=clear_every)
    )
    np.testing.assert_array_equal(out, np.array(_PAL4, np.uint8)[idx])


def test_interlaced_rows_deinterlace():
    idx = (np.arange(16)[:, None] % 4 * np.ones((1, 5), int)).astype(np.uint8)
    out = decode_gif(_gif(idx, _PAL4, interlace=True))
    np.testing.assert_array_equal(out, np.array(_PAL4, np.uint8)[idx])


def test_transparency_and_local_table():
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    out = decode_gif(_gif(idx, _PAL4, transparent=1))
    assert out.shape == (2, 2, 4)
    np.testing.assert_array_equal(out[..., 3], [[255, 0], [255, 0]])
    out = decode_gif(_gif(idx, _PAL4, local_table=True))
    np.testing.assert_array_equal(out, np.array(_PAL4, np.uint8)[idx])


def test_eight_bit_palette_256_colors():
    """mcs=8, full 256-entry table — the common photographic GIF."""
    pal = [(i, 255 - i, i // 2) for i in range(256)]
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    out = decode_gif(_gif(idx, pal))
    np.testing.assert_array_equal(out, np.array(pal, np.uint8)[idx])


def test_rejections_and_truncations():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"not a gif")
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    payload = _gif(idx, _PAL4)
    with pytest.raises(ValueError, match="truncated GIF"):
        decode_gif(payload[:14])
    with pytest.raises(ValueError, match="GIF"):
        decode_gif(payload[: len(payload) - 6])


def test_decode_image_dispatches_gif():
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    idx = np.array([[0, 3], [1, 2]], dtype=np.uint8)
    out = decode_image(_gif(idx, _PAL4), "gif")
    np.testing.assert_array_equal(out, np.array(_PAL4, np.uint8)[idx])


def test_declared_huge_frame_rejected_before_lzw():
    """Hostile-header cap (ADVICE r10 #3): a tiny payload declaring a
    60000x60000 frame must be rejected from the header alone — BEFORE
    the per-code LZW loop runs and before the w*h bytearray allocates
    (the ~2700x LZW expansion makes this a crawl DoS otherwise)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 60000, 60000, 0x80 | 0, 0, 0)
    out += bytes(6)  # 2-entry global color table
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, 60000, 60000, 0)
    out += bytes([2, 1, 0x04, 0, 0x3B])  # minimal LZW sub-block + trailer
    with pytest.raises(ValueError, match="max_pixels"):
        decode_gif(bytes(out))
    # the cap is a parameter, not a constant: a legitimate frame can
    # opt into a higher bound, and a stricter pipeline into a lower one
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_gif(_gif(idx, _PAL4), max_pixels=2)
    assert decode_gif(_gif(idx, _PAL4), max_pixels=4).shape == (2, 2, 3)


def test_decode_image_valueerror_falls_through_to_pil(monkeypatch):
    """ADVICE r10 #2: a pure decoder misclassifying a decodable asset
    as corrupt (ValueError) must fall through to PIL when PIL is
    importable — and re-raise the ORIGINAL error when PIL is absent
    or also fails."""
    import sys
    import types

    from openeo_processes_dask_ml_spark.scale import multimodal

    bad = b"GIF89a\x00"  # truncated: pure decoder raises ValueError

    # PIL absent (this environment): the pure decoder's error surfaces
    with pytest.raises(ValueError, match="truncated GIF"):
        multimodal.decode_image(bad, "gif")

    # fake PIL that "decodes" anything: the asset must reach it
    sentinel = np.full((2, 2, 3), 7, np.uint8)

    class _Img:
        def convert(self, mode):
            return sentinel

    fake_image = types.SimpleNamespace(open=lambda fh: _Img())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)
    np.testing.assert_array_equal(multimodal.decode_image(bad, "gif"), sentinel)

    # fake PIL that ALSO fails: the pure decoder's error, not PIL's
    def _boom(fh):
        raise OSError("cannot identify image file")

    fake_pil.Image = types.SimpleNamespace(open=_boom)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil.Image)
    with pytest.raises(ValueError, match="truncated GIF"):
        multimodal.decode_image(bad, "gif")


def test_decoder_order_knob(monkeypatch):
    """The production decoder-order knob (SCALE_NOTES codec
    throughput): ('pil', 'pure') consults PIL FIRST — the blessed
    crawl-ingest fast path — and falls back to the deterministic numpy
    decoder when PIL fails; the default ('pure', 'pil') never touches
    PIL on a payload the pure codec handles."""
    import sys
    import types

    from openeo_processes_dask_ml_spark.scale import multimodal

    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    good = _gif(idx, _PAL4)
    expect = np.array(_PAL4, np.uint8)[idx]

    calls = []
    sentinel = np.full((1, 1, 3), 9, np.uint8)

    class _Img:
        def convert(self, mode):
            return sentinel

    def _open_ok(fh):
        calls.append("pil")
        return _Img()

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(open=_open_ok)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil.Image)

    # pil-first: PIL wins on a decodable payload
    out = multimodal.decode_image(good, "gif", decoder_order=("pil", "pure"))
    np.testing.assert_array_equal(out, sentinel)
    assert calls == ["pil"]

    # pure-first (default): numpy decodes, PIL never consulted
    calls.clear()
    out = multimodal.decode_image(good, "gif")
    np.testing.assert_array_equal(out, expect)
    assert calls == []

    # pil-first with a failing PIL: numpy fallback still decodes
    def _open_fail(fh):
        calls.append("pil-fail")
        raise OSError("cannot identify image file")

    fake_pil.Image = types.SimpleNamespace(open=_open_fail)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil.Image)
    out = multimodal.decode_image(good, "gif", decoder_order=("pil", "pure"))
    np.testing.assert_array_equal(out, expect)
    assert calls == ["pil-fail"]

    with pytest.raises(ValueError, match="unknown decoder"):
        multimodal.decode_image(good, "gif", decoder_order=("rasterio",))


def test_pil_and_pure_paths_agree_on_fixtures():
    """Value pin between the PIL fast path and the numpy decoders on
    the same fixtures (VERDICT r10 next #5). Runs only where PIL is
    installed — the sandbox has no PIL, so there it documents the
    contract and is skipped; in a production image it is the agreement
    gate for the blessed ('pil', 'pure') ingest config."""
    pytest.importorskip("PIL")
    from openeo_processes_dask_ml_spark.io.png import encode_png
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    png = encode_png(rgb)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    gif = _gif(idx, _PAL4)
    for payload, fmt in ((png, "png"), (gif, "gif")):
        pure = decode_image(payload, fmt, decoder_order=("pure",))
        pil = decode_image(payload, fmt, decoder_order=("pil",))
        if pure.ndim == 2:
            pure = np.stack([pure] * 3, axis=-1)
        np.testing.assert_array_equal(pil, pure)


def _animated_gif(screen_wh, frames, palette=None) -> bytes:
    """Independent multi-frame writer: frames are (left, top, indices,
    disposal, transparent) tuples composited on a screen_wh canvas.
    One global color table; GCE before every image descriptor."""
    palette = palette if palette is not None else _PAL4
    sw, sh = screen_wh
    n_bits = max(2, (len(palette) - 1).bit_length())
    table_size = 1 << n_bits
    pal = bytes(
        v for c in (list(palette) + [(0, 0, 0)] * table_size)[:table_size]
        for v in c
    )
    mcs = max(2, n_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (n_bits - 1), 0, 0)
    out += pal
    for left, top, indices, disposal, transparent in frames:
        h, w = indices.shape
        gce_flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += bytes(
            [0x21, 0xF9, 4, gce_flags, 0, 0, transparent or 0, 0]
        )
        out += bytes([0x2C]) + struct.pack("<HHHHB", left, top, w, h, 0)
        lzw = _lzw_encode_gif(indices.astype(np.uint8).tobytes(), mcs)
        out += bytes([mcs]) + _blocks(lzw)  # _blocks writes the terminator
    out += bytes([0x3B])
    return bytes(out)


def test_animated_compositing_disposals_and_sampling():
    from openeo_processes_dask_ml_spark.io.gif import decode_gif_frames

    full = np.zeros((4, 6), np.uint8)  # screen-sized, color 0 (red)
    patch = np.full((2, 2), 1, np.uint8)  # green 2x2
    patch2 = np.full((2, 2), 2, np.uint8)  # blue 2x2
    frames = [
        (0, 0, full, 1, None),      # frame 0: red screen, keep
        (1, 1, patch, 2, None),     # frame 1: green patch, restore-bg after
        (3, 0, patch2, 3, None),    # frame 2: blue patch, restore-prev after
        (0, 0, patch, 1, 1),        # frame 3: FULLY transparent patch (idx 1)
    ]
    payload = _animated_gif((6, 4), frames)
    out = decode_gif_frames(payload)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    red, green, blue = (255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255)
    f0, f1, f2, f3 = (a for _, a in out)
    assert tuple(f0[0, 0]) == red and tuple(f0[3, 5]) == red
    # frame 1: green patch at (1,1)
    assert tuple(f1[1, 1]) == green and tuple(f1[2, 2]) == green
    assert tuple(f1[0, 0]) == red
    # frame 2: patch region from frame 1 was DISPOSED to background
    # (transparent), blue patch visible at (0,3)
    assert tuple(f2[1, 1]) == (0, 0, 0, 0)
    assert tuple(f2[0, 3]) == blue and tuple(f2[1, 4]) == blue
    # frame 3: disposal 3 restored the canvas BEFORE frame 2, then a
    # fully-transparent frame changed nothing
    assert tuple(f3[0, 3]) == red  # blue patch gone
    assert tuple(f3[1, 1]) == (0, 0, 0, 0)  # still disposed from frame 1
    assert tuple(f3[0, 0]) == red

    # sampling keeps 0, 2 but still composites 1 (canvas correctness)
    sampled = decode_gif_frames(payload, every_n=2)
    assert [i for i, _ in sampled] == [0, 2]
    np.testing.assert_array_equal(sampled[1][1], f2)
    # max_frames bounds DECODE work
    assert [i for i, _ in decode_gif_frames(payload, max_frames=2)] == [0, 1]


def test_animated_out_of_bounds_frame_clipped():
    from openeo_processes_dask_ml_spark.io.gif import decode_gif_frames

    full = np.zeros((3, 3), np.uint8)
    over = np.full((3, 3), 1, np.uint8)
    payload = _animated_gif((3, 3), [(0, 0, full, 1, None), (2, 2, over, 1, None)])
    out = decode_gif_frames(payload)
    f1 = out[1][1]
    assert tuple(f1[2, 2]) == (0, 255, 0, 255)  # the one in-bounds pixel
    assert tuple(f1[0, 0]) == (255, 0, 0, 255)


def test_decode_gif_still_returns_first_frame_of_animation():
    full = np.zeros((4, 6), np.uint8)
    patch = np.full((2, 2), 1, np.uint8)
    payload = _animated_gif((6, 4), [(0, 0, full, 1, None), (1, 1, patch, 1, None)])
    out = decode_gif(payload)
    assert out.shape == (4, 6, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
