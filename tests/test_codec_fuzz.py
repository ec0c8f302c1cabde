"""Deterministic mutation fuzzing of the crawl-facing decoders.

A 100 TB crawl feeds these decoders truncated, bit-flipped, and
hostile payloads constantly; `decode_assets_to_cube(on_error='skip')`
and the multimodal pipeline survive any EXCEPTION, but not a hang or
an interpreter crash. Contract fuzzed here: for every truncation
point and every deterministic byte flip of a valid payload, each
decoder either returns an ndarray or raises — quickly, with bounded
memory — never hangs, never aborts the process.

Mutations are seeded/deterministic so a failure reproduces exactly.
"""

import struct
import zlib

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.gif import decode_gif
from openeo_processes_dask_ml_spark.io.gtiff import decode_gtiff, encode_gtiff
from openeo_processes_dask_ml_spark.io.jpeg import decode_jpeg
from openeo_processes_dask_ml_spark.io.png import decode_png, encode_png
from openeo_processes_dask_ml_spark.io.webp import decode_webp

# every exception class a hostile payload may legitimately surface —
# the skip-path catches Exception, so anything derived from it is fine;
# what must NEVER happen is a hang, a SystemExit, or a hard crash
_OK = (Exception,)


def _seed_payloads():
    rng = np.random.default_rng(0)
    img8 = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

    import sys

    sys.path.insert(0, "tests")
    from test_gif import _PAL4, _gif
    from test_jpeg import _fdct_blocks, _gray_jpeg, _progressive_jpeg

    gif_idx = rng.integers(0, 4, (9, 13)).astype(np.uint8)
    prog_plan = [
        ("dc", 0, 0, 0, 1),
        ("ac", 1, 10, 0, 1),
        ("ac", 11, 63, 0, 1),
        ("dcr", 0, 0, 1, 0),
        ("acr", 1, 10, 1, 0),
        ("acr", 11, 63, 1, 0),
    ]
    return {
        decode_gtiff: encode_gtiff(
            img8,
            bbox=(0, 0, 24.0, 16.0),
            epsg=32632,
            compression="lzw",
            tile=(8, 8),
            predictor=2,
            overviews=[img8[::2, ::2]],
        ),
        decode_png: encode_png(rgb),
        decode_jpeg: _gray_jpeg(_fdct_blocks(img8), 16, 24),
        decode_gif: _gif(gif_idx, _PAL4),
        # the progressive multi-scan path is its own attack surface
        # (scan headers, EOB runs, refinement state across scans)
        lambda b: decode_jpeg(b): _progressive_jpeg(
            _fdct_blocks(img8), 16, 24, prog_plan
        ),
        # lossless WebP: a plain literal stream and a transform-rich
        # one (subtract-green + predictor sub-image) — prefix-code
        # tables, LZ77 state, and the transform readers all fuzzed
        decode_webp: _webp_payloads(rng)[0],
        lambda b: decode_webp(b): _webp_payloads(rng)[1],
        # MJPEG-AVI: the RIFF walk (nested lists, chunk sizes) AND the
        # embedded per-frame JPEGs get mutated together; the adapter
        # unwraps the (idx, frame) list so the ndarray contract holds
        _avi_first_frame: _avi_payload(),
        # animated GIF: the disposal-method compositor and frame-rect
        # clipping run over mutated multi-frame streams
        _gif_last_frame: _animated_payload(),
    }


def _gif_last_frame(payload: bytes) -> np.ndarray:
    from openeo_processes_dask_ml_spark.io.gif import decode_gif_frames

    frames = decode_gif_frames(payload, max_frames=8)
    return frames[-1][1] if frames else np.zeros((0, 0), np.uint8)


def _animated_payload() -> bytes:
    import sys

    sys.path.insert(0, "tests")
    from test_gif import _animated_gif

    rng = np.random.default_rng(11)
    full = rng.integers(0, 4, (9, 13)).astype(np.uint8)
    patch = rng.integers(0, 4, (4, 5)).astype(np.uint8)
    return _animated_gif(
        (13, 9),
        [
            (0, 0, full, 1, None),
            (2, 3, patch, 2, 1),
            (8, 1, patch, 3, None),
        ],
    )


def _avi_first_frame(payload: bytes) -> np.ndarray:
    from openeo_processes_dask_ml_spark.io.avi import decode_avi_frames

    frames = decode_avi_frames(payload, max_frames=4)
    return frames[0][1] if frames else np.zeros((0, 0), np.uint8)


def _avi_payload() -> bytes:
    import sys

    sys.path.insert(0, "tests")
    from test_avi import _avi

    return _avi(3)


def _webp_payloads(rng):
    import sys

    sys.path.insert(0, "tests")
    from test_webp import _literal_codes, _simple_lossless

    rgb = rng.integers(0, 256, (8, 6, 3)).astype(np.uint8)
    plain = _simple_lossless(rgb)

    def tr(bw):
        bw.val(1, 1)
        bw.val(2, 2)  # subtract green (no sub-image)
        bw.val(1, 1)
        bw.val(0, 2)  # predictor, bits=2 -> 2x2 sub-image
        bw.val(0, 3)
        bw.val(0, 1)  # sub-image: no cache
        _literal_codes(bw)
        for _ in range(4):
            bw.code(2, 8)  # mode 2 (top) in green
            bw.code(0, 8)
            bw.code(0, 8)

    rich = _simple_lossless(rgb, tr)
    return plain, rich


@pytest.mark.parametrize("codec_idx", range(9))
def test_truncations_never_hang_or_crash(codec_idx):
    payloads = _seed_payloads()
    decode, payload = list(payloads.items())[codec_idx]
    for cut in range(0, len(payload), 3):
        try:
            out = decode(payload[:cut])
            assert isinstance(out, np.ndarray)
        except _OK:
            pass


@pytest.mark.parametrize("codec_idx", range(9))
def test_byte_flips_never_hang_or_crash(codec_idx):
    payloads = _seed_payloads()
    decode, payload = list(payloads.items())[codec_idx]
    rng = np.random.default_rng(codec_idx + 1)
    buf = bytearray(payload)
    # one pass of single-byte flips over deterministic positions, plus
    # a pass of 4-byte garbage splices
    positions = rng.integers(0, len(buf), 200)
    for pos in positions:
        orig = buf[pos]
        buf[pos] = (orig + 1 + int(rng.integers(0, 255))) & 0xFF
        try:
            out = decode(bytes(buf))
            assert isinstance(out, np.ndarray)
        except _OK:
            pass
        buf[pos] = orig
    for pos in rng.integers(0, max(1, len(buf) - 4), 50):
        chunk = bytes(rng.integers(0, 256, 4).astype(np.uint8))
        mutated = bytes(buf[:pos]) + chunk + bytes(buf[pos + 4 :])
        try:
            out = decode(mutated)
            assert isinstance(out, np.ndarray)
        except _OK:
            pass


def test_png_decompression_bomb_bounded():
    """A tiny IDAT inflating to far more than the declared image must
    not balloon memory: inflate is bounded to the image geometry."""
    # 4x4 gray image, but IDAT carries 64 MB of zeros compressed
    bomb = zlib.compress(b"\x00" * (64 << 20))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    )
    out = decode_png(payload)  # decodes the 4x4 prefix, ignores the rest
    assert out.shape == (4, 4)


def test_jpeg_hostile_frame_size_rejected_fast():
    """A header declaring a 65535x65535 frame must raise immediately
    (the per-coefficient Python loop would otherwise run for hours on
    garbage bits — a crawl DoS, not an image)."""
    import sys

    sys.path.insert(0, "tests")
    from test_jpeg import _gray_jpeg

    payload = _gray_jpeg([[0] * 64], 8, 8)
    i = payload.index(b"\xff\xc0")
    hostile = (
        payload[: i + 5]
        + struct.pack(">HH", 65535, 65535)
        + payload[i + 9 :]
    )
    with pytest.raises(ValueError, match="max_pixels"):
        decode_jpeg(hostile)
    # the cap is a parameter: a frame over a LOWERED cap is rejected,
    # the same frame decodes under the default
    with pytest.raises(ValueError, match="max_pixels"):
        decode_jpeg(payload, max_pixels=16)
    assert decode_jpeg(payload).shape == (8, 8)


@pytest.mark.parametrize("which", ["ppm", "pgm", "bmp", "wav"])
def test_simple_format_parsers_survive_mutations(which):
    """The simpler parsers (PNM/BMP headers, RIFF/WAVE chunks) get the
    same contract: return-or-raise, never hang."""
    import sys

    sys.path.insert(0, "tests")
    from test_cube_ops import _bmp_bytes, _ppm_bytes, _wav_bytes
    from test_raster_decode import _pgm

    from openeo_processes_dask_ml_spark.scale.multimodal import (
        decode_audio,
        decode_image,
    )

    rng = np.random.default_rng(42)
    px = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(9)]
    if which == "ppm":
        payload, decode = _ppm_bytes(3, 3, px), lambda b: decode_image(b, "ppm")
    elif which == "pgm":
        grid = rng.integers(0, 256, (5, 7)).astype(np.uint8)
        payload, decode = _pgm(grid), lambda b: decode_image(b, "pgm")
    elif which == "bmp":
        payload, decode = _bmp_bytes(3, 3, px), lambda b: decode_image(b, "bmp")
    else:
        payload = _wav_bytes(np.sin(np.arange(200) / 7.0))
        decode = decode_audio
    for cut in range(0, len(payload), 2):
        try:
            decode(payload[:cut])
        except _OK:
            pass
    buf = bytearray(payload)
    for pos in rng.integers(0, len(buf), 150):
        orig = buf[pos]
        buf[pos] = (orig + 1 + int(rng.integers(0, 255))) & 0xFF
        try:
            decode(bytes(buf))
        except _OK:
            pass
        buf[pos] = orig


def test_max_pixels_cap_never_falls_through_to_pil(monkeypatch):
    """ADVICE r11: the max_pixels decompression-bomb rejection is a
    resource policy — decode_image must re-raise it, NOT retry the
    hostile payload under PIL's much higher bomb limit. Pinned with a
    fake PIL that records whether it was consulted."""
    import sys
    import types

    import openeo_processes_dask_ml_spark.scale.multimodal as mm
    from openeo_processes_dask_ml_spark.io.limits import ImageLimitError
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    sys.path.insert(0, "tests")
    from test_gif import _PAL4, _gif

    payload = _gif(np.array([[0, 1], [2, 3]]), _PAL4)

    called = []

    class _FakeImg:
        def convert(self, mode):
            called.append(mode)
            return np.zeros((2, 2, 3), dtype=np.uint8)

    fake_image_mod = types.SimpleNamespace(open=lambda buf: _FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    # the fake PIL is wired up and handles formats the pure path lacks
    out = decode_image(payload, "bogus-fmt", decoder_order=("pure", "pil"))
    assert out.shape == (2, 2, 3) and called == ["RGB"]

    # ... but the limit rejection must never reach it: shrink the cap
    # at the dispatched decoder and confirm no PIL consultation
    called.clear()
    monkeypatch.setitem(
        mm._PURE_DECODERS, "gif", lambda p: decode_gif(p, max_pixels=2)
    )
    with pytest.raises(ImageLimitError, match="max_pixels"):
        decode_image(payload, "gif", decoder_order=("pure", "pil"))
    assert called == []  # PIL was never consulted
