"""Measure the pure-numpy image decoders in MB/s per core.

VERDICT r10 next #5: the numpy JPEG entropy decode is a
per-coefficient Python bit-loop — horizontal scaling inside
mapInPandas is fine, but the per-core constant matters for choosing
the blessed production decoder order (see ``decode_image``'s
``decoder_order`` knob and the SCALE_NOTES "codec throughput" entry).
This script builds realistic entropy-rich fixtures with the repo's own
encoders (and the test-side JPEG/GIF encoders, which exist precisely
to be independent of the decoders), times repeated decodes, and prints
one JSON line: payload MB/s and pixel Mpx/s per codec, single core.

Run:  python tools/codec_throughput.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from openeo_processes_dask_ml_spark.io.gif import decode_gif  # noqa: E402
from openeo_processes_dask_ml_spark.io.jpeg import decode_jpeg  # noqa: E402
from openeo_processes_dask_ml_spark.io.png import (  # noqa: E402
    decode_png,
    encode_png,
)


def _jpeg_fixture(n: int = 256) -> tuple[bytes, int]:
    from test_jpeg import _fdct_blocks, _gray_jpeg

    rng = np.random.default_rng(5)
    img = np.clip(
        128
        + np.cumsum(rng.normal(0, 6, (n, n)), axis=1) * 0.5
        + rng.normal(0, 12, (n, n)),
        0,
        255,
    ).astype(np.uint8)
    return _gray_jpeg(_fdct_blocks(img), n, n), n * n


def _png_fixture(n: int = 512) -> tuple[bytes, int]:
    rng = np.random.default_rng(6)
    img = np.clip(
        np.cumsum(rng.normal(0, 5, (n, n, 3)), axis=1) + 128, 0, 255
    ).astype(np.uint8)
    return encode_png(img), n * n


def _gif_fixture(n: int = 256) -> tuple[bytes, int]:
    from test_gif import _gif

    rng = np.random.default_rng(7)
    idx = (
        (np.cumsum(rng.normal(0, 1.5, (n, n)), axis=1) % 16)
        .astype(np.uint8)
    )
    pal = [(i * 16, 255 - i * 16, i * 8) for i in range(16)]
    return _gif(idx, pal), n * n


def _webp_fixture(n: int = 128) -> tuple[bytes, int]:
    from test_webp import _simple_lossless

    rng = np.random.default_rng(8)
    img = np.clip(
        np.cumsum(rng.normal(0, 5, (n, n, 3)), axis=1) + 128, 0, 255
    ).astype(np.uint8)
    return _simple_lossless(img), n * n


def _avi_fixture(frames: int = 8) -> tuple[bytes, int]:
    from test_avi import _avi

    return _avi(frames), frames * 16 * 16


def measure(name, payload, pixels, decode, min_sec=2.0):
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < min_sec:
        decode(payload)
        reps += 1
    dt = (time.perf_counter() - t0) / reps
    return {
        "codec": name,
        "payload_kb": round(len(payload) / 1024, 1),
        "decode_sec": round(dt, 4),
        "mb_per_sec": round(len(payload) / dt / 1e6, 3),
        "mpx_per_sec": round(pixels / dt / 1e6, 3),
        "reps": reps,
    }


def main():
    rows = []
    p, px = _jpeg_fixture()
    rows.append(measure("jpeg_numpy", p, px, decode_jpeg))
    p, px = _png_fixture()
    rows.append(measure("png_numpy", p, px, decode_png))
    p, px = _gif_fixture()
    rows.append(measure("gif_numpy", p, px, decode_gif))
    from openeo_processes_dask_ml_spark.io.avi import decode_avi_frames
    from openeo_processes_dask_ml_spark.io.webp import decode_webp

    p, px = _webp_fixture()
    rows.append(measure("webp_numpy", p, px, decode_webp))
    p, px = _avi_fixture()
    rows.append(measure("avi_mjpeg_numpy", p, px, decode_avi_frames))
    print(json.dumps({"codec_throughput_single_core": rows}))


if __name__ == "__main__":
    main()
