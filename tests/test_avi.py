"""MJPEG-in-AVI container (io/avi.py): parse, frame-sampled decode
through the pure-numpy JPEG decoder, the inter-frame-codec boundary,
DoS caps, and the Spark-side video_frame_features op. Frames are
DC-only JPEGs, so every decoded pixel has the closed-form value
DC/8 + 128 (the raster_decode_jpeg gate's construction)."""

import struct
import sys

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.avi import (
    decode_avi_frames,
    encode_avi_mjpeg,
    iter_mjpeg_frames,
    parse_avi,
)

sys.path.insert(0, "tests")


def _dc_frame_jpeg(dc: int) -> bytes:
    """16x16 grayscale baseline JPEG, all four blocks DC-only ``dc`` —
    decodes to a flat dc/8 + 128 image (T.81 IDCT closed form)."""
    from test_jpeg import _gray_jpeg

    return _gray_jpeg([[dc * 8] + [0] * 63] * 4, 16, 16)


def _avi(n_frames=5, fps=10.0) -> bytes:
    frames = [_dc_frame_jpeg(i) for i in range(n_frames)]
    return encode_avi_mjpeg(frames, 16, 16, fps=fps)


def test_parse_and_sampled_decode():
    payload = _avi(5)
    info = parse_avi(payload)
    assert (info["width"], info["height"]) == (16, 16)
    assert info["n_frames"] == 5 and len(info["frames"]) == 5
    assert info["handler"] == "MJPG"
    assert info["fps"] == 10.0
    # every_n=2 keeps frames 0, 2, 4 and never entropy-decodes 1, 3
    out = decode_avi_frames(payload, every_n=2)
    assert [i for i, _ in out] == [0, 2, 4]
    for i, arr in out:
        assert arr.shape == (16, 16)
        np.testing.assert_array_equal(
            arr, np.full((16, 16), i + 128, np.uint8)
        )


def test_max_frames_cap_and_every_n_guard():
    payload = _avi(5)
    out = decode_avi_frames(payload, max_frames=2)
    assert [i for i, _ in out] == [0, 1]
    with pytest.raises(ValueError, match="every_n"):
        decode_avi_frames(payload, every_n=0)


def test_interframe_codec_raises():
    payload = _avi(2).replace(b"vids" + b"MJPG", b"vids" + b"H264")
    with pytest.raises(NotImplementedError, match="H264"):
        list(iter_mjpeg_frames(payload))


def test_container_guards():
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"not an avi at all")
    payload = _avi(2)
    with pytest.raises(ValueError, match="truncated AVI"):
        parse_avi(payload[: len(payload) - 10])
    # a declared-huge chunk size must not read past the buffer
    i = payload.index(b"00dc")
    hostile = (
        payload[: i + 4] + struct.pack("<I", 1 << 30) + payload[i + 8 :]
    )
    with pytest.raises(ValueError, match="truncated AVI"):
        parse_avi(hostile)


def test_video_frame_features_real_and_fallback(spark):
    from openeo_processes_dask_ml_spark.scale.multimodal import (
        image_features,
        video_frame_features,
    )

    avi = _avi(5)
    rows = [
        (1, bytearray(avi), ("video", "avi", 16, 16, 5)),
        (2, bytearray(b"\x00" * 32), ("video", "mp4", 8, 8, 20)),
        (3, bytearray(b"\x00" * 8), ("image", "pgm", 4, 4, 1)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<kind:string,format:string,width:int,height:int,"
        "n_frames:int>",
    )
    got = video_frame_features(media, every_n=2, feature_dim=4).collect()
    by_media = {}
    for r in got:
        by_media.setdefault(r["media_id"], []).append(r)
    # image rows contribute nothing
    assert 3 not in by_media
    # AVI: real features of the flat dc/8+128 frames
    avi_rows = {r["frame_idx"]: r["feature"] for r in by_media[1]}
    assert sorted(avi_rows) == [0, 2, 4]
    expect = image_features(np.full((16, 16), 2 + 128, np.uint8), 4)
    assert avi_rows[2] == expect
    # opaque container: one md5 stand-in row per sampled index
    mp4_rows = {r["frame_idx"] for r in by_media[2]}
    assert mp4_rows == set(range(0, 20, 2))


def test_video_frame_features_animated_gif(spark):
    sys.path.insert(0, "tests")
    from test_gif import _PAL4, _animated_gif

    from openeo_processes_dask_ml_spark.scale.multimodal import (
        image_features,
        video_frame_features,
    )

    full = np.zeros((4, 6), np.uint8)
    patch = np.full((2, 2), 1, np.uint8)
    gif = _animated_gif(
        (6, 4), [(0, 0, full, 1, None), (1, 1, patch, 1, None)]
    )
    media = spark.createDataFrame(
        [(9, bytearray(gif), ("video", "gif", 6, 4, 2))],
        "media_id long, payload binary, "
        "meta struct<kind:string,format:string,width:int,height:int,"
        "n_frames:int>",
    )
    got = {
        r["frame_idx"]: r["feature"]
        for r in video_frame_features(media, every_n=1, feature_dim=4).collect()
    }
    assert sorted(got) == [0, 1]
    canvas = np.zeros((4, 6, 4), np.uint8)
    canvas[:, :] = (255, 0, 0, 255)
    assert got[0] == image_features(canvas, 4)
    canvas[1:3, 1:3] = (0, 255, 0, 255)
    assert got[1] == image_features(canvas, 4)


def test_multistream_avi_keeps_one_video_stream():
    """ADVICE r11: a two-video-stream AVI must not interleave frames
    across streams, and the handler must come from the stream whose
    frames are kept (the first MJPEG 'vids' strl) — not the last."""
    import struct as _s

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + _s.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    def strl(handler, n):
        strh = (
            b"vids" + handler + _s.pack("<I", 0)
            + _s.pack("<HHI", 0, 0, 0)
            + _s.pack("<II", 1, 10)
            + _s.pack("<5I", 0, n, 0, 0, 0)
            + _s.pack("<4h", 0, 0, 16, 16)
        )
        strf = _s.pack(
            "<IiiHH4sIiiII", 40, 16, 16, 1, 24, handler,
            16 * 16 * 3, 0, 0, 0, 0,
        )
        return lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))

    avih = _s.pack("<14I", 100000, 0, 0, 0, 2, 0, 2, 0, 16, 16, 0, 0, 0, 0)
    # stream 00 = H264 vids, stream 01 = MJPEG vids
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl(b"H264", 2)
               + strl(b"MJPG", 2))
    f0, f1 = _dc_frame_jpeg(0), _dc_frame_jpeg(1)
    movi = lst(b"movi",
               chunk(b"00dc", b"\x11" * 10) + chunk(b"01dc", f0)
               + chunk(b"00dc", b"\x22" * 10) + chunk(b"01dc", f1))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + _s.pack("<I", len(body)) + body

    info = parse_avi(payload)
    assert info["handler"] == "MJPG"
    assert len(info["frames"]) == 2  # only the 01dc chunks
    out = decode_avi_frames(payload)
    assert [i for i, _ in out] == [0, 1]
    np.testing.assert_array_equal(out[0][1], np.full((16, 16), 128, np.uint8))
    np.testing.assert_array_equal(out[1][1], np.full((16, 16), 129, np.uint8))


def test_hex_stream_id_only_fails_loudly():
    """ADVICE r12: a muxer writing hex stream ids ('0adc') must raise,
    not silently decode to an empty frame list; mixed files keep the
    decimal-id frames."""
    import struct as _s

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + _s.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = _s.pack("<14I", 100000, 0, 0, 0, 1, 0, 1, 0, 16, 16, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih))
    movi_hex = lst(b"movi", chunk(b"0adc", b"\x11" * 10))
    body = b"AVI " + hdrl + movi_hex
    payload = b"RIFF" + _s.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="non-decimal stream ids"):
        parse_avi(payload)

    # mixed decimal + hex: the decimal frames survive, no raise
    f0 = _dc_frame_jpeg(0)
    movi_mixed = lst(b"movi", chunk(b"0adc", b"\x11" * 10)
                     + chunk(b"00dc", f0))
    body = b"AVI " + hdrl + movi_mixed
    payload = b"RIFF" + _s.pack("<I", len(body)) + body
    assert len(parse_avi(payload)["frames"]) == 1
