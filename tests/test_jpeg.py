"""Baseline JPEG codec (operators/jpegcodec.py): round-trip pixel
closeness (the codec is lossy, so tolerance-based), header exactness,
Huffman edge paths (ZRL, EOB, byte stuffing), variant rejection, and
the Arrow mapInPandas seam end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from irclogbot_spark.operators import multimodal
from irclogbot_spark.operators.jpegcodec import (
    _canonical_codes,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(w: int, h: int, ch: int) -> bytes:
    x = np.linspace(0, 255, w)[None, :]
    y = np.linspace(0, 255, h)[:, None]
    if ch == 1:
        img = np.clip(x + y, 0, 255)[..., None]
    else:
        img = np.stack([x + 0 * y, 0 * x + y, (x + y) / 2], axis=-1)
    return img.astype(np.uint8).tobytes()


def test_round_trip_geometry_exact_pixels_close_rgb():
    w, h = 19, 13
    pix = _gradient(w, h, 3)
    W, H, C, out = decode_jpeg(encode_jpeg(w, h, pix, 3, quality=95))
    assert (W, H, C) == (w, h, 3)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int)
        - np.frombuffer(pix, np.uint8).astype(int)
    )
    # smooth gradient at q95: DCT quantization error stays tiny
    assert err.max() <= 6 and err.mean() < 2


def test_round_trip_grayscale():
    w, h = 11, 9
    pix = _gradient(w, h, 1)
    W, H, C, out = decode_jpeg(encode_jpeg(w, h, pix, 1, quality=90))
    assert (W, H, C) == (w, h, 1)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int)
        - np.frombuffer(pix, np.uint8).astype(int)
    )
    assert err.max() <= 8


def test_flat_block_is_exact():
    # a constant 8x8 block quantizes to DC-only: lossless round trip
    W, H, C, out = decode_jpeg(
        encode_jpeg(8, 8, bytes([200] * 64), 1, quality=95)
    )
    assert (W, H, C) == (8, 8, 1)
    assert set(out) == {200}


def test_noise_low_quality_exercises_zrl_and_stuffing():
    # random content at low quality drives long zero runs (ZRL), EOB,
    # and — statistically — 0xFF bytes needing stuffing; must decode
    # to the declared geometry without error
    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, 24 * 16 * 3, dtype=np.uint8).tobytes()
    payload = encode_jpeg(24, 16, pix, 3, quality=25)
    W, H, C, out = decode_jpeg(payload)
    assert (W, H, C, len(out)) == (24, 16, 3, 24 * 16 * 3)


def test_determinism():
    pix = _gradient(12, 10, 3)
    assert encode_jpeg(12, 10, pix, 3) == encode_jpeg(12, 10, pix, 3)


def test_rejects_progressive_and_truncation():
    payload = encode_jpeg(8, 8, bytes(64), 1)
    # splice a progressive SOF2 marker after SOI
    bad = payload[:2] + b"\xff\xc2\x00\x05aaa" + payload[2:]
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bad)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    # subsampled sampling factor in SOF0 must be rejected: rebuild the
    # SOF0 with 2x2 luma sampling
    import struct

    pos = payload.find(b"\xff\xc0")
    (ln,) = struct.unpack_from(">H", payload, pos + 2)
    seg = bytearray(payload[pos + 4 : pos + 2 + ln])
    seg[7] = 0x22  # first component sampling 2x2
    bad2 = payload[: pos + 4] + bytes(seg) + payload[pos + 2 + ln :]
    with pytest.raises(ValueError, match="4:4:4"):
        decode_jpeg(bad2)


def test_huffman_tables_are_canonical_and_complete():
    codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(codes) == sum(AC_LUMA_BITS) == len(AC_LUMA_VALS)
    # prefix-free: no code is a prefix of another
    as_bits = {
        format(c, f"0{ln}b") for c, ln in codes.values()
    }
    assert len(as_bits) == len(codes)
    for a in as_bits:
        for b in as_bits:
            if a is not b:
                assert not b.startswith(a) or a == b


def test_decode_images_real_jpeg_through_arrow_seam(spark):
    # flat-color image -> exact per-channel means even through the
    # lossy codec (constant blocks round-trip exactly)
    pix = bytes([200, 100, 50] * (8 * 8))
    payload = encode_jpeg(8, 8, pix, 3, quality=95)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "jpeg", "t://1")],
        schema=multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_images(
        media, n_features=3, decode_stub="raise"
    ).collect()[0]
    assert (row.width, row.height, row.n_channels) == (8, 8, 3)
    for ch, want in enumerate((200, 100, 50)):
        assert abs(row.feature[ch] - want / 255.0) < 0.02


def test_synthesize_jpeg_media_matches_oracle_rule(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "hello"), (3, "xy")], "doc_id long, text string"
    )
    out = {
        r.asset_id: (r.width, r.height, r.n_channels)
        for r in multimodal.decode_images(
            multimodal.synthesize_jpeg_media(df), decode_stub="raise"
        ).collect()
    }
    for did, text in ((1, "abcd"), (2, "hello"), (3, "xy")):
        n = len(text.encode())
        assert out[did] == (4 + n % 13, 3 + n % 7, 1 if n % 2 == 0 else 3)


def test_resize_jpeg_in_family(spark):
    pix = _gradient(16, 12, 3)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_jpeg(16, 12, pix, 3)), "jpeg", "t://1")],
        schema=multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.resize_images(
        media, width=8, height=8, decode_stub="raise"
    ).collect()[0]
    assert (row.width, row.height) == (8, 8)
    assert (row.src_width, row.src_height) == (16, 12)
    W, H, C, _ = decode_jpeg(bytes(row.payload))
    assert (W, H, C) == (8, 8, 3)  # payload re-encoded in-family


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: 0xFF fill bytes may pad before any marker code
    payload = encode_jpeg(8, 8, bytes([200] * 64), 1, quality=95)
    pos = payload.find(b"\xff\xdb")  # first DQT
    padded = payload[:pos] + b"\xff\xff\xff" + payload[pos:]
    W, H, C, out = decode_jpeg(padded)
    assert (W, H, C) == (8, 8, 1) and set(out) == {200}


def test_truncated_fill_run_raises_valueerror_not_indexerror():
    # ADVICE r8: a payload truncated INSIDE a 0xFF fill run used to
    # read payload[pos + 1] past the bound check -> IndexError; the
    # codec's error contract is ValueError for any malformed stream
    payload = encode_jpeg(8, 8, bytes(64), 1)
    pos = payload.find(b"\xff\xdb")
    truncated = payload[:pos] + b"\xff\xff\xff\xff"
    with pytest.raises(ValueError):
        decode_jpeg(truncated)
