"""Baseline JPEG codec (multimodal/jpeg.py): round trips, subsampling,
restart intervals, error bounds, and the media.decode_image /
resize_image routing. Encoder output is the decoder's test input —
no JPEG fixtures ship in the container, so the codec proves itself on
bytes it generates, with orientation/DC invariants guarding against
encoder+decoder sharing a compensating bug (a transposed DCT pair
round-trips fine but flips the gradient checks below)."""

from __future__ import annotations

import numpy as np
import pytest

from xorbits_sql_spark.multimodal.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: bytes, b: bytes) -> float:
    x = np.frombuffer(a, dtype=np.uint8).astype(np.float64)
    y = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
    mse = ((x - y) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient_rgb(w: int, h: int) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.tile(np.linspace(10, 245, w), (h, 1))
    img[:, :, 1] = np.tile(np.linspace(245, 10, h).reshape(-1, 1), (1, w))
    img[:, :, 2] = 60
    return img


def test_constant_gray_roundtrip_exact():
    """DC-only image: quantization cannot disturb a constant block."""
    w, h = 24, 16
    data = encode_jpeg(w, h, 1, bytes([77]) * (w * h), quality=90)
    W, H, C, px = decode_jpeg(data)
    assert (W, H, C) == (w, h, 1)
    assert np.abs(np.frombuffer(px, np.uint8).astype(int) - 77).max() == 0


def test_gradient_orientation_preserved():
    """Horizontal gradient stays horizontal: decoded left edge dark,
    right edge bright, rows near-identical. A transposed DCT/IDCT pair
    (the classic compensating-bug round trip) fails this."""
    w, h = 32, 16
    grad = np.tile(np.linspace(0, 255, w).astype(np.uint8), (h, 1))
    W, H, C, px = decode_jpeg(encode_jpeg(w, h, 1, grad.tobytes(), quality=92))
    out = np.frombuffer(px, np.uint8).reshape(h, w)
    assert out[0, 0] < 30 and out[0, -1] > 225
    assert np.abs(out[0].astype(int) - out[-1].astype(int)).mean() < 6
    assert _psnr(grad.tobytes(), px) > 45


def test_rgb_444_roundtrip():
    img = _gradient_rgb(24, 16)
    W, H, C, px = decode_jpeg(encode_jpeg(24, 16, 3, img.tobytes(), quality=90))
    assert (W, H, C) == (24, 16, 3)
    assert _psnr(img.tobytes(), px) > 40


def test_rgb_420_odd_dimensions():
    """4:2:0 with non-multiple-of-16 dims: MCU padding + chroma
    upsample + crop must reproduce the exact declared size."""
    w, h = 37, 21
    img = _gradient_rgb(w, h)
    W, H, C, px = decode_jpeg(
        encode_jpeg(w, h, 3, img.tobytes(), quality=90, subsample=True)
    )
    assert (W, H, C) == (w, h, 3)
    assert len(px) == w * h * 3
    assert _psnr(img.tobytes(), px) > 33


def test_restart_intervals_do_not_change_pixels():
    """DRI/RSTn is a bitstream framing feature: decoded pixels must be
    bit-identical to the unframed encoding (same coefficients)."""
    w, h = 41, 29
    img = _gradient_rgb(w, h)
    for sub in (False, True):
        base = decode_jpeg(encode_jpeg(w, h, 3, img.tobytes(), 90, subsample=sub))[3]
        for ri in (1, 3, 7):
            out = decode_jpeg(
                encode_jpeg(
                    w, h, 3, img.tobytes(), 90, subsample=sub, restart_interval=ri
                )
            )[3]
            assert out == base, f"sub={sub} ri={ri}"


def test_quality_monotone():
    img = _gradient_rgb(40, 24).tobytes()
    p30 = _psnr(img, decode_jpeg(encode_jpeg(40, 24, 3, img, quality=30))[3])
    p95 = _psnr(img, decode_jpeg(encode_jpeg(40, 24, 3, img, quality=95))[3])
    assert p95 > p30


def test_high_entropy_noise_survives():
    """Noise stresses every Huffman code length incl. ZRL/large
    categories and the 0xFF byte-stuffing path."""
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8).astype(np.uint8)
    W, H, C, px = decode_jpeg(encode_jpeg(24, 16, 3, noise.tobytes(), quality=95))
    assert (W, H, C) == (24, 16, 3)
    assert _psnr(noise.tobytes(), px) > 25


def test_bad_soi_rejected():
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_progressive_rejected():
    """SOF0 patched to SOF2: must refuse, not mis-decode."""
    data = bytearray(encode_jpeg(16, 16, 1, bytes(256), quality=80))
    idx = data.find(b"\xff\xc0")
    assert idx > 0
    data[idx + 1] = 0xC2
    with pytest.raises(JpegError, match="baseline"):
        decode_jpeg(bytes(data))


def test_dimension_bomb_rejected():
    """Forged 65535x65535 header must refuse BEFORE allocating planes."""
    data = bytearray(encode_jpeg(16, 16, 1, bytes(256), quality=80))
    idx = data.find(b"\xff\xc0")
    data[idx + 5 : idx + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(JpegError, match="out of bounds"):
        decode_jpeg(bytes(data))


def test_truncated_stream_rejected():
    data = encode_jpeg(32, 32, 1, bytes(range(256)) * 4, quality=90)
    with pytest.raises(JpegError):
        decode_jpeg(data[: len(data) // 2])


def test_encoder_input_validation():
    with pytest.raises(JpegError, match="pixel buffer"):
        encode_jpeg(8, 8, 1, bytes(63))
    with pytest.raises(JpegError, match="channels"):
        encode_jpeg(8, 8, 2, bytes(128))
    with pytest.raises(JpegError, match="quality"):
        encode_jpeg(8, 8, 1, bytes(64), quality=0)


def test_decode_image_routes_jpeg():
    from xorbits_sql_spark.multimodal.media import decode_image

    img = _gradient_rgb(24, 16)
    stats = decode_image(encode_jpeg(24, 16, 3, img.tobytes(), quality=90))
    assert (stats["width"], stats["height"], stats["channels"]) == (24, 16, 3)
    assert stats["n_bytes"] == 24 * 16 * 3
    # pixel stats describe the DECODED image, not the compressed bytes
    assert abs(stats["mean_byte"] - img.mean()) < 4.0


def test_resize_image_real_jpeg_path():
    from xorbits_sql_spark.multimodal.media import resize_image

    img = _gradient_rgb(32, 32)
    out = resize_image(encode_jpeg(32, 32, 3, img.tobytes(), quality=90), 16, 8)
    assert out[:2] == b"\xff\xd8"  # re-encoded as JPEG, not PNG
    W, H, C, px = decode_jpeg(out)
    assert (W, H, C) == (16, 8, 3)
    # nearest-neighbor downsample of a gradient keeps the orientation
    arr = np.frombuffer(px, np.uint8).reshape(8, 16, 3)
    assert arr[0, 0, 0] < arr[0, -1, 0]


def test_transform_media_stamps_jpeg_mime(spark):
    from xorbits_sql_spark.multimodal.media import transform_media

    img = _gradient_rgb(24, 16)
    jpg = encode_jpeg(24, 16, 3, img.tobytes(), quality=90)
    df = spark.createDataFrame(
        [(1, bytearray(jpg))], "doc_id long, media binary"
    )
    rows = transform_media(df, 12, 8, fake=False).collect()
    assert len(rows) == 1
    meta = rows[0]["media_meta"]
    assert meta["mime"] == "image/jpeg"
    assert (meta["width"], meta["height"]) == (12, 8)
    W, H, C, _ = decode_jpeg(bytes(rows[0]["media"]))
    assert (W, H, C) == (12, 8, 3)


def test_staged_jpeg_query_matches_oracle(spark, duck):
    """u04–u07 (see queries/staged.py — registered since round 9): full
    parity check with the same type-strict compare + exact-match
    harness as test_oracle_parity."""
    from xorbits_sql_spark.queries.staged import STAGED

    from .oracle import compare, exact_match

    assert "u04_jpeg_decode_stats" in STAGED
    for name, spec in STAGED.items():
        sdf = spec.fn(spark, "/root/testdata/sf0.01").toPandas()
        assert len(sdf) > 0, name
        ddf = duck.execute(spec.oracle).fetchdf()
        problems = compare(sdf, ddf)
        assert not problems, f"{name}: " + "; ".join(problems)
        assert exact_match(sdf, ddf), name


def test_staged_entries_registered():
    """Round-9 unfreeze (round-8 playbook): the staged entries are live
    registry names now — in the driver window, oracle-paired."""
    from xorbits_sql_spark.queries import load_all

    reg = load_all()
    for name in (
        "u04_jpeg_decode_stats",
        "u05_jpeg_resize_roundtrip",
        "u06_pg_dialect_weekday_rollup",
        "u07_bq_dialect_boundary_datediff",
    ):
        assert name in reg and reg[name].oracle


def test_decoder_never_fails_uncontrolled():
    """Fuzz: corrupt bytes must either decode (plausible image) or
    raise JpegError — never IndexError/struct.error/etc. Seeded and
    small here; the round-8 build ran 9000+ mutations offline with
    zero uncontrolled failures (byte flips, truncations at every
    offset, length-field sweeps, random garbage)."""
    import struct

    rng = np.random.default_rng(42)
    img = _gradient_rgb(33, 21)
    bases = [
        encode_jpeg(33, 21, 3, img.tobytes(), quality=85),
        encode_jpeg(
            33, 21, 3, img.tobytes(), quality=85,
            subsample=True, restart_interval=2,
        ),
    ]

    def attempt(blob: bytes) -> None:
        try:
            w, h, c, px = decode_jpeg(blob)
            assert len(px) == w * h * c
        except JpegError:
            pass

    for trial in range(300):
        data = bytearray(bases[trial % 2])
        for _ in range(rng.integers(1, 6)):
            data[rng.integers(0, len(data))] = rng.integers(0, 256)
        attempt(bytes(data))
    base = bases[0]
    for cut in range(0, len(base), 7):  # truncations
        attempt(base[:cut])
    markers = [
        i
        for i in range(len(base) - 1)
        if base[i] == 0xFF
        and base[i + 1] not in (0x00, 0xD8, 0xD9)
        and not (0xD0 <= base[i + 1] <= 0xD7)
    ]
    for m in markers:  # length-field sweep
        for L in (0, 1, 2, 3, 4, 7, 8, 17, 65535):
            d = bytearray(base)
            d[m + 2 : m + 4] = struct.pack(">H", L)
            attempt(bytes(d))


def test_roundtrip_property():
    """Property-style sweep: random dimensions (incl. MCU-edge sizes),
    channels, subsampling, and quality — decode(encode(img)) must
    return the declared shape and track the source within a
    quality-dependent PSNR floor."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        channels=st.sampled_from([1, 3]),
        quality=st.integers(55, 98),
        subsample=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def prop(w, h, channels, quality, subsample, seed):
        rng = np.random.default_rng(seed)
        # smooth-ish content (random blocks) so PSNR floors are meaningful
        img = rng.integers(
            40, 216, ((h + 3) // 4, (w + 3) // 4, channels), dtype=np.uint8
        )
        img = np.repeat(np.repeat(img, 4, axis=0), 4, axis=1)[:h, :w, :]
        data = encode_jpeg(
            w, h, channels, img.tobytes(), quality=quality,
            subsample=subsample and channels == 3,
        )
        W, H, C, px = decode_jpeg(data)
        assert (W, H, C) == (w, h, channels)
        assert len(px) == w * h * channels
        # calibrated: q55 + sharp chroma edges + 4:2:0 on tiny images
        # legitimately dips to ~16 dB; a transposed plane or a wrong
        # color transform lands below 10. Precise per-quality floors
        # live in the directed tests above.
        assert _psnr(img.tobytes(), px) > 13.0, (w, h, channels, quality)

    prop()


def test_exif_orientation_parse_and_absent():
    """Round-9 hardening: tag 0x0112 from a spliced APP1 (both TIFF
    endiannesses), None when untagged, None on malformed blobs —
    orientation is advisory, pixels still decode."""
    from xorbits_sql_spark.multimodal.jpeg import (
        exif_orientation, make_exif_app1,
    )

    img = _gradient_rgb(16, 8)
    base = encode_jpeg(16, 8, 3, img.tobytes(), quality=90)
    assert exif_orientation(base) is None
    for o in range(1, 9):
        tagged = base[:2] + make_exif_app1(o) + base[2:]
        assert exif_orientation(tagged) == o
        # the tagged stream still decodes to the same pixels
        assert decode_jpeg(tagged) == decode_jpeg(base)
    # little-endian TIFF variant
    import struct as _s
    tiff = (b"II\x2a\x00\x08\x00\x00\x00" + b"\x01\x00"
            + _s.pack("<HHI", 0x0112, 3, 1) + _s.pack("<HH", 6, 0)
            + b"\x00\x00\x00\x00")
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + _s.pack(">H", len(payload) + 2) + payload
    assert exif_orientation(base[:2] + app1 + base[2:]) == 6
    # malformed: truncated TIFF, wrong byte order mark, value out of range
    bad_tiff = b"Exif\x00\x00" + b"XX\x00\x2a"
    app1_bad = b"\xff\xe1" + _s.pack(">H", len(bad_tiff) + 2) + bad_tiff
    assert exif_orientation(base[:2] + app1_bad + base[2:]) is None
    assert exif_orientation(b"\x00\x01") is None
    tagged9 = base[:2] + make_exif_app1(8) + base[2:]
    assert exif_orientation(tagged9) == 8
    with pytest.raises(JpegError):
        make_exif_app1(9)


def test_exif_apply_orientation_exact():
    """The 8 upright transforms, pinned on an asymmetric 2x3 array so
    every rotation/mirror is distinguishable."""
    from xorbits_sql_spark.multimodal.jpeg import apply_orientation

    a = np.array([[1, 2, 3], [4, 5, 6]])
    want = {
        1: [[1, 2, 3], [4, 5, 6]],
        2: [[3, 2, 1], [6, 5, 4]],
        3: [[6, 5, 4], [3, 2, 1]],
        4: [[4, 5, 6], [1, 2, 3]],
        5: [[1, 4], [2, 5], [3, 6]],          # transpose
        6: [[4, 1], [5, 2], [6, 3]],          # rotate 90 CW
        7: [[6, 3], [5, 2], [4, 1]],          # transverse
        8: [[3, 6], [2, 5], [1, 4]],          # rotate 270 CW
    }
    for o, w in want.items():
        got = apply_orientation(a, o)
        assert got.tolist() == w, o
        assert got.flags["C_CONTIGUOUS"]
    assert apply_orientation(a, None) is a
    with pytest.raises(JpegError):
        apply_orientation(a, 0)
    # 3-channel arrays transform per-plane identically
    rgb = np.dstack([a, a * 10, a * 100])
    assert apply_orientation(rgb, 6).shape == (3, 2, 3)


def test_decode_image_surfaces_orientation():
    from xorbits_sql_spark.multimodal.jpeg import make_exif_app1
    from xorbits_sql_spark.multimodal.media import decode_image

    img = _gradient_rgb(16, 8)
    base = encode_jpeg(16, 8, 3, img.tobytes(), quality=90)
    assert decode_image(base)["orientation"] is None
    tagged = base[:2] + make_exif_app1(6) + base[2:]
    stats = decode_image(tagged)
    assert stats["orientation"] == 6
    assert stats["width"] == 16 and stats["height"] == 8
