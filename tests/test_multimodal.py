"""Multimodal plumbing: binary payloads + metadata structs through
Arrow-batched mapInPandas, with the decode step faked deterministically
(real codecs are stubbed — see multimodal/media.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from xorbits_sql_spark.multimodal import (
    attach_fake_media,
    decode_image,
    extract_media_features,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")


def test_feature_extraction_matches_python(spark):
    rows = [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="xyz")]
    df = attach_fake_media(spark.createDataFrame(rows))
    out = {r["id"]: r for r in extract_media_features(df, fake=True).collect()}
    for row in rows:
        data = row.text.encode()
        exp = {
            "n_bytes": len(data),
            "mean_byte": sum(data) / len(data),
            "hash_hi": int.from_bytes(hashlib.md5(data).digest()[:4], "big"),
        }
        got = out[row.doc_id]
        assert got["n_bytes"] == exp["n_bytes"]
        assert abs(got["mean_byte"] - exp["mean_byte"]) < 1e-12
        assert got["hash_hi"] == exp["hash_hi"]


def test_resize_plumbing(spark):
    from xorbits_sql_spark.multimodal import resize_image, transform_media

    with pytest.raises(NotImplementedError):
        resize_image(b"abc", 4, 4)
    df = attach_fake_media(
        spark.createDataFrame([Row(doc_id=1, text="hello"), Row(doc_id=2, text="yo")])
    )
    out = {r["id"]: r for r in transform_media(df, width=8, height=2, fake=True).collect()}
    assert len(out) == 2
    for r in out.values():
        assert len(bytes(r["media"])) == 16
        assert r["media_meta"]["width"] == 8 and r["media_meta"]["height"] == 2
    # deterministic per payload
    assert bytes(out[1]["media"]) == resize_image(b"hello", 8, 2, fake=True)


def test_frame_sampling_fanout(spark):
    from xorbits_sql_spark.multimodal import explode_frames, sample_frames

    with pytest.raises(NotImplementedError):
        sample_frames(b"abc", 2)
    df = attach_fake_media(
        spark.createDataFrame([Row(doc_id=7, text="clip")])
    )
    rows = explode_frames(df, n_frames=3, fake=True).collect()
    assert [(r["id"], r["frame_idx"]) for r in rows] == [(7, 0), (7, 1), (7, 2)]
    assert [bytes(r["frame"]) for r in rows] == sample_frames(b"clip", 3, fake=True)


def test_media_metadata_struct(spark):
    df = attach_fake_media(spark.createDataFrame([Row(doc_id=1, text="abcd")]))
    row = df.select("media", "media_meta").collect()[0]
    assert bytes(row["media"]) == b"abcd"
    assert row["media_meta"]["mime"] == "application/x-fake"
    assert row["media_meta"]["width"] == 4


# ---- real PNG codec (pure stdlib; multimodal/png.py) ----


def _filtered_png(width, height, channels, pixels, filters):
    """Hand-build a PNG whose scanlines use the given filter types, by
    applying the spec's forward filters to raw rows. Exercises decode
    paths the builtin encoder (filter 0 only) never emits."""
    import struct
    import zlib

    from xorbits_sql_spark.multimodal.png import _SIGNATURE, _chunk, _paeth

    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y, ftype in zip(range(height), filters):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(ftype)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] - a
            elif ftype == 2:
                v = line[i] - b
            elif ftype == 3:
                v = line[i] - ((a + b) >> 1)
            else:
                v = line[i] - _paeth(a, b, c)
            raw.append(v & 0xFF)
        prev = line
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_channel_counts():
    from xorbits_sql_spark.multimodal.png import decode_png, encode_png

    import hashlib as _h

    for ch in (1, 2, 3, 4):
        w, h = 5, 3
        pixels = bytes(
            _h.md5(bytes([ch, i])).digest()[0] for i in range(w * h * ch)
        )
        png = encode_png(w, h, ch, pixels)
        assert decode_png(png) == (w, h, ch, pixels)


def test_png_decode_every_filter_type():
    from xorbits_sql_spark.multimodal.png import decode_png

    w, h, ch = 4, 5, 3
    pixels = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
    png = _filtered_png(w, h, ch, pixels, filters=[0, 1, 2, 3, 4])
    assert decode_png(png) == (w, h, ch, pixels)


def test_png_crc_validation():
    import pytest as _pytest

    from xorbits_sql_spark.multimodal.png import PngError, decode_png, encode_png

    png = bytearray(encode_png(2, 2, 3, bytes(12)))
    png[-5] ^= 0xFF  # corrupt IEND CRC
    with _pytest.raises(PngError):
        decode_png(bytes(png))
    with _pytest.raises(PngError):
        decode_png(b"not a png at all")


def test_png_resize_nearest():
    from xorbits_sql_spark.multimodal.png import resize_nearest

    # 2x2 RGB -> 4x4: each source pixel becomes a 2x2 block
    px = bytes([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4])
    up = resize_nearest(px, 2, 2, 3, 4, 4)
    assert up[0:3] == bytes([1, 1, 1]) and up[9:12] == bytes([2, 2, 2])
    assert up[36:39] == bytes([3, 3, 3]) and up[45:48] == bytes([4, 4, 4])


def test_decode_image_real_png_path():
    from xorbits_sql_spark.multimodal.media import decode_image, resize_image
    from xorbits_sql_spark.multimodal.png import decode_png, encode_png

    png = encode_png(3, 2, 3, bytes([10, 20, 30]) * 6)
    got = decode_image(png)  # fake=False: REAL decode
    assert (got["width"], got["height"], got["channels"]) == (3, 2, 3)
    assert got["n_bytes"] == 18 and got["mean_byte"] == 20.0

    small = resize_image(png, 2, 1)  # real path: decode->resample->encode
    assert decode_png(small) == (2, 1, 3, bytes([10, 20, 30]) * 2)

    # JPEG-signature bytes route to the REAL baseline codec now
    # (multimodal/jpeg.py) — malformed ones raise its typed error...
    from xorbits_sql_spark.multimodal.jpeg import JpegError

    with pytest.raises(JpegError):
        decode_image(b"\xff\xd8\xff jpeg-ish")
    # ...and non-image bytes still hit the PIL/cv2 swap-in boundary
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a not supported")


def test_png_roundtrip_query_matches_oracle(spark, duck):
    from xorbits_sql_spark.queries import load_all

    from .oracle import compare, exact_match

    spec = load_all()["r90_png_decode_roundtrip"]
    sdf = spec.fn(spark, "/root/testdata/sf0.001").toPandas()
    con_sql = spec.oracle.replace("documents", "'/root/testdata/sf0.001/documents.parquet'")
    ddf = duck.execute(con_sql).fetchdf()
    assert not compare(sdf, ddf)
    assert exact_match(sdf, ddf)


# ---------------------------------------------------------------------------
# WAV codec (multimodal/wav.py): pure-stdlib RIFF PCM16


def test_wav_roundtrip_mono_stereo():
    from xorbits_sql_spark.multimodal.wav import decode_wav, encode_wav

    mono = [0, 100, -100, 32767, -32768]
    rate, ch, frames, out = decode_wav(encode_wav(16000, 1, mono))
    assert (rate, ch, frames, out) == (16000, 1, 5, mono)

    stereo = [1, -1, 2, -2, 3, -3]  # 3 frames interleaved
    rate, ch, frames, out = decode_wav(encode_wav(44100, 2, stereo))
    assert (rate, ch, frames, out) == (44100, 2, 3, stereo)


def test_wav_odd_data_padding():
    from xorbits_sql_spark.multimodal.wav import decode_wav, encode_wav

    # odd sample count -> odd data-chunk byte length is impossible for
    # 16-bit, but an odd *chunk* arises with an odd-size LIST chunk; the
    # decoder must honor the pad byte between chunks.
    wav = encode_wav(8000, 1, [5, 6, 7])
    # splice an odd-size junk chunk before data
    import struct

    head, rest = wav[:12], wav[12:]
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to 4
    spliced = b"RIFF" + struct.pack("<I", len(head[8:]) + len(junk) + len(rest) - 8 + 8) + head[8:12] + junk + rest[:]
    # rebuild with correct riff size
    body = head[8:12] + junk + rest
    spliced = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(spliced)[3] == [5, 6, 7]


def test_wav_malformed_and_unsupported():
    import struct

    import pytest

    from xorbits_sql_spark.multimodal.wav import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"nope")
    wav = encode_wav(8000, 1, [1, 2])
    with pytest.raises(ValueError):
        decode_wav(wav[:20])  # truncated
    # flip audio_format to 3 (IEEE float) -> unsupported, not garbage
    fmt_pos = wav.index(b"fmt ") + 8
    broken = wav[:fmt_pos] + struct.pack("<H", 3) + wav[fmt_pos + 2 :]
    with pytest.raises(NotImplementedError):
        decode_wav(broken)


def test_wav_resample_and_features():
    from xorbits_sql_spark.multimodal.wav import (
        audio_features,
        encode_wav,
        resample_nearest,
    )

    samples = [10, -20, 30, -40]
    feats = audio_features(encode_wav(8000, 1, samples))
    assert feats["duration_ms"] == 4 * 1000 // 8000
    assert feats["sample_sum"] == -20 and feats["abs_sum"] == 100 and feats["peak"] == 40
    assert resample_nearest(samples, 1, 4, 2) == [10, 30]
    assert resample_nearest([1, 2, 3, 4], 2, 2, 4) == [1, 2, 1, 2, 3, 4, 3, 4]


def test_decode_audio_routes_wav():
    import pytest

    from xorbits_sql_spark.multimodal import decode_audio
    from xorbits_sql_spark.multimodal.wav import encode_wav

    feats = decode_audio(encode_wav(8000, 1, [1, -1]))
    assert feats["n_frames"] == 2
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfbMP3FRAME")  # not RIFF -> explicit stub path
    fake = decode_audio(b"\xff\xfbMP3FRAME", fake=True)
    assert set(fake) >= {"sample_rate", "n_frames", "duration_ms"}


def test_png_zlib_bomb_rejected():
    """A tiny IDAT that decompresses to GBs must raise PngError at the
    bounded cap, never materialize the bomb (round-7 review)."""
    import struct
    import zlib

    from xorbits_sql_spark.multimodal.png import PngError, decode_png

    def chunk(t, body):
        return (
            struct.pack(">I", len(body))
            + t
            + body
            + struct.pack(">I", zlib.crc32(t + body))
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 50_000_000, 9)  # ~48 KB -> 50 MB
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    import pytest

    with pytest.raises(PngError, match="IDAT size mismatch"):
        decode_png(png)


def test_wav_zero_sample_rate_raises_value_error():
    import struct

    import pytest

    from xorbits_sql_spark.multimodal.wav import decode_wav, encode_wav

    wav = bytearray(encode_wav(8000, 1, [1, -1]))
    # fmt chunk sample_rate field sits at offset 24 in the canonical
    # RIFF layout encode_wav produces
    assert struct.unpack_from("<I", wav, 24)[0] == 8000
    struct.pack_into("<I", wav, 24, 0)
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(bytes(wav))


def test_media_udfs_tolerate_null_payloads(spark):
    """A NULL media payload yields NULL features / NULL media / zero
    frames — never a TypeError that aborts the job (round-7 review)."""
    import pandas as pd

    from xorbits_sql_spark.multimodal.media import (
        explode_frames,
        extract_media_features,
        transform_media,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "media": [b"payload", None]})
    )
    feats = extract_media_features(df).toPandas().set_index("id")
    assert feats.loc[1, "n_bytes"] == 7
    assert pd.isna(feats.loc[2, "n_bytes"])
    tr = transform_media(df, 4, 4).toPandas().set_index("id")
    assert tr.loc[1, "media"] is not None and tr.loc[2, "media"] is None
    fr = explode_frames(df, 3).toPandas()
    assert set(fr["id"]) == {1} and len(fr) == 3


def test_decode_image_orientation_key_schema_stable(spark):
    """decode_image returns 'orientation' on EVERY path (None outside
    JPEG) so pd.DataFrame over a mixed-codec batch gets a stable column
    set, and extract_media_features surfaces it as a typed column."""
    import pandas as pd

    from xorbits_sql_spark.multimodal.jpeg import encode_jpeg, make_exif_app1
    from xorbits_sql_spark.multimodal.png import encode_png

    png = encode_png(2, 2, 1, bytes(4))
    jpg = encode_jpeg(8, 8, 1, bytes([128]) * 64, quality=90)
    jpg_rot = jpg[:2] + make_exif_app1(6) + jpg[2:]
    assert decode_image(png)["orientation"] is None
    assert decode_image(jpg)["orientation"] is None  # untagged
    assert decode_image(jpg_rot)["orientation"] == 6
    assert decode_image(b"whatever", fake=True)["orientation"] is None
    # frame-building consumers: one column set across a mixed batch
    cols = {frozenset(decode_image(p).keys()) for p in (png, jpg, jpg_rot)}
    assert len(cols) == 1
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "media": [png, jpg_rot, None]})
    )
    feats = extract_media_features(df, fake=False).toPandas().set_index("id")
    assert "orientation" in feats.columns
    assert pd.isna(feats.loc[1, "orientation"])
    assert feats.loc[2, "orientation"] == 6
    assert pd.isna(feats.loc[3, "orientation"])
