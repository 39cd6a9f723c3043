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
