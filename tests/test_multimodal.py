"""Multimodal plumbing tests: schema, batch shape, and partition flow
are real; the codec is the deterministic stub (no image libs in the
container — SURVEY §2.14)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gather_datawarehouse_sync_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    fake_image_decode,
    media_from_files,
    real_image_decode,
    resize_stub,
    sample_frames,
)


@pytest.fixture()
def media(spark, tmp_path):
    payloads = {
        "pics/a.png": b"\x89PNG-fake-bytes-a",
        "pics/b.jpg": b"\xff\xd8-fake-bytes-b",
        "clips/c.mp4": b"\x00" * 3000,
        "notes/d.txt": b"plain",
    }
    for rel, data in payloads.items():
        p = tmp_path / rel
        p.parent.mkdir(exist_ok=True)
        p.write_bytes(data)
    scan = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(str(tmp_path))
    )
    return media_from_files(scan), payloads


def test_media_schema_and_kind(media):
    df, payloads = media
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.png"]["kind"] == "image"
    assert rows["c.mp4"]["kind"] == "video"
    assert rows["d.txt"]["kind"] == "binary"
    a = rows["a.png"]
    assert bytes(a["content"]) == payloads["pics/a.png"]
    assert a["meta"]["size"] == len(payloads["pics/a.png"])
    assert a["meta"]["md5"] == hashlib.md5(payloads["pics/a.png"]).hexdigest()


def test_metadata_query_prunes_payload_column(media):
    from gather_datawarehouse_sync_spark.plans import read_schemas

    df, _ = media
    # a query over non-payload columns must not read payload bytes
    # (meta.md5 is payload-derived, so selecting *it* would — by design)
    raw_only = df.select("path", "kind")
    schemas = read_schemas(raw_only)
    assert schemas and "content" not in schemas[0]


def test_extract_image_features_stub(media):
    df, payloads = media
    feats = {r["media_id"]: r for r in extract_image_features(df).collect()}
    # only image rows decoded
    assert len(feats) == 2
    expect = fake_image_decode(payloads["pics/a.png"])
    ids = {
        r["media_id"]: r["path"].rsplit("/", 1)[-1]
        for r in df.select("media_id", "path").collect()
    }
    a_id = next(k for k, v in ids.items() if v == "a.png")
    got = feats[a_id]
    assert (got["width"], got["height"], got["channels"]) == (
        expect["width"],
        expect["height"],
        expect["channels"],
    )
    assert abs(got["mean_luma"] - expect["mean_luma"]) < 1e-9


def test_extract_image_features_drops_corrupt(spark):
    rows = [
        {"media_id": 1, "path": "x.png", "kind": "image", "content": b"good-bytes",
         "meta": {"size": 10, "md5": "m", "mime": "application/png"}},
        {"media_id": 2, "path": "y.png", "kind": "image", "content": b"",
         "meta": {"size": 0, "md5": "m", "mime": "application/png"}},
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_image_features(df).collect()
    # empty payload raises in the decoder → row dropped, job survives
    assert [r["media_id"] for r in out] == [1]


def test_extract_respects_partitioning(media):
    df, _ = media
    out = extract_image_features(df.repartition(4))
    assert out.count() == 2  # partition layout never changes results


def test_sample_frames_bounded_expansion(media):
    df, payloads = media
    frames = sample_frames(df, every_n_bytes=1024, max_frames=8).collect()
    # 3000-byte clip at 1024-byte stride → 2 full frames (floor division)
    assert len(frames) == 2
    assert [f["frame_idx"] for f in frames] == [0, 1]
    assert frames[0]["frame_size"] == 1024
    # deterministic slicing: frame md5 = md5 of the payload slice
    want = hashlib.md5(payloads["clips/c.mp4"][:1024]).hexdigest()
    assert frames[0]["frame_md5"] == want
    # non-positive knobs would make sequence(0, n_frames-1) descend and
    # emit phantom frames — refused loudly instead
    import pytest

    with pytest.raises(ValueError, match="positive"):
        sample_frames(df, max_frames=0)
    with pytest.raises(ValueError, match="positive"):
        sample_frames(df, every_n_bytes=0)


def test_resize_stub_schema_and_passthrough(media):
    df, payloads = media
    out = resize_stub(df, 224, 224)
    assert out.columns == ["media_id", "content", "width", "height"]
    rows = out.collect()
    assert len(rows) == 4
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)


def test_real_decoder_gated_behind_import(spark):
    # container ships no PIL: the real slot must fail loudly and name the fix
    with pytest.raises((NotImplementedError, Exception)):
        real_image_decode(b"\x89PNG\r\n\x1a\n")


def test_extract_audio_features_stub(spark, tmp_path):
    from gather_datawarehouse_sync_spark.operators.multimodal import (
        extract_audio_features,
        fake_audio_decode,
        media_from_files,
    )

    payloads = {"a.wav": b"RIFF-fake-aud-a", "b.mp3": b"ID3-fake-aud-b", "c.txt": b"x"}
    for rel, data in payloads.items():
        (tmp_path / rel).write_bytes(data)
    media = media_from_files(
        spark.read.format("binaryFile").load(str(tmp_path))
    )
    rows = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    # only the two audio-kind files decode; values match the stub exactly
    assert len(rows) == 2
    ids = {
        r["media_id"]: r["path"].rsplit("/", 1)[-1]
        for r in media.filter(F.col("kind") == "audio").select("media_id", "path").collect()
    }
    for mid, name in ids.items():
        want = fake_audio_decode(payloads[name])
        got = rows[mid]
        assert (got["duration_ms"], got["sample_rate"], got["channels"], got["rms"]) == (
            want["duration_ms"], want["sample_rate"], want["channels"], want["rms"],
        )


def test_sample_frames_null_and_empty_payloads_emit_no_rows(spark):
    """A null- or zero-byte-payload video must emit NO frame rows:
    `greatest` skips nulls, so the unguarded n_frames would read
    greatest(null, 1) = 1 and fabricate a phantom frame (r17 review
    find)."""
    df = spark.createDataFrame(
        [(1, "video", None), (2, "video", b""), (3, "video", b"x" * 2048)],
        "media_id long, kind string, content binary",
    )
    rows = sample_frames(df, every_n_bytes=1024, max_frames=8).collect()
    assert {r["media_id"] for r in rows} == {3}
    assert len(rows) == 2  # 2048 bytes / 1024 = 2 full frames
