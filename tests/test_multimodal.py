"""Multimodal plumbing (X5): magic-byte sniffing, Arrow-batched fake
decode, frame-sampling fan-out, real-decode stub contract."""

import pytest

from etl_ipl_data_analysis_pipeline_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    payloads = [
        ("img1.png", b"\x89PNG\r\n\x1a\n" + b"p" * 200),
        ("img2.jpg", b"\xff\xd8\xff\xe0" + b"j" * 300),
        ("clip.wav", b"RIFF" + b"w" * 400),
        ("blob.bin", b"\x00\x01\x02\x03" + b"b" * 100),
    ]
    binary_like = spark.createDataFrame(
        [(p, c, len(c)) for p, c in payloads], "path string, content binary, length long"
    )
    return multimodal.attach_metadata(binary_like)


def test_attach_metadata_sniffs_formats(media):
    fmts = {r["path"]: r["format"] for r in media.collect()}
    assert fmts == {
        "img1.png": "png",
        "img2.jpg": "jpeg",
        "clip.wav": "riff",
        "blob.bin": "unknown",
    }


def test_attach_metadata_ids_stable(media):
    a = {r["path"]: r["media_id"] for r in media.collect()}
    b = {r["path"]: r["media_id"] for r in media.collect()}
    assert a == b


def test_extract_features_fake_plumbing(media):
    out = multimodal.extract_features(media, fake=True, dim=8).collect()
    assert len(out) == 4
    for r in out:
        assert r["width"] >= 16 and r["height"] >= 16
        assert len(r["feature"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["feature"])


def test_extract_features_fake_deterministic(media):
    a = sorted((r["media_id"], tuple(r["feature"])) for r in
               multimodal.extract_features(media, fake=True).collect())
    b = sorted((r["media_id"], tuple(r["feature"])) for r in
               multimodal.extract_features(media.repartition(3), fake=True).collect())
    assert a == b  # stable across partitionings (crc32, not salted hash)


def test_real_decode_is_declared_stub(media):
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image(b"\x89PNG")


def test_sample_frames_fanout(media):
    frames = multimodal.sample_frames(media, every_n=1).collect()
    assert frames  # at least one frame per payload
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert idxs == sorted(idxs) and len(idxs) <= 8
