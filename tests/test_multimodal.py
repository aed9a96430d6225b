"""Multimodal plumbing: binary asset normalization + Arrow-batched
mapInPandas feature extraction (decode kernel stubbed, Spark shape real)."""

from __future__ import annotations

import pytest

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    _decode_kernel,
    binary_assets,
    extract_features,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table


def test_binary_assets_metadata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    assets = binary_assets(docs, "doc_id", "text", "text")
    rows = assets.collect()
    assert len(rows) == 50
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray))
        assert r.n_bytes == len(r.payload)
        assert r.modality == "text"
        assert len(r.digest_md5) == 32


def test_extract_features_mapinpandas(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    assets = binary_assets(docs, "doc_id", "text", "text")
    feats = extract_features(assets)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.decode_status == "stubbed"
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-3  # histogram normalized

    # determinism: same input -> same features
    again = extract_features(assets).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_decode_kernel_rejects_unknown_modality():
    with pytest.raises(NotImplementedError):
        _decode_kernel(b"xx", "hologram")


def test_sample_frames_explodes_video_assets(spark, sf_dir):
    import hashlib

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.multimodal import FRAME_SCHEMA, sample_frames

    docs = load_table(spark, sf_dir, "documents").limit(10)
    videos = binary_assets(docs.filter("doc_id % 2 = 0"), "doc_id", "text", "video")
    texts = binary_assets(docs.filter("doc_id % 2 = 1"), "doc_id", "text", "text")
    frames = sample_frames(videos.unionByName(texts), n_frames=4)
    assert frames.schema == FRAME_SCHEMA
    rows = frames.collect()
    n_videos = videos.count()
    # 1->N: exactly n_frames rows per VIDEO asset; text assets yield none
    assert len(rows) == 4 * n_videos
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
        assert r.frame_md5 == hashlib.md5(bytes(r.frame_bytes)).hexdigest()
        assert r.decode_status == "stubbed"
    for aid, fr in by_asset.items():
        assert sorted(f.frame_index for f in fr) == [0, 1, 2, 3]
    # deterministic
    again = sample_frames(videos.unionByName(texts), n_frames=4).collect()
    assert sorted((r.asset_id, r.frame_index, r.frame_md5) for r in again) == sorted(
        (r.asset_id, r.frame_index, r.frame_md5) for r in rows
    )


def test_resize_images_transforms_only_images(spark, sf_dir):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.multimodal import RESIZED_SCHEMA, resize_images

    docs = load_table(spark, sf_dir, "documents").limit(10)
    images = binary_assets(docs.filter("doc_id % 2 = 0"), "doc_id", "text", "image")
    audio = binary_assets(docs.filter("doc_id % 2 = 1"), "doc_id", "text", "audio")
    out = resize_images(images.unionByName(audio), width=8, height=8)
    assert out.schema == RESIZED_SCHEMA
    rows = {r.asset_id: r for r in out.collect()}
    orig = {r.asset_id: r for r in images.unionByName(audio).collect()}
    assert set(rows) == set(orig)
    for aid, r in rows.items():
        assert (r.target_w, r.target_h) == (8, 8)
        assert r.n_bytes == len(r.payload)
        if r.modality == "image":
            assert r.decode_status == "stubbed" and r.n_bytes <= 64
        else:
            assert r.decode_status == "passthrough"
            assert bytes(r.payload) == bytes(orig[aid].payload)


# -- VERDICT r5 task 8: decoder registry + capability probe ----------------


def test_decoder_capabilities_reflect_environment():
    """In this environment no media libraries exist, so every modality
    serves the stub; with PIL/soundfile present the probe auto-registers
    real decoders (the skipping test below exercises that path)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import multimodal as mm

    caps = mm.decoder_capabilities()
    assert set(caps) == {"image", "audio", "video", "text"}
    try:
        import PIL  # noqa: F401

        assert caps["image"] == "registered"
    except ImportError:
        assert caps["image"] == "stubbed"


def test_registered_decoder_reaches_executors_by_value(spark):
    """A decoder registered at plan time must apply inside mapInPandas
    (snapshot-by-value, not worker-side module state)."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import multimodal as mm

    mm.register_decoder("image", lambda payload: [float(len(payload))])
    try:
        assets = mm.binary_assets(
            spark.createDataFrame([(1, bytearray(b"abcd"))], "id long, data binary"),
            "id", "data", "image",
        )
        row = mm.extract_features(assets).collect()[0]
        assert row.decode_status == "decoded"
        assert row.feature == [4.0]
    finally:
        mm.unregister_decoder("image")
        mm._probe_optional_decoders()  # restore whatever the env provides


def test_failing_decoder_degrades_to_stub_not_crash(spark):
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import multimodal as mm

    def bad(payload):
        raise ValueError("corrupt asset")

    mm.register_decoder("image", bad)
    try:
        assets = mm.binary_assets(
            spark.createDataFrame([(1, bytearray(b"abcd"))], "id long, data binary"),
            "id", "data", "image",
        )
        row = mm.extract_features(assets).collect()[0]
        assert row.decode_status == "decode_error"
        assert len(row.feature) == 8  # stub feature stands in
    finally:
        mm.unregister_decoder("image")
        mm._probe_optional_decoders()


def test_real_pil_decoder_when_library_present(spark):
    """Capability test: runs only where PIL exists (skips cleanly here)."""
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    from aws_glue_streaming_etl_with_apache_hudi_spark.operators import multimodal as mm

    buf = io.BytesIO()
    Image.new("L", (16, 16), color=128).save(buf, format="PNG")
    assets = mm.binary_assets(
        spark.createDataFrame([(1, bytearray(buf.getvalue()))], "id long, data binary"),
        "id", "data", "image",
    )
    row = mm.extract_features(assets).collect()[0]
    assert row.decode_status == "decoded"
    assert row.feature == [round(128 / 255.0, 6)] * 8
