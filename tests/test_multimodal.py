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
