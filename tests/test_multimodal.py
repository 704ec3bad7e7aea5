"""Multimodal plumbing: payload schema, Arrow-batched extraction, stub gating,
and the 1→N frame-explode shape."""

from __future__ import annotations

import hashlib

import pytest

from ds_ga1004_bigdata_project_spark.operators import multimodal as MM
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def payloads(spark):
    cat = Catalog(spark, SF_SMOKE)
    return MM.attach_payload(cat.documents.limit(30))


def test_payload_schema(spark, payloads):
    assert payloads.schema.simpleString() == (
        "struct<doc_id:bigint,modality:string,content:binary,"
        "meta:map<string,string>>")
    mods = {r["modality"] for r in payloads.select("modality").distinct().collect()}
    assert mods <= {"image", "audio", "video"}


def test_extract_features_matches_python_hash(spark, payloads):
    feats = {r["doc_id"]: r for r in MM.extract_features(payloads).collect()}
    src = {r["doc_id"]: r["content"] for r in payloads.collect()}
    for doc_id, content in src.items():
        b = bytes(content)
        assert feats[doc_id]["n_bytes"] == len(b)
        assert feats[doc_id]["digest"] == hashlib.md5(b).hexdigest()
        assert len(feats[doc_id]["feature"]) == 4


def test_real_decode_is_gated(spark, payloads):
    with pytest.raises(Exception) as ei:
        MM.extract_features(payloads, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real" in str(ei.value)


def test_resize_tags_meta(spark, payloads):
    out = MM.resize_stub(payloads, 224, 224).select("meta").first()
    assert out["meta"]["resize"] == "224x224"


def test_frame_sample_explode_shape(spark, payloads):
    frames = MM.frame_sample_stub(payloads)
    assert set(frames.columns) == {"doc_id", "modality", "frame_no", "frame_digest"}
    assert frames.count() >= payloads.count()  # 1→N explode (N=1 in the stub)
