"""Multimodal plumbing tests: schema/batch shapes are real, the codec is a
deterministic stub (or NotImplementedError for the real path)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from galago_git_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text {i} " * (i + 1)) for i in range(12)],
        "doc_id long, text string",
    )
    return mm.synthetic_media(docs).persist()


def test_media_schema(media):
    # simpleString ignores nullability (select-derived columns vary there)
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_features_deterministic_and_correct(spark, media):
    feats = mm.media_features(media).collect()
    assert len(feats) == 12
    src = {r["doc"]: bytes(r["media"]) for r in media.collect()}
    for r in feats:
        want = mm._feature_from_payload(src[r["doc"]])
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert r["feature"] == pytest.approx(want, abs=1e-7)
        assert all(0.0 <= f < 1.0 for f in r["feature"])
    # stable across runs
    again = mm.media_features(media).collect()
    assert sorted((r["doc"], tuple(r["feature"])) for r in again) == sorted(
        (r["doc"], tuple(r["feature"])) for r in feats
    )


def test_resize_plumbing(spark, media):
    out = mm.resize_images(media.filter(F.col("kind") == "image"), 8, 6)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
        px = np.frombuffer(bytes(r["media"]), dtype=np.uint8)
        assert px.size == 8 * 6 * r["meta"]["channels"]


def test_frame_sampling_counts(spark, media):
    sampled = mm.sample_frames(media, every_n=5)
    got = {
        r["doc"]: r["n"]
        for r in sampled.groupBy("doc").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    metas = {
        r["doc"]: r["meta"]["n_frames"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert got.keys() == metas.keys()
    for d, nf in metas.items():
        assert got[d] == (max(nf - 1, 0)) // 5 + 1


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="decode"):
        mm.decode_media(b"bytes", {"width": 2, "height": 2, "channels": 3}, codec="real")


def test_fake_decode_pure_function():
    m = {"width": 4, "height": 3, "channels": 3, "sample_rate": 0, "n_frames": 0}
    a = mm.decode_media(b"same bytes", m)
    b = mm.decode_media(b"same bytes", m)
    assert a.shape == (3, 4, 3) and (a == b).all()
    c = mm.decode_media(b"other bytes", m)
    assert not (a == c).all()


def test_features_feed_simsearch(spark, media):
    """The extracted embeddings flow into the ANN operator unchanged."""
    from galago_git_spark.operators.simsearch import cosine_topk

    feats = mm.media_features(media).select(
        F.col("doc").alias("vec_id"), F.col("feature").alias("embedding")
    )
    q = feats.limit(1).collect()[0]
    top = cosine_topk(feats, list(q["embedding"]), k=3).collect()
    assert len(top) == 3
    assert top[0]["id"] == q["vec_id"]
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
