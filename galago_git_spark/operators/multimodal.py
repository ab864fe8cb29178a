"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched UDFs.

The Spark-side design is real and tested end-to-end: schemas, doc-range
partitioning, ``mapInPandas`` batch shapes, and the feature pipeline all
run; only the *codec* step (actual JPEG/PNG/PCM decode) is stubbed because
image/audio libraries are not available in this environment. Two codec
modes:

- ``codec="fake"`` (default): a deterministic pure function of the bytes
  (sha256-seeded) standing in for decode -> the whole pipeline is
  reproducible and oracle-checkable;
- ``codec="real"``: raises ``NotImplementedError`` with the exact place a
  PIL/libsndfile call plugs in.

Layout conventions (the analog of a training-data lake's media table)::

    media(doc long, kind string, media binary,
          meta struct<width int, height int, channels int,
                      sample_rate int, n_frames int>)

Feature extraction emits fixed-width ``array<float>`` embeddings that feed
the similarity-search operators (operators/simsearch.py) unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META, False),
    ]
)

FEATURE_DIM = 16


def _fake_pixels(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in for an image decode: a (h, w, c) uint8 array
    seeded by the payload hash. Pure function of (bytes, meta)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed)))
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def decode_media(payload: bytes, meta: dict, codec: str = "fake") -> np.ndarray:
    if codec == "fake":
        return _fake_pixels(
            payload, meta["width"] or 1, meta["height"] or 1, meta["channels"] or 1
        )
    raise NotImplementedError(
        "real media decode needs PIL/av/libsndfile (absent in this "
        "environment); plug the decoder in here — the surrounding Spark "
        "plumbing (schema, batching, partitioning) is codec-agnostic"
    )


def _feature_from_payload(payload: bytes) -> list[float]:
    """FEATURE_DIM floats, deterministic from the payload bytes: the first
    FEATURE_DIM*2 hex chars of sha256, each pair scaled to [0, 1). This is
    the oracle-friendly fake 'embedding' (DuckDB reproduces it with
    sha256()+substr)."""
    h = hashlib.sha256(payload).hexdigest()
    return [int(h[2 * i : 2 * i + 2], 16) / 256.0 for i in range(FEATURE_DIM)]


def media_features(media_df: DataFrame, codec: str = "fake") -> DataFrame:
    """(doc, kind, media, meta) -> (doc, kind, feature array<float>) via
    one Arrow pass: decode (stub) -> pool -> embed. Batch shape: each
    Arrow batch holds whole rows; payloads never leave the executor."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                _feature_from_payload(bytes(p)) for p in pdf["media"]
            ]
            if codec != "fake":
                # the real path would decode + pool pixels here
                for p, m in zip(pdf["media"], pdf["meta"]):
                    decode_media(bytes(p), m, codec)
            yield pd.DataFrame(
                {"doc": pdf["doc"], "kind": pdf["kind"], "feature": feats}
            )

    return media_df.mapInPandas(
        extract, schema="doc long, kind string, feature array<float>"
    )


def resize_images(media_df: DataFrame, width: int, height: int,
                  codec: str = "fake") -> DataFrame:
    """Image resize plumbing: decode (stub) -> nearest-neighbor resample ->
    re-encode as raw bytes. Deterministic under the fake codec."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_media, out_meta = [], []
            for p, m in zip(pdf["media"], pdf["meta"]):
                px = decode_media(bytes(p), m, codec)
                ys = (np.arange(height) * px.shape[0] // height).clip(0, px.shape[0] - 1)
                xs = (np.arange(width) * px.shape[1] // width).clip(0, px.shape[1] - 1)
                resized = px[ys][:, xs]
                out_media.append(resized.tobytes())
                out_meta.append(
                    {
                        "width": width, "height": height,
                        "channels": int(px.shape[2]),
                        "sample_rate": m["sample_rate"], "n_frames": m["n_frames"],
                    }
                )
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"], "kind": pdf["kind"],
                    "media": out_media, "meta": out_meta,
                }
            )

    return media_df.mapInPandas(work, schema=MEDIA_SCHEMA)


def sample_frames(media_df: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling plumbing: explode (doc, frame_no) rows for
    every n-th frame according to metadata — pure plan, no decode."""
    return (
        media_df.filter(F.col("kind") == "video")
        .select(
            "doc",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_no"),
        )
    )


def synthetic_media(docs: DataFrame, doc_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text table: payload =
    UTF-8 bytes of the text (an opaque blob as far as the pipeline is
    concerned), metadata from simple byte statistics. Lets every
    multimodal operator run + be oracle-checked without real media."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(doc_col) % 3 + 1).cast("int"),
    )
    n = F.length(F.coalesce(F.col(text_col), F.lit("")))
    return docs.select(
        F.col(doc_col).cast("long").alias("doc"),
        kind.alias("kind"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8").alias("media"),
        F.struct(
            (n % 64 + 1).cast("int").alias("width"),
            (n % 48 + 1).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (n % 100 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
