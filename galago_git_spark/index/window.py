"""Window (n-gram) index — the Spark rebuild of ``galago build-window``
(``core/.../tools/apps/BuildWindowIndex.java``, ``window/WindowProducer.java``):
materialize ordered windows of width w as index terms so that window
queries become direct posting lookups (the optimizer's
``WindowRewriteTraversal.java`` substitution — rule 11 in SURVEY §4.1).

Part layout: ``index_dir/window.od1.<n>/`` holding ``postings``
(term=joined shingle, doc, tf) and ``termstats``, same shapes as the main
postings part. Shingle terms are ``t1~t2~...`` (contiguous, ordered —
``#od:1`` semantics; the greedy OrderedWindowIterator loop for width 1
counts exactly the contiguous shingles, so a rewrite is result-identical —
tested).

``frequency_threshold`` drops rare shingles at build time
(BuildWindowIndex's ``threshold`` param): at web scale the bigram
vocabulary is pruned before the write shuffle by a partial count.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from galago_git_spark.functions.tokenize import _tokenize_series

SEP = "~"


def _shingle_stream(n: int):
    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            tok_lists = _tokenize_series(pdf["content"]).to_list()
            docs = pdf["doc"].to_numpy()
            out_docs, out_terms = [], []
            for d, toks in zip(docs, tok_lists):
                if len(toks) < n:
                    continue
                grams = [
                    SEP.join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                ]
                out_docs.append(np.full(len(grams), d))
                out_terms.append(np.asarray(grams, dtype=object))
            if not out_docs:
                continue
            df = pd.DataFrame(
                {"doc": np.concatenate(out_docs), "term": np.concatenate(out_terms)}
            )
            yield df.groupby(["doc", "term"], sort=False).size().reset_index(
                name="tf"
            )

    return fn


def build_window_postings(
    numbered_docs: DataFrame,
    index_dir: str,
    n: int = 2,
    frequency_threshold: int = 0,
    num_partitions: int | None = None,
) -> str:
    """numbered_docs: (doc, content, ...). Writes the window part and
    registers it in manifest.json; returns the part directory."""
    spark = numbered_docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.time()
    part = f"window.od1.{n}"
    part_dir = os.path.join(index_dir, part)

    grams = numbered_docs.select("doc", "content").mapInPandas(
        _shingle_stream(n), schema="doc long, term string, tf long"
    )
    if frequency_threshold > 1:
        keep = (
            grams.groupBy("term")
            .agg(F.sum("tf").alias("cf"))
            .filter(F.col("cf") >= frequency_threshold)
            .select("term")
        )
        grams = grams.join(keep, "term", "left_semi")
    (
        grams.select("term", "doc", "tf")
        .repartitionByRange(num_partitions, "term", "doc")
        .sortWithinPartitions("term", "doc")
        .write.mode("overwrite")
        .parquet(os.path.join(part_dir, "postings"))
    )
    (
        spark.read.parquet(os.path.join(part_dir, "postings"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        )
        .repartitionByRange(max(1, num_partitions // 4), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(part_dir, "termstats"))
    )

    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest = {"params": {}, "parts": {}}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    manifest["parts"][part] = {
        "path": part_dir,
        "seconds": round(time.time() - t0, 3),
        "n": n,
        "frequency_threshold": frequency_threshold,
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return part_dir


def load_window_parts(spark: SparkSession, index_dir: str) -> dict[int, DataFrame]:
    """n -> window postings DataFrame for every window part on disk."""
    out: dict[int, DataFrame] = {}
    if not os.path.isdir(index_dir):
        return out
    for name in os.listdir(index_dir):
        if name.startswith("window.od1."):
            try:
                n = int(name.rsplit(".", 1)[1])
            except ValueError:
                continue
            p = os.path.join(index_dir, name, "postings")
            if os.path.exists(p):
                out[n] = spark.read.parquet(p)
    return out
