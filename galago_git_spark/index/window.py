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


def _uw_pair_stream(width: int):
    """mapInPandas kernel: per doc, exact ``#uw:width`` PAIR counts under
    UnorderedWindowIterator semantics (``UnorderedWindowIterator.java:
    28-82``): the occurrence at position p pairs with the FIRST occurrence
    of each other term q in ``(p, p+width-1]``; summed over both directions
    this equals the query kernel's count
    (``functions/windows.unordered2_counts``) — which is what makes the
    ``#uw:w`` part rewrite result-identical.

    NOTE: this deliberately diverges from the reference's
    ``WindowProducer.extractUnorderedWindows`` (``WindowProducer.java:
    117-137``), which emits EVERY n-subset inside the span and therefore
    over-counts relative to the query-time iterator. We keep its key shape
    (lexically sorted terms, '~'-joined) but count with iterator semantics
    so the rewrite never changes query results. O(len * width) per doc,
    embarrassingly parallel over docs — the same build-side cost class as
    shingling."""

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            tok_lists = _tokenize_series(pdf["content"]).to_list()
            docs = pdf["doc"].to_numpy()
            rows_doc, rows_term, rows_tf = [], [], []
            for d, toks in zip(docs, tok_lists):
                length = len(toks)
                if length < 2:
                    continue
                cnt: dict[str, int] = {}
                for i in range(length - 1):
                    t = toks[i]
                    seen = {t}
                    for j in range(i + 1, min(i + width, length)):
                        q = toks[j]
                        if q in seen:
                            continue
                        seen.add(q)
                        key = t + SEP + q if t < q else q + SEP + t
                        cnt[key] = cnt.get(key, 0) + 1
                for key, c in cnt.items():
                    rows_doc.append(d)
                    rows_term.append(key)
                    rows_tf.append(c)
            if rows_doc:
                yield pd.DataFrame(
                    {"doc": rows_doc, "term": rows_term, "tf": rows_tf}
                )

    return fn


def _uw_tuple_stream(width: int, n: int, max_doc_candidates: int | None = None):
    """mapInPandas kernel for n>=3: per doc, exact ``#uw:width`` counts for
    every sorted n-tuple of distinct terms, computed by running the SAME
    n-ary merge loop the query side uses
    (``functions/windows.unordered_window_extents``,
    ``UnorderedWindowIterator.java:28-82``) — identity by construction.

    Candidate tuples: a matched window's min position is an occurrence of
    one of its terms and every term lies within ``[min, min+width)``, so
    every matched tuple is {toks[i]} + an (n-1)-subset of the distinct
    OTHER terms in ``toks[i:i+width]`` for some i. Enumerating those
    anchored subsets is O(len * C(width-1, n-1)) per doc — the same
    combinatorics as the reference's WindowProducer; unmatched candidates
    are dropped by tf=0. Build once, amortize over the query log.

    Cost profile (measured, sf0.01): n=3 w=12 is ~40 ms/doc and ~1k tuple
    rows/doc — inherently combinatorial, like the reference tool. Intended
    for targeted builds with ``frequency_threshold`` (which prunes the
    part but then disables the automatic rewrite) or over filtered
    corpora; the n=2 parts are the default scale path."""
    from itertools import combinations

    from galago_git_spark.functions.windows import (
        positions_to_extents,
        unordered_window_extents,
    )

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            tok_lists = _tokenize_series(pdf["content"]).to_list()
            docs = pdf["doc"].to_numpy()
            rows_doc, rows_term, rows_tf = [], [], []
            for d, toks in zip(docs, tok_lists):
                length = len(toks)
                if length < n:
                    continue
                pos: dict[str, list[int]] = {}
                for p, t in enumerate(toks):
                    pos.setdefault(t, []).append(p + 1)  # engine 1-based
                cands: set[tuple[str, ...]] = set()
                for i in range(length):
                    others = sorted(
                        {t for t in toks[i + 1 : i + width] if t != toks[i]}
                    )
                    if len(others) < n - 1:
                        continue
                    anchor = toks[i]
                    for combo in combinations(others, n - 1):
                        cands.add(tuple(sorted((anchor,) + combo)))
                    if (
                        max_doc_candidates is not None
                        and len(cands) > max_doc_candidates
                    ):
                        raise RuntimeError(
                            f"uw n={n} w={width} part build: doc {d} "
                            f"exceeds max_doc_candidates="
                            f"{max_doc_candidates} candidate tuples — the "
                            "n>=3 build is combinatorial (O(len * "
                            "C(width-1, n-1)) per doc). Raise the cap, "
                            "set a frequency_threshold, or build over a "
                            "filtered corpus."
                        )
                for combo in sorted(cands):
                    children = [
                        positions_to_extents(pos[t]) for t in combo
                    ]
                    tf = len(unordered_window_extents(children, width))
                    if tf > 0:
                        rows_doc.append(d)
                        rows_term.append(SEP.join(combo))
                        rows_tf.append(tf)
            if rows_doc:
                yield pd.DataFrame(
                    {"doc": rows_doc, "term": rows_term, "tf": rows_tf}
                )

    return fn


def _write_window_part(
    spark: SparkSession,
    grams: DataFrame,
    index_dir: str,
    part: str,
    meta: dict,
    frequency_threshold: int,
    num_partitions: int,
    t0: float,
) -> str:
    part_dir = os.path.join(index_dir, part)
    # persist the skinny gram stream: the window-extraction kernel is the
    # expensive stage, and without the cache it re-runs for the
    # frequency-threshold aggregate AND for repartitionByRange's
    # bound-sampling pass (each executes the child plan in full)
    from pyspark.storagelevel import StorageLevel

    grams = grams.select("term", "doc", "tf").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        if frequency_threshold > 1:
            keep = (
                grams.groupBy("term")
                .agg(F.sum("tf").alias("cf"))
                .filter(F.col("cf") >= frequency_threshold)
                .select("term")
            )
            out = grams.join(keep, "term", "left_semi")
        else:
            out = grams
        (
            out.repartitionByRange(num_partitions, "term", "doc")
            .sortWithinPartitions("term", "doc")
            .write.mode("overwrite")
            .parquet(os.path.join(part_dir, "postings"))
        )
    finally:
        grams.unpersist()
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
        "frequency_threshold": frequency_threshold,
        **meta,
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return part_dir


def build_window_postings(
    numbered_docs: DataFrame,
    index_dir: str,
    n: int = 2,
    frequency_threshold: int = 0,
    num_partitions: int | None = None,
) -> str:
    """Contiguous ordered (``#od:1``) n-gram part. numbered_docs:
    (doc, content, ...). Writes the part and registers it in
    manifest.json; returns the part directory."""
    spark = numbered_docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.time()
    grams = numbered_docs.select("doc", "content").mapInPandas(
        _shingle_stream(n), schema="doc long, term string, tf long"
    )
    return _write_window_part(
        spark, grams, index_dir, f"window.od1.{n}", {"n": n},
        frequency_threshold, num_partitions, t0,
    )


def build_unordered_window_postings(
    numbered_docs: DataFrame,
    index_dir: str,
    width: int = 8,
    n: int = 2,
    frequency_threshold: int = 0,
    num_partitions: int | None = None,
    max_doc_candidates: int | None = None,
) -> str:
    """Unordered window part (``#uw:width`` over ``n`` distinct bare terms
    becomes a direct posting lookup). The analog of ``galago build-window
    --ordered=false --n=N --width=w`` (``BuildWindowIndex.java:301-305``
    part naming ``uw.nN.w{w}``), counted with query-iterator semantics —
    see :func:`_uw_pair_stream` (n=2 fast path) and
    :func:`_uw_tuple_stream` (n>=3, exact n-ary merge loop).

    The n>=3 build is COMBINATORIAL — O(len * C(width-1, n-1)) candidate
    tuples per doc — so it REFUSES to run without an explicit cost bound:
    either ``frequency_threshold >= 2`` (prunes the written part, which
    also disables the automatic query rewrite for safety) or
    ``max_doc_candidates`` (a per-doc candidate cap; the kernel raises —
    never silently truncates — if any doc exceeds it). The n=2 parts are
    the default scale path."""
    if width < 2:
        raise ValueError(
            "unordered window parts need width >= 2 (width -1 / #intersect "
            "is whole-document and stays on the positional path)"
        )
    if n < 2:
        raise ValueError("unordered window parts need n >= 2")
    if n >= 3 and frequency_threshold <= 1 and max_doc_candidates is None:
        raise ValueError(
            f"n={n} unordered-window part builds are combinatorial "
            f"(O(len * C(width-1, n-1)) candidate tuples per doc — "
            "index/window._uw_tuple_stream). Pass frequency_threshold>=2 "
            "to bound the written part, or max_doc_candidates=<cap> to "
            "bound per-doc work (the kernel raises if a doc exceeds it); "
            "n=2 parts are the default scale path."
        )
    spark = numbered_docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.time()
    stream = (
        _uw_pair_stream(width)
        if n == 2
        else _uw_tuple_stream(width, n, max_doc_candidates)
    )
    grams = numbered_docs.select("doc", "content").mapInPandas(
        stream, schema="doc long, term string, tf long"
    )
    return _write_window_part(
        spark, grams, index_dir, f"window.uw.n{n}.w{width}",
        {"n": n, "width": width}, frequency_threshold, num_partitions, t0,
    )


def load_window_parts(spark: SparkSession, index_dir: str) -> dict:
    """Window postings DataFrames for every window part on disk that is
    safe for the AUTOMATIC query rewrite — parts built with
    ``frequency_threshold > 1`` drop rare grams, so rewriting a query
    through them would silently return empty for pruned windows; they are
    skipped here (still queryable explicitly via their parquet path).

    Keys: ``n`` (int) for contiguous ``window.od1.{n}`` parts,
    ``("uw", width)`` for unordered pair parts ``window.uw.n2.w{width}``,
    ``("uw", n, width)`` for n>=3 tuple parts ``window.uw.n{n}.w{width}``."""
    import re

    out: dict = {}
    if not os.path.isdir(index_dir):
        return out
    thresholds: dict[str, int] = {}
    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for pname, meta in json.load(f).get("parts", {}).items():
                thresholds[pname] = int(meta.get("frequency_threshold", 0) or 0)
    for name in os.listdir(index_dir):
        key = None
        if name.startswith("window.od1."):
            try:
                key = int(name.rsplit(".", 1)[1])
            except ValueError:
                continue
        else:
            m = re.fullmatch(r"window\.uw\.n(\d+)\.w(\d+)", name)
            if m:
                un, uw = int(m.group(1)), int(m.group(2))
                key = ("uw", uw) if un == 2 else ("uw", un, uw)
        if key is None or thresholds.get(name, 0) > 1:
            continue
        p = os.path.join(index_dir, name, "postings")
        if os.path.exists(p):
            out[key] = spark.read.parquet(p)
    return out
