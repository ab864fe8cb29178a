"""On-disk IVF ANN part: build once, probe with partition pruning.

The in-memory IVF path (:func:`~galago_git_spark.operators.simsearch.
ivf_cosine_topk`) recomputes the coarse-quantizer assignment on every
query — one full corpus scan per query. At 100 TB the right shape is the
classic inverted-file layout on disk: vectors grouped by their cell so a
query touches only its ``n_probe`` cells' files. This module writes that
layout as parquet partitioned by cell (the DiskIndex analog for the ANN
plane, mirroring how ``index/build.py`` persists the postings parts):

- ``<path>/centroids`` — (cent_id, cvec) quantized centroids (tiny);
- ``<path>/vectors`` — (id, vec) partitioned by ``cell=<cent_id>``
  directories, so a probed query reads ``n_probe / n_cells`` of the data
  via partition pruning (no filter ever touches the other cells' files);
- ``<path>/manifest.json`` — parameters + row counts for validation.

Query-time cell selection happens driver-side on the collected centroid
matrix (n_cells x dim int64 — same exact-integer dot and lowest-id
tie-break as assignment, so results are identical to the in-memory path
on every engine and cluster size). Cell keys are written as strings so
partition-column type inference can never disagree with the centroid id
type."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from galago_git_spark.operators.simsearch import (
    _assign_to,
    _quantize,
    cosine_topk,
    ivf_centroids,
)


def _assign_and_write(
    embeddings: DataFrame,
    cents: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    mode: str,
) -> None:
    """ONE corpus pass shared by build and append: vec rides the same
    Arrow batch the assignment reads (``carry=``), so the only shuffle is
    the repartition-by-cell write."""
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _quantize(F.col(vec_col)).alias("qvec"),
    )
    vectors = _assign_to(e, cents, carry=("vec",)).withColumn(
        "cell", F.col("cell").cast("string")
    )
    (
        vectors.repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(os.path.join(path, "vectors"))
    )


def build_ann_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    iterations: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    resume: bool = True,
) -> dict:
    """Build the IVF part under ``path``; returns the manifest dict.

    One assignment scan (broadcast centroids, exact int64 dot — zero
    shuffle) + one ``repartition(cell)`` write shuffle. Head-cell skew is
    bounded by the quantizer itself (a cell never exceeds its member
    count; for pathological corpora raise ``n_cells`` or refine with
    ``iterations``).

    The manifest is written LAST, so its presence marks a completed
    build; with ``resume=True`` (default) a re-run over the same base
    corpus and parameters returns the existing manifest without touching
    the part — INCLUDING a part that has since been appended to (the
    resume check compares ``base_rows``, not the append-inflated
    ``rows``, so an idempotent build retry never discards appended
    vectors). Any build that proceeds past the resume check deletes the
    old manifest FIRST, so an interrupted (re)build can never leave a
    manifest pointing at half-overwritten part files; a genuine rebuild
    (changed corpus or parameters) resets the part to exactly the given
    corpus, dropping prior appends by design."""
    n_rows = embeddings.count()
    mpath = os.path.join(path, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            existing = json.load(f)
        same = all(
            existing.get(k) == v
            for k, v in [
                ("type", "ivf"), ("n_cells", n_cells),
                ("iterations", iterations), ("id_col", id_col),
                ("vec_col", vec_col),
            ]
        ) and existing.get("base_rows", existing.get("rows")) == n_rows
        if resume and same:
            return existing
        os.remove(mpath)  # rebuilding: the old completion marker is a lie

    cents = ivf_centroids(embeddings, n_cells, iterations, id_col, vec_col)
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    _assign_and_write(embeddings, cents, path, id_col, vec_col, "overwrite")
    manifest = {
        "type": "ivf",
        "n_cells": n_cells,
        "iterations": iterations,
        "id_col": id_col,
        "vec_col": vec_col,
        "rows": n_rows,
        "base_rows": n_rows,
    }
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return manifest


def append_to_ann_index(
    embeddings: DataFrame,
    path: str,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> dict:
    """Append new vectors to an existing part — the ANN analog of the
    fulltext plane's incremental indexer. The STORED centroids assign the
    new batch (one broadcast scan, no re-clustering: cell geometry is
    frozen at build time, the standard IVF increment), rows land in their
    cell directories via parquet dynamic-partition append, and the
    manifest's total row count updates LAST (``base_rows`` stays at the
    original build's count, so an idempotent build retry still resumes
    cleanly; the part stays probe-consistent throughout because appends
    never overwrite).

    Column names default to the manifest's. The caller owns id
    uniqueness across appends (same contract as the fulltext plane's
    doc-id assignment): an id appended twice yields two rows in its cell
    and both surface in probes. A held-open :class:`AnnReader` snapshots
    the part's file listing at construction — call ``reader.refresh()``
    (or construct a new reader) to see appended vectors. Returns the
    updated manifest."""
    mpath = os.path.join(path, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    id_col = id_col or manifest["id_col"]
    vec_col = vec_col or manifest["vec_col"]
    spark = embeddings.sparkSession
    cents = spark.read.parquet(os.path.join(path, "centroids"))

    n_new = embeddings.count()
    _assign_and_write(embeddings, cents, path, id_col, vec_col, "append")
    manifest["rows"] = manifest["rows"] + n_new
    manifest.setdefault("base_rows", manifest["rows"] - n_new)
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return manifest


def _load_centroids(spark: SparkSession, path: str):
    """(cent_ids list, (n_cells, dim) int64 matrix) from the centroids
    part — one small parquet collect, nothing else."""
    import numpy as np

    rows = sorted(
        spark.read.parquet(os.path.join(path, "centroids")).collect(),
        key=lambda r: r["cent_id"],
    )
    cent_ids = [r["cent_id"] for r in rows]
    c_mat = np.stack([np.asarray(r["cvec"], dtype=np.int64) for r in rows])
    return cent_ids, c_mat


def _top_cells(cent_ids, c_mat, query_vec: list[float], n_probe: int) -> list[str]:
    """Top ``n_probe`` cell keys — driver-side exact int64 dots (dot
    desc, cent_id asc: the same order the assignment uses).
    ``_quantize_np``, NOT Python ``round()``: Spark/DuckDB round half
    away from zero while Python rounds half to even — a .5 boundary
    component would probe different cells than the engine assigned."""
    import numpy as np

    from galago_git_spark.operators.simsearch import _quantize_np

    q = _quantize_np(np.asarray([float(x) for x in query_vec]))
    dots = c_mat @ q
    order = sorted(range(len(cent_ids)), key=lambda i: (-dots[i], cent_ids[i]))
    return [str(cent_ids[i]) for i in order[:n_probe]]


class AnnReader:
    """Held-open handle on an IVF part — the ANN analog of the WAND
    tier's ``PackedReader``. Collects the tiny centroid matrix ONCE
    (n_cells x dim int64 on the driver) and keeps the vectors relation
    open, so each probe is a single partition-pruned Spark job instead of
    a centroid-read job followed by the scan. Use one reader per daemon /
    query batch; one-shot callers can pass ``path`` alone and pay the
    extra job.

    The reader SNAPSHOTS the part at construction (Spark caches the
    parquet file listing): vectors added by :func:`append_to_ann_index`
    afterwards are invisible until :meth:`refresh` or a new reader. The
    manifest is optional metadata — a reader constructed during a
    rebuild's manifest-free window still probes the old part files."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark, self.path = spark, path
        self.refresh()

    def refresh(self) -> "AnnReader":
        """Re-snapshot centroids, manifest, and the vectors file listing
        (call after :func:`append_to_ann_index`)."""
        mpath = os.path.join(self.path, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = None  # mid-rebuild window: part files still valid
        self.cent_ids, self.c_mat = _load_centroids(self.spark, self.path)
        self.vectors = self.spark.read.parquet(
            os.path.join(self.path, "vectors")
        )
        return self

    def probed_cells(self, query_vec: list[float], n_probe: int) -> list[str]:
        return _top_cells(self.cent_ids, self.c_mat, query_vec, n_probe)


def _probed_cells(
    spark: SparkSession, path: str, query_vec: list[float], n_probe: int
) -> list[str]:
    """One-shot cell selection: centroids collect only (no manifest read,
    no vectors listing)."""
    cent_ids, c_mat = _load_centroids(spark, path)
    return _top_cells(cent_ids, c_mat, query_vec, n_probe)


def ann_index_topk(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    reader: AnnReader | None = None,
) -> DataFrame:
    """(id, cosine) top-k from the on-disk part: exact cosine restricted
    to the ``n_probe`` best cells. The ``cell`` In-filter is a PARTITION
    filter — Spark lists only the probed directories, so the scan reads
    ``n_probe / n_cells`` of the part (assert ``PartitionFilters`` in
    ``.explain``). Results are identical to ``ivf_cosine_topk`` with the
    same parameters over the source table. Pass a held-open ``reader``
    in daemon/batch regimes so the probe is ONE Spark job."""
    if reader is None:
        cells = _probed_cells(spark, path, query_vec, n_probe)
        vecs = spark.read.parquet(os.path.join(path, "vectors")).filter(
            F.col("cell").isin(cells)
        )
    else:
        cells = reader.probed_cells(query_vec, n_probe)
        vecs = reader.vectors.filter(F.col("cell").isin(cells))
    return cosine_topk(vecs, query_vec, k=k, id_col="id", vec_col="vec")
