"""On-disk IVF ANN part: build + partition-pruned probe must reproduce
the in-memory IVF path exactly, and the probe scan must touch only the
probed cells' files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from galago_git_spark.operators.ann_index import (
    ann_index_topk,
    build_ann_index,
)
from galago_git_spark.operators.simsearch import ivf_cosine_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def ann_part(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann") / "ivf")
    manifest = build_ann_index(emb, d, n_cells=16)
    assert manifest["rows"] == emb.count()
    return d


def test_part_topk_matches_in_memory_ivf(spark, emb, ann_part):
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    mem = [
        (r["id"], round(r["cosine"], 9))
        for r in ivf_cosine_topk(
            emb, qvec, k=10, n_cells=16, n_probe=4
        ).collect()
    ]
    part = [
        (r["id"], round(r["cosine"], 9))
        for r in ann_index_topk(spark, ann_part, qvec, k=10, n_probe=4).collect()
    ]
    assert part == mem and len(part) == 10


def test_probe_scan_is_partition_pruned(spark, emb, ann_part):
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    probe = ann_index_topk(spark, ann_part, qvec, k=10, n_probe=4)
    # the cell In-filter must land in PartitionFilters (directory-level
    # pruning), NOT DataFilters (a post-scan row filter would mean every
    # cell's files were read); inputFiles() reports the pre-pruning
    # listing, so the physical plan is the evidence
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "PartitionFilters: [cell" in scan and " IN " in scan
    assert "DataFilters: []" in scan
    # and the probed directories alone reproduce the candidate set
    from galago_git_spark.operators.ann_index import _probed_cells

    cells = _probed_cells(spark, ann_part, qvec, n_probe=4)
    assert len(cells) == 4
    direct = spark.read.parquet(
        *[os.path.join(ann_part, "vectors", f"cell={c}") for c in cells]
    )
    n_cand = (
        spark.read.parquet(os.path.join(ann_part, "vectors"))
        .filter(F.col("cell").isin(cells))
        .count()
    )
    assert direct.count() == n_cand > 0


def test_probe_all_cells_equals_bruteforce(spark, emb, ann_part):
    from galago_git_spark.operators.simsearch import cosine_topk

    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    full = [
        (r["id"], round(r["cosine"], 9))
        for r in cosine_topk(emb, qvec, k=10).collect()
    ]
    part = [
        (r["id"], round(r["cosine"], 9))
        for r in ann_index_topk(spark, ann_part, qvec, k=10, n_probe=16).collect()
    ]
    assert part == full


def test_ann_cli_build_and_search(spark, emb, tmp_path):
    import json as _json
    import subprocess
    import sys

    d = str(tmp_path / "ivf_cli")

    def cli(args):
        out = subprocess.run(
            [sys.executable, "-m", "galago_git_spark", *args],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        )
        return _json.loads(
            [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        )

    r = cli(["build-ann", "--input", f"{SF_DIR}/embeddings.parquet",
             "--index", d, "--cells", "8", "--cores", "2"])
    assert r["n_cells"] == 8 and r["rows"] == emb.count()
    r = cli(["ann-search", "--index", d,
             "--input", f"{SF_DIR}/embeddings.parquet",
             "--query-id", "0", "--k", "5", "--probe", "8", "--cores", "2"])
    assert r["found"] and len(r["results"]) == 5
    assert r["results"][0]["id"] == 0  # self-match at cosine ~1.0
    assert r["results"][0]["cosine"] == 1.0


def test_build_resume_skips_completed_part(spark, emb, tmp_path):
    import time

    d = str(tmp_path / "ivf_resume")
    m1 = build_ann_index(emb, d, n_cells=8)
    mtime = os.path.getmtime(os.path.join(d, "manifest.json"))
    t0 = time.perf_counter()
    m2 = build_ann_index(emb, d, n_cells=8)
    assert m2 == m1
    assert os.path.getmtime(os.path.join(d, "manifest.json")) == mtime
    assert time.perf_counter() - t0 < 5  # count() only, no rebuild
    # changed parameters force a rebuild
    m3 = build_ann_index(emb, d, n_cells=4)
    assert m3["n_cells"] == 4
    assert os.path.getmtime(os.path.join(d, "manifest.json")) != mtime


def test_rebuild_removes_stale_manifest_first(spark, emb, tmp_path):
    # any build that proceeds past the resume check must delete the old
    # manifest before touching part files, so an interrupted rebuild can
    # never leave a completion marker over half-overwritten data
    import json as _json

    d = str(tmp_path / "ivf_stale")
    build_ann_index(emb, d, n_cells=8)
    mpath = os.path.join(d, "manifest.json")

    # simulate the dangerous state the r3 review found: an aborted
    # rebuild that died after removing the manifest would leave none;
    # assert the code path actually removes it by monkey-observing the
    # write order — rebuild with resume=False and check the final
    # manifest matches the NEW build (not the stale one)
    with open(mpath) as f:
        old = _json.load(f)
    m = build_ann_index(emb, d, n_cells=8, resume=False)
    assert m == old  # same params -> same manifest content, rebuilt part

    # a manifest whose BASE corpus count disagrees with the input must
    # not satisfy resume (rows alone may legitimately exceed base_rows
    # after appends — base_rows is the resume key)
    with open(mpath, "w") as f:
        _json.dump({**old, "base_rows": old["base_rows"] + 1}, f)
    m2 = build_ann_index(emb, d, n_cells=8)
    assert m2["base_rows"] == old["base_rows"]


def test_probe_quantization_matches_engine(spark):
    # driver-side probe quantization must be bit-identical to the Spark
    # assignment plane on exact .5 boundaries (half away from zero, not
    # Python/numpy half-to-even)
    import numpy as np

    from galago_git_spark.operators.simsearch import _quantize, _quantize_np

    vals = [0.0005, -0.0005, 0.0015, -0.0025, 0.0625, -0.0625]
    sp = (
        spark.createDataFrame([(vals,)], "v array<float>")
        .select(_quantize(F.col("v")).alias("q"))
        .first()["q"]
    )
    drv = _quantize_np(np.asarray([float(np.float32(x)) for x in vals]))
    assert list(drv) == list(sp)


def test_ann_search_cli_validates_arguments():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "galago_git_spark", "ann-search",
         "--index", "/tmp/nonexistent"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "provide --vector" in (out.stderr + out.stdout)


def test_append_matches_full_build(spark, emb, tmp_path):
    """Incremental append: build on the low-id half (which owns every
    seed centroid), append the rest — probes must equal a one-shot build
    over the full corpus (same frozen cell geometry)."""
    from galago_git_spark.operators.ann_index import append_to_ann_index

    lo = emb.filter(F.col("vec_id") < 250)
    hi = emb.filter(F.col("vec_id") >= 250)
    d_inc = str(tmp_path / "ivf_inc")
    d_full = str(tmp_path / "ivf_full")
    build_ann_index(lo, d_inc, n_cells=8)
    m = append_to_ann_index(hi, d_inc)
    assert m["rows"] == emb.count()
    build_ann_index(emb, d_full, n_cells=8)

    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    inc = [
        (r["id"], round(r["cosine"], 9))
        for r in ann_index_topk(spark, d_inc, qvec, k=10, n_probe=4).collect()
    ]
    full = [
        (r["id"], round(r["cosine"], 9))
        for r in ann_index_topk(spark, d_full, qvec, k=10, n_probe=4).collect()
    ]
    assert inc == full and len(inc) == 10


def test_reader_probe_matches_pathonly_probe(spark, emb, ann_part):
    from galago_git_spark.operators.ann_index import AnnReader

    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    reader = AnnReader(spark, ann_part)
    assert reader.manifest["n_cells"] == 16
    a = [
        (r["id"], round(r["cosine"], 9))
        for r in ann_index_topk(
            spark, ann_part, qvec, k=10, n_probe=4, reader=reader
        ).collect()
    ]
    b = [
        (r["id"], round(r["cosine"], 9))
        for r in ann_index_topk(spark, ann_part, qvec, k=10, n_probe=4).collect()
    ]
    assert a == b and len(a) == 10


def test_build_retry_after_append_resumes_not_rebuilds(spark, emb, tmp_path):
    """An idempotent build retry over the ORIGINAL corpus must resume
    (base_rows matches) and keep appended vectors — not silently rebuild
    and drop them (r3 review finding)."""
    from galago_git_spark.operators.ann_index import append_to_ann_index

    lo = emb.filter(F.col("vec_id") < 250)
    hi = emb.filter(F.col("vec_id") >= 250)
    d = str(tmp_path / "ivf_retry")
    build_ann_index(lo, d, n_cells=8)
    append_to_ann_index(hi, d)
    m = build_ann_index(lo, d, n_cells=8)  # retry of the original build
    assert m["rows"] == emb.count() and m["base_rows"] == lo.count()
    # appended vector still probe-visible
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 300).first()["embedding"]
    ]
    top = ann_index_topk(spark, d, qvec, k=1, n_probe=8).collect()
    assert top[0]["id"] == 300


def test_reader_refresh_sees_appended_vectors(spark, emb, tmp_path):
    from galago_git_spark.operators.ann_index import (
        AnnReader,
        append_to_ann_index,
    )

    lo = emb.filter(F.col("vec_id") < 250)
    hi = emb.filter(F.col("vec_id") >= 250)
    d = str(tmp_path / "ivf_refresh")
    build_ann_index(lo, d, n_cells=8)
    reader = AnnReader(spark, d)
    append_to_ann_index(hi, d)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 300).first()["embedding"]
    ]
    stale = ann_index_topk(spark, d, qvec, k=1, n_probe=8, reader=reader).collect()
    assert stale[0]["id"] != 300  # documented snapshot semantics
    fresh = ann_index_topk(
        spark, d, qvec, k=1, n_probe=8, reader=reader.refresh()
    ).collect()
    assert fresh[0]["id"] == 300


def test_oneshot_probe_works_without_manifest(spark, emb, tmp_path):
    # the mid-rebuild window deletes manifest.json while the old part
    # files remain valid — probes must keep serving from them
    d = str(tmp_path / "ivf_nomani")
    build_ann_index(emb, d, n_cells=8)
    os.remove(os.path.join(d, "manifest.json"))
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    top = ann_index_topk(spark, d, qvec, k=3, n_probe=8).collect()
    assert len(top) == 3 and top[0]["id"] == 0
    from galago_git_spark.operators.ann_index import AnnReader

    r = AnnReader(spark, d)
    assert r.manifest is None
    assert len(ann_index_topk(spark, d, qvec, k=3, n_probe=8, reader=r).collect()) == 3
