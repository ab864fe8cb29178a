#!/usr/bin/env python
"""Benchmark harness — the engine's TimedBatchSearch analog
(``core/.../tools/apps/TimedBatchSearch.java:114-221``).

Runs the headline pipeline at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``:

1. full index build from the ``documents`` table (relational parts +
   packed vbyte block layer) — reported as build seconds and docs/sec;
2. ranked retrieval (BM25 / Dirichlet / JM #combine top-10) over the
   built index — per-query wall seconds;
3. representative training-data operators (MinHash-LSH near-dup,
   brute-force ANN cosine top-k, token stats) straight off the tables.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ..., "build_docs_per_sec": ...}``.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("galago_git_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from galago_git_spark.index.build import build_index, open_index
    from galago_git_spark.plans import driver_queries as dq
    from galago_git_spark.query.executor import execute

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}

    def timed(name: str, fn):
        """One-shot timing — build/mutating stages only."""
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        return out

    n_runs = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))

    def timed3(name: str, fn):
        """Median-of-N timing for read-only query entries (VERDICT r3
        item 4: one-shot numbers could not separate host steal from plan
        regressions; N=5 default since r4 — this host's throttle spikes
        can hit 2 of 3 runs, see the 10.2s q_sdm_wand outlier in the
        session-4 log). All raw runs land in the ``runs`` field; the
        ``queries`` value is the median."""
        ts = []
        out = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            out = fn()
            ts.append(round(time.perf_counter() - t0, 4))
        runs[name] = ts
        # statistics.median, not sorted(ts)[n//2]: the latter is the
        # upper-middle element for even N (biased up under steal spikes)
        timings[name] = round(statistics.median(ts), 4)
        return out

    def cpu_burn() -> float:
        """Single-thread numpy burn (ms): a host-speed probe. Hypervisor
        steal inflates this the same way it inflates every query — read
        BENCH deltas against the calibration ratio, not raw."""
        import numpy as np

        a = np.random.default_rng(0).random(4_000_000)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                # elementwise ufuncs: single-threaded in numpy (no BLAS),
                # so this measures one core's real speed under steal
                float(np.sqrt(a).sum() + np.log1p(a).sum())
            ts.append(time.perf_counter() - t0)
        return round(sorted(ts)[1] * 1000, 2)

    calibration = {"cpu_burn_ms_start": cpu_burn()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.lit("corpus").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("text")), 256)
        .substr(1, 40)
        .alias("commit"),
        F.coalesce(F.col("lang"), F.lit("md")).alias("lang"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
    )
    n_docs = docs.count()

    tmp = tempfile.mkdtemp(prefix="bench_index_")
    index_dir = os.path.join(tmp, "idx")
    try:
        # 1. index build (relational parts + packed block layer in ONE
        # fused call: blocks build concurrently with lengths/termstats in
        # wave 2 — index/build.py), WITH positions: the full-featured
        # config (phrase/#sdm queries + the positional packed tier).
        # r1 reported build_index + build_packed separately; the fused
        # wall time here covers BOTH.
        timed(
            "build_index",
            lambda: build_index(docs, index_dir, positions=True, packed=True),
        )
        has_packed = True

        idx = open_index(spark, index_dir)
        # warm the tiny broadcast side once so query timings measure queries
        idx.collection_stats  # noqa: B018

        # 2. ranked retrieval over the built index
        queries = {
            "q_bm25_top10": ("#combine(#bm25(table) #bm25(row) #bm25(merge))", "bm25"),
            "q_dirichlet_top10": ("#combine(query scan)", "dirichlet"),
            "q_jm_top10": ("#combine(#jm(join) #jm(filter))", "jm"),
            "q_bm25_weighted": ("#combine:0=0.7:1=0.3(#bm25(hash) #bm25(table))", "bm25"),
        }
        for name, (q, scorer) in queries.items():
            timed3(
                name,
                lambda q=q, scorer=scorer: execute(
                    q, idx, k=10, default_scorer=scorer
                ).collect(),
            )

        if has_packed:
            from galago_git_spark.query.wand import PackedReader, wand_topk

            reader = PackedReader(spark, index_dir)
            # held-open service regime: resident bucket-partitioned
            # posting cache (size-guarded; cold fallback warms lengths)
            if not reader.enable_cogroup_cache():
                reader.lengths_bucketed.count()  # warm once
            timed3(
                "q_bm25_wand_top10",
                lambda: wand_topk(
                    spark, index_dir, ["table", "row", "merge"], k=10,
                    reader=reader,
                ).collect(),
            )
            # kept for round-over-round comparability with r2/r3 (same
            # regime as timed3's median now, recorded separately)
            timings["q_bm25_wand_top10_warm"] = timings["q_bm25_wand_top10"]
            # the north-rule metric verbatim: BM25 top-10 p50 over a
            # QUERY SET (12 distinct two/three-term queries, held-open
            # reader — the batch-search regime TimedBatchSearch reports)
            wand_qs = [
                ["table", "row"], ["merge", "scan"], ["query", "filter"],
                ["hash", "join"], ["data", "value"], ["sort", "group"],
                ["index", "stream"], ["batch", "window"], ["key", "part"],
                ["line", "order"], ["fast", "slow"], ["table", "row", "merge"],
            ]
            lats = []
            for terms in wand_qs:
                t0 = time.perf_counter()
                wand_topk(spark, index_dir, terms, k=10, reader=reader).collect()
                lats.append(time.perf_counter() - t0)
            lats.sort()
            timings["q_bm25_wand_p50_12q"] = round(
                (lats[5] + lats[6]) / 2, 4
            )
            # #sdm relational vs the positional packed kernel (kept for
            # tier comparison; the graded packed route is part-backed,
            # below, once the window block layers are built)
            timed3(
                "q_sdm_relational_top10",
                lambda: execute("#sdm(table row)", idx, k=10).collect(),
            )
            from galago_git_spark.query.wand import wand_sdm_topk

            timed3(
                "q_sdm_poswand_top10",
                lambda: wand_sdm_topk(
                    spark, index_dir, ["table", "row"], k=10, reader=reader
                ).collect(),
            )

        # window parts: build cost, then the same #uw:8 query through the
        # part rewrite vs the positional merge loop — the part path must
        # win at sf0.1 (VERDICT r2 item 4)
        uw_q = "#combine(#uw:8(table row))"
        timed3(
            "q_uw_positional_top10",
            lambda: execute(uw_q, idx, k=10).collect(),
        )
        from galago_git_spark.index.build import assign_doc_ids
        from galago_git_spark.index.window import (
            build_unordered_window_postings,
            build_window_postings,
        )

        numbered = assign_doc_ids(docs)
        timed(
            "build_uw_window_part",
            lambda: build_unordered_window_postings(
                numbered, index_dir, width=8
            ),
        )
        timed(
            "build_od_window_part",
            lambda: build_window_postings(numbered, index_dir, n=2),
        )
        idx_w = open_index(spark, index_dir)
        timed3(
            "q_uw_part_top10",
            lambda: execute(uw_q, idx_w, k=10).collect(),
        )
        # with BOTH parts on disk, #sdm(t1 t2) compiles to three pruned
        # posting lookups — zero positional joins (compare
        # q_sdm_relational_top10 above)
        timed3(
            "q_sdm_parts_top10",
            lambda: execute("#sdm(table row)", idx_w, k=10).collect(),
        )
        if has_packed:
            # the graded packed #sdm route (VERDICT r3 item 2): window
            # parts packed into block layers, od/uw children served as
            # posting leaves with exact block-max bounds — sound AND
            # selective, no position decode
            from galago_git_spark.index.packed import pack_window_parts
            from galago_git_spark.query.wand import wand_sdm_parts_topk

            timed(
                "pack_window_parts",
                lambda: pack_window_parts(spark, index_dir),
            )
            # one untimed warmup (part-blocks footer reads + plan codegen)
            # — the same held-open-reader regime the BM25 WAND entries
            # measure; steady-state is what the tier is for
            wand_sdm_parts_topk(
                spark, index_dir, ["merge", "scan"], k=10, reader=reader
            ).collect()
            timed3(
                "q_sdm_wand_top10",
                lambda: wand_sdm_parts_topk(
                    spark, index_dir, ["table", "row"], k=10, reader=reader
                ).collect(),
            )
            # the GRADED #sdm tier (VERDICT r4 item 4) is the routed one:
            # --wand cost-probes candidate volume and picks the cheaper
            # of {cogroup kernel, exhaustive part rewrite} per query —
            # at bench sf the probe picks the exhaustive rewrite (pure
            # JVM plan; the kernel's Python round-trip floor loses below
            # SDM_WAND_MIN_POSTINGS candidates). Probe decision +
            # threshold recorded in `calibration` below.
            from galago_git_spark.query.wand import (
                SDM_WAND_MIN_POSTINGS,
                sdm_kernel_pays_off,
            )

            kernel_route = sdm_kernel_pays_off(reader, ["table", "row"])
            calibration["sdm_route"] = {
                "kernel": bool(kernel_route),
                "min_postings": SDM_WAND_MIN_POSTINGS,
                "probe_df_sum": int(sum(
                    s.df for s in reader.term_stats(["table", "row"]).values()
                )),
            }
            timed3(
                "q_sdm_routed_top10",
                lambda: (
                    wand_sdm_parts_topk(
                        spark, index_dir, ["table", "row"], k=10,
                        reader=reader,
                    )
                    if kernel_route
                    else execute("#sdm(table row)", idx_w, k=10)
                ).collect(),
            )

        # whole-batch single-plan retrieval (12 queries, one job)
        from galago_git_spark.query.batch import batch_bm25_topk, queries_to_terms

        batch_q = [
            {"number": f"b{i}", "text": t}
            for i, t in enumerate(
                [
                    "#combine(table row)", "#combine(merge scan)",
                    "#combine(query filter)", "#combine(hash join)",
                    "#combine:0=0.7:1=0.3(data value)", "#combine(sort group)",
                    "#combine(index stream)", "#combine(batch window)",
                    "#combine(key part)", "#combine(line order)",
                    "#combine(fast slow)", "#combine(big small)",
                ]
            )
        ]
        qt = queries_to_terms(spark, batch_q)
        timed3("q_batch_plan_12q", lambda: batch_bm25_topk(idx, qt, k=10).collect())

        if has_packed:
            # whole-batch single-job block-max WAND (wand_batch_topk,
            # VERDICT r4 item 3): same 12 queries as the exhaustive plan
            # above, one cogroup job, rank-identical per qid to wand_topk
            from galago_git_spark.query.parser import parse
            from galago_git_spark.query.wand import (
                wand_batch_topk,
                wand_eligible,
            )

            wb = {
                q["number"]: wand_eligible(parse(q["text"]), "bm25")
                for q in batch_q
            }
            timed3(
                "q_batch_daat_12q",
                lambda: wand_batch_topk(
                    spark, index_dir, wb, k=10, reader=reader
                ).collect(),
            )

        # 3. training-data operators straight off the driver tables
        reg = dq.queries()
        for name in (
            "dedup_minhash_lsh",
            "dedup_paragraphs",
            "ann_cosine_topk",
            "text_token_counts",
        ):
            if name in reg:
                timed3(name, lambda name=name: reg[name](spark, sf_dir).collect())

        # 4. on-disk IVF ANN part: one-time build, then the probed query
        # reads n_probe/n_cells of the part via partition pruning —
        # compare q_ann_part_topk against the full-scan ann_cosine_topk
        from galago_git_spark.operators.ann_index import (
            AnnReader,
            ann_index_topk,
            build_ann_index,
        )

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
        ann_dir = os.path.join(tmp, "ann_ivf")
        timed(
            "build_ann_part",
            lambda: build_ann_index(emb, ann_dir, n_cells=16),
        )
        ann_reader = AnnReader(spark, ann_dir)  # daemon regime: one probe job
        timed3(
            "q_ann_part_topk",
            lambda: ann_index_topk(
                spark, ann_dir, qvec, k=10, n_probe=4, reader=ann_reader
            ).collect(),
        )

        # 5. raw-file ingestion plane: parse the corpus back out of
        # rendered trectext shards with the record-split reader (one task
        # per file-split — the 100 GB-shard shape), timing parse only
        from galago_git_spark.sources.formats import as_corpus, read_corpus_split

        shard_dir = os.path.join(tmp, "trectext")
        os.makedirs(shard_dir)
        rows = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        ).collect()
        shards: list[list[str]] = [[] for _ in range(8)]
        for r in rows:
            shards[int(r["doc_id"]) % 8].append(
                f"<DOC>\n<DOCNO>{r['doc_id']}</DOCNO>\n<TEXT>\n{r['text']}\n</TEXT>\n</DOC>\n"
            )
        for i, s in enumerate(shards):
            with open(os.path.join(shard_dir, f"part{i}.trectext"), "w") as f:
                f.write("".join(s))
        timed(
            "parse_trectext_split",
            lambda: as_corpus(read_corpus_split(spark, shard_dir)).count(),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    calibration["cpu_burn_ms_end"] = cpu_burn()
    total = round(sum(timings.values()), 4)
    build_sec = timings.get("build_index", 0.0)  # fused: includes packed
    result = {
        "metric": "index-build + BM25 top-10 pipeline wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "n_docs": n_docs,
        "build_docs_per_sec": round(n_docs / build_sec, 2) if build_sec else None,
        "cpus": cpus,
        # VERDICT r3 item 4: query entries are median-of-N (raw runs in
        # `runs`); cpu_burn_ms_* is a single-thread host-speed probe so
        # host steal is separable from plan regressions
        "timing": f"median{n_runs}",
        "runs": runs,
        "calibration": calibration,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
