"""Index build pipeline — the Spark-native rebuild of ``galago build``.

Reference DAG (``core/.../tools/apps/BuildIndex.java:641-788``): parse ->
tokenize -> number -> fan-out extractors -> external sort -> single-threaded
part writers. Here the whole TupleFlow layer collapses into one declarative
DataFrame plan: Catalyst handles the sorts (shuffle), partial aggregation
(the Reducer), and column pruning; the writers become parquet tables sorted
so that min/max statistics give B-tree-like key-ordered seek.

Index layout (one directory = one index, the analog of DiskIndex's part
files, ``core/.../index/disk/DiskIndex.java:33-54``)::

    index_dir/
      names/       (doc, repo, path, commit, lang, sha256)      [names + reverse]
      lengths/     (doc, length)                                 [lengths part]
      postings/    (term, doc, tf, positions)   term-range sorted [postings part]
      termstats/   (term, df, cf, max_tf)                        [per-key stats]
      stats/       single row: CL, N, avgdl, vocab, max/min len  [field stats]
      blocks/      packed layer (built by index.packed)          [skip blocks]
      manifest.json  build params + per-part lineage (resume)

Scale notes (designed for 10^12 docs / 1000 executors, tested on local[32]):

- Doc numbering is a *distributed* dense rank: range-repartition by the
  sort key, count per partition (tiny driver-side cumsum), then
  offset + within-partition row_number. No global single-partition window.
- ``groupBy(term, doc)`` and ``groupBy(term)`` rely on Catalyst's partial
  (map-side) aggregation, which already neutralizes head-term skew for
  counting; explicit range-salting is applied only where no partial agg
  exists (packed block assembly, see index/packed.py).
- The postings table is written range-partitioned and sorted by
  ``(term, doc)`` so parquet row-group min/max stats prune term lookups
  (the analog of Galago's B-tree key seek + skip lists,
  ``PositionIndexWriter.java:360-386``).
"""

from __future__ import annotations

import json
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from galago_git_spark.functions.tokenize import tokenize_col, tokenize_pandas
from galago_git_spark.query.scoring import CollectionStats, TermStats

# serializes every read-modify-write of a manifest.json (concurrent part
# writers run on driver threads; the packed builder shares this lock)
MANIFEST_LOCK = threading.Lock()

PARTS = ("names", "lengths", "postings", "termstats", "stats")


def assign_doc_ids(
    docs: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    num_partitions: int | None = None,
    broadcast_max_rows: int | None = 4_000_000,
) -> DataFrame:
    """Deterministic dense doc ids: global rank over ``key_cols``.

    The analog of Galago's SequentialDocumentNumberer
    (``core/.../parse/SequentialDocumentNumberer.java``) but distributed:
    range-repartition on the key, then ``doc = partition_offset +
    within-partition rank``. The offsets pass collects one count per
    partition (P rows) — O(P) driver work, no global window, so the same
    ids come out at any cluster size (the north-rule requirement).

    The id join back onto the wide rows BROADCASTS the slim id table when
    the corpus (known exactly from the offsets pass) has at most
    ``broadcast_max_rows`` docs: every downstream part writer then streams
    the corpus once instead of shuffle-sorting it by the string key per
    part — the ids join was the widest repeated shuffle in the build. Past
    the threshold (or with ``None``) it stays a shuffle join: a 10^12-row
    id table cannot broadcast.
    """
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    # rank over a SLIM key-only projection: the range sort and the offsets
    # pass touch ~100 bytes/row instead of full rows (content is KB-scale
    # at 10^12 docs); ids then hash-join back onto the wide rows.
    keyed = (
        docs.select(*key_cols)
        .repartitionByRange(num_partitions, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        keyed.groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # duplicate-key guard: equal keys are range-colocated, so a
            # per-partition distinct count is a global uniqueness check
            # (piggybacked on the offsets pass — no extra job)
            F.count_distinct(*[F.col(c) for c in key_cols]).alias("dcnt"),
        )
        .collect()
    )
    dup = sum(r["cnt"] - r["dcnt"] for r in counts)
    if dup:
        raise ValueError(
            f"assign_doc_ids: {dup} duplicate {key_cols} corpus keys — the "
            "id join would cross-product; de-duplicate the corpus first"
        )
    cnt_by_pid = {r["_pid"]: r["cnt"] for r in counts}
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(cnt_by_pid):
        offsets[pid] = running
        running += cnt_by_pid[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    slim_ids = (
        keyed.join(offsets_df, "_pid")
        .withColumn("doc", F.col("_offset") + F.row_number().over(w) - 1)
        .drop("_pid", "_offset")
    )
    if broadcast_max_rows is not None and running <= broadcast_max_rows:
        slim_ids = F.broadcast(slim_ids)
    return docs.join(slim_ids, list(key_cols))


def tokenized_docs(docs_with_ids: DataFrame, tokenizer: str = "pandas") -> DataFrame:
    """Add a ``terms array<string>`` column. ``pandas`` (default) is the
    Arrow-vectorized UDF path — measured 5-10x faster than the native
    column expression AND it scales with cores (the JVM higher-order
    ``filter`` lambda runs interpreted, outside whole-stage codegen);
    identical output on both paths is asserted in tests."""
    if tokenizer == "native":
        terms = tokenize_col(F.col("content"))
    elif tokenizer == "pandas":
        terms = tokenize_pandas(F.col("content"))
    elif tokenizer == "unicode":
        from galago_git_spark.functions.tokenize import (
            tokenize_pandas_unicode,
        )

        terms = tokenize_pandas_unicode(F.col("content"))
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return docs_with_ids.withColumn("terms", terms)


def build_index(
    docs: DataFrame,
    index_dir: str,
    tokenizer: str = "pandas",
    positions: bool = True,
    fields: bool = False,
    field_formats: dict[str, str] | None = None,
    num_term_partitions: int | None = None,
    resume: bool = False,
    packed: bool = False,
    block_size: int | None = None,
    bucket_bits: int | None = None,
    id_col: str | None = None,
    stemmer: str | None = None,
    tag_fields: list[str] | None = None,
) -> dict:
    """Build all relational index parts under ``index_dir``.

    Returns the manifest dict (build params, per-part lineage rows, wall
    times). With ``resume=True``, parts already recorded in the manifest
    with a parquet ``_SUCCESS`` marker are skipped — the analog of
    TupleFlow's CheckpointedStageExecutor
    (``tupleflow/.../execution/CheckpointedStageExecutor.java``).

    ``stemmer`` (the SURVEY §2.2 term_transform hook) additionally writes
    a stemmed postings/termstats pair under ``postings.<name>`` /
    ``termstats.<name>`` — the ``BuildIndex.java:409-455`` stemmed-part
    stages (``postings.krovetz``/``postings.porter``); query routing then
    prefers the stemmed part (``DiskIndex.java:200-222``,
    ``TextPartAssigner.java``). Names resolve through
    ``functions.stem.get_stemmer`` ("porter2" built in; Krovetz excluded
    per the north rule; ``register_stemmer`` adds custom transforms).
    The stemmed part derives from the raw postings parquet — one
    Arrow-vectorized stem of the ``term`` column plus one re-aggregation
    shuffle over (stem, doc) — positions merged sorted, so window
    operators over the stemmed part see the same token coordinates.

    ``tag_fields`` switches the build to the TAG-AWARE token stream
    (functions/tagtok.py — TagTokenizer.java semantics: markup stripped,
    script/style dropped) and extracts the named tags' spans into the
    extents part plus a field-postings part, so ``term.title`` works on
    ``build --input-format trectext/html`` indexes exactly like the
    reference's whitelisted-tag fields. Mutually exclusive with the
    code-structural ``fields=True`` (one token geometry per index).
    """
    if tag_fields and fields:
        raise ValueError(
            "tag_fields and fields=True are mutually exclusive — an index "
            "has one token geometry (code-structural OR tag-span fields)"
        )
    if tokenizer not in ("pandas", "native", "unicode"):
        raise ValueError(
            f"unknown tokenizer {tokenizer!r}: 'pandas' (code-aware, "
            "default), 'native' (same rule, JVM expressions), or "
            "'unicode' (Unicode-word separators for non-Latin corpora)"
        )
    spark = docs.sparkSession
    if num_term_partitions is None:
        num_term_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    os.makedirs(index_dir, exist_ok=True)
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest: dict = {"params": {"tokenizer": tokenizer, "positions": positions}, "parts": {}}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    def done(part: str) -> bool:
        return (
            resume
            and part in manifest["parts"]
            and os.path.exists(os.path.join(index_dir, part, "_SUCCESS"))
        )

    def record(part: str, path: str, t0: float, rows: int | None = None) -> None:
        entry = {
            "path": path,
            "seconds": round(time.time() - t0, 3),
            "rows": rows,
            "lineage": part_lineage(path),
        }
        with MANIFEST_LOCK:
            # merge against the on-disk state: a concurrent writer (the
            # fused packed builder) may have added entries since our copy
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    on_disk = json.load(f)
                for k, v in on_disk.get("parts", {}).items():
                    manifest["parts"].setdefault(k, v)
            manifest["parts"][part] = entry
            with open(manifest_path, "w") as f:
                json.dump(manifest, f, indent=2)

    # No whole-corpus cache: each part is one streaming pass. The tokenize
    # UDF is cheap enough (Arrow-vectorized) that recomputation beats the
    # GC/memory pressure of caching (content + term arrays) — and at
    # 10^12 docs a corpus-sized cache is impossible anyway. `names` never
    # tokenizes; `lengths` derives from postings (length == sum of tfs —
    # every token is in exactly one posting).
    if id_col is not None:
        # identifier passthrough: the corpus already carries stable long
        # doc ids (e.g. the driver's ``documents.doc_id``) — skip the
        # distributed numbering rank; caller guarantees uniqueness
        numbered = docs.withColumn("doc", F.col(id_col).cast("long"))
    else:
        numbered = assign_doc_ids(docs)

    names_path = os.path.join(index_dir, "names")
    postings_path = os.path.join(index_dir, "postings")
    lengths_path = os.path.join(index_dir, "lengths")
    termstats_path = os.path.join(index_dir, "termstats")
    stats_path = os.path.join(index_dir, "stats")

    # names part (+ reverse map: one table serves both directions in Spark)
    def write_names() -> None:
        t0 = time.time()
        # slim rows cached so repartitionByRange's sampling pass doesn't
        # re-run the corpus scan + content sha256 (same pattern as the
        # postings write below)
        nframe = numbered.select(
            "doc", "repo", "path", "commit", "lang",
            F.sha2(F.col("content"), 256).alias("sha256"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            (
                nframe.repartitionByRange(num_term_partitions, "doc")
                .sortWithinPartitions("doc")
                .write.mode("overwrite")
                .parquet(names_path)
            )
        finally:
            nframe.unpersist()
        record("names", names_path, t0)

    # postings part: (term, doc, tf[, positions]); 1-based positions.
    # Tokenization and per-doc term frequencies are fused in ONE Arrow UDF
    # pass (functions/tokenize.doc_term_freqs) — counts are final per
    # batch, so the only shuffle is the term-range write layout.
    def write_postings() -> None:
        from galago_git_spark.functions.tokenize import doc_term_freqs

        t0 = time.time()
        if tag_fields:
            from galago_git_spark.functions.tagtok import (
                tagged_postings_stream,
            )

            schema = "doc long, term string, tf long"
            if positions:
                schema += ", positions array<int>"
            postings = numbered.select("doc", "content").mapInPandas(
                tagged_postings_stream(tuple(tag_fields), positions),
                schema=schema,
            )
        elif tokenizer == "native":
            # legacy explode + hash-agg path (kept for parity testing)
            toks = tokenized_docs(numbered, tokenizer)
            token_rows = toks.select(
                "doc", F.posexplode("terms").alias("pos0", "term")
            ).withColumn("pos", F.col("pos0") + 1).drop("pos0")
            aggs = [F.count(F.lit(1)).alias("tf")]
            if positions:
                aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
            postings = token_rows.groupBy("term", "doc").agg(*aggs)
        else:
            # "pandas" (code-aware, default) or "unicode" (non-Latin
            # corpora, e.g. Arabic builds) — same fused kernel either way
            postings = doc_term_freqs(
                numbered, positions=positions, tokenizer=tokenizer
            )
        cols = ["term", "doc", "tf"] + (["positions"] if positions else [])
        # persist the posting stream before the range write:
        # repartitionByRange's bound-sampling pass executes its child in
        # full, so without the cache the tokenize kernel (the most
        # expensive stage of the whole build) runs twice — once to sample
        # term bounds, once for real. With positions=True the cache is
        # NOT skinny — the positions arrays dominate the part's volume
        # (comparable to the tokenized corpus itself), which is why the
        # level is MEMORY_AND_DISK: position payloads spill rather than
        # evict-and-recompute. At cluster scale this is the same
        # materialize-sorted-runs tradeoff Galago's tupleflow sorter
        # makes on disk (Sorter.java flush runs) — transient storage of
        # roughly one extra copy of the biggest part.
        pframe = postings.select(*cols).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            (
                pframe.repartitionByRange(num_term_partitions, "term", "doc")
                .sortWithinPartitions("term", "doc")
                .write.mode("overwrite")
                .parquet(postings_path)
            )
        finally:
            pframe.unpersist()
        record("postings", postings_path, t0)

    # extents part: line-structural field spans (NumberedExtentExtractor /
    # WindowIndexWriter analog, ``index/disk/WindowIndexWriter.java:23-47``)
    def write_extents() -> None:
        from galago_git_spark.functions.fields import field_extents_col

        extents_path = os.path.join(index_dir, "extents")
        t0 = time.time()
        (
            numbered.select("doc", F.explode(field_extents_col(F.col("content"))).alias("ext"))
            .select("doc", "ext.field", "ext.begin", "ext.end")
            .repartitionByRange(num_term_partitions, "field", "doc")
            .sortWithinPartitions("field", "doc", "begin")
            .write.mode("overwrite")
            .parquet(extents_path)
        )
        record("extents", extents_path, t0)

    # field-scoped postings part — the InsideToFieldPartTraversal target
    # (``traversal/InsideToFieldPartTraversal.java``: #inside(#extents:t
    # #field:f) resolves to a direct field-part lookup when one was
    # built). (field, term, doc, tf, positions) with positions global
    # (document-coordinate), deduped across overlapping extents exactly
    # like the containment join it replaces.
    def write_fieldpostings() -> None:
        from galago_git_spark.functions.fields import field_extents_col

        fp_path = os.path.join(index_dir, "fieldpostings")
        t0 = time.time()
        toks = (
            numbered.select(
                "doc",
                F.posexplode(tokenize_pandas(F.col("content"))).alias(
                    "pos0", "term"
                ),
            )
            .withColumn("pos", F.col("pos0") + 1)
            .drop("pos0")
        )
        ext = numbered.select(
            "doc", F.explode(field_extents_col(F.col("content"))).alias("ext")
        ).select("doc", "ext.field", "ext.begin", "ext.end")
        part = (
            toks.join(ext, "doc")
            .filter((F.col("pos") >= F.col("begin")) & (F.col("pos") + 1 <= F.col("end")))
            .select("field", "term", "doc", "pos")
            # collect_set dedups positions matched by overlapping extents of
            # the same field INSIDE the aggregation — one shuffle instead of
            # a distinct-then-groupBy pair on the containment-join output
            .groupBy("field", "term", "doc")
            .agg(F.sort_array(F.collect_set("pos")).alias("positions"))
            .withColumn("tf", F.size("positions").cast("long"))
        )
        (
            part.repartitionByRange(num_term_partitions, "field", "term", "doc")
            .sortWithinPartitions("field", "term", "doc")
            .write.mode("overwrite")
            .parquet(fp_path)
        )
        record("fieldpostings", fp_path, t0)

    # typed fields part (FieldIndexWriter analog, ``index/disk/
    # FieldIndexWriter.java``; format validation ``BuildIndex.java:502-517``)
    def write_fields() -> None:
        from galago_git_spark.index.fieldindex import build_field_part

        fields_path = os.path.join(index_dir, "fields")
        t0 = time.time()
        (
            build_field_part(numbered, field_formats, doc_col="doc")
            .repartitionByRange(max(1, num_term_partitions // 4), "field", "doc")
            .sortWithinPartitions("field", "doc")
            .write.mode("overwrite")
            .parquet(fields_path)
        )
        record("fields", fields_path, t0)

    # tag-span extents part (TagTokenizer whitelisted tags -> the same
    # (doc, field, begin, end) shape as the code-structural extents)
    def write_tag_extents() -> None:
        from galago_git_spark.functions.tagtok import tagged_extents_stream

        extents_path = os.path.join(index_dir, "extents")
        t0 = time.time()
        (
            numbered.select("doc", "content")
            .mapInPandas(
                tagged_extents_stream(tuple(tag_fields)),
                schema="doc long, field string, begin int, end int",
            )
            .repartitionByRange(num_term_partitions, "field", "doc")
            .sortWithinPartitions("field", "doc", "begin")
            .write.mode("overwrite")
            .parquet(extents_path)
        )
        record("extents", extents_path, t0)

    # tagged field-postings part: derived from the WRITTEN postings and
    # extents parquet (containment join — identical semantics to the
    # query-side #inside join it replaces), so it joins wave 2 and never
    # re-tokenizes
    def write_tag_fieldpostings() -> None:
        fp_path = os.path.join(index_dir, "fieldpostings")
        t0 = time.time()
        post = spark.read.parquet(postings_path)
        ext = spark.read.parquet(os.path.join(index_dir, "extents"))
        pos = post.select(
            "term", "doc", F.explode("positions").alias("pos")
        )
        part = (
            pos.join(ext, "doc")
            .filter(
                (F.col("pos") >= F.col("begin"))
                & (F.col("pos") + 1 <= F.col("end"))
            )
            .groupBy("field", "term", "doc")
            .agg(F.sort_array(F.collect_set("pos")).alias("positions"))
            .withColumn("tf", F.size("positions").cast("long"))
        )
        (
            part.repartitionByRange(num_term_partitions, "field", "term", "doc")
            .sortWithinPartitions("field", "term", "doc")
            .write.mode("overwrite")
            .parquet(fp_path)
        )
        record("fieldpostings", fp_path, t0)

    # lengths part (DiskLengthsWriter analog): derived from postings —
    # length(doc) = sum of its tfs; zero-length docs filled from names.
    def write_lengths() -> None:
        t0 = time.time()
        post_lengths = (
            spark.read.parquet(postings_path)
            .groupBy("doc")
            .agg(F.sum("tf").cast("int").alias("length"))
        )
        (
            spark.read.parquet(names_path)
            .select("doc")
            .join(post_lengths, "doc", "left")
            .select("doc", F.coalesce("length", F.lit(0)).alias("length"))
            .repartitionByRange(num_term_partitions, "doc")
            .sortWithinPartitions("doc")
            .write.mode("overwrite")
            .parquet(lengths_path)
        )
        record("lengths", lengths_path, t0)

    # per-term statistics (NodeStatistics: df, cf, maximumCount)
    def write_termstats() -> None:
        t0 = time.time()
        (
            spark.read.parquet(postings_path)
            .groupBy("term")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.sum("tf").alias("cf"),
                F.max("tf").alias("max_tf"),
            )
            .repartitionByRange(max(1, num_term_partitions // 4), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(termstats_path)
        )
        record("termstats", termstats_path, t0)

    # global field statistics — single tiny row (FieldStatistics analog);
    # CL/N derive from the lengths part (this is what makes scores
    # rank-identical to the reference, see query/scoring.py docstring).
    # vocab comes from the termstats parquet FOOTERS (part_lineage) — a
    # driver-side metadata read, not a Spark job.
    def write_stats() -> None:
        t0 = time.time()
        lineage = manifest["parts"].get("termstats", {}).get("lineage") or []
        vocab = sum(r["rows"] for r in lineage)
        if vocab == 0:
            # footer read failed or a pre-lineage manifest (resume over an
            # older build): pay one count job instead of silently
            # recording vocab_count=0
            vocab = spark.read.parquet(termstats_path).count()
        (
            spark.read.parquet(lengths_path)
            .agg(
                F.sum("length").alias("collection_length"),
                F.count(F.lit(1)).alias("document_count"),
                F.avg("length").alias("avg_doc_length"),
                F.max("length").alias("max_length"),
                F.min("length").alias("min_length"),
                F.count(F.when(F.col("length") > 0, 1)).alias("non_zero_len_doc_count"),
            )
            .withColumn("vocab_count", F.lit(vocab))
            .write.mode("overwrite")
            .parquet(stats_path)
        )
        record("stats", stats_path, t0)

    if field_formats:
        with MANIFEST_LOCK:
            manifest["params"]["field_formats"] = dict(field_formats)
    if tag_fields:
        with MANIFEST_LOCK:
            manifest["params"]["tag_fields"] = list(tag_fields)

    # Two dependency waves, each wave's independent parts written on
    # concurrent driver threads (Spark schedules their jobs side by side,
    # filling the cores a single job's low-parallelism phases leave idle —
    # this removed most of the serial small-part fraction that held build
    # scaling under the 0.8 bar in round 1):
    #   wave 1: names | postings | extents? | fields?   (corpus scans)
    #   wave 2: lengths | termstats                     (postings scans)
    #   then:   stats                                   (lengths + footers)
    wave1 = [("names", write_names), ("postings", write_postings)]
    if fields:
        wave1.append(("extents", write_extents))
        wave1.append(("fieldpostings", write_fieldpostings))
    if tag_fields:
        wave1.append(("extents", write_tag_extents))
    if field_formats:
        wave1.append(("fields", write_fields))
    # packed vbyte block layer, fused into wave 2: its lengths/avgdl
    # derive from the postings parquet directly (zero-length docs never
    # appear in blocks; document_count comes from the names FOOTERS), so
    # blocks build CONCURRENTLY with the lengths/termstats parts instead
    # of serially after them
    def write_blocks() -> None:
        from galago_git_spark.index.packed import (
            DEFAULT_BLOCK_SIZE,
            DEFAULT_BUCKET_BITS,
            build_packed,
        )

        post_lengths = (
            spark.read.parquet(postings_path)
            .groupBy("doc")
            .agg(F.sum("tf").cast("int").alias("length"))
            # one postings scan, not two: the cl aggregate below
            # materializes the cache the pack's broadcast join then reads
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_docs = sum(r["rows"] for r in manifest["parts"]["names"]["lineage"])
        cl = post_lengths.agg(F.sum("length")).collect()[0][0] or 0
        build_packed(
            spark,
            index_dir,
            block_size=block_size or DEFAULT_BLOCK_SIZE,
            bucket_bits=bucket_bits or DEFAULT_BUCKET_BITS,
            num_partitions=num_term_partitions,
            lengths=post_lengths,
            avgdl=cl / max(n_docs, 1),
            # the postings part just written has the sorted layout
            # (write_postings above) — zero-shuffle pack; n_docs feeds the
            # lengths-broadcast size guard without an extra stats read
            presorted=True,
            n_docs=n_docs,
        )
        post_lengths.unpersist()

    # stemmed postings + termstats parts (BuildIndex.java:139-161 stemmed
    # stages) — derived from the raw postings parquet, so they join wave 2
    def write_stemmed() -> None:
        from galago_git_spark.functions.stem import get_stemmer, stem_pandas

        get_stemmer(stemmer)  # fail fast on unknown names
        sp_path = os.path.join(index_dir, f"postings.{stemmer}")
        st_path = os.path.join(index_dir, f"termstats.{stemmer}")
        t0 = time.time()
        raw = spark.read.parquet(postings_path)
        stemmed = raw.withColumn("term", stem_pandas(F.col("term"), stemmer))
        if positions:
            merged = stemmed.groupBy("term", "doc").agg(
                F.sum("tf").alias("tf"),
                F.sort_array(F.flatten(F.collect_list("positions"))).alias(
                    "positions"
                ),
            )
        else:
            merged = stemmed.groupBy("term", "doc").agg(F.sum("tf").alias("tf"))
        (
            merged.repartitionByRange(num_term_partitions, "term", "doc")
            .sortWithinPartitions("term", "doc")
            .write.mode("overwrite")
            .parquet(sp_path)
        )
        record(f"postings.{stemmer}", sp_path, t0)
        t1 = time.time()
        (
            spark.read.parquet(sp_path)
            .groupBy("term")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.sum("tf").alias("cf"),
                F.max("tf").alias("max_tf"),
            )
            .repartitionByRange(max(1, num_term_partitions // 4), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(st_path)
        )
        record(f"termstats.{stemmer}", st_path, t1)

    if stemmer:
        with MANIFEST_LOCK:
            manifest["params"]["stemmer"] = stemmer

    wave2 = [("lengths", write_lengths), ("termstats", write_termstats)]
    if stemmer:
        wave2.append((f"postings.{stemmer}", write_stemmed))
    if tag_fields and positions:
        wave2.append(("fieldpostings", write_tag_fieldpostings))
    if packed:
        wave2.append(("blocks", write_blocks))
    for wave in (wave1, wave2):
        todo = [fn for part, fn in wave if not done(part)]
        if len(todo) == 1:
            todo[0]()
        elif todo:
            with ThreadPoolExecutor(max_workers=len(todo)) as pool:
                futures = [pool.submit(fn) for fn in todo]
                for f in futures:
                    f.result()
    if not done("stats"):
        write_stats()

    # packed layer for the stemmed part: the DEFAULT text part once a
    # stemmer is built (DiskIndex.java:200-222), so the WAND tier must
    # serve it too — packed after stats (reads lengths + stats parts)
    if packed and stemmer and not done(f"blocks.{stemmer}"):
        from galago_git_spark.index.packed import (
            DEFAULT_BLOCK_SIZE,
            DEFAULT_BUCKET_BITS,
            build_packed,
        )

        build_packed(
            spark,
            index_dir,
            block_size=block_size or DEFAULT_BLOCK_SIZE,
            bucket_bits=bucket_bits or DEFAULT_BUCKET_BITS,
            num_partitions=num_term_partitions,
            postings=spark.read.parquet(
                os.path.join(index_dir, f"postings.{stemmer}")
            ),
            out=f"blocks.{stemmer}",
            # write_stemmed lays the part out sorted, like write_postings
            presorted=True,
        )

    # the packed thread merges its entry straight into the on-disk
    # manifest; return the authoritative state
    with MANIFEST_LOCK:
        with open(manifest_path) as f:
            return json.load(f)


@dataclass
class Index:
    """Open index handle — the analog of DiskIndex + LocalRetrieval's
    cached statistics (``LocalRetrieval.java:61-88``)."""

    spark: SparkSession
    index_dir: str
    postings: DataFrame
    lengths: DataFrame
    names: DataFrame
    termstats: DataFrame
    collection_stats: CollectionStats
    extents: DataFrame | None = None
    # n -> ordered-shingle postings; ("uw", width) -> unordered pair part
    window_parts: dict | None = None
    priors: DataFrame | None = None  # (doc, prior) log-space static scores
    fields_part: DataFrame | None = None  # typed (doc, field, sval, nval, dval)
    field_formats: dict | None = None  # field -> string/int/long/float/double/date
    indicator: DataFrame | None = None  # (doc, indicator bool) part
    indicator_default: bool = False  # value for docs absent from the part
    field_postings: DataFrame | None = None  # (field, term, doc, tf, positions)
    # stemmer name -> {"postings": DF, "termstats": DF} (postings.<name>)
    stemmed_parts: dict | None = None
    # the DiskIndex default-part resolution result (DiskIndex.java:200-222):
    # "postings.<stemmer>" when a stemmed part exists, else "postings"
    default_text_part: str = "postings"
    # the transform already applied to THIS view's postings/termstats
    # (None = raw part) — routing guards on it to never double-stem
    stemmer_name: str | None = None
    # working-set retrieval (WorkingSetDocumentModel.java): when set,
    # EVERY doc in this frame is a scoring candidate (absent terms score
    # background mass) and the count-plane scans are In-pruned to it
    working_docs: DataFrame | None = None
    # stats redirection for restricted views: term/window statistics must
    # come from the FULL index (AnnotateCollectionStatistics reads global
    # stats regardless of the working set)
    stats_base: "Index | None" = None

    _termstats_cache: dict | None = None
    _node_stats_cache: dict | None = None  # str(node) -> TermStats

    def term_stats(self, terms: list[str]) -> dict[str, TermStats]:
        """Stats lookup for query terms — a pruned scan of the small
        termstats table, collected to the driver (the analog of
        AnnotateCollectionStatistics pinning stats onto scorer nodes).
        Memoized per Index handle: repeated terms across a query batch
        cost zero extra jobs; absent terms are cached as absent."""
        if self._termstats_cache is None:
            self._termstats_cache = {}
        ordered = list(dict.fromkeys(terms))
        missing = [t for t in ordered if t not in self._termstats_cache]
        if missing:
            rows = self.termstats.filter(F.col("term").isin(missing)).collect()
            found = {
                r["term"]: TermStats(r["term"], r["df"], r["cf"], r["max_tf"])
                for r in rows
            }
            for t in missing:
                self._termstats_cache[t] = found.get(t)
        return {
            t: self._termstats_cache[t]
            for t in ordered
            if self._termstats_cache[t] is not None
        }

    def stemmed_view(self, name: str) -> "Index":
        """An Index whose text plane IS the stemmed part — the engine-side
        analog of routing a query to ``postings.<stemmer>``
        (TextPartAssigner.assignPart). Lengths/names/extents/typed-fields/
        priors/indicator are shared (stemming changes neither doc lengths
        nor token coordinates); parts built from RAW tokens (window
        n-gram parts, field postings) are dropped so their rewrites can
        never silently mix vocabularies. Fresh stats caches."""
        import dataclasses

        if not self.stemmed_parts or name not in self.stemmed_parts:
            raise ValueError(
                f"no stemmed part {name!r}; built: "
                f"{sorted(self.stemmed_parts or {})}"
            )
        part = self.stemmed_parts[name]
        return dataclasses.replace(
            self,
            postings=part["postings"],
            termstats=part["termstats"],
            window_parts=None,
            field_postings=None,
            stemmer_name=name,
            _termstats_cache=None,
            _node_stats_cache=None,
        )


def open_index(spark: SparkSession, index_dir: str) -> Index:
    stats_row = spark.read.parquet(os.path.join(index_dir, "stats")).collect()[0]
    extents_path = os.path.join(index_dir, "extents")
    extents = (
        spark.read.parquet(extents_path) if os.path.exists(extents_path) else None
    )
    from galago_git_spark.index.window import load_window_parts

    priors_path = os.path.join(index_dir, "priors")
    priors = (
        spark.read.parquet(priors_path) if os.path.exists(priors_path) else None
    )
    fields_path = os.path.join(index_dir, "fields")
    fields_part = (
        spark.read.parquet(fields_path) if os.path.exists(fields_path) else None
    )
    field_formats = None
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest_json = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest_json = json.load(f)
    if fields_part is not None and manifest_json:
        field_formats = manifest_json["params"].get("field_formats")
    indicator_path = os.path.join(index_dir, "indicator")
    indicator = (
        spark.read.parquet(indicator_path)
        if os.path.exists(indicator_path)
        else None
    )
    indicator_default = False
    if indicator is not None and manifest_json:
        indicator_default = bool(
            manifest_json.get("parts", {})
            .get("indicator", {})
            .get("params", {})
            .get("default", False)
        )
    fp_path = os.path.join(index_dir, "fieldpostings")
    field_postings = (
        spark.read.parquet(fp_path) if os.path.exists(fp_path) else None
    )
    # stemmed parts: every postings.<name> dir with a matching termstats
    # (DiskIndex part discovery, DiskIndex.java:176-199)
    stemmed_parts: dict = {}
    for entry in sorted(os.listdir(index_dir)):
        if not entry.startswith("postings."):
            continue
        sname = entry.split(".", 1)[1]
        st_path = os.path.join(index_dir, f"termstats.{sname}")
        if os.path.exists(os.path.join(index_dir, entry, "_SUCCESS")) and \
                os.path.exists(st_path):
            stemmed_parts[sname] = {
                "postings": spark.read.parquet(os.path.join(index_dir, entry)),
                "termstats": spark.read.parquet(st_path),
            }
    default_text_part = "postings"
    if stemmed_parts:
        # the manifest's built stemmer wins; otherwise any single part
        built = (manifest_json or {}).get("params", {}).get("stemmer")
        pick = built if built in stemmed_parts else sorted(stemmed_parts)[0]
        default_text_part = f"postings.{pick}"
    return Index(
        stemmed_parts=stemmed_parts or None,
        default_text_part=default_text_part,
        extents=extents,
        priors=priors,
        fields_part=fields_part,
        field_formats=field_formats,
        indicator=indicator,
        indicator_default=indicator_default,
        field_postings=field_postings,
        window_parts=load_window_parts(spark, index_dir) or None,
        spark=spark,
        index_dir=index_dir,
        postings=spark.read.parquet(os.path.join(index_dir, "postings")),
        lengths=spark.read.parquet(os.path.join(index_dir, "lengths")),
        names=spark.read.parquet(os.path.join(index_dir, "names")),
        termstats=spark.read.parquet(os.path.join(index_dir, "termstats")),
        collection_stats=CollectionStats(
            collection_length=stats_row["collection_length"],
            document_count=stats_row["document_count"],
        ),
    )


def part_lineage(path: str) -> list[dict]:
    """Per-partition lineage rows for a written part: one entry per
    parquet file with its byte size and row count (from the parquet
    footer). The analog of TupleFlow's checkpoint metadata — resume
    decisions and audits read this instead of re-scanning data."""
    out: list[dict] = []
    try:
        import pyarrow.parquet as pq

        for name in sorted(os.listdir(path)):
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(path, name)
            out.append(
                {
                    "file": name,
                    "bytes": os.path.getsize(fp),
                    "rows": pq.ParquetFile(fp).metadata.num_rows,
                }
            )
    except Exception:
        pass
    return out


def build_prior_part(
    priors: DataFrame, index_dir: str, num_partitions: int | None = None
) -> str:
    """Write the document-prior part — the DocumentPriorWriter analog
    (``core/.../index/disk/DocumentPriorWriter.java``; built by
    ``tools/apps/BuildSpecialPart.java``). ``priors``: (doc, prior) with
    log-space scores. Returns the part path (also manifest-recorded)."""
    spark = priors.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    path = os.path.join(index_dir, "priors")
    t0 = time.time()
    (
        priors.select(F.col("doc").cast("long"), F.col("prior").cast("double"))
        .repartitionByRange(num_partitions, "doc")
        .sortWithinPartitions("doc")
        .write.mode("overwrite")
        .parquet(path)
    )
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest = {"params": {}, "parts": {}}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    manifest["parts"]["priors"] = {
        "path": path, "seconds": round(time.time() - t0, 3)
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def build_indicator_part(
    indicators: DataFrame,
    index_dir: str,
    default: bool = False,
    num_partitions: int | None = None,
) -> str:
    """Write the document-indicator part — the DocumentIndicatorWriter
    analog (``core/.../index/disk/DocumentIndicatorWriter.java:20-40``,
    reader default semantics ``DocumentIndicatorReader``): ``indicators``
    is (doc, indicator bool); docs absent from the part take ``default``
    at query time (#indicator, executor.compile_indicator)."""
    spark = indicators.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    path = os.path.join(index_dir, "indicator")
    t0 = time.time()
    (
        indicators.select(
            F.col("doc").cast("long"), F.col("indicator").cast("boolean")
        )
        .repartitionByRange(num_partitions, "doc")
        .sortWithinPartitions("doc")
        .write.mode("overwrite")
        .parquet(path)
    )
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest = {"params": {}, "parts": {}}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    manifest["parts"]["indicator"] = {
        "path": path, "seconds": round(time.time() - t0, 3),
        "params": {"default": default},
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def build_conflation_part(
    spark: SparkSession,
    index_dir: str,
    stemmer: str = "porter2",
    source: DataFrame | None = None,
    num_partitions: int | None = None,
) -> str:
    """Write the stemmer-conflation part: stemmed term -> sorted distinct
    surface forms observed in the corpus — the BuildStemmerConflation
    analog (``tools/apps/BuildStemmerConflation.java:70-118``: parse ->
    tokenize -> ConflationExtractor emits (stem(term), term) pairs ->
    ConflationReducer dedups -> ConflationIndexWriter groups values per
    key, ``parse/stem/ConflationExtractor.java:29-38``).

    Spark-first collapse: the extractor/sort/reducer pipeline is one
    vocabulary projection + one small groupBy. By default the vocabulary
    comes from the index's OWN raw postings part (``SELECT DISTINCT
    term``) — parquet column pruning reads just the ``term`` column, and
    the shuffle is vocab-sized (tiny next to the corpus). Pass ``source``
    (any (term) DataFrame, e.g. a freshly tokenized corpus) to conflate
    without an index. Output: ``conflation.<stemmer>/`` parquet
    (stem string, terms array<string> sorted), manifest-recorded.
    """
    from galago_git_spark.functions.stem import get_stemmer, stem_pandas

    get_stemmer(stemmer)  # fail fast on unknown names
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if source is None:
        source = spark.read.parquet(os.path.join(index_dir, "postings"))
    vocab = source.select("term").distinct()
    conf = (
        vocab.withColumn("stem", stem_pandas(F.col("term"), stemmer))
        .where(F.col("stem").isNotNull())
        .groupBy("stem")
        .agg(F.sort_array(F.collect_set("term")).alias("terms"))
    )
    path = os.path.join(index_dir, f"conflation.{stemmer}")
    t0 = time.time()
    (
        conf.repartitionByRange(max(1, min(num_partitions, 8)), "stem")
        .sortWithinPartitions("stem")
        .write.mode("overwrite")
        .parquet(path)
    )
    manifest_path = os.path.join(index_dir, "manifest.json")
    with MANIFEST_LOCK:
        manifest = {"params": {}, "parts": {}}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
        manifest["parts"][f"conflation.{stemmer}"] = {
            "path": path,
            "seconds": round(time.time() - t0, 3),
            "params": {"stemmer": stemmer},
        }
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)
    return path
