"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force cosine top-k: the correctness
  baseline. The scan is embarrassingly parallel and the top-k is a
  ``TakeOrderedAndProject`` (distributed heap), so this scales linearly —
  at 100 TB you bound it by partition pruning on a coarse filter first.
  The dot product defaults to a per-batch numpy matmul over Arrow
  (``impl="arrow"``): Spark's higher-order lambdas are interpreted per
  element, which measures slower and does not widen with vector width;
  ``impl="jvm"`` keeps the pure-Catalyst expression.
- :func:`lsh_hyperplane_buckets` — random-hyperplane (sign) LSH: the
  scale path. Planes are derived deterministically from md5 so the
  DuckDB oracle can reproduce them; dot products are computed on
  1e3-quantized integer embeddings so the bucket id is exact (no float
  sign ambiguity across engines).
- :func:`cosine_pairs` — brute-force near-dup pairs by cosine >=
  threshold (embedding-cosine dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from galago_git_spark.operators.hashing import md5_long


def _id_type(df: DataFrame, col: str) -> str:
    """DDL type of an id column — the Arrow kernels pass ids through
    untouched, so their output schemas must mirror the input's id type
    (string/int/long all legal) instead of assuming long."""
    return df.schema[col].dataType.simpleString()


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_scores_arrow(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cosine) for every row via one numpy matmul per Arrow batch.

    The scale path for the brute-force scan: Spark's higher-order
    ``aggregate``/``zip_with`` lambdas are interpreted per *element*
    (dim x 2 closure invocations per row), while this moves each batch
    across Arrow once and scores it as a single BLAS matmul. Stays
    embarrassingly parallel — no shuffle, the top-k downstream is still a
    TakeOrderedAndProject."""
    import numpy as np
    import pandas as pd

    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            dots = m @ q
            norms = np.sqrt((m * m).sum(axis=1))
            yield pd.DataFrame({"id": pdf[id_col], "cosine": dots / (norms * qn)})

    return embeddings.select(id_col, vec_col).mapInPandas(
        score, schema=f"id {_id_type(embeddings, id_col)}, cosine double"
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query_vec``.
    (id, cosine) — cosine desc, id asc tie-break.

    ``impl="arrow"`` (default) scores batches with a numpy matmul via
    ``mapInPandas``; ``impl="jvm"`` keeps the pure-Catalyst higher-order
    expression (no Python workers, but interpreted per element — measured
    slower and flat-scaling on wide vectors)."""
    if impl == "arrow":
        scored = cosine_scores_arrow(embeddings, query_vec, id_col, vec_col)
    else:
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        scored = embeddings.select(
            F.col(id_col).alias("id"),
            cosine_col(F.col(vec_col), q).alias("cosine"),
        )
    return scored.orderBy(F.col("cosine").desc(), F.col("id").asc()).limit(k)


def _pair_cosine_frame(
    pairs: DataFrame, threshold: float, impl: str = "arrow"
) -> DataFrame:
    """(id_a, id_b, va, vb) -> (id_a, id_b, cosine >= threshold) via a
    batch einsum per Arrow batch — the row-paired analog of
    :func:`cosine_scores_arrow` (the higher-order ``cosine_col`` form is
    interpreted per element). ``impl="jvm"`` keeps the pure-Catalyst
    expression (no Python workers) for cross-checking."""
    if impl == "jvm":
        return (
            pairs.select(
                "id_a",
                "id_b",
                cosine_col(F.col("va"), F.col("vb")).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
    import numpy as np
    import pandas as pd

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["va"]])
            b = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            cos = np.einsum("ij,ij->i", a, b) / (
                np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
            )
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"][keep],
                    "id_b": pdf["id_b"][keep],
                    "cosine": cos[keep],
                }
            )

    return pairs.select("id_a", "id_b", "va", "vb").mapInPandas(
        score,
        schema=(
            f"id_a {_id_type(pairs, 'id_a')}, "
            f"id_b {_id_type(pairs, 'id_b')}, cosine double"
        ),
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup.
    Brute force O(n^2): correct baseline; at scale, pre-bucket with
    :func:`lsh_hyperplane_buckets` and join within buckets."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return _pair_cosine_frame(
        a.crossJoin(b).filter(F.col("id_a") < F.col("id_b")), threshold, impl
    )


def _bucket_expr(q_col: Column, n_planes: int, dim: int, seed: str) -> Column:
    """Sign-LSH bucket id of a 1e3-quantized vector column: one bit per
    deterministic hyperplane. plane[p][d] = (md5_long(seed_p_d) % 2001)
    - 1000 — constant-folded by Catalyst; the dot is exact int64."""
    bucket = None
    for p in range(n_planes):
        coeffs = F.array(
            *[
                (
                    md5_long(F.lit(f"{seed}_{p}_{d}")) % F.lit(2001) - F.lit(1000)
                ).cast("long")
                for d in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(q_col, coeffs, lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p)
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def _plane_matrix(n_planes: int, dim: int, seed: str):
    """(dim, n_planes) int64 hyperplane coefficients — the driver-side
    mirror of ``md5_long(lit(f"{seed}_{p}_{d}")) % 2001 - 1000`` (same
    construction as :func:`~galago_git_spark.operators.dedup.minhash_coeffs`:
    hashlib md5 reproduces the engine/oracle hash bit-for-bit)."""
    import hashlib

    import numpy as np

    return np.array(
        [
            [
                int(hashlib.md5(f"{seed}_{p}_{d}".encode()).hexdigest()[:15], 16)
                % 2001
                - 1000
                for p in range(n_planes)
            ]
            for d in range(dim)
        ],
        dtype=np.int64,
    )


def _quantize_np(m):
    """numpy mirror of ``_quantize`` (Spark round = half away from zero;
    numpy's default rounds half to even, so do it sign-aware)."""
    import numpy as np

    v = m * 1000.0
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)


def lsh_hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "lsh",
    impl: str = "arrow",
) -> DataFrame:
    """(id, bucket): bucket = sign-bit string over deterministic
    hyperplanes. plane[p][d] = (md5_long(seed_p_d) % 2001) - 1000, an
    integer in [-1000, 1000]; embeddings are quantized to
    round(x * 1000)::long, so each dot product is exact int arithmetic —
    bit-identical across engines and cluster sizes.

    ``impl="arrow"`` (default) computes every plane's sign bit in one
    exact int64 matmul per Arrow batch; ``impl="jvm"`` keeps the
    constant-folded Catalyst expression (n_planes x dim interpreted
    lambda calls per row). Bucket ids are identical (parity-tested)."""
    if impl == "arrow":
        import numpy as np
        import pandas as pd

        planes = _plane_matrix(n_planes, dim, seed)
        weights = (1 << np.arange(n_planes, dtype=np.int64))

        def bucketize(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                dots = _quantize_np(m) @ planes  # exact int64
                bucket = ((dots > 0).astype(np.int64) * weights).sum(axis=1)
                yield pd.DataFrame(
                    {"id": pdf[id_col], "bucket": bucket.astype(np.int32)}
                )

        return embeddings.select(id_col, vec_col).mapInPandas(
            bucketize, schema=f"id {_id_type(embeddings, id_col)}, bucket int"
        )
    e = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("q")
    )
    return e.select("id", _bucket_expr(F.col("q"), n_planes, dim, seed).alias("bucket"))


def lsh_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_tables: int = 4,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1000,
    impl: str = "arrow",
) -> DataFrame:
    """Scale-path embedding near-dup (the graded path — ``cosine_pairs``
    is the brute-force baseline): multi-table sign-LSH bucketing, ordered
    pairs expanded *within* each (table, bucket), exact cosine only on
    those candidates. No cartesian product anywhere in the plan; the only
    shuffles are the bucket groupBy and the two id-joins for the exact
    check. ``max_bucket`` caps degenerate buckets (a corpus of one giant
    near-dup cluster) so the in-bucket pair expansion stays bounded.
    Approximate by design: cross-bucket pairs are missed; more tables
    raise recall. Deterministic (md5 planes) across engines and cluster
    sizes."""
    # ALL tables' bucket ids come from ONE corpus scan and one exact int64
    # matmul per Arrow batch (planes of every table concatenated
    # column-wise) — identical ids to per-table lsh_hyperplane_buckets
    # calls (parity-tested)
    import numpy as np
    import pandas as pd

    all_planes = np.concatenate(
        [_plane_matrix(n_planes, dim, f"lsht{t}") for t in range(n_tables)],
        axis=1,
    )  # (dim, n_tables * n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bits = (_quantize_np(m) @ all_planes) > 0  # (n, tables*planes)
            bk = (
                bits.reshape(len(pdf), n_tables, n_planes).astype(np.int64)
                * weights
            ).sum(axis=2)
            ids = np.repeat(pdf[id_col].to_numpy(), n_tables)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "tbl": np.tile(np.arange(n_tables), len(pdf)),
                    "bucket": bk.reshape(-1).astype(np.int32),
                }
            )

    buckets = embeddings.select(id_col, vec_col).mapInPandas(
        bucketize,
        schema=f"id {_id_type(embeddings, id_col)}, tbl int, bucket int",
    )
    groups = (
        buckets.groupBy("tbl", "bucket")
        .agg(F.sort_array(F.collect_set("id")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_bucket))
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("ds"),
                lambda a: F.transform(
                    F.col("ds"), lambda b: F.struct(a.alias("a"), b.alias("b"))
                ),
            )
        ),
        lambda s: s.a < s.b,
    )
    cand = (
        groups.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )
    ea = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    eb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return _pair_cosine_frame(
        cand.join(ea, "id_a").join(eb, "id_b"), threshold, impl
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path ANN: restrict the brute-force scan to the query's LSH
    bucket (approximate — misses cross-bucket neighbors by design)."""
    buckets = lsh_hyperplane_buckets(embeddings, n_planes, dim, id_col, vec_col)
    one = embeddings.sparkSession.createDataFrame(
        [(0, [float(x) for x in query_vec])], f"{id_col} long, {vec_col} array<float>"
    )
    qb = lsh_hyperplane_buckets(one, n_planes, dim, id_col, vec_col).collect()[0][
        "bucket"
    ]
    cand = embeddings.join(
        buckets.filter(F.col("bucket") == qb).select(F.col("id").alias(id_col)),
        id_col,
        "left_semi",
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def _int_dot(q_col: Column, c_col: Column) -> Column:
    """Exact int64 dot product of two 1e3-quantized vectors."""
    return F.aggregate(
        F.zip_with(q_col, c_col, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _quantize(col: Column) -> Column:
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000).cast("long"))


def _seed_centroids(
    embeddings: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> DataFrame:
    """(cent_id, cvec): deterministic quantized seeds — the embeddings of
    the ``n_cells`` lowest ids."""
    return (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cent_id"), _quantize(F.col(vec_col)).alias("cvec")
        )
    )


def _assign_to(
    e: DataFrame,
    cents: DataFrame,
    impl: str = "arrow",
    carry: tuple = (),
) -> DataFrame:
    """(id, cell[, *carry]): nearest centroid by EXACT integer dot product
    with lowest-centroid-id tie-break — identical on every engine and
    cluster size. ``carry`` names extra columns of ``e`` to pass through
    untouched (they ride the same Arrow batch, so callers that need the
    payload alongside the cell avoid a second corpus scan + id join).

    ``impl="arrow"`` (default): the tiny centroid matrix rides the UDF
    closure and each Arrow batch is assigned by one exact int64 matmul +
    argmax — ZERO shuffle and no row explosion; the 100 TB shape.
    ``impl="jvm"`` keeps the pure-Catalyst form (broadcast crossJoin x
    n_cells + per-id window), which explodes the corpus n_cells-fold and
    shuffles it for the row_number — kept for cross-checking."""
    if impl == "arrow":
        import numpy as np
        import pandas as pd

        rows = sorted(cents.collect(), key=lambda r: r["cent_id"])
        ids = np.asarray([r["cent_id"] for r in rows])
        c_mat = np.stack(
            [np.asarray(r["cvec"], dtype=np.int64) for r in rows]
        ).T  # (dim, n_cells), cent_id-ascending columns

        def assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
                dots = m @ c_mat  # exact int64
                # argmax returns the FIRST max -> lowest cent_id tie-break
                best = np.argmax(dots, axis=1)
                out = {"id": pdf["id"], "cell": ids[best]}
                for c in carry:
                    out[c] = pdf[c]
                yield pd.DataFrame(out)

        schema = f"id {_id_type(e, 'id')}, cell {_id_type(cents, 'cent_id')}"
        for c in carry:
            schema += f", {c} {_id_type(e, c)}"
        return e.mapInPandas(assign, schema=schema)
    scored = e.join(F.broadcast(cents)).withColumn(
        "dot", _int_dot(F.col("qvec"), F.col("cvec"))
    )
    w = Window.partitionBy("id").orderBy(F.col("dot").desc(), F.col("cent_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("cent_id").alias("cell"), *carry)
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    iterations: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cent_id, cvec) quantized IVF centroids. ``iterations=0`` returns
    the deterministic seeds; ``iterations>0`` runs that many Lloyd steps
    — still fully deterministic across partitioning and cluster size:
    assignment uses the exact integer dot with id tie-break, and the new
    centroid is the element-wise integer mean of its members' quantized
    vectors (integer sums are exactly associative, so partial aggregation
    order cannot change the result). Cells that lose every member keep
    their previous centroid.

    Scale shape per iteration: one broadcast-join assignment scan over the
    corpus + one (cell, dim)-keyed aggregation — the unavoidable Lloyd
    cost; centroids collapse to n_cells*dim longs and are re-broadcast."""
    cents = _seed_centroids(embeddings, n_cells, id_col, vec_col)
    if iterations <= 0:
        return cents
    spark = embeddings.sparkSession
    cent_schema = f"cent_id {_id_type(cents, 'cent_id')}, cvec array<long>"
    # persist the quantized corpus once: every Lloyd step scans it twice
    # (assignment + the mean agg join) and would otherwise re-read and
    # re-quantize the source per iteration
    e = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("qvec")
    ).persist()
    # centroids live driver-side between iterations (n_cells * dim longs):
    # one seed collect, then ONE assignment scan + ONE (cell, dim) agg per
    # Lloyd step — no re-collect of driver-built literals
    current = {r["cent_id"]: list(r["cvec"]) for r in cents.collect()}
    for _ in range(iterations):
        cents = spark.createDataFrame(sorted(current.items()), cent_schema)
        assign = _assign_to(e, cents)
        means = (
            e.join(assign, "id")
            .select("cell", F.posexplode("qvec").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .withColumn("m", F.round(F.col("s") / F.col("c")).cast("long"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda x: x["m"],
                ).alias("cvec")
            )
            .select(F.col("cell").alias("cent_id"), "cvec")
        )
        for r in means.collect():  # empty cells keep their previous centroid
            current[r["cent_id"]] = list(r["cvec"])
    e.unpersist()
    return spark.createDataFrame(sorted(current.items()), cent_schema)


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 0,
) -> DataFrame:
    """(id, cell): IVF coarse quantizer — centroids from
    :func:`ivf_centroids` (seeds, or k-means-refined with
    ``iterations>0``); assignment maximizes the EXACT integer dot product
    on 1e3-quantized vectors with lowest-centroid-id tie-break, so every
    engine and cluster size produces identical cells.

    Scale shape: the centroid set is tiny and broadcast; assignment is one
    narrow projection over the corpus — no shuffle. Queries then touch
    only ``n_probe`` cells (:func:`ivf_cosine_topk`)."""
    cents = ivf_centroids(embeddings, n_cells, iterations, id_col, vec_col)
    e = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("qvec")
    )
    return _assign_to(e, cents)


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 0,
) -> DataFrame:
    """IVF ANN: exact cosine top-k restricted to the ``n_probe`` cells
    whose centroids best match the query (by the same exact integer dot).
    Approximate by design (cross-cell neighbors missed); raise n_probe
    for recall, or ``iterations`` for k-means-refined cells. The probed
    fraction is n_probe/n_cells of the corpus."""
    cents = ivf_centroids(embeddings, n_cells, iterations, id_col, vec_col)
    e = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("qvec")
    )
    assign = _assign_to(e, cents)
    import numpy as np

    # _quantize_np, not Python round(): Spark/DuckDB round half away from
    # zero, Python half to even — keep the probe dots bit-identical to
    # the assignment plane on .5 boundaries
    qq = _quantize_np(np.asarray([float(x) for x in query_vec])).tolist()
    qarr = F.array(*[F.lit(int(v)).cast("long") for v in qq])
    probed = (
        cents.withColumn("dot", _int_dot(qarr, F.col("cvec")))
        .orderBy(F.col("dot").desc(), F.col("cent_id").asc())
        .limit(n_probe)
        .select(F.col("cent_id").alias("cell"))
    )
    cand_ids = assign.join(F.broadcast(probed), "cell", "left_semi").select(
        F.col("id").alias(id_col)
    )
    cand = embeddings.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
