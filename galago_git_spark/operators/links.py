"""Link harvest — the Spark rebuild of ``galago harvest-links``
(``core/.../tools/apps/HarvestLinksFn.java``, ``links/LinkExtractor.java``):
extract outgoing references from documents, resolve them to target
documents, and aggregate anchor evidence per target.

The reference extracts HTML anchors; this corpus is source code, so links
are import/include references (the code-analog of hyperlinks), extracted
with per-language patterns — pure column expressions, no UDF:

    python:  import X | from X import ...
    c:       #include "X.h" | #include <X.h>
    js:      require('X') | import ... from 'X'
    go/java: import "X" | import a.b.X;

Outputs mirror the reference's streams:

- :func:`extract_links` -> (repo, path, dst_ref, kind) per reference
  (LinkExtractor's ExtractedLink);
- :func:`resolve_links` -> (src, dst) doc-id edges by joining dst_ref
  against target module names from the names part (LinkDestNamer) —
  directly consumable by operators.pagerank;
- :func:`anchor_counts` -> per-target anchor-text aggregation (the
  anchor-text part HarvestLinks writes).

Resolved edges feed :func:`operators.pagerank.pagerank` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PATTERNS = [
    # kind, regex with one capture group for the referenced module
    ("py_import", r"(?m)^\s*import\s+([A-Za-z_][\w\.]*)"),
    ("py_from", r"(?m)^\s*from\s+([A-Za-z_][\w\.]*)\s+import"),
    ("c_include", r"(?m)^\s*#include\s+[\"<]([\w\./]+)[\">]"),
    ("js_require", r"require\(\s*['\"]([\w\./@-]+)['\"]\s*\)"),
    ("js_import", r"(?m)^\s*import\s+.*?\s+from\s+['\"]([\w\./@-]+)['\"]"),
    ("quoted_import", r"(?m)^\s*import\s+\"([\w\./-]+)\""),
]


def extract_links(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """One row per extracted reference: (repo, path, dst_ref, kind)."""
    frames = []
    for kind, pat in _PATTERNS:
        hits = docs.select(
            "repo",
            "path",
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(1))).alias(
                "dst_ref"
            ),
        ).withColumn("kind", F.lit(kind))
        frames.append(hits)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.filter(F.length("dst_ref") > 0)


def module_name(path_col) -> F.Column:
    """Module name of a file path: basename without extension
    (``src/a/foo.py`` -> ``foo``) — the LinkDestNamer convention here."""
    base = F.element_at(F.split(path_col, "/"), -1)
    return F.regexp_replace(base, r"\.[A-Za-z0-9]+$", "")


def resolve_links(links: DataFrame, names: DataFrame) -> DataFrame:
    """(src_doc, dst_doc) edges: dst_ref's last dotted/slashed segment
    matches the target's module name within the same repo. Self-links
    dropped (ComputeRandomWalk.java:73-75)."""
    targets = names.select(
        F.col("doc").alias("dst_doc"),
        F.col("repo").alias("dst_repo"),
        module_name(F.col("path")).alias("module"),
    )
    srcs = names.select(
        F.col("doc").alias("src_doc"), "repo", "path"
    )
    # c includes are file paths (basename minus extension); the rest are
    # dotted/slashed module refs (last segment)
    ref_mod = F.when(
        F.col("kind") == "c_include",
        module_name(F.col("dst_ref")),
    ).otherwise(
        F.element_at(F.split(F.regexp_replace("dst_ref", r"\.", "/"), "/"), -1)
    )
    return (
        links.join(srcs, ["repo", "path"])
        .withColumn("ref_mod", ref_mod)
        .join(
            targets,
            (F.col("ref_mod") == F.col("module"))
            & (F.col("repo") == F.col("dst_repo")),
        )
        .filter(F.col("src_doc") != F.col("dst_doc"))
        .select(F.col("src_doc").alias("src"), F.col("dst_doc").alias("dst"))
        .distinct()
    )


def anchor_counts(links: DataFrame, names: DataFrame) -> DataFrame:
    """Per-target anchor aggregation: how many sources reference each
    module, with the source paths as 'anchor text' (the anchor part)."""
    resolved = resolve_links(links, names)
    srcs = names.select(F.col("doc").alias("src"), F.col("path").alias("src_path"))
    return (
        resolved.join(srcs, "src")
        .groupBy(F.col("dst").alias("dst_doc"))
        .agg(
            F.count(F.lit(1)).alias("in_degree"),
            F.sort_array(F.collect_set("src_path")).alias("anchors"),
        )
    )
