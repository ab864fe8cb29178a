"""Document fetch — the ``galago doc`` / ``doc-id`` / ``doc-name`` tools
(``core/.../tools/apps/DumpDocFn.java:18-57``, ``DumpDocIdFn.java:15-47``,
``DumpDocNameFn.java:15-45``) over the names part and the corpus table.

The reference resolves an external identifier through the names.reverse
btree and fetches text from the corpus part; here the names parquet serves
both directions (one table, filter pushdown on either key), and the corpus
IS the source table per the north rule — the fetch is a pruned
(filter-pushed) corpus read joined on the identity columns, never a scan
collected to the driver.

External identifiers are ``repo:path@commit`` — the engine-wide document
name (the same triple ``search --corpus`` joins on)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def name_expr(
    repo: Column | str = "repo",
    path: Column | str = "path",
    commit: Column | str = "commit",
) -> Column:
    """The external-name column: ``repo:path@commit``."""
    c = lambda x: F.col(x) if isinstance(x, str) else x
    return F.concat_ws("", c(repo), F.lit(":"), c(path), F.lit("@"), c(commit))


def doc_name(index, doc: int) -> str | None:
    """Internal number -> external identifier (DumpDocNameFn.java:28-40).
    One filter-pushed names lookup."""
    rows = (
        index.names.filter(F.col("doc") == int(doc))
        .select(name_expr().alias("name"))
        .take(1)
    )
    return rows[0]["name"] if rows else None


def doc_id(index, identifier: str) -> int | None:
    """External identifier -> internal number (DumpDocIdFn.java:29-39,
    the names.reverse direction). The filter compares the composed name
    expression, so identifiers never need parsing."""
    rows = (
        index.names.filter(name_expr() == identifier).select("doc").take(1)
    )
    return int(rows[0]["doc"]) if rows else None


def doc_id_for_names(index, identifiers: list[str]) -> list[int]:
    """Batch external-name -> doc-id resolution
    (``LocalRetrieval.getDocumentIds``, used by the working-set model).
    Missing names are dropped — WorkingSetDocumentModel.java:56-62 logs
    and IGNOREs ids < 0. One pruned names scan for the whole batch."""
    rows = (
        index.names.withColumn("name", name_expr())
        .filter(F.col("name").isin(list(identifiers)))
        .select("doc")
        .collect()
    )
    return [int(r["doc"]) for r in rows]


def fetch_document(
    index,
    corpus: DataFrame,
    identifier: str | int,
    tokenize: bool = False,
) -> dict | None:
    """Full document by external name or internal number — the
    ``galago doc`` surface (DumpDocFn.java:38-57: text + metadata +
    optional term vector). Accepts an int (or digit string, when it
    matches no external name) as an internal number.

    Returns ``{"doc", "name", "metadata": {...}, "text"[, "terms"]}`` or
    None. The corpus read is pruned to the one (repo, path, commit) key —
    at 100 TB this is a partition-pruned point lookup, not a scan."""
    named = index.names.withColumn("name", name_expr())
    if isinstance(identifier, int):
        hit = named.filter(F.col("doc") == identifier)
    else:
        hit = named.filter(F.col("name") == identifier)
        if isinstance(identifier, str) and identifier.isdigit():
            hit = named.filter(
                (F.col("name") == identifier)
                | (F.col("doc") == int(identifier))
            )
    rows = hit.take(1)
    if not rows:
        return None
    r = rows[0].asDict()
    text_rows = (
        corpus.filter(
            (F.col("repo") == r["repo"])
            & (F.col("path") == r["path"])
            & (F.col("commit") == r["commit"])
        )
        .select("content")
        .take(1)
    )
    out = {
        "doc": int(r["doc"]),
        "name": r["name"],
        "metadata": {
            k: r[k] for k in ("repo", "path", "commit", "lang", "sha256")
            if k in r
        },
        "text": text_rows[0]["content"] if text_rows else None,
    }
    if tokenize and out["text"] is not None:
        from galago_git_spark.functions.tokenize import tokenize_py

        out["terms"] = tokenize_py(out["text"])
    return out
