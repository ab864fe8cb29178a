"""Working-set retrieval (WorkingSetDocumentModel.java:33-75).

Semantics: score EXACTLY the whitelisted docs — a listed doc matching no
query term still gets its background score; unlisted docs never appear;
missing names are ignored; statistics stay global.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from galago_git_spark.query.executor import execute, inline_index, score_frame


@pytest.fixture(scope="module")
def ws_index(spark):
    docs = spark.createDataFrame(
        [
            (0, "table row table join"),
            (1, "row filter scan"),
            (2, "vector stream window"),   # matches nothing below
            (3, "table merge"),
            (4, "row row row"),
        ],
        ["doc_id", "text"],
    )
    return inline_index(docs)


def test_whitelist_is_the_candidate_set(spark, ws_index):
    rows = execute(
        "#combine(table row)", ws_index, k=10, working=[0, 2, 4]
    ).collect()
    # exactly the whitelist — doc 2 (no matching term) included with a
    # background-only score; docs 1 and 3 excluded despite matching
    assert {r["doc"] for r in rows} == {0, 2, 4}
    by_doc = {r["doc"]: r["score"] for r in rows}
    assert by_doc[2] < by_doc[0] and by_doc[2] < by_doc[4]


def test_scores_match_unrestricted_on_common_docs(spark, ws_index):
    full = {
        r["doc"]: round(r["score"], 9)
        for r in score_frame("#combine(table row)", ws_index).collect()
    }
    ws = {
        r["doc"]: round(r["score"], 9)
        for r in score_frame(
            "#combine(table row)", ws_index, working=[0, 4]
        ).collect()
    }
    # restriction must not change any doc's score (global stats rule)
    assert ws == {d: full[d] for d in (0, 4)}


def test_nonexistent_ids_are_dropped(spark, ws_index):
    rows = execute(
        "#combine(table)", ws_index, k=10, working=[0, 999]
    ).collect()
    assert {r["doc"] for r in rows} == {0}


def test_empty_working_set_rejected(spark, ws_index):
    with pytest.raises(ValueError, match="empty"):
        execute("#combine(table)", ws_index, k=10, working=[])


def test_working_names_resolution(spark, tmp_path):
    from galago_git_spark.index.build import build_index, open_index

    corpus = spark.createDataFrame(
        [
            ("r", "a.py", "c1", "py", "table row"),
            ("r", "b.py", "c2", "py", "row scan"),
            ("r", "c.py", "c3", "py", "vector stream"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "idx")
    build_index(corpus, d)
    idx = open_index(spark, d)
    docs = {r["path"]: r["doc"] for r in idx.names.collect()}
    rows = execute(
        "#combine(row)", idx, k=10,
        working=["r:a.py@c1", "r:c.py@c3", "r:missing@x"],
    ).collect()
    assert {r["doc"] for r in rows} == {docs["a.py"], docs["c.py"]}


def test_working_set_plan_prunes_postings_scan(spark, ws_index):
    """The count-plane scan carries the In(doc, working) filter — a
    1000-doc rerank must not scan the whole postings table."""
    df = score_frame("#combine(table row)", ws_index, working=[0, 2, 4])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    plan = buf.getvalue()
    assert "doc#" in plan
    # the In-filter over the working ids appears in the optimized plan
    assert plan.count("IN (0,2,4)") + plan.count("doc IN (0, 2, 4)") + (
        "isin" in plan or "IN (" in plan
    ) >= 1


def test_working_set_wsum(spark, ws_index):
    rows = execute(
        "#wsum(#dirichlet(table) #dirichlet(row))", ws_index, k=10,
        working=[0, 2],
    ).collect()
    assert {r["doc"] for r in rows} == {0, 2}


def test_sdm_scores_match_unrestricted(spark, ws_index):
    """Complex count nodes (od/uw windows) must take their statistics
    from the FULL index under a working set — regression for the
    node_stats leaf-check clobber, where window nodes fell into the
    leaf termstats lookup and scored with TermStats(0,0,0)."""
    full = {
        r["doc"]: round(r["score"], 9)
        for r in score_frame("#sdm(table row)", ws_index).collect()
    }
    ws = {
        r["doc"]: round(r["score"], 9)
        for r in score_frame(
            "#sdm(table row)", ws_index, working=[0, 1, 4]
        ).collect()
    }
    assert ws == {d: full[d] for d in (0, 1, 4)}


def test_working_set_with_sdm_and_stemmed_part(spark):
    # composes with operator trees and the stemmed routing
    docs = spark.createDataFrame(
        [(0, "running tables running tables"), (1, "table row"), (2, "scan")],
        ["doc_id", "text"],
    )
    idx = inline_index(docs, stemmer="porter2")
    rows = execute(
        "#sdm(running tables)", idx, k=10, working=[0, 2]
    ).collect()
    assert {r["doc"] for r in rows} == {0, 2}
    by_doc = {r["doc"]: r["score"] for r in rows}
    assert by_doc[0] > by_doc[2]
