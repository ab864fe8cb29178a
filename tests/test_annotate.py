"""Per-document query traces (AnnotatedNode.java / DebugQuery.java).

The trace's root returnValue must equal the production score for that
document, and count leaves must report the document's true tf — the
whole point of the debug surface is that it never lies about the
production plan.
"""

from __future__ import annotations

import pytest

from galago_git_spark.query.annotate import annotate
from galago_git_spark.query.executor import execute, inline_index


@pytest.fixture(scope="module")
def ann_index(spark):
    docs = spark.createDataFrame(
        [
            (0, "table row table join"),
            (1, "row filter scan row"),
            (2, "vector stream window"),
            (3, "table merge row"),
        ],
        ["doc_id", "text"],
    )
    return inline_index(docs)


def test_root_value_matches_production_score(spark, ann_index):
    trace = annotate("#combine(table row)", ann_index, k=3)
    prod = {
        r["doc"]: round(r["score"], 6)
        for r in execute("#combine(table row)", ann_index, k=3).collect()
    }
    assert len(trace["results"]) == 3
    for res in trace["results"]:
        assert res["annotation"]["returnValue"] == pytest.approx(
            prod[res["doc"]], abs=1e-6
        )
        assert res["annotation"]["type"] == "combine"


def test_count_leaves_report_true_tf(spark, ann_index):
    trace = annotate("#combine(table row)", ann_index, k=4)
    by_doc = {r["doc"]: r["annotation"] for r in trace["results"]}
    # doc 0: table x2, row x1
    scorers = by_doc[0]["children"]
    leaves = {c["children"][0]["parameters"].get("default"):
              c["children"][0]["returnValue"] for c in scorers}
    assert leaves == {"table": 2, "row": 1}
    # doc 1: table absent -> tf 0
    leaves1 = {c["children"][0]["parameters"].get("default"):
               c["children"][0]["returnValue"]
               for c in by_doc[1]["children"]}
    assert leaves1 == {"table": 0, "row": 2}


def test_docid_restriction_traces_only_that_doc(spark, ann_index):
    trace = annotate("#combine(table)", ann_index, docs=[2])
    assert [r["doc"] for r in trace["results"]] == [2]
    # a doc matching nothing still gets a full (background-score) trace
    assert isinstance(trace["results"][0]["annotation"]["returnValue"], float)


def test_sdm_trace_has_window_nodes(spark, ann_index):
    trace = annotate("#sdm(table row)", ann_index, k=2)
    root = trace["results"][0]["annotation"]

    def ops(t):
        yield t["type"]
        for c in t["children"]:
            yield from ops(c)

    seen = set(ops(root))
    assert "ordered" in seen or "od" in seen
    assert "unordered" in seen or "uw" in seen
    # trace scores match production (global stats through the ws view)
    prod = {
        r["doc"]: round(r["score"], 6)
        for r in execute("#sdm(table row)", ann_index, k=2).collect()
    }
    for res in trace["results"]:
        assert res["annotation"]["returnValue"] == pytest.approx(
            prod[res["doc"]], abs=1e-6
        )


def test_positional_op_on_count_only_index_raises(spark, tmp_path):
    """A count-only build (positions=False) must reject positional
    operators with an actionable error, not crash inside the window
    kernels with a NoneType (regression: CLI build defaulted to
    count-only and `#sdm` died in unordered2_begins_batch)."""
    from galago_git_spark.index.build import build_index, open_index

    corpus = spark.createDataFrame(
        [("r", "a.py", "c", "py", "def run(): return run"),
         ("r", "b.py", "c", "py", "return def")],
        "repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "noidx")
    build_index(corpus, d, positions=False)
    idx = open_index(spark, d)
    with pytest.raises(ValueError, match="without positions"):
        execute("#sdm(def return)", idx, k=2).collect()
    # count queries still work on the same index
    assert execute("#combine(def)", idx, k=2).count() > 0
