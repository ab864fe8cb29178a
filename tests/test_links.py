"""Link harvest tests: extraction patterns, resolution, anchors, and the
harvest -> PageRank pipeline."""

from __future__ import annotations

import pytest

from galago_git_spark.operators.links import (
    anchor_counts,
    extract_links,
    resolve_links,
)
from galago_git_spark.operators.pagerank import pagerank

DOCS = [
    # repo, path, content
    ("r1", "src/app.py", "import util\nfrom models import train\nx = 1"),
    ("r1", "src/util.py", "import os\n# helper"),
    ("r1", "src/models.py", 'require("util")\nimport "nested/util"'),
    ("r1", "src/main.c", '#include "util.h"\n#include <stdio.h>'),
    ("r2", "lib/util.py", "import app"),  # other repo: must NOT link to r1
    ("r1", "web/index.js", "import {x} from './util'\nconst u = require('models')"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "repo string, path string, content string")


@pytest.fixture(scope="module")
def names(spark, corpus):
    from pyspark.sql import functions as F

    return corpus.select(
        F.crc32(F.concat_ws("/", "repo", "path")).cast("long").alias("doc"),
        "repo",
        "path",
    ).persist()


def test_extraction_patterns(spark, corpus):
    got = {
        (r["path"], r["dst_ref"], r["kind"])
        for r in extract_links(corpus).collect()
    }
    assert ("src/app.py", "util", "py_import") in got
    assert ("src/app.py", "models", "py_from") in got
    assert ("src/models.py", "util", "js_require") in got
    assert ("src/models.py", "nested/util", "quoted_import") in got
    assert ("src/main.c", "util.h", "c_include") in got
    assert ("src/main.c", "stdio.h", "c_include") in got
    assert ("web/index.js", "./util", "js_import") in got
    assert ("web/index.js", "models", "js_require") in got


def test_resolution_same_repo_by_module(spark, corpus, names):
    doc_of = {
        (r["repo"], r["path"]): r["doc"] for r in names.collect()
    }
    edges = {
        (r["src"], r["dst"])
        for r in resolve_links(extract_links(corpus), names).collect()
    }
    app, util = doc_of[("r1", "src/app.py")], doc_of[("r1", "src/util.py")]
    models, mainc = doc_of[("r1", "src/models.py")], doc_of[("r1", "src/main.c")]
    js = doc_of[("r1", "web/index.js")]
    r2util = doc_of[("r2", "lib/util.py")]
    assert (app, util) in edges and (app, models) in edges
    assert (models, util) in edges
    assert (mainc, util) in edges  # util.h -> module 'util'
    assert (js, util) in edges and (js, models) in edges
    # cross-repo reference does not resolve (r2's 'import app')
    assert not any(s == r2util for s, _ in edges)
    # no self-links
    assert all(s != d for s, d in edges)


def test_anchor_counts_and_pagerank_pipeline(spark, corpus, names):
    links = extract_links(corpus)
    anchors = {r["dst_doc"]: r for r in anchor_counts(links, names).collect()}
    doc_of = {(r["repo"], r["path"]): r["doc"] for r in names.collect()}
    util = doc_of[("r1", "src/util.py")]
    assert anchors[util]["in_degree"] == 4
    assert "src/app.py" in anchors[util]["anchors"]

    edges = resolve_links(links, names)
    pr = pagerank(names.select("doc"), edges, lambda_=0.5, delta=0.0, max_iter=3)
    scores = {r["doc"]: r["score"] for r in pr.collect()}
    assert sum(scores.values()) == pytest.approx(1.0, abs=1e-9)
    # the most-referenced module ranks highest
    assert max(scores, key=scores.get) == util
