"""HTTP search service (Search.java / SearchWebHandler.java analog):
route coverage, result shape, parity with the library API, concurrent
requests into the shared scheduler."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from galago_git_spark.index.build import build_index, open_index
from galago_git_spark.operators.docs import doc_name
from galago_git_spark.query.executor import execute
from galago_git_spark.service import SearchService, serve_in_thread
from galago_git_spark.sources.corpus import synthetic_code_corpus


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("svc")
    cdir, idir = str(root / "corpus"), str(root / "idx")
    corpus = synthetic_code_corpus(spark, n_docs=50, seed=3)
    corpus.write.parquet(cdir)
    build_index(spark.read.parquet(cdir), idir, positions=True)
    service = SearchService(spark, idir, corpus_path=cdir)
    srv, thread = serve_in_thread(service)
    host, port = srv.server_address
    yield f"http://{host}:{port}", idir
    srv.shutdown()
    srv.server_close()


def _get(base: str, path: str, status: int = 200, **params) -> dict:
    qs = urllib.parse.urlencode(params, doseq=True)
    url = f"{base}{path}" + (f"?{qs}" if qs else "")
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            assert r.status == status
            return json.load(r)
    except urllib.error.HTTPError as e:
        assert e.code == status, f"{url}: {e.code}"
        return json.load(e)


def test_search_route_matches_library(spark, server):
    base, idir = server
    out = _get(base, "/search", q="#combine(def return)", k=5)
    assert out["queryAsString"] == "#combine(def return)"
    assert "combine" in out["transformedQuery"]
    items = out["items"]
    assert len(items) == 5
    idx = open_index(spark, idir)
    want = execute("#combine(def return)", idx, k=5).collect()
    assert [i["document"] for i in items] == [r["doc"] for r in want]
    assert [i["rank"] for i in items] == [r["rank"] for r in want]
    top = items[0]
    assert top["identifier"] and top["metadata"]["repo"]
    assert top["summary"] and "<strong>" in top["summary"]


def test_document_and_snippet_routes(spark, server):
    base, idir = server
    idx = open_index(spark, idir)
    name = doc_name(idx, 4)
    d = _get(base, "/document", id=name, tokenize="true")
    assert d["doc"] == 4 and d["text"] and d["terms"]
    s = _get(base, "/snippet", id=name, term=d["terms"][0])
    assert s["identifier"] == name and "<strong>" in s["snippet"]
    _get(base, "/document", id="no:such@doc", status=404)


def test_count_stats_parts_transform_routes(spark, server):
    base, idir = server
    cf_def = (
        spark.read.parquet(f"{idir}/termstats")
        .filter(F.col("term") == "def").collect()[0]
    )
    assert _get(base, "/xcount", expression="def")["count"] == cf_def["cf"]
    assert _get(base, "/doccount", expression="def")["count"] == cf_def["df"]
    st = _get(base, "/stats")
    assert st["document_count"] == 50
    parts = _get(base, "/parts")["parts"]
    assert "postings" in parts and "lengths" in parts
    tq = _get(base, "/transformquery", q='"def return"')
    assert "ordered" in tq["transformed"] or "od" in tq["transformed"]
    _get(base, "/nope", status=404)
    err = _get(base, "/search", q="#combine(def", status=500)
    assert "error" in err


def test_concurrent_searches(server):
    base, _ = server
    queries = ["#combine(def)", "#combine(return)", "#combine(class import)",
               "#combine:scorer=bm25(def return)"]
    with ThreadPoolExecutor(max_workers=4) as pool:
        outs = list(pool.map(
            lambda q: _get(base, "/search", q=q, k=3, snippets="false"), queries
        ))
    assert all(o["items"] for o in outs)
    assert [o["queryAsString"] for o in outs] == queries


def test_search_wand_route_on_packed_index(spark, tmp_path_factory):
    """/search?wand=true routes eligible BM25 combines to the packed
    block-max tier (reader attached) and matches the relational ranking;
    on a part-less service the flag degrades gracefully (covered by the
    main fixture, which has no packed layer)."""
    root = tmp_path_factory.mktemp("svcwand")
    cdir, idir = str(root / "corpus"), str(root / "idx")
    corpus = synthetic_code_corpus(spark, n_docs=80, seed=11)
    corpus.write.parquet(cdir)
    build_index(spark.read.parquet(cdir), idir, positions=True, packed=True,
                block_size=32, bucket_bits=7)
    service = SearchService(spark, idir, corpus_path=cdir)
    assert service.reader is not None
    srv, _ = serve_in_thread(service)
    host, port = srv.server_address
    base = f"http://{host}:{port}"
    try:
        q = "#combine:scorer=bm25(def return)"
        a = _get(base, "/search", q=q, k=5, snippets="false", wand="true")
        b = _get(base, "/search", q=q, k=5, snippets="false")
        assert [i["document"] for i in a["items"]] == [
            i["document"] for i in b["items"]
        ]
        assert a["items"], "wand route must return results"
    finally:
        srv.shutdown()
        srv.server_close()


def _get_html(base: str, path: str, **params) -> str:
    qs = urllib.parse.urlencode(params, doseq=True)
    url = f"{base}{path}" + (f"?{qs}" if qs else "")
    with urllib.request.urlopen(url, timeout=120) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        return r.read().decode()


def test_html_main_page(server):
    """`/` serves the search form (handleMainPage,
    SearchWebHandler.java:430-448)."""
    base, _ = server
    page = _get_html(base, "/")
    assert "<form action=\"html/search\"" in page
    assert "<input name=\"q\"" in page


def test_html_search_page_renders_results_escaped(spark, server):
    """/html/search renders one result div per item with the same ranking
    as the JSON route (handleSearch, SearchWebHandler.java:161-260), and
    escapes the query text."""
    base, _ = server
    js = _get(base, "/search", q="#combine(def return)", k=3)
    page = _get_html(base, "/html/search", q="#combine(def return)", k=3)
    assert page.count('<div id="result">') == 3
    for item in js["items"]:
        assert str(item["identifier"]) in page
    # transformed query in the debug block
    assert "Transformed Query" in page
    # escaping: a query with markup must not inject tags
    hostile = '<script>alert(1)</script>'
    page2 = _get_html(base, "/html/search", q=hostile, k=1)
    assert "<script>alert(1)</script>" not in page2
    assert "&lt;script&gt;" in page2
