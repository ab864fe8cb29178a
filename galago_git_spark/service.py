"""HTTP search service — the ``galago search`` web daemon
(``core/.../tools/Search.java:26-106``, route dispatch
``SearchWebHandler.java:458-497``) re-expressed as a stdlib
``ThreadingHTTPServer`` over one shared SparkSession.

Routes (JSON for the machine API; `/` and `/html/search` additionally
serve the reference's browser HTML skin — handleMainPage/handleSearch.
The SearchResult/SearchResultItem fields are kept: rank, identifier,
score, metadata, summary):

    /search?q=...&k=10[&scorer=bm25][&wand=true]   handleSearch
    /document?id=<name-or-number>[&tokenize=true]  handleDocument
    /snippet?id=...&term=a&term=b                  handleSnippet
    /xcount?expression=...                         handleXCount
    /doccount?expression=...                       handleDocCount
    /stats                                         handleStats
    /parts                                         handleParts
    /transformquery?q=...                          handleTransformQuery
    /                                              handleMainPage (HTML)
    /html/search?q=...&k=10                        handleSearch (HTML)

Concurrency model: Spark job submission is thread-safe, so each HTTP
thread submits its query as an independent job into the shared scheduler
(FAIR mode recommended) — the same shape as the reference's servlet
threads over one Retrieval object."""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F


class SearchService:
    """Search.java analog: an open index (+ optional corpus table for
    document text and snippets) answering retrieval requests."""

    def __init__(self, spark, index_dir: str, corpus_path: str | None = None,
                 default_scorer: str = "dirichlet"):
        from galago_git_spark.index.build import open_index

        self.spark = spark
        self.index_dir = index_dir
        self.index = open_index(spark, index_dir)
        self.corpus = (
            spark.read.parquet(corpus_path) if corpus_path else None
        )
        self.default_scorer = default_scorer
        self.reader = None  # packed-tier session handle, when available
        if os.path.isdir(os.path.join(index_dir, "blocks")):
            from galago_git_spark.query.wand import PackedReader

            self.reader = PackedReader(spark, index_dir)
            # a long-running service is exactly the regime the resident
            # bucket-partitioned posting cache exists for (size-guarded;
            # oversize indexes keep the pruned-scan path)
            self.reader.enable_cogroup_cache()

    # -- retrieval ---------------------------------------------------------

    def search(self, q: str, k: int = 10, scorer: str | None = None,
               snippets: bool = True, wand: bool = False) -> dict:
        """SearchResult shape (Search.java:55-77): items carry rank,
        identifier (external name), score, metadata, summary (highlighted
        snippet when a corpus is attached). ``wand=True`` routes eligible
        queries (BM25 flat combines, bare-term #sdm) to the packed
        block-max tier when the index has one — same routing as
        ``cli search --wand``."""
        from galago_git_spark.operators.docs import name_expr
        from galago_git_spark.query.executor import execute
        from galago_git_spark.query.parser import parse
        from galago_git_spark.query.traversals import transform

        scorer = scorer or self.default_scorer
        node = parse(q)
        tnode = transform(node, scorer)  # transformed once: display + terms
        if wand and self.reader is not None:
            from galago_git_spark.cli import _run_one

            rows = _run_one(self.spark, self.index, self.index_dir, q, k,
                            scorer, True, reader=self.reader)
        else:
            rows = execute(node, self.index, k=k, default_scorer=scorer).collect()
        names = {
            r["doc"]: r
            for r in self.index.names.withColumn("name", name_expr())
            .filter(F.col("doc").isin([r["doc"] for r in rows]) if rows else F.lit(False))
            .collect()
        }
        summaries = {}
        if snippets and self.corpus is not None and rows:
            summaries = self._summaries(tnode, [r["doc"] for r in rows])
        items = []
        for r in rows:
            nm = names.get(r["doc"])
            items.append({
                "rank": r["rank"],
                "document": int(r["doc"]),
                "identifier": nm["name"] if nm else None,
                "score": r["score"],
                "metadata": {
                    k2: nm[k2] for k2 in ("repo", "path", "commit", "lang")
                    if nm is not None and k2 in nm.asDict()
                } if nm else {},
                "summary": summaries.get(r["doc"]),
            })
        return {
            "queryAsString": q,
            "transformedQuery": str(tnode),
            "items": items,
        }

    def _summaries(self, tnode, docs: list[int]) -> dict:
        from galago_git_spark.operators.snippets import snippets_frame
        from galago_git_spark.query.nodes import Node, is_term_leaf

        def leaf_terms(n: Node) -> list[str]:
            if is_term_leaf(n):
                return [str(n.default_param)]
            return [t for c in n.children for t in leaf_terms(c)]

        terms = sorted(set(leaf_terms(tnode)))
        texts = (
            self.index.names.filter(F.col("doc").isin(docs))
            .select("doc", "repo", "path", "commit")
            .join(self.corpus, ["repo", "path", "commit"])
            .select("doc", F.col("content").alias("text"))
        )
        return {
            r["doc"]: r["snippet"]
            for r in snippets_frame(texts, terms, doc_col="doc").collect()
        }

    def document(self, identifier: str, tokenize: bool = False) -> dict | None:
        if self.corpus is None:
            raise ValueError("service started without a corpus table")
        from galago_git_spark.operators.docs import fetch_document

        return fetch_document(self.index, self.corpus, identifier,
                              tokenize=tokenize)

    def snippet(self, identifier: str, terms: list[str]) -> dict | None:
        from galago_git_spark.operators.snippets import best_snippet

        d = self.document(identifier)
        if d is None:
            return None
        return {"identifier": d["name"],
                "snippet": best_snippet(d["text"] or "", terms)}

    def xcount(self, expression: str) -> dict:
        from galago_git_spark.query.executor import node_stats
        from galago_git_spark.query.parser import parse
        from galago_git_spark.query.traversals import transform

        ns = node_stats(transform(parse(expression)), self.index)
        return {"expression": expression, "count": ns.cf}

    def doccount(self, expression: str) -> dict:
        from galago_git_spark.query.executor import node_stats
        from galago_git_spark.query.parser import parse
        from galago_git_spark.query.traversals import transform

        ns = node_stats(transform(parse(expression)), self.index)
        return {"expression": expression, "count": ns.df}

    def stats(self) -> dict:
        row = self.spark.read.parquet(
            os.path.join(self.index_dir, "stats")
        ).collect()[0]
        return row.asDict()

    def parts(self) -> dict:
        manifest_path = os.path.join(self.index_dir, "manifest.json")
        with open(manifest_path) as f:
            manifest = json.load(f)
        return {"parts": sorted(manifest.get("parts", {}))}

    def transform_query(self, q: str) -> dict:
        from galago_git_spark.query.parser import parse
        from galago_git_spark.query.traversals import transform

        return {
            "query": q,
            "transformed": str(transform(parse(q), self.default_scorer)),
        }


# ---------------------------------------------------------------------------
# HTML skin — SearchWebHandler's browser routes (handleMainPage
# SearchWebHandler.java:430-448, handleSearch :161-260, writeStyle
# :415-428). Rendering only: both pages call the same SearchService the
# JSON routes use. From-scratch markup (the reference builds its page
# with PrintWriter appends); queries/snippets are HTML-escaped.
# ---------------------------------------------------------------------------

_STYLE = """<style>
body { font-family: sans-serif; }
#header { background: #d2e9d9; border: 1px solid #ccc; padding: 8px; }
#result { padding: 10px 5px; max-width: 550px; }
#meta { font-size: small; color: #3c643c; }
#summary { font-size: small; }
#debug { display: none; background: #f4f4f4; padding: 6px; }
</style>
<script>function toggleDebug() {
  var o = document.getElementById('debug');
  o.style.display = o.style.display != 'block' ? 'block' : 'none';
}</script>"""


def render_main_page(title: str = "galago_git_spark search") -> str:
    """handleMainPage (SearchWebHandler.java:430-448): a centered form."""
    import html as _html

    t = _html.escape(title)
    return (
        f"<html><head>{_STYLE}<title>{t}</title></head><body>"
        f"<center><br/><br/><div id=\"box\"><h2>{t}</h2>"
        '<form action="html/search"><input name="q" size="40">'
        '<input value="Search" type="submit"/></form><br/><br/>'
        "</div></center></body></html>\n"
    )


def render_search_page(service: SearchService, q: str, k: int = 10,
                       scorer: str | None = None,
                       wand: bool = False) -> str:
    """handleSearch's HTML body (SearchWebHandler.java:161-260): header
    form, a debug toggle showing the raw + transformed query, one result
    div per item (title link -> /document, snippet, identifier + score
    meta line)."""
    import html as _html

    res = service.search(q, k=k, scorer=scorer, wand=wand)
    dq = _html.escape(q, quote=True)
    out = [
        f"<html><head>{_STYLE}<title>{dq} - galago_git_spark"
        "</title></head><body>",
        '<div id="header"><form action="search">'
        f'<input name="q" size="40" value="{dq}"/>'
        '<input value="Search" type="submit"/></form></div>',
        '<center>[<a href="#" onClick="toggleDebug(); return false;">'
        "debug</a>]</center>",
        '<div id="debug"><table>'
        f"<tr><td>Original Query</td><td>{dq}</td></tr>"
        f"<tr><td>Transformed Query</td>"
        f"<td>{_html.escape(res['transformedQuery'])}</td></tr>"
        "</table></div>",
    ]
    for item in res["items"]:
        ident = _html.escape(str(item["identifier"] or item["document"]),
                             quote=True)
        title = ident or "&lt;document link&gt;"
        summary = _html.escape(item.get("summary") or "")
        out.append(
            '<div id="result">'
            f'<a href="document?id={ident}">{title}</a><br/>'
            f'<div id="summary">{summary}</div>'
            f'<div id="meta">{ident} - {item["score"]:.2f}</div></div>'
        )
    out.append("</body></html>\n")
    return "".join(out)


def make_handler(service: SearchService):
    """Route table — SearchWebHandler.handle (SearchWebHandler.java:
    458-497). JSON routes as before; `/` and `/html/search` serve the
    reference's browser skin (handleMainPage/handleSearch HTML)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test servers
            pass

        def _reply(self, obj, status: int = 200) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_html(self, page: str, status: int = 200) -> None:
            body = page.encode()
            self.send_response(status)
            self.send_header("Content-Type", "text/html; charset=UTF-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            u = urlparse(self.path)
            p = parse_qs(u.query)
            one = lambda k, d=None: p.get(k, [d])[0]
            try:
                if u.path == "/search":
                    self._reply(service.search(
                        one("q", ""), k=int(one("k", "10")),
                        scorer=one("scorer"),
                        snippets=one("snippets", "true") != "false",
                        wand=one("wand", "false") == "true",
                    ))
                elif u.path == "/document":
                    d = service.document(
                        one("id", ""), tokenize=one("tokenize") == "true"
                    )
                    self._reply(d if d is not None
                                else {"error": "not found"},
                                200 if d is not None else 404)
                elif u.path == "/snippet":
                    s = service.snippet(one("id", ""), p.get("term", []))
                    self._reply(s if s is not None
                                else {"error": "not found"},
                                200 if s is not None else 404)
                elif u.path == "/xcount":
                    self._reply(service.xcount(one("expression", "")))
                elif u.path == "/doccount":
                    self._reply(service.doccount(one("expression", "")))
                elif u.path == "/stats":
                    self._reply(service.stats())
                elif u.path == "/parts":
                    self._reply(service.parts())
                elif u.path == "/transformquery":
                    self._reply(service.transform_query(one("q", "")))
                elif u.path in ("/", "/index.html"):
                    # handleMainPage (SearchWebHandler.java:430-448)
                    self._reply_html(render_main_page())
                elif u.path == "/html/search":
                    # handleSearch HTML (SearchWebHandler.java:161-260)
                    self._reply_html(render_search_page(
                        service, one("q", ""), k=int(one("k", "10")),
                        scorer=one("scorer"),
                        wand=one("wand", "false") == "true",
                    ))
                else:
                    self._reply({"error": f"no route {u.path}"}, 404)
            except Exception as e:  # surface retrieval errors as JSON
                self._reply({"error": str(e)}, 500)

    return Handler


def serve(service: SearchService, port: int = 0) -> ThreadingHTTPServer:
    """Bind and return the server (port 0 = ephemeral; read
    ``server.server_address``). Caller drives ``serve_forever`` — the CLI
    blocks on it, tests run it in a daemon thread."""
    return ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))


def serve_in_thread(service: SearchService, port: int = 0):
    """(server, thread) with serve_forever running as a daemon."""
    server = serve(service, port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, t
