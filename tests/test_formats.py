"""File-format corpus readers (sources/formats.py) vs the reference
parsers' documented semantics (TrecTextParser.java / TrecWebParser.java /
WARCParser.java / FileParser.java / DocumentStreamParser.java)."""

from __future__ import annotations

import gzip

import pytest

from galago_git_spark.sources.formats import (
    as_corpus,
    parse_trectext,
    parse_trecweb,
    parse_warc,
    read_corpus_files,
    scrub_url,
)

TRECTEXT = """<DOC>
<DOCNO> WSJ-1 </DOCNO>
<SOURCE> ignored section </SOURCE>
<TEXT>
line one
line two
</TEXT>
<HEADLINE>
the headline
</HEADLINE>
</DOC>
<DOC>
<DOCNO>AP-2
</DOCNO>
<TEXT>
solo
</TEXT>
</DOC>
"""


def test_trectext_semantics():
    docs = list(parse_trectext(TRECTEXT.encode(), "f.trectext"))
    assert [d[0] for d in docs] == ["WSJ-1", "AP-2"]
    # whitelisted sections only, tag lines INCLUDED (TrecTextParser.java:80-105)
    assert docs[0][2] == (
        "<TEXT>\nline one\nline two\n</TEXT>\n"
        "<HEADLINE>\nthe headline\n</HEADLINE>\n"
    )
    assert "ignored" not in docs[0][2]
    # <DOCNO> spanning lines is accumulated (parseDocNumber)
    assert docs[1][2] == "<TEXT>\nsolo\n</TEXT>\n"


TRECWEB = """<DOC>
<DOCNO>WEB-7</DOCNO>
<DOCHDR>
HTTP://Example.com:80/a/# 200 OK
content-type: text/html
</DOCHDR>
<html>anything
<goes> here
</DOC>
"""


def test_trecweb_semantics():
    docs = list(parse_trecweb(TRECWEB.encode(), "f.trecweb"))
    assert len(docs) == 1
    name, url, text, _ = docs[0]
    assert name == "WEB-7"
    # scrubUrl: lowercase, :80 gone, trailing / and # gone
    assert url == "http://example.com/a"
    # everything after </DOCHDR> captured, no tag whitelist
    assert text == "<html>anything\n<goes> here\n"


def test_scrub_url_cases():
    assert scrub_url("HTTP://X.com:80") == "http://x.com"
    assert scrub_url("http://x.com/p/") == "http://x.com/p"


def _warc_record(headers: dict[str, str], body: bytes) -> bytes:
    head = "WARC/1.0\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers.items()
    ) + f"Content-Length: {len(body)}\r\n\r\n"
    return head.encode() + body + b"\r\n\r\n"


def test_warc_semantics():
    data = (
        _warc_record({"WARC-Type": "warcinfo"}, b"software: test\r\n\r\n")
        + _warc_record(
            {"WARC-Type": "response",
             "WARC-Record-ID": "<urn:uuid:1>",
             "WARC-Target-URI": "http://a.example/"},
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hello</html>",
        )
        + _warc_record(
            {"WARC-Type": "response", "WARC-TREC-ID": "clueweb-0001"},
            b"no header split here",
        )
    )
    docs = list(parse_warc(data, "f.warc"))
    # file-header record skipped (WARCParser constructor reads it)
    assert len(docs) == 2
    name, url, text, _ = docs[0]
    assert name == "<urn:uuid:1>" and url == "http://a.example/"
    # http header block split off the text (WARCParser.java:73-85)
    assert text == "<html>hello</html>"
    # id fallback to WARC-TREC-ID; no blank line -> body kept whole
    assert docs[1][0] == "clueweb-0001"
    assert docs[1][2] == "no header split here"


def test_twitter_semantics():
    from galago_git_spark.sources.formats import parse_twitter

    data = (
        "alice\t20240101\thello world\tweb\n"
        "malformed line\n"
        "bob\t20240102\tsecond tweet\tapi\n"
    ).encode()
    docs = list(parse_twitter(data, "t.twitter"))
    assert [(d[0], d[2]) for d in docs] == [
        ("alice-20240101", "hello world"),
        ("bob-20240102", "second tweet"),
    ]


def test_arc_semantics():
    from galago_git_spark.sources.formats import parse_arc

    body1 = "HTTP/1.0 200 OK\nContent-Type: text/html\n\n<html>arc doc</html>"
    body2 = "no header here"
    data = (
        f"http://a.example/x 1.2.3.4 20070312 text/html {len(body1)}\n{body1}\n"
        f"http://b.example/y 1.2.3.5 20070313 text/plain {len(body2)}\n{body2}\n"
    ).encode()
    docs = list(parse_arc(data, "f.arc"))
    assert [d[0] for d in docs] == ["http://a.example/x", "http://b.example/y"]
    # server header split at the double newline (ArcParser.java:128-143:
    # headerEnd = second \n, text = substring(headerEnd + 1))
    assert docs[0][2] == "<html>arc doc</html>"
    assert docs[1][2] == "no header here"


WIKI = """<mediawiki>
<page>
<title>Spark (software)</title>
<id>42</id>
<revision><id>999</id>
<timestamp>2020-01-01T00:00:00Z</timestamp>
<text xml:space="preserve">'''Apache Spark''' is an engine.</text>
</revision>
</page>
<page>
<title>Talk:Ignored</title>
<id>43</id>
<revision><timestamp>x</timestamp><text>dropped</text></revision>
</page>
<page>
<title>Category:Kept</title>
<id>44</id>
<revision><timestamp>y</timestamp><text>category page</text></revision>
</page>
</mediawiki>
"""


def test_wiki_semantics():
    from galago_git_spark.sources.formats import parse_wiki

    docs = list(parse_wiki(WIKI.encode(), "dump.wiki"))
    # Talk: dropped (colon, not whitelisted); Category: kept; name = w+<id>
    assert [d[0] for d in docs] == ["w42", "w44"]
    name, url, text, _ = docs[0]
    assert url == "http://en.wikipedia.org/wiki/Spark (software)"
    # title/timestamp header prepended, everything lowercased
    assert text.startswith(
        "<title>spark (software)</title>\n"
        "<timestamp>2020-01-01t00:00:00z</timestamp>\n"
    )
    assert "'''apache spark''' is an engine." in text


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fmt")
    (d / "a.trectext").write_text(TRECTEXT)
    (d / "b.trectext.gz").write_bytes(gzip.compress(
        "<DOC>\n<DOCNO>GZ-1</DOCNO>\n<TEXT>\ncompressed doc\n</TEXT>\n</DOC>\n".encode()
    ))
    (d / "c.txt").write_text("plain text file about spark joins")
    (d / "d.jsonl").write_text(
        '{"id": "j1", "text": "json doc one"}\n{"id": "j2", "text": "json doc two"}\n'
    )
    (d / "e.tsv").write_text("t1\ttab doc one\nt2\ttab doc two\n")
    return str(d)


def test_read_corpus_files_mixed_extensions(spark, corpus_dir):
    rows = read_corpus_files(spark, corpus_dir).collect()
    by_name = {r["name"]: r for r in rows}
    # gz peeled then extension picks the parser (getBufferedReader analog)
    assert by_name["GZ-1"]["text"] == "<TEXT>\ncompressed doc\n</TEXT>\n"
    assert {"WSJ-1", "AP-2", "j1", "j2", "t1", "t2"} <= set(by_name)
    txt = [r for r in rows if r["file"].endswith("c.txt")]
    assert len(txt) == 1 and txt[0]["text"].startswith("plain text")
    assert len(rows) == 8


def test_forced_format_and_unknown_extension(spark, corpus_dir, tmp_path):
    (tmp_path / "x.dat").write_text(TRECTEXT)
    got = read_corpus_files(spark, str(tmp_path), fmt="trectext").collect()
    assert {r["name"] for r in got} == {"WSJ-1", "AP-2"}
    with pytest.raises(Exception, match="no parser"):
        read_corpus_files(spark, str(tmp_path)).collect()
    with pytest.raises(ValueError, match="unknown corpus format"):
        read_corpus_files(spark, str(tmp_path), fmt="nope")


def test_line_terminators_are_readline_exact():
    # only \n / \r / \r\n split lines; form feeds etc. stay in the text
    from galago_git_spark.sources.formats import _lines, parse_trectext

    assert _lines(b"a\x0cb\r\nc\rd\ne") == ["a\x0cb", "c", "d", "e"]
    data = "<DOC>\n<DOCNO>F</DOCNO>\n<TEXT>\na\x0cb\n</TEXT>\n</DOC>\n".encode()
    (_, _, text, _), = parse_trectext(data, "f")
    assert text == "<TEXT>\na\x0cb\n</TEXT>\n"


def test_tsv_trailing_tab_keeps_name():
    from galago_git_spark.sources.formats import parse_tsv

    docs = list(parse_tsv(b"doc42\t\nplain line\n", "c.tsv"))
    assert docs[0][0] == "doc42" and docs[0][2] == ""
    assert docs[1][0] == "c.tsv:1" and docs[1][2] == "plain line"


def test_arc_skips_filedesc_record():
    from galago_git_spark.sources.formats import parse_arc

    vers = "1 0 InternetArchive\nURL IP-address Archive-date Content-type Archive-length"
    body = "real doc"
    data = (
        f"filedesc://x.arc 0.0.0.0 2007 text/plain {len(vers)}\n{vers}\n"
        f"http://a/ 1.1.1.1 2007 text/plain {len(body)}\n{body}\n"
    ).encode()
    docs = list(parse_arc(data, "f.arc"))
    assert [d[0] for d in docs] == ["http://a/"]


def test_on_error_skip(spark, tmp_path):
    # a truncated shard and an unknown extension are skipped, good files kept
    (tmp_path / "good.trectext").write_text(
        "<DOC>\n<DOCNO>G1</DOCNO>\n<TEXT>\nok\n</TEXT>\n</DOC>\n"
    )
    (tmp_path / "bad.trectext").write_text("<DOC>\n<DOCNO> TRUNCATED")
    (tmp_path / "README.md").write_text("stray file")
    with pytest.raises(Exception):
        read_corpus_files(spark, str(tmp_path)).collect()
    got = read_corpus_files(spark, str(tmp_path), on_error="skip").collect()
    assert [r["name"] for r in got] == ["G1"]
    with pytest.raises(ValueError, match="on_error"):
        read_corpus_files(spark, str(tmp_path), on_error="warn")


def test_duplicate_docnos_build_as_distinct_docs(spark, tmp_path):
    # legal in TREC corpora: same DOCNO in two shards -> two documents
    from galago_git_spark.index.build import build_index, open_index

    for f in ("x", "y"):
        (tmp_path / f"{f}.trectext").write_text(
            f"<DOC>\n<DOCNO>DUP-1</DOCNO>\n<TEXT>\nshard {f} text\n</TEXT>\n</DOC>\n"
        )
    corpus = as_corpus(read_corpus_files(spark, str(tmp_path)))
    d = str(tmp_path / "idx")
    build_index(corpus, d, positions=False)
    idx = open_index(spark, d)
    names = idx.names.collect()
    assert len(names) == 2 and all(r["path"] == "DUP-1" for r in names)


def test_external_parser_hook(spark, tmp_path):
    # DocumentStreamParser.java:55-59 external-parser registration analog
    (tmp_path / "y.rev").write_text("olleh")

    def rev(data: bytes, file: str):
        yield "r1", None, data.decode()[::-1], file

    got = read_corpus_files(
        spark, str(tmp_path), extra_parsers={"rev": rev}
    ).collect()
    assert got[0]["name"] == "r1" and got[0]["text"] == "hello"


def test_read_corpus_split_identical_across_split_boundaries(spark, tmp_path):
    """One big trectext shard read with tiny file-splits must produce
    exactly the per-file parser's output: records straddling split
    boundaries are neither lost nor duplicated."""
    from galago_git_spark.sources.formats import read_corpus_split

    docs = [
        f"<DOC>\n<DOCNO>D{i}</DOCNO>\n<TEXT>\n"
        + " ".join(f"tok{i}_{j}" for j in range(30))
        + f"\nline two of doc {i}\n</TEXT>\n</DOC>\n"
        for i in range(60)
    ]
    (tmp_path / "big.trectext").write_text("".join(docs))
    whole = {
        (r["name"], r["text"])
        for r in read_corpus_files(spark, str(tmp_path)).collect()
    }
    assert len(whole) == 60
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        split_df = read_corpus_split(spark, str(tmp_path))
        assert split_df.rdd.getNumPartitions() > 1, "file must actually split"
        got = {(r["name"], r["text"]) for r in split_df.collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert got == whole
    with pytest.raises(ValueError, match="read_corpus_split supports"):
        read_corpus_split(spark, str(tmp_path), fmt="warc")


def test_read_corpus_split_line_formats(spark, tmp_path):
    """twitter/tsv/jsonl split natively on newlines; names self-identify,
    id-less lines hash instead of using (split-relative) line numbers."""
    from galago_git_spark.sources.formats import read_corpus_split

    (tmp_path / "a.twitter").write_text(
        "u1\t100\tfirst tweet\tweb\nu2\t200\tsecond tweet\tapi\n"
    )
    got = {r["name"]: r["text"] for r in
           read_corpus_split(spark, str(tmp_path), fmt="twitter").collect()}
    assert got == {"u1-100": "first tweet", "u2-200": "second tweet"}

    d2 = tmp_path / "j"
    d2.mkdir()
    (d2 / "b.jsonl").write_text(
        '{"id": "j1", "text": "json one"}\n{"text": "no id"}\n'
    )
    rows = read_corpus_split(spark, str(d2), fmt="jsonl").collect()
    by = {r["name"]: r["text"] for r in rows}
    assert by["j1"] == "json one"
    hashed = [n for n in by if n.startswith("h")]
    assert len(hashed) == 1 and by[hashed[0]] == "no id"

    d3 = tmp_path / "t"
    d3.mkdir()
    (d3 / "c.tsv").write_text("t1\talpha beta\nbare line\n")
    rows = read_corpus_split(spark, str(d3), fmt="tsv").collect()
    by = {r["name"]: r["text"] for r in rows}
    assert by["t1"] == "alpha beta"
    assert any(n.startswith("h") and by[n] == "bare line" for n in by)


def test_stream_corpus_split_into_incremental_index(spark, tmp_path):
    """File-drop streaming ingestion: trectext shards arriving in a watched
    directory flow through stream_corpus_split into an IncrementalIndexer
    (foreachBatch), and the geometric index answers queries."""
    from galago_git_spark.query.executor import execute
    from galago_git_spark.sources.formats import as_corpus, stream_corpus_split
    from galago_git_spark.streaming.incremental import IncrementalIndexer

    drop = tmp_path / "drop"
    drop.mkdir()
    for f in range(2):
        (drop / f"shard{f}.trectext").write_text("".join(
            f"<DOC>\n<DOCNO>F{f}D{i}</DOCNO>\n<TEXT>\n"
            f"stream doc {i} shard {f} shuffle join\n</TEXT>\n</DOC>\n"
            for i in range(5)
        ))
    indexer = IncrementalIndexer(spark, str(tmp_path / "geo"))
    parsed = as_corpus(stream_corpus_split(spark, str(drop)))
    q = (
        parsed.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(indexer.stream_writer())
        .start()
    )
    # availableNow stops itself once the backlog is drained; poll rather
    # than a fixed await so a loaded host can't truncate the micro-batch
    import time as _time

    deadline = _time.time() + 600
    while q.isActive and _time.time() < deadline:
        q.awaitTermination(5)
    assert not q.isActive, "stream did not drain in time"
    idx = indexer.open()
    assert idx.names.count() == 10
    out = execute("#combine(shuffle join)", idx, k=10).collect()
    assert len(out) == 10


def test_cli_build_from_files(corpus_dir, tmp_path):
    """galago build over raw files: --input-format routes --input through
    the format readers instead of parquet."""
    import json
    import subprocess
    import sys

    d = str(tmp_path / "idx")
    out = subprocess.run(
        [sys.executable, "-m", "galago_git_spark", "build",
         "--input", corpus_dir, "--input-format", "auto",
         "--index", d, "--cores", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    rec = json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    assert rec["n_docs"] == 8
    r = subprocess.run(
        [sys.executable, "-m", "galago_git_spark", "search",
         "--index", d, "--query", "#combine(spark joins)", "--cores", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    res = json.loads(
        [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    assert res["results"], res


def test_end_to_end_build_and_query(spark, corpus_dir, tmp_path):
    from galago_git_spark.index.build import build_index, open_index
    from galago_git_spark.query.executor import execute

    corpus = as_corpus(read_corpus_files(spark, corpus_dir))
    index_dir = str(tmp_path / "idx")
    build_index(corpus, index_dir, positions=False)
    idx = open_index(spark, index_dir)
    got = execute("#combine(spark joins)", idx, k=3).collect()
    assert len(got) >= 1
    # the plain-text file is the only doc containing both terms -> rank 1
    top_doc = got[0]["doc"]
    name_row = idx.names.filter(f"doc = {top_doc}").collect()[0]
    assert name_row["path"].endswith("c.txt")
