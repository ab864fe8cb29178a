"""Distributed file-format corpus readers — the UniversalParser plane.

The reference ingests raw document files through per-format stream
parsers selected by file extension (``parse/DocumentStreamParser.java:
40-63`` extension->parser map, ``:131`` gz/bz2 wrapping), fanned out one
parser instance per file split (``BuildIndex.java:676`` getSplitStage,
``parse/DocumentSource.java``). This module is that plane re-expressed
Spark-first:

- ``spark.read.format("binaryFile")`` enumerates and reads the files —
  the DocumentSource/DocumentSplit analog (one file = one split = one
  task; at 10^12-file scale the listing itself is distributed and the
  parse stage is embarrassingly parallel, exactly like the reference's
  parsePostings fan-out).
- a ``mapInPandas`` stage runs the pure-Python per-format parser over
  each file's bytes, yielding one output frame per file so a task never
  holds more than one decoded file plus its parsed rows.

Parsers implemented (same extension names as the reference map):
``trectext`` (``parse/TrecTextParser.java:57-116``), ``trecweb``
(``parse/TrecWebParser.java:73-104``), ``warc``
(``parse/WARCParser.java:44-87``, ``parse/WARCRecord.java``), ``txt`` /
``html`` / ``xml`` (``parse/FileParser.java`` — whole file is one
document), ``twitter`` (``parse/TwitterParser.java``), ``arc``
(``parse/ArcParser.java``), ``wiki`` (``parse/WikiParser.java``),
``jsonl`` / ``tsv`` (``parse/FileLineParser.java`` — one document per
line). ``.gz`` / ``.bz2`` suffixes are decompressed first
and the next suffix picks the parser, mirroring getBufferedReader.

Output schema: ``(name string, url string, text string, file string)``.
``as_corpus`` maps it onto the build pipeline's corpus columns.
"""

from __future__ import annotations

import bz2
import gzip
import json
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARSED_SCHEMA = "name string, url string, text string, file string"

# TrecTextParser.java:70-75 — tag sections captured into the document text
_TREC_START = ("<TEXT>", "<HEADLINE>", "<TITLE>", "<HL>", "<HEAD>",
               "<TTL>", "<DD>", "<DATE>", "<LP>", "<LEADPARA>")
_TREC_END = ("</TEXT>", "</HEADLINE>", "</TITLE>", "</HL>", "</HEAD>",
             "</TTL>", "</DD>", "</DATE>", "</LP>", "</LEADPARA>")


_LINE_TERM = re.compile(r"\r\n|\r|\n")


def _lines(data: bytes) -> list[str]:
    # BufferedReader.readLine semantics: ONLY \n / \r / \r\n terminate a
    # line (str.splitlines would also split on \x0b/\x0c/ /...,
    # corrupting document text that contains those characters)
    text = data.decode("utf-8", errors="replace")
    lines = _LINE_TERM.split(text)
    if lines and lines[-1] == "":
        lines.pop()  # trailing terminator, not an extra empty line
    return lines


def parse_trectext(data: bytes, file: str) -> Iterator[tuple]:
    """TrecTextParser.java:57-116 line-for-line semantics: docs delimited
    by <DOC>, identifier from <DOCNO> (may span lines), text = only the
    whitelisted tag sections INCLUDING the tag lines themselves."""
    lines = _lines(data)
    i, n = 0, len(lines)
    while True:
        while i < n and not lines[i].startswith("<DOC>"):
            i += 1
        if i >= n:
            return
        i += 1
        # parseDocNumber: accumulate from the <DOCNO> line until </DOCNO>
        while i < n and not lines[i].startswith("<DOCNO>"):
            i += 1
        if i >= n:
            return
        all_text = lines[i]
        i += 1
        while "</DOCNO>" not in all_text and i < n:
            all_text += lines[i]
            i += 1
        s = all_text.index("<DOCNO>") + 7
        e = all_text.index("</DOCNO>")
        identifier = all_text[s:e].strip()
        buf: list[str] = []
        in_tag = -1
        while i < n:
            line = lines[i]
            i += 1
            if line.startswith("</DOC>"):
                break
            if line.startswith("<"):
                if in_tag >= 0 and line.startswith(_TREC_END[in_tag]):
                    in_tag = -1
                    buf.append(line)
                    continue
                if in_tag < 0:
                    for ti, t in enumerate(_TREC_START):
                        if line.startswith(t):
                            in_tag = ti
                            break
            if in_tag >= 0:
                buf.append(line)
        yield identifier, None, "".join(x + "\n" for x in buf), file


def scrub_url(url: str) -> str:
    """TrecWebParser.java:44-59."""
    if url.endswith("#"):
        url = url[:-1]
    url = url.lower()
    url = url.replace(":80/", "/")
    if url.endswith(":80"):
        url = url[:-3]
    while url.endswith("/"):
        url = url[:-1]
    return url


def parse_trecweb(data: bytes, file: str) -> Iterator[tuple]:
    """TrecWebParser.java:73-104: one-line <DOCNO>, url = first token of
    the line after <DOCHDR> (scrubbed), text = everything after </DOCHDR>
    up to </DOC> (no tag whitelist)."""
    lines = _lines(data)
    i, n = 0, len(lines)

    def wait_for(tag: str) -> str | None:
        nonlocal i
        while i < n:
            line = lines[i]
            i += 1
            if line.startswith(tag):
                return line
        return None

    while True:
        if wait_for("<DOC>") is None:
            return
        ident_line = wait_for("<DOCNO>")
        if ident_line is None:
            return
        identifier = ident_line[7:].strip()
        identifier = identifier[: len(identifier) - 8].strip()
        if wait_for("<DOCHDR>") is None:
            return
        url_line = lines[i] if i < n else ""
        i += 1
        space = url_line.find(" ")
        url = scrub_url(url_line[: space if space >= 0 else len(url_line)])
        if wait_for("</DOCHDR>") is None:
            return
        buf: list[str] = []
        while i < n:
            line = lines[i]
            i += 1
            if line.startswith("</DOC>"):
                break
            buf.append(line)
        yield identifier, url, "".join(x + "\n" for x in buf), file


_HDR_SPLIT = re.compile(rb"\r?\n\r?\n")
_BODY_SPLIT = re.compile(r"\n\n|\r\n\r\n")


def _read_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Minimal WARC/0.x-1.x reader (WARCRecord.java readNextWarcRecord):
    version line, header lines to the blank line, Content-Length body."""
    pos, n = 0, len(data)
    while pos < n:
        # skip record separators / leading blank lines
        nl = data.find(b"WARC/", pos)
        if nl < 0:
            return
        head_end = _HDR_SPLIT.search(data, nl)
        if head_end is None:
            return
        header_block = data[nl:head_end.start()].decode("utf-8", errors="replace")
        headers: dict[str, str] = {}
        for line in header_block.splitlines()[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip()] = v.strip()
        try:
            clen = int(headers.get("Content-Length", "0"))
        except ValueError:
            clen = 0
        body_start = head_end.end()
        body = data[body_start:body_start + clen]
        pos = body_start + clen
        yield headers, body


def parse_warc(data: bytes, file: str) -> Iterator[tuple]:
    """WARCParser.java:44-87: the first record is the file header
    (skipped); id from WARC-Record-ID / WARC-TREC-ID / WARC-DOC-ID; the
    content's own header block (up to the first blank line) is split off
    the text; url from WARC-Target-URI."""
    first = True
    for headers, body in _read_warc_records(data):
        if first:
            first = False
            continue
        doc_id = (headers.get("WARC-Record-ID")
                  or headers.get("WARC-TREC-ID")
                  or headers.get("WARC-DOC-ID") or "")
        text = body.decode("utf-8", errors="replace")
        m = _BODY_SPLIT.search(text)
        if m:
            text = text[m.end():]
        yield doc_id, headers.get("WARC-Target-URI"), text, file


def parse_twitter(data: bytes, file: str) -> Iterator[tuple]:
    """TwitterParser.java:39-59: one tweet per line, tab-separated
    ``user timestamp tweet source``; malformed lines skipped."""
    for line in _lines(data):
        fields = line.split("\t")
        if len(fields) == 4:
            user, ts, tweet, _source = fields
            yield f"{user}-{ts}", None, tweet, file


def parse_arc(data: bytes, file: str) -> Iterator[tuple]:
    """Heritrix ARC records (ArcParser.java:48-94): header line
    ``url ip date content-type length``, then ``length`` bytes; the
    server-header block ends at the first double newline. Deliberate
    divergence: the leading ``filedesc://`` version-block record is
    skipped (the reference emits it as a document — one junk doc per ARC
    file; WARCParser skips its equivalent, and so do we)."""
    pos, n = 0, len(data)
    while pos < n:
        while pos < n and data[pos:pos + 1] == b"\n":
            pos += 1
        eol = data.find(b"\n", pos)
        if eol < 0:
            return
        header = data[pos:eol].decode("utf-8", errors="replace")
        fields = header.split(" ")
        if len(fields) < 5:
            return
        try:
            length = int(fields[4])
        except ValueError:
            return
        body = data[eol + 1:eol + 1 + length].decode("utf-8", errors="replace")
        pos = eol + 1 + length + 1  # + trailing newline
        if fields[0].startswith("filedesc://"):
            continue
        # findDoubleNewline: headerEnd = index of the SECOND consecutive
        # \n; text = substring(headerEnd + 1) — i.e. after both newlines
        head_end = body.find("\n\n")
        text = body if head_end < 0 else body[head_end + 2:]
        yield fields[0], fields[0], text, file


_WIKI_TAG = {
    t: re.compile(rf"<{t}(?:\s[^>]*)?>(.*?)</{t}>", re.S) for t in
    ("id", "title", "timestamp", "text")
}
_WIKI_PREFIX_WHITELIST = ("Category:",)


def parse_wiki(data: bytes, file: str) -> Iterator[tuple]:
    """MediaWiki XML dumps (WikiParser.java:55-146): <page> blocks;
    name = "w" + first <id>; titles containing ':' are dropped unless
    whitelisted (Category:); document text = <title>/<timestamp> header +
    page text, lowercased. Divergence from the reference: the wikitext is
    passed through raw rather than rendered to HTML (the reference uses
    the external bliki renderer); tag structure and filtering match."""
    lines = _lines(data)
    page: list[str] | None = None
    for line in lines:
        s = line.strip()
        if s.startswith("<page>"):
            page = [line]
        elif s.startswith("</page>"):
            if page is None:
                continue
            page.append(line)
            block = "\n".join(page) + "\n"
            page = None
            # per-page resilience (WikiParser.processPage catches and
            # skips only the broken page, not the file): a malformed
            # <id> etc. must never abort the shard
            try:
                tags = {}
                for t, rx in _WIKI_TAG.items():
                    m = rx.search(block)
                    tags[t] = m.group(1) if m else ""
                title = tags["title"]
                if ":" in title and not title.startswith(_WIKI_PREFIX_WHITELIST):
                    continue
                if not tags["id"]:
                    continue
                text = (
                    f"<title>{title}</title>\n"
                    f"<timestamp>{tags['timestamp']}</timestamp>\n"
                    + tags["text"]
                ).lower()
                url = f"http://en.wikipedia.org/wiki/{title}"
                yield f"w{int(tags['id'])}", url, text, file
            except Exception:
                continue
        elif page is not None:
            page.append(line)


def _strip_known_extensions(name: str) -> str:
    # FileParser.stripExtensions (FileParser.java:39-55)
    for ext in (".bz", ".bz2", ".gz", ".html", ".xml", ".txt"):
        if name.endswith(ext):
            name = name[: -len(ext)]
    return name


def _parse_wholefile(identifier_mode: str):
    def parse(data: bytes, file: str) -> Iterator[tuple]:
        name = file
        if identifier_mode == "stripped":
            name = os.path.basename(_strip_known_extensions(file))
        # FileParser.nextDocument reads line-by-line and appends '\n' per
        # line: CRLF normalizes to LF and the text always ends with a
        # newline (empty file -> empty text) — raw bytes diverge on both
        lines = _lines(data)
        text = "\n".join(lines) + "\n" if lines else ""
        yield name, None, text, file

    return parse


def parse_jsonl(data: bytes, file: str) -> Iterator[tuple]:
    for ln, line in enumerate(_lines(data)):
        if not line.strip():
            continue
        obj = json.loads(line)
        name = str(obj.get("name", obj.get("id", obj.get("doc_id", f"{file}:{ln}"))))
        yield name, obj.get("url"), str(obj.get("text", obj.get("content", ""))), file


def parse_tsv(data: bytes, file: str) -> Iterator[tuple]:
    # FileLineParser-style: one document per line, "name \t text"
    for ln, line in enumerate(_lines(data)):
        if not line:
            continue
        if "\t" in line:
            # keep the name even when the text is legitimately empty
            name, _, text = line.partition("\t")
        else:
            name, text = f"{file}:{ln}", line
        yield name, None, text, file


def format_parsers(identifier: str = "filename") -> dict:
    """Extension -> parser map (DocumentStreamParser.java:40-63)."""
    whole = _parse_wholefile(identifier)
    return {
        "trectext": parse_trectext,
        "trecweb": parse_trecweb,
        "warc": parse_warc,
        "txt": whole,
        "html": whole,
        "xml": whole,
        "jsonl": parse_jsonl,
        "tsv": parse_tsv,
        "twitter": parse_twitter,
        "arc": parse_arc,
        "wiki": parse_wiki,
    }


def _decompress(path: str, data: bytes) -> tuple[str, bytes]:
    if path.endswith(".gz"):
        return path[:-3], gzip.decompress(data)
    if path.endswith(".bz2"):
        return path[:-4], bz2.decompress(data)
    return path, data


def _strip_scheme(path: str) -> str:
    if path.startswith("file:"):
        path = path[5:]
        while path.startswith("//"):
            path = path[1:]
    return path


def read_corpus_files(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    identifier: str = "filename",
    glob: str | None = None,
    extra_parsers: dict | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Parse a directory/glob of document files into ``(name, url, text,
    file)`` rows, one task per file. ``fmt=None`` picks the parser from
    each file's extension after peeling ``.gz``/``.bz2`` (the
    UniversalParser behavior); ``fmt="x"`` forces one parser.
    ``extra_parsers`` registers external formats by name — the
    ``parserParameters/externalParsers`` hook
    (DocumentStreamParser.java:55-59).

    ``on_error``: ``"fail"`` (default, reference parity — a malformed or
    unknown-format file aborts the job) or ``"skip"`` — log the file to
    stderr and continue, which a very large ingest over crawled data
    realistically needs (one truncated shard must not kill an hours-long
    build)."""
    parsers = format_parsers(identifier)
    if extra_parsers:
        parsers.update(extra_parsers)
    if fmt is not None and fmt not in parsers:
        raise ValueError(f"unknown corpus format {fmt!r}; known: {sorted(parsers)}")
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', not {on_error!r}")
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        for b in batches:
            for p, blob in zip(b["path"], b["content"]):
                local = _strip_scheme(str(p))
                try:
                    local, data = _decompress(local, bytes(blob))
                    f = fmt or local.rsplit(".", 1)[-1].lower()
                    parse = parsers.get(f)
                    if parse is None:
                        raise ValueError(
                            f"no parser for {local!r} (extension {f!r}); "
                            f"pass fmt= or extra_parsers="
                        )
                    rows = list(parse(data, local))
                except Exception:
                    if on_error == "fail":
                        raise
                    print(f"skipping unparseable file: {local}", file=sys.stderr)
                    continue
                # one frame per file: a task never buffers two decoded files
                yield pd.DataFrame(
                    rows, columns=["name", "url", "text", "file"]
                )

    return files.mapInPandas(run, schema=PARSED_SCHEMA)


def read_corpus_split(
    spark: SparkSession,
    path: str,
    fmt: str = "trectext",
    glob: str | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Record-split reader for the line-oriented multi-document formats
    (``trectext``/``trecweb``): documents are split out by the ``</DOC>``
    terminator at SCAN time (Spark text source, custom ``lineSep``), so a
    single huge uncompressed shard parallelizes one task per file-split —
    ``read_corpus_files``'s one-task-per-file shape can't spread a 100 GB
    shard over the cluster, this can (the file is cut at
    ``spark.sql.files.maxPartitionBytes`` boundaries and each split
    resynchronizes on the next record terminator, so no document is lost
    or duplicated across splits).

    Line-delimited formats (``twitter``/``tsv``/``jsonl``) split natively
    on newlines — same one-task-per-split shape. Their lines must be
    self-identifying; a tsv/jsonl line with no name falls back to a
    content hash instead of the per-file reader's ``file:lineno``
    (line numbers don't exist inside a split).

    Divergence from the reference parser (and from ``read_corpus_files``,
    which matches it exactly): the split happens on ANY ``</DOC>``
    occurrence, not only at line starts — identical output unless a
    document body itself contains ``</DOC>``. Compressed shards (.gz)
    are not splittable; use ``read_corpus_files`` for those. WARC/ARC
    are length-prefixed, not delimiter-framed, so they stay per-file."""
    chunks = _split_chunks(spark.read, path, glob, fmt)
    return chunks.mapInPandas(_chunk_parser(fmt, on_error), schema=PARSED_SCHEMA)


def stream_corpus_split(
    spark: SparkSession,
    path: str,
    fmt: str = "trectext",
    glob: str | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_corpus_split`: watch a
    directory for arriving trectext/trecweb shards and emit parsed
    document rows as a streaming DataFrame. Pair it with
    ``IncrementalIndexer.stream_writer()`` (foreachBatch) for continuous
    file-drop ingestion into a geometric index."""
    chunks = _split_chunks(spark.readStream, path, glob, fmt)
    return chunks.mapInPandas(_chunk_parser(fmt, on_error), schema=PARSED_SCHEMA)


_SPLIT_LINE_FORMATS = ("twitter", "tsv", "jsonl")


def _split_chunks(reader, path: str, glob: str | None, fmt: str) -> DataFrame:
    if fmt not in _SPLIT_LINE_FORMATS:  # doc-framed: one chunk per <DOC>
        reader = reader.option("lineSep", "</DOC>")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.text(path).select(
        F.input_file_name().alias("file"), "value"
    )


def _parse_tsv_selfid(data: bytes, file: str) -> Iterator[tuple]:
    import hashlib

    for line in _lines(data):
        if not line:
            continue
        if "\t" in line:
            name, _, text = line.partition("\t")
        else:
            name, text = "h" + hashlib.md5(line.encode()).hexdigest()[:16], line
        yield name, None, text, file


def _parse_jsonl_selfid(data: bytes, file: str) -> Iterator[tuple]:
    import hashlib

    for line in _lines(data):
        if not line.strip():
            continue
        obj = json.loads(line)
        name = obj.get("name", obj.get("id", obj.get("doc_id")))
        if name is None:
            name = "h" + hashlib.md5(line.encode()).hexdigest()[:16]
        yield (str(name), obj.get("url"),
               str(obj.get("text", obj.get("content", ""))), file)


def _chunk_parser(fmt: str, on_error: str = "fail"):
    parsers = {
        "trectext": parse_trectext,
        "trecweb": parse_trecweb,
        # line-delimited formats: the default \n lineSep splits them
        # natively; each "chunk" is one line. The per-file readers'
        # positional fallback name (file:lineno) is unavailable here —
        # lines must be self-identifying (twitter/tsv carry the name in
        # the line, jsonl needs an id/name/doc_id field), else the
        # fallback is a content hash (documented divergence).
        "twitter": parse_twitter,
        "tsv": _parse_tsv_selfid,
        "jsonl": _parse_jsonl_selfid,
    }
    if fmt not in parsers:
        raise ValueError(
            f"read_corpus_split supports {sorted(parsers)}, not {fmt!r}"
        )
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', not {on_error!r}")
    parse = parsers[fmt]

    line_mode = fmt in _SPLIT_LINE_FORMATS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        for b in batches:
            rows = []
            for f, chunk in zip(b["file"], b["value"]):
                if chunk is None:
                    continue
                if line_mode:
                    data = chunk.encode()
                else:
                    if "<DOC" not in chunk:
                        continue  # trailing whitespace after the last record
                    data = (chunk + "</DOC>\n").encode()
                try:
                    rows.extend(parse(data, _strip_scheme(str(f))))
                except Exception:
                    if on_error == "fail":
                        raise
                    print(f"skipping unparseable record in: {f}", file=sys.stderr)
            yield pd.DataFrame(rows, columns=["name", "url", "text", "file"])

    return run


def as_corpus(parsed: DataFrame, repo: str = "files") -> DataFrame:
    """Map parsed rows onto the build pipeline's corpus columns; doc
    names become ``path`` so ``assign_doc_ids``'s (repo, path, commit)
    ranking keys on the document identifier.

    Real TREC corpora contain duplicate DOCNOs (the reference's
    sequential numberer just numbers both), so ``commit`` carries a
    content-derived discriminator: duplicate names stay distinct
    documents unless they are byte-identical duplicates in the same
    file — which the build's duplicate-key guard then reports, exactly
    the degenerate case worth surfacing."""
    return parsed.select(
        F.lit(repo).alias("repo"),
        F.col("name").alias("path"),
        F.md5(F.concat_ws("\x00", F.col("file"),
                          F.coalesce(F.col("url"), F.lit("")),
                          F.col("text"))).alias("commit"),
        F.lit("").alias("lang"),
        F.col("text").alias("content"),
    )
