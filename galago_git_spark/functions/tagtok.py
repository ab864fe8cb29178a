"""Tag-aware tokenization — SGML tag-span fields for parsed corpora.

The reference's TagTokenizer (``core/.../parse/TagTokenizer.java:38-108``,
``parse/tagtok/TagTokenizerParser.java``) strips markup from the token
stream, drops ``script``/``style`` content entirely (``ignoredTags``,
TagTokenizer.java:40), and records each whitelisted tag's span as a Tag
with token-coordinate begin/end — which is what makes ``term.title`` work
on TREC/HTML indexes. This module is that plane for the engine: the text
between tags tokenizes with the CANONICAL code-aware rule
(functions/tokenize.py — the north rule's tokenizer), markup never
reaches the token stream, and whitelisted spans come out in the SAME
(doc, field, begin, end) extents shape the code-structural fields use
(functions/fields.py), so the ``#inside`` containment join, the
field-postings part, and field-scoped scoring all work unchanged.

Documented divergences from the reference parser: field whitelists are
exact lowercase tag names (the reference compiles them as regexes,
TagTokenizer.java:71-73); an unclosed whitelisted tag closes at document
end; tag attributes are ignored (no attribute extraction).

Extent convention (matches functions/fields.py): 1-based token begin,
exclusive end; a position p is inside iff ``begin <= p`` and
``p + 1 <= end``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from galago_git_spark.functions.tokenize import tokenize_py

# markup: comments, CDATA, processing instructions, then plain tags
_MARKUP_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[!?][^>]*>|"
    r"<(/?)\s*([a-zA-Z][a-zA-Z0-9:_.-]*)(?:[^>\"']|\"[^\"]*\"|'[^']*')*?(/?)>",
    re.DOTALL,
)
IGNORED_TAGS = frozenset(("script", "style"))  # TagTokenizer.java:40


def parse_tagged_py(
    text: str | None, whitelist: list[str] | tuple[str, ...] = ()
) -> tuple[list[str], list[tuple[str, int, int]]]:
    """(tokens, tag extents) for one document. Pure function — the
    per-doc oracle the vectorized kernels and the DuckDB SQL mirror."""
    if not text:
        return [], []
    wl = {w.lower() for w in whitelist}
    tokens: list[str] = []
    extents: list[tuple[str, int, int]] = []
    open_spans: dict[str, list[int]] = {}
    ignore_depth = 0
    last = 0
    for m in _MARKUP_RE.finditer(text):
        if ignore_depth == 0:
            tokens.extend(tokenize_py(text[last : m.start()]))
        last = m.end()
        name = m.group(2)
        if name is None:
            continue  # comment / CDATA / <! / <?
        name = name.lower()
        closing = m.group(1) == "/"
        self_closing = m.group(3) == "/"
        if name in IGNORED_TAGS:
            if self_closing:
                continue
            if closing:
                ignore_depth = max(0, ignore_depth - 1)
            else:
                ignore_depth += 1
            continue
        if ignore_depth or name not in wl or self_closing:
            continue
        if closing:
            stack = open_spans.get(name)
            if stack:
                begin = stack.pop()
                end = len(tokens) + 1
                if end > begin:
                    extents.append((name, begin, end))
        else:
            open_spans.setdefault(name, []).append(len(tokens) + 1)
    if ignore_depth == 0:
        tokens.extend(tokenize_py(text[last:]))
    # unclosed whitelisted tags close at document end
    end = len(tokens) + 1
    for name, stack in open_spans.items():
        for begin in stack:
            if end > begin:
                extents.append((name, begin, end))
    extents.sort(key=lambda e: (e[0], e[1]))
    return tokens, extents


def tagged_postings_stream(whitelist: tuple[str, ...], positions: bool):
    """mapInPandas kernel: (doc, content) -> posting rows with the
    tag-aware token stream (the tagged analog of
    tokenize.doc_term_freqs_stream — markup stripped, script/style
    dropped)."""

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows_doc, rows_tok = [], []
            for d, content in zip(pdf["doc"].to_numpy(), pdf["content"]):
                toks, _ = parse_tagged_py(content, whitelist)
                if toks:
                    rows_doc.append(np.full(len(toks), d))
                    rows_tok.append(np.asarray(toks, dtype=object))
            if not rows_doc:
                continue
            lengths = [len(t) for t in rows_tok]
            docs_rep = np.concatenate(rows_doc)
            terms = np.concatenate(rows_tok)
            if positions:
                from galago_git_spark.functions.tokenize import (
                    group_positions,
                )

                pos = np.concatenate(
                    [np.arange(1, n + 1) for n in lengths]
                )
                yield group_positions(docs_rep, terms, pos)
            else:
                yield (
                    pd.DataFrame({"doc": docs_rep, "term": terms})
                    .groupby(["doc", "term"], sort=False)
                    .size()
                    .reset_index(name="tf")
                )

    return fn


def tagged_extents_stream(whitelist: tuple[str, ...]):
    """mapInPandas kernel: (doc, content) -> (doc, field, begin, end)
    whitelisted tag extents in token coordinates."""

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for d, content in zip(pdf["doc"].to_numpy(), pdf["content"]):
                _, exts = parse_tagged_py(content, whitelist)
                rows.extend((d, f, b, e) for f, b, e in exts)
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc", "field", "begin", "end"]
                )

    return fn


def tagged_tokens_col(col, whitelist: tuple[str, ...] = ()):
    """Tag-aware token array as an Arrow-batched Column (the tagged
    sibling of tokenize.tokenize_pandas; used by inline_index)."""
    from pyspark.sql import functions as F

    wl = tuple(whitelist)

    def _tok(s):
        return s.map(lambda t: parse_tagged_py(t, wl)[0])

    _tok.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_tok, "array<string>")(col)


def tagged_extents_col(col, whitelist: tuple[str, ...]):
    """Whitelisted tag extents as an array<struct<field,begin,end>>
    Column (the tagged sibling of fields.field_extents_col)."""
    from pyspark.sql import functions as F

    wl = tuple(whitelist)

    def _ext(s):
        return s.map(
            lambda t: [
                {"field": f, "begin": b, "end": e}
                for f, b, e in parse_tagged_py(t, wl)[1]
            ]
        )

    _ext.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(
        _ext, "array<struct<field:string,begin:int,end:int>>"
    )(col)


def tagged_lengths_stream():
    """mapInPandas kernel: (doc, content) -> (doc, length) under the
    tag-aware stream (markup/script/style contribute no tokens)."""

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = [
                (d, len(parse_tagged_py(content, ())[0]))
                for d, content in zip(pdf["doc"].to_numpy(), pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=["doc", "length"])

    return fn
