"""Field extent extraction — the engine's analog of Galago's tag-span
fields (``core/.../parse/TagTokenizer.java:38-108`` extracts whitelisted
SGML tag spans as fields over token positions;
``NumberedExtentExtractor`` turns them into ``(name, doc, begin, end)``
tuples).

Source code has no SGML tags; per the code-aware design the fields are
*line-structural* and purely deterministic, so the DuckDB oracle can
replicate them exactly:

- ``comment``: lines whose first non-space character is ``#``
- ``def``:     lines whose stripped text starts with ``def ``

An extent is ``(field, begin, end)`` in 1-based token positions, end
exclusive — the same convention as Galago extents. The concatenation of
per-line tokens equals the document's canonical token stream (the split
regex treats newlines as separators), so extent positions line up with
the postings' positions (tested).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from galago_git_spark.functions.tokenize import tokenize_py

EXTENT_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("field", T.StringType()),
            T.StructField("begin", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)

FIELDS = ("comment", "def", "lead", "tail")
LEAD_K = 10  # the `lead` field spans the first K tokens (title surrogate)
TAIL_K = 10  # the `tail` field spans the last K tokens (footer surrogate)


def line_field(line: str) -> str | None:
    s = line.lstrip()
    if s.startswith("#"):
        return "comment"
    if s.startswith("def "):
        return "def"
    return None


def field_extents_py(text: str | None) -> list[tuple[str, int, int]]:
    """Pure-Python extractor (oracle + UDF kernel)."""
    if not text:
        return []
    out: list[tuple[str, int, int]] = []
    offset = 0
    for line in text.split("\n"):
        toks = tokenize_py(line)
        if not toks:
            continue
        f = line_field(line)
        if f is not None:
            out.append((f, offset + 1, offset + len(toks) + 1))
        offset += len(toks)
    if offset > 0:
        out.append(("lead", 1, min(offset, LEAD_K) + 1))
        out.append(("tail", max(1, offset - TAIL_K + 1), offset + 1))
    return out


@F.pandas_udf(EXTENT_TYPE)
def field_extents_pandas(s: pd.Series) -> pd.Series:
    return s.map(field_extents_py)


def field_extents_col(text: Column) -> Column:
    return field_extents_pandas(text)
