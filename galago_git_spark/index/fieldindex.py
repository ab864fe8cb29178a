"""Typed field part + field-comparison compilation.

The analog of FieldIndexWriter/FieldIndexReader
(``core/.../index/disk/FieldIndexWriter.java``,
``FieldIndexReader.java``) and the FieldComparisonIterator family
(``core/.../retrieval/iterator/FieldComparisonIterator.java:45-81``,
``GreaterThanIterator.java``, ``LessThanIterator.java``,
``InBetweenIterator.java:63-90`` — strict bounds, ``EqualityIterator.java``).
The allowed format list mirrors BuildIndex's validation
(``BuildIndex.java:502-517``): string/int/long/float/double/date.

Spark-first shape: the part is one narrow row per (doc, field) with the
value in a per-kind column — ``sval`` (string), ``nval`` (int/long/date
epoch-millis), ``dval`` (float/double). A comparison compiles to a
predicate-pushable scan of this part (filter on ``field`` + the typed
column reaches the parquet reader), so ``#between`` over 10^12 docs is a
partition-pruned columnar scan, not a join.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIELD_FORMATS = ("string", "int", "long", "float", "double", "date")

_VALUE_COL = {
    "string": "sval",
    "int": "nval",
    "long": "nval",
    "date": "nval",
    "float": "dval",
    "double": "dval",
}

# DateFormat.getDateInstance(DateFormat.SHORT) in the reference's en_US
# default locale is "M/d/yy" (lenient: 4-digit years accepted)
_DATE_PATTERNS = ("%m/%d/%Y", "%m/%d/%y")


def _date_millis_col(col: Column) -> Column:
    """String/date/timestamp column -> epoch millis, interpreted in UTC
    like the query side (:func:`parse_field_value`) — NOT in the session
    timezone, which would shift #greater/#less/#between boundaries by the
    UTC offset on any cluster not running spark.sql.session.timeZone=UTC.
    Date-only values go through DateType (``unix_date`` is tz-free); full
    timestamps fall back to a parse re-based from session tz to UTC."""
    s = col.cast("string")
    date_ms = F.unix_date(
        F.coalesce(
            F.to_date(s, "M/d/yyyy"), F.to_date(s, "M/d/yy"), F.to_date(s)
        )
    ).cast("long") * F.lit(86400000).cast("long")
    ts_ms = F.unix_millis(
        F.from_utc_timestamp(F.to_timestamp(s), F.current_timezone())
    )
    # to_date(s) also accepts timestamp strings (truncating): prefer the
    # timestamp parse whenever the string carries a time component
    return F.when(s.rlike("[0-9]:[0-9]"), F.coalesce(ts_ms, date_ms)).otherwise(
        F.coalesce(date_ms, ts_ms)
    )


def build_field_part(
    docs: DataFrame, formats: dict[str, str], doc_col: str = "doc_id"
) -> DataFrame:
    """Typed field part from table columns: ``formats`` maps column name ->
    format (the ``tokenizer/formats`` build parameter,
    ``BuildIndex.java:502-517``). Returns (doc, field, sval, nval, dval)."""
    parts = []
    for fname, fmt in formats.items():
        if fmt not in FIELD_FORMATS:
            raise ValueError(
                f"unknown field format {fmt!r} for {fname!r}; "
                f"expected one of {FIELD_FORMATS}"
            )
        col = F.col(fname)
        sval = col.cast("string") if fmt == "string" else F.lit(None).cast("string")
        if fmt in ("int", "long"):
            nval = col.cast("long")
        elif fmt == "date":
            nval = _date_millis_col(col)
        else:
            nval = F.lit(None).cast("long")
        dval = (
            col.cast("double")
            if fmt in ("float", "double")
            else F.lit(None).cast("double")
        )
        parts.append(
            docs.select(
                F.col(doc_col).cast("long").alias("doc"),
                F.lit(fname).alias("field"),
                sval.alias("sval"),
                nval.alias("nval"),
                dval.alias("dval"),
            ).filter(
                F.col("sval").isNotNull()
                | F.col("nval").isNotNull()
                | F.col("dval").isNotNull()
            )
        )
    if not parts:
        raise ValueError("build_field_part needs at least one field format")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def parse_field_value(fmt: str, raw) -> str | int | float:
    """Parse a query-side comparison value per the field's format
    (FieldComparisonIterator.parseField, FieldComparisonIterator.java:45-81)."""
    if fmt == "string":
        return str(raw)
    if fmt in ("int", "long"):
        return int(raw)
    if fmt in ("float", "double"):
        return float(raw)
    if fmt == "date":
        s = str(raw)
        for pat in _DATE_PATTERNS:
            try:
                dt = datetime.strptime(s, pat).replace(tzinfo=timezone.utc)
                return int(dt.timestamp() * 1000)
            except ValueError:
                continue
        raise ValueError(f"cannot parse date value {s!r} (expected M/d/yyyy)")
    raise ValueError(f"unknown field format {fmt!r}")


def field_comparison_docs(node, index) -> DataFrame:
    """Indicator docs for #greater/#less/#between/#equals over the typed
    field part. ``node`` is the post-rewrite shape
    ``#op:0=v[:1=v2](#field:name())`` (ImplicitFeatureCastTraversal.java:
    59-81)."""
    if index.fields_part is None or not index.field_formats:
        raise ValueError(
            f"#{node.operator} requires a typed fields part "
            "(build with field_formats={...})"
        )
    fnode = node.children[0]
    fname = str(fnode.default_param)
    fmt = index.field_formats.get(fname)
    if fmt is None:
        raise ValueError(
            f"no typed field {fname!r}; known: {sorted(index.field_formats)}"
        )
    col = F.col(_VALUE_COL[fmt])
    v0 = parse_field_value(fmt, node.parameters["0"])
    op = node.operator
    if op == "greater":
        pred = col > F.lit(v0)
    elif op == "less":
        pred = col < F.lit(v0)
    elif op == "equals":
        pred = col == F.lit(v0)
    elif op == "between":
        v1 = parse_field_value(fmt, node.parameters["1"])
        pred = (col > F.lit(v0)) & (col < F.lit(v1))  # strict both ends
    else:
        raise ValueError(f"not a field comparison: #{op}")
    return (
        index.fields_part.filter(F.col("field") == fname)
        .filter(pred)
        .select("doc")
    )
