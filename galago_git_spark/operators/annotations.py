"""Document entity-annotation plane (AnnotationsGenerateFn.java analog).

The reference tool runs a Stanford NER sequence classifier over documents
(from an index or raw files) and emits per-document entity annotations of
up to three types — LOCATION / PERSON / ORGANIZATION
(``core/.../tools/apps/AnnotationsGenerateFn.java``).  The classifier
itself is an external model artifact the reference loads from disk; this
engine keeps the model pluggable and makes the DISTRIBUTED side real:

- an extractor is any ``str -> list[(entity_type, begin_char, end_char)]``
  callable, registered with :func:`register_extractor` (the analog of
  pointing the reference at a CRF model file);
- :func:`annotate_entities` fans it over the corpus with ``mapInPandas``
  (document text never leaves the executors; one output row per entity,
  exploded — the shape that groupBys/joins downstream);
- no extractor is bundled: calling without registering one raises
  ``NotImplementedError`` naming the plug point, the same honest-stub
  convention as the multimodal decode step (operators/multimodal.py).

``entity_types`` filters to the reference's up-to-three requested types.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

Extractor = Callable[[str], list]

_EXTRACTORS: dict[str, Extractor] = {}


def register_extractor(name: str, fn: Extractor) -> None:
    """Register an entity extractor (the model plug point). ``fn`` maps a
    document's text to ``[(entity_type, begin_char, end_char), ...]``."""
    _EXTRACTORS[name] = fn


def unregister_extractor(name: str) -> None:
    _EXTRACTORS.pop(name, None)


def annotate_entities(
    docs: DataFrame,
    extractor: str | Extractor = "default",
    entity_types: list[str] | None = None,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, entity_type, begin, end, entity_text) — one row per entity
    occurrence, extracted executor-side over Arrow batches.  ``extractor``
    is a registered name or a callable; a named extractor resolves at
    CALL time on the driver (the callable ships in the task closure), so
    registration is a driver-side act like the reference's model path."""
    if callable(extractor):
        fn = extractor
    elif extractor in _EXTRACTORS:
        fn = _EXTRACTORS[extractor]
    else:
        raise NotImplementedError(
            "no entity extractor registered under "
            f"{extractor!r} — this engine ships no NER model (the "
            "reference loads an external Stanford CRF artifact, "
            "AnnotationsGenerateFn.java); register one with "
            "annotations.register_extractor(name, fn)"
        )
    wanted = frozenset(t.upper() for t in entity_types) if entity_types \
        else None

    def stream(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for d, text in zip(pdf[doc_col], pdf[text_col]):
                if not text:
                    continue
                for etype, b, e in fn(text):
                    et = str(etype).upper()
                    if wanted is not None and et not in wanted:
                        continue
                    rows.append((d, et, int(b), int(e), text[b:e]))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["doc", "entity_type", "begin", "end",
                             "entity_text"],
                )

    return docs.select(doc_col, text_col).mapInPandas(
        stream,
        schema="doc long, entity_type string, begin int, end int, "
               "entity_text string",
    )
