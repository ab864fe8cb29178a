"""Entity-annotation plumbing (AnnotationsGenerateFn.java analog): the
distributed fan-out is real; the model is a registered plug point."""

from __future__ import annotations

import re

import pytest

from galago_git_spark.operators.annotations import (
    annotate_entities,
    register_extractor,
    unregister_extractor,
)

_CAPS = re.compile(r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)*\b")


def _toy_extractor(text: str):
    # deterministic test model: capitalized runs; multi-word -> PERSON
    out = []
    for m in _CAPS.finditer(text):
        etype = "PERSON" if " " in m.group(0) else "ORGANIZATION"
        out.append((etype, m.start(), m.end()))
    return out


@pytest.fixture(scope="module")
def ann_docs(spark):
    return spark.createDataFrame(
        [
            (0, "Ada Lovelace joined Acme to work with Grace Hopper"),
            (1, "nothing capitalized here"),
            (2, None),
        ],
        ["doc_id", "text"],
    )


def test_unregistered_extractor_raises(ann_docs):
    with pytest.raises(NotImplementedError, match="register_extractor"):
        annotate_entities(ann_docs, extractor="nope")


def test_registered_extractor_rows(spark, ann_docs):
    register_extractor("toy", _toy_extractor)
    try:
        rows = annotate_entities(ann_docs, extractor="toy").collect()
    finally:
        unregister_extractor("toy")
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc"], []).append(
            (r["entity_type"], r["entity_text"])
        )
    assert by_doc == {
        0: [("PERSON", "Ada Lovelace"), ("ORGANIZATION", "Acme"),
            ("PERSON", "Grace Hopper")]
    }
    # offsets index the original text
    for r in rows:
        assert r["entity_text"] == (
            "Ada Lovelace joined Acme to work with Grace Hopper"
        )[r["begin"]:r["end"]]


def test_entity_type_filter(spark, ann_docs):
    rows = annotate_entities(
        ann_docs, extractor=_toy_extractor, entity_types=["person"]
    ).collect()
    assert {r["entity_type"] for r in rows} == {"PERSON"}
    assert len(rows) == 2
