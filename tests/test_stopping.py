"""Stopping: StopWordTraversal + StopStructureTraversal + word-list
resources (traversal/StopWordTraversal.java:47-82,
StopStructureTraversal.java:44-110, util/WordLists.java:25-70,
resources/stopwords/inquery). No Spark needed — pure tree rewrites."""

from __future__ import annotations

from galago_git_spark.functions.wordlists import stop_structures, word_list
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform


def test_inquery_list_loads():
    words = word_list("inquery")
    assert len(words) == 418
    assert "the" in words and "about" in words
    assert "volcano" not in words


def test_stop_structures_end_with_space():
    ss = stop_structures()
    assert all(s.endswith(" ") for s in ss)
    assert "why is " in ss


def test_stopword_over_sdm_matches_hand_stopped_expansion():
    # the traversal-order pattern (reference §5.5): #stopword runs BEFORE
    # sdm expansion, so stopped terms never contribute od/uw pairs
    got = str(transform(parse("#stopword(#sdm(the example query))")))
    want = str(transform(parse("#sdm(example query)")))
    assert got == want


def test_ss_alias_and_recursion():
    got = str(transform(parse("#ss(this example query)")))
    want = str(transform(parse("#combine(example query)")))
    assert got == want


def test_stopstructure_strips_longest_prefix():
    # "why is there" and "why is" are both in the list; longest wins
    got = str(transform(parse("#stopstructure(why is there water on mars)")))
    want = str(transform(parse("#combine(water on mars)")))
    assert got == want


def test_stopstructure_no_match_is_identity():
    got = str(transform(parse("#stopstructure(volcano eruption dates)")))
    want = str(transform(parse("#combine(volcano eruption dates)")))
    assert got == want


def test_stopstructure_then_stopword_compose():
    # stopstructure runs first (FeatureFactory.java:112-113), then
    # stopword removes remaining stop terms from what is left
    got = str(transform(parse("#stopword(#stopstructure(why is the sky blue))")))
    # the stopping rewrites leave a nested #combine that the flatten
    # traversals then merge — compare against the same nested shape
    want = str(transform(parse("#combine(#combine(sky blue))")))
    assert got == want
