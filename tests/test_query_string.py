"""query_string mini-language parser laws (search.parse_query_string):
prefix clauses, integer boosts as qf multiplicity, normalization, and
the degenerate inputs a user's query box will produce.
"""

from __future__ import annotations

import pytest

from dint_spark.search import parse_query_string


def test_clause_routing():
    p = parse_query_string("+join hash -slow")
    assert p == {"must": ["join"], "should": ["hash"],
                 "must_not": ["slow"]}


def test_boost_is_qf_multiplicity():
    p = parse_query_string("scan +filter batch^2 value^3")
    assert p["must"] == ["filter"]
    assert sorted(p["should"]) == ["batch", "batch", "scan",
                                   "value", "value", "value"]


def test_boost_on_must_and_ignored_on_must_not():
    p = parse_query_string("+row^2 -table^5")
    assert p["must"] == ["row", "row"]
    assert p["must_not"] == ["table"]  # negation has no weight channel


def test_malformed_boosts_fall_back_to_1():
    for q in ("hash^0", "hash^-2", "hash^x", "hash^"):
        assert parse_query_string(q)["should"] == ["hash"], q


def test_normalization_and_empty_tokens():
    p = parse_query_string("  +JOIN   -  ^2  HASH^2 ")
    # bare "-" and bare "^2" normalize to nothing and drop
    assert p["must"] == ["join"]
    assert p["should"] == ["hash", "hash"]
    assert p["must_not"] == []


def test_multiple_carets_use_last():
    assert parse_query_string("a^2^3")["should"] == ["a"] * 3


def test_empty_query():
    assert parse_query_string("") == {"must": [], "should": [],
                                      "must_not": []}


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(st.text(alphabet=st.characters(
    whitelist_categories=("Ll", "Lu", "Nd", "Zs"),
    whitelist_characters="+-^\"'~*:()[]{}"), max_size=60))
def test_parser_never_crashes_and_is_well_formed(q):
    """Any query-box input parses without raising; every produced word
    is a normalized [0-9a-z]+ token and clause lists stay lists."""
    p = parse_query_string(q)
    assert set(p) == {"must", "should", "must_not"}
    for clause in p.values():
        for w in clause:
            assert w and w == w.lower()
            assert all(c.isalnum() for c in w)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(
    ["join", "+join", "-join", "hash^2", "+hash^3", "-slow^4", "^", "+",
     "-", "a^b", "scan^0"]), max_size=8))
def test_parser_multiset_law(tokens):
    """Parsing token-by-token equals parsing the joined string — the
    parser is a per-token fold with no cross-token state."""
    whole = parse_query_string(" ".join(tokens))
    folded = {"must": [], "should": [], "must_not": []}
    for t in tokens:
        part = parse_query_string(t)
        for k in folded:
            folded[k] += part[k]
    assert whole == folded
