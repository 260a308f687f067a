"""Golden scoring fixtures from FIXTURES.md §2 — these must pass byte-for-byte
against the reference's semantics (north_rule, BASELINE.json)."""

import pytest

from frizbee_spark.core.config import Scoring
from frizbee_spark.core.oracle import (
    has_alignment_path,
    match_greedy,
    score_haystack,
    score_haystack_indices,
)

CHAR = 16  # MATCH_SCORE + MATCHING_CASE_BONUS


def sw(needle, haystack, lanes=8, case_sensitive=False, unicode=False):
    return score_haystack(
        needle,
        haystack,
        case_sensitive=case_sensitive,
        include_prefix=True,
        unicode=unicode,
        lanes=lanes,
    ).score


# FIXTURES.md §2.1 (reference: src/smith_waterman/mod.rs:208-331,420-520)
SW_CASES = [
    ("b", "abc", 16),
    ("c", "abc", 16),
    ("a", "abc", 28),
    ("a", "aabc", 28),
    ("a", "babc", 16),
    ("a", "a", 28),
    ("abc", "abc", 60),
    ("-", "a--bc", 16),
    ("b", "a-b", 20),
    ("a", "a-b-c", 28),
    ("b", "a--b", 20),
    ("c", "a--bc", 16),
    ("a", "-a--bc", 20),
    ("-", "a-bc", 16),
    ("test", "Uteost", 59),
    ("test", "Uteoost", 58),
    ("test", "Utooooeoooosoooot", 40),
    ("test", "Utooooooeoooooosoooooot", 34),
    ("a", "A", 24),
    ("A", "Aa", 28),
    ("D", "forDist", 20),
    ("D", "foRDist", 16),
    ("D", "FOR_DIST", 20),
]


@pytest.mark.parametrize("needle,haystack,expected", SW_CASES)
def test_sw_fixture(needle, haystack, expected):
    assert sw(needle, haystack) == expected


@pytest.mark.parametrize("lanes", [8, 16, 32, 64])
def test_sw_fixture_lane_independent(lanes):
    for needle, haystack, expected in SW_CASES:
        assert sw(needle, haystack, lanes=lanes) == expected, (needle, haystack, lanes)


SW_INEQUALITIES = [
    (("swap", "swap(test)"), ("swap", "iter_swap(test)")),
    (("_", "_private_member"), ("_", "public_member")),
    (("H", "HELLO"), ("H", "fooHello")),
    (("foo", "fooo"), ("foo", "f_o_o_o")),
    (("fo", "foo"), ("fo", "faOo")),
    (("abc", "a111bc"), ("abc", "a1b1c")),
    (("b", "b"), ("b", "a-b")),
    (("b", "a-b"), ("b", "ab")),
    (("a_b", "a_bb"), ("a_b", "a__b")),
]


@pytest.mark.parametrize("hi,lo", SW_INEQUALITIES)
def test_sw_inequalities(hi, lo):
    assert sw(*hi) > sw(*lo)


def test_sw_case_inequality():
    assert sw("B", "aB", case_sensitive=True) > sw("b", "aB")


# FIXTURES.md §2.2 — unicode layer (src/smith_waterman/mod.rs:228-252)
UNICODE_CASES = [
    ("é", "é", 28),
    ("😀", "😀", 28),
    ("éx", "éx", 44),
    ("ab", "aéb", 39),
    ("ab", "aé😀b", 38),
]


@pytest.mark.parametrize("needle,haystack,expected", UNICODE_CASES)
def test_sw_unicode_fixture(needle, haystack, expected):
    assert sw(needle, haystack, unicode=True) == expected


def test_unicode_gap_equivalence():
    assert sw("éx", "ébx", unicode=True) == sw("éx", "é😀x", unicode=True)


@pytest.mark.parametrize("lanes", [8, 16, 32])
def test_unicode_lane_independent(lanes):
    for needle, haystack, expected in UNICODE_CASES:
        assert sw(needle, haystack, unicode=True, lanes=lanes) == expected


# FIXTURES.md §2.3 — typo thresholds (src/smith_waterman/mod.rs:329-440)
def sw_typos(needle, haystack, max_typos, case_sensitive=False):
    score = sw(needle, haystack, case_sensitive=case_sensitive)
    if has_alignment_path(needle, haystack, max_typos, case_sensitive=case_sensitive):
        return score
    return None


TYPO_CASES = [
    ("abc", "axc", 0, False, None),
    ("abc", "ac", 0, False, None),
    ("foo", "Ufooo", 0, False, 48),
    ("foo", "Ufo", 0, False, None),
    ("foo", "Ufo", 1, False, 27),
    ("foo", "Ufo", 2, False, 27),
    ("foo", "Uf", 1, False, None),
    ("foo", "Uf", 2, False, 10),
    ("foo", "U", 2, False, None),
    ("foo", "U", 3, False, 0),
    ("foo", "U", 4, False, 0),
    ("A", "A", 0, True, 28),
    ("A", "a", 0, True, None),
    ("A", "a", 0, False, 24),
]


@pytest.mark.parametrize("needle,haystack,max_typos,case_sensitive,expected", TYPO_CASES)
def test_sw_typos(needle, haystack, max_typos, case_sensitive, expected):
    assert sw_typos(needle, haystack, max_typos, case_sensitive) == expected


def test_sw_typos_non_null():
    assert sw_typos("abc", "axc", 1) is not None
    assert sw_typos("abc", "ac", 1) is not None
    assert sw_typos("abc", "abbc", 0) is not None


# FIXTURES.md §2.4 — matched indices, reverse order (mod.rs:322-326,443-520)
def indices(needle, haystack, unicode=False, start_pos=0):
    return score_haystack_indices(
        needle, haystack, haystack_start_pos=start_pos, unicode=unicode
    )[1]


INDICES_CASES = [
    ("_", "abc", []),
    ("a", "abc", [0]),
    ("b", "abc", [1]),
    ("c", "abc", [2]),
    ("ac", "________________abc", [18, 16]),
    ("foo", "Uf", [1]),
    ("aa", "aaa", [1, 0]),
    ("ab", "abab", [1, 0]),
    ("abc", "xabcabc", [3, 2, 1]),
]


@pytest.mark.parametrize("needle,haystack,expected", INDICES_CASES)
def test_indices(needle, haystack, expected):
    assert indices(needle, haystack) == expected


UNICODE_INDICES_CASES = [
    ("é", "é", [1, 0]),
    ("😀", "😀", [3, 2, 1, 0]),
    ("aé", "aé", [2, 1, 0]),
    ("ab", "aéb", [3, 0]),
    ("ab", "aé😀b", [7, 0]),
    ("éx", "é😀x", [6, 1, 0]),
    ("éé", "ééé", [3, 2, 1, 0]),
    ("😀x", "_______😀x", [11, 10, 9, 8, 7]),
    ("😀.a", "..😀a", [6, 1]),
    ("😀.é", "..😀é", [7, 6, 1]),
    ("😀 a", "  😀a", [6, 1]),
    ("😀é", "..😀é", [7, 6, 5, 4, 3, 2]),
]


@pytest.mark.parametrize("needle,haystack,expected", UNICODE_INDICES_CASES)
def test_unicode_indices(needle, haystack, expected):
    assert indices(needle, haystack, unicode=True) == expected


def test_unicode_indices_with_offset():
    assert indices("é", "é", unicode=True, start_pos=3) == [4, 3]
    assert indices("éx", "é😀x", unicode=True, start_pos=3) == [9, 4, 3]


@pytest.mark.parametrize("length", [1023, 1024, 1025])
def test_long_boundary_indices(length):
    haystack = "x" * (length - 3) + "abc"
    assert sw("abc", haystack) == 48
    assert indices("abc", haystack) == [length - 1, length - 2, length - 3]


# FIXTURES.md §2.5 — greedy path (src/smith_waterman/greedy.rs:93-193)
def greedy(needle, haystack):
    res = match_greedy(
        needle.encode(), haystack.encode(), Scoring(), False, True
    )
    return res[0] if res is not None else 0


GREEDY_CASES = [
    ("b", "abc", 16),
    ("fbb", "barbazfoobarbaz", 36),
    ("a", "b", 0),
    ("ab", "ba", 0),
    ("abc", "ab", 0),
    ("a", "abc", 28),
    ("a", "-a--bc", 16),
    ("test", "Uterst", 59),
    ("test", "Uterrst", 58),
    ("d", "forDist", 16),
    ("D", "forDist", 20),
    ("D", "FOR_DIST", 20),
    ("-", "a-bc", 16),
    ("-", "a--bc", 16),
]


@pytest.mark.parametrize("needle,haystack,expected", GREEDY_CASES)
def test_greedy(needle, haystack, expected):
    assert greedy(needle, haystack) == expected


def test_greedy_saturation():
    haystack = "a" + "x" * 70000 + "b"
    assert greedy("ab", haystack) == 4


def test_greedy_delimiter_inequality():
    assert greedy("a_b", "a_bb") > greedy("a_b", "a__b")
