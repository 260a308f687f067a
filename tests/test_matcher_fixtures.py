"""FIXTURES.md §2.6-2.9: match_list end-to-end, literal modes, prefilter,
pattern parsing."""

import pytest

from frizbee_spark.core.config import (
    CaseMatching,
    Config,
    Matching,
    SortStrategy,
)
from frizbee_spark.core.matcher import Matcher
from frizbee_spark.core.pattern import Pattern
from frizbee_spark.core.prefilter import prefilter_ascii, prefilter_unicode


# §2.6 match_list (src/matcher/mod.rs:532-654; tests/api_properties.rs:437-449)
def test_match_list_ordering_and_exact():
    haystacks = ["deadbeef", "deadbf", "deadbeefg", "deadbe"]
    m = Matcher("deadbe", Config(max_typos=None))
    matches = m.match_list(haystacks)
    assert [x.index for x in matches] == [3, 0, 2, 1]
    assert [x.exact for x in matches] == [True, False, False, False]


def test_match_list_typo_filtering():
    haystacks = ["deadbeef", "deadbf", "deadbeefg", "deadbe"]
    m = Matcher("deadbe", Config(max_typos=0))
    matches = m.match_list(haystacks)
    assert len(matches) == 3
    assert {x.index for x in matches} == {0, 2, 3}


def test_match_list_casing_respect():
    haystacks = ["foo", "FOO", "fOo", "xxfooxx"]
    m = Matcher("foo", Config(casing=CaseMatching.RESPECT, sort=SortStrategy.INDEX_ASC))
    assert [x.index for x in m.match_list(haystacks)] == [0, 3]


def test_match_list_casing_smart():
    haystacks = ["foo", "FOO", "FoO", "xxFoOxx"]
    m = Matcher("FoO", Config(sort=SortStrategy.INDEX_ASC))
    assert [x.index for x in m.match_list(haystacks)] == [2, 3]


def test_match_list_empty_needle():
    haystacks = ["a", "b", "c"]
    m = Matcher("", Config())
    matches = m.match_list(haystacks)
    assert [x.index for x in matches] == [0, 1, 2]
    assert all(x.score == 0 for x in matches)


def test_unsorted_output_preserves_candidate_order():
    # matcher/algo.rs:444-456
    haystacks = ["foo", "nomatch", "xfoo", "f_o_o", "bar"]
    m = Matcher("foo", Config(sort=SortStrategy.INDEX_ASC))
    assert [x.index for x in m.match_list(haystacks)] == [0, 2, 3]


def test_match_list_indices_public():
    # matcher/algo.rs:458-469
    haystacks = ["xabcx", "a_b_c", "nomatch"]
    m = Matcher("abc", Config(sort=SortStrategy.INDEX_ASC))
    matches = m.match_list_indices(haystacks)
    assert len(matches) == 2
    assert matches[0].index == 0
    assert matches[0].indices == (3, 2, 1)
    assert matches[1].index == 1
    assert matches[1].indices == (4, 2, 0)


def test_greedy_fallback_membership_agreement():
    # matcher/algo.rs:396-408
    haystack = "a" + "z" * 1100 + "b"
    config = Config(max_typos=1)
    matches = Matcher("abc", config).match_list([haystack])
    indices = Matcher("abc", config).match_list_indices([haystack])
    assert len(matches) == 1 and len(indices) == 1
    assert matches[0].score == indices[0].score
    assert indices[0].indices == ()


# §2.7 literal modes (src/literal/mod.rs:54-132,208-359)
def lit(mode, needle, haystacks, casing=CaseMatching.SMART):
    cfg = Config(matching=mode, casing=casing, sort=SortStrategy.INDEX_ASC)
    return Matcher(needle, cfg).match_list(haystacks)


def test_literal_exact():
    matches = lit(Matching.EXACT, "foo", ["foo", "foobar", "xfoo", "FOO"])
    assert [m.index for m in matches] == [0, 3]
    assert all(m.exact for m in matches)


def test_literal_exact_scores():
    assert lit(Matching.EXACT, "abc", ["abc"])[0].score == 68
    assert lit(Matching.EXACT, "a", ["a"])[0].score == 36


def test_literal_prefix_suffix():
    hs = ["foobar", "barfoo", "foo", "xfoobar"]
    assert [m.index for m in lit(Matching.PREFIX, "foo", hs)] == [0, 2]
    assert [m.index for m in lit(Matching.SUFFIX, "foo", hs)] == [1, 2]


def test_literal_substring_scores():
    assert lit(Matching.SUBSTRING, "bar", ["foobar"])[0].score == 48
    assert lit(Matching.SUBSTRING, "bar", ["foo_bar"])[0].score == 52
    # pos-0 prefix occurrence beats the delimiter occurrence
    assert lit(Matching.SUBSTRING, "ab", ["ab_ab"])[0].score == 44


def test_literal_substring_unicode():
    assert lit(Matching.SUBSTRING, "é", ["é"])[0].score == 36
    # 2*CHAR + PREFIX + EXACT (reference: src/literal/mod.rs:300-306)
    assert lit(Matching.SUBSTRING, "éx", ["éx"])[0].score == 52
    assert lit(Matching.SUBSTRING, "é", ["xé"])[0].score == 16


def test_literal_substring_length_changing_fold():
    # ß→SS fold changes byte length, so it stays case-sensitive
    assert lit(Matching.SUBSTRING, "ß", ["SS"], casing=CaseMatching.IGNORE) == []
    assert lit(Matching.SUBSTRING, "ß", ["ss"], casing=CaseMatching.IGNORE) == []
    assert len(lit(Matching.SUBSTRING, "ß", ["ß"], casing=CaseMatching.IGNORE)) == 1


def test_literal_cherokee_hybrid_rejection():
    # Ꭰ (U+13A0) folds to ꭰ (U+AB70); hybrid byte mixes must not match
    assert len(lit(Matching.SUBSTRING, "Ꭰ", ["ꭰ"], casing=CaseMatching.IGNORE)) == 1
    hybrid = "᭰"
    assert lit(Matching.SUBSTRING, "Ꭰ", [hybrid], casing=CaseMatching.IGNORE) == []


# §2.8 prefilter (src/prefilter/mod.rs:188-248)
PREFILTER_TRUE = [
    ("foo", "foo", 0),
    ("foo", "f_o_o", 0),
    ("foo", "FOO", 0),
    ("abc", "xaxbxcx", 0),
    ("foo", "f_______________o_______________o", 0),
    ("abc", "bc", 1),
    ("abc", "ac", 1),
    ("abc", "ab", 1),
    ("hello", "hll", 2),
    ("abcdef", "abdf", 2),
    ("TeSt", "ES", 2),
    ("abc", "c", 2),
    ("abc", "", 3),
    ("abc", "cba", 2),
    ("aaa", "aa", 1),
    ("aba", "aa", 1),
    ("aaba", "aba", 1),
    ("d63NacaDJaaaa", "63aeeaaaeeaaaaaaaNacaDJaaAa", 1),
]
PREFILTER_FALSE = [
    ("foo", "oof", 0),
    ("abc", "cba", 0),
    ("foo", "fo", 0),
    ("a", "", 0),
    ("aa", "a", 0),
    ("abc", "", 2),
    ("bar", "rb", 1),
    ("abcdef", "fcda", 2),
    ("TeSt", "ES", 1),
    ("abc", "cba", 1),
    ("aaa", "aa", 0),
]


@pytest.mark.parametrize("needle,haystack,k", PREFILTER_TRUE)
def test_prefilter_true(needle, haystack, k):
    assert prefilter_ascii(needle.encode(), haystack.encode(), k, False)[0]


@pytest.mark.parametrize("needle,haystack,k", PREFILTER_FALSE)
def test_prefilter_false(needle, haystack, k):
    assert not prefilter_ascii(needle.encode(), haystack.encode(), k, False)[0]


def test_prefilter_windows_conservative():
    # prefilter/mod.rs:273-278
    assert prefilter_ascii(b"foo", b"xxfooxfoo", 0, False) == (True, 2, 9)
    assert prefilter_ascii(b"abc", b"xxaybzczz", 0, False) == (True, 2, 7)
    assert prefilter_ascii(b"abcd", b"xxaydz", 2, False) == (True, 2, 5)
    assert prefilter_ascii(b"abc", b"xyz", 3, False) == (True, 0, 3)


def test_prefilter_case_sensitive():
    # prefilter/mod.rs:251-270
    cases = [
        ("foo", "foo", 0, True),
        ("foo", "FOO", 0, False),
        ("FoO", "xxFoOxx", 0, True),
        ("abc", "xaxbxcx", 0, True),
        ("abc", "xAxBxCx", 0, False),
        ("TeSt", "eS", 2, True),
        ("TeSt", "ES", 2, False),
        ("Ab", "b", 1, True),
        ("Ab", "ab", 0, False),
        ("Ab", "ab", 1, True),
    ]
    for needle, haystack, k, want in cases:
        got = prefilter_ascii(needle.encode(), haystack.encode(), k, True)[0]
        assert got == want, (needle, haystack, k)


def test_prefilter_unicode_windows():
    # prefilter/mod.rs:281-293
    assert prefilter_unicode("إن", "xxإنyy".encode(), 0, False) == (True, 2, 6)
    assert prefilter_unicode("니다", "xx니__다yy".encode(), 0, False) == (True, 2, 10)
    assert prefilter_unicode("😀", "xx😀yy".encode(), 0, False) == (True, 2, 6)


def test_prefilter_unicode_back_scan():
    haystack = "xxإن" + "x" * 32 + "نzz"
    hay_b = haystack.encode()
    expected_end = hay_b.rindex("ن".encode()) + len("ن".encode())
    assert prefilter_unicode("إن", hay_b, 0, False) == (True, 2, expected_end)


def test_prefilter_unicode_typos():
    assert prefilter_unicode("إن", "ن".encode(), 1, False)[0]
    assert not prefilter_unicode("إن", "ن".encode(), 0, False)[0]
    assert prefilter_unicode("éन😀", "😀".encode(), 2, False)[0]
    assert not prefilter_unicode("éन😀", "😀".encode(), 1, False)[0]


# §2.9 pattern parsing (src/pattern.rs:295-383)
@pytest.mark.parametrize(
    "atom,needle,matching,negated",
    [
        ("foo", "foo", None, False),
        ("^foo", "foo", Matching.PREFIX, False),
        ("foo$", "foo", Matching.SUFFIX, False),
        ("'foo", "foo", Matching.SUBSTRING, False),
        ("^foo$", "foo", Matching.EXACT, False),
        ("!foo", "foo", Matching.SUBSTRING, True),
        ("!^foo", "foo", Matching.PREFIX, True),
        ("!foo$", "foo", Matching.SUFFIX, True),
        ("!^foo$", "foo", Matching.EXACT, True),
        ("\\^foo", "^foo", None, False),
        ("foo\\$", "foo$", None, False),
        ("\\'foo", "'foo", None, False),
        ("\\!foo", "!foo", None, False),
        ("foo\\ bar", "foo bar", None, False),
        ("!\\^foo", "^foo", Matching.SUBSTRING, True),
        ("foo\\\\$", "foo\\\\", Matching.SUFFIX, False),
        ("foo\\bar", "foo\\bar", None, False),
    ],
)
def test_pattern_parse(atom, needle, matching, negated):
    p = Pattern.parse(atom)
    assert p.needle == needle
    assert p.config.matching == matching
    assert p.negated == negated


def test_parse_query():
    ps = Pattern.parse_query("foo !^bar")
    assert len(ps) == 2
    assert ps[0].needle == "foo"
    assert ps[1].needle == "bar" and ps[1].negated

    ps = Pattern.parse_query("foo\\ bar baz")
    assert [p.needle for p in ps] == ["foo bar", "baz"]

    assert Pattern.parse_query("") == []
    assert Pattern.parse_query("   ") == []
    assert Pattern.parse_query("! ^$ '") == []


# multi-pattern semantics (src/matcher/multi.rs:164-228)
def test_multi_pattern_and_not():
    haystacks = ["foobar", "foo", "barfoo", "bar", "qux"]
    m = Matcher.from_query("foo !bar", Config(sort=SortStrategy.INDEX_ASC))
    assert [x.index for x in m.match_list(haystacks)] == [1]


def test_multi_pattern_double_scores():
    haystacks = ["foobar", "xfooy"]
    single = Matcher.from_query("foo", Config()).match_list(haystacks)
    double = Matcher.from_query("foo foo", Config()).match_list(haystacks)
    assert [(m.index, m.score * 2) for m in single] == [
        (m.index, m.score) for m in double
    ]


def test_multi_pattern_contradiction():
    haystacks = ["foobar", "foo"]
    assert Matcher.from_query("foo !foo", Config()).match_list(haystacks) == []
