"""Parity harness: vectorized batch kernel == scalar oracle matcher
(mirrors /root/reference/src/smith_waterman/backend/tests/parity.rs —
the vectorized backend must be score-identical to the scalar oracle)."""

import random

import numpy as np
import pytest

from frizbee_spark.core.config import CaseMatching, Config, SortStrategy
from frizbee_spark.core.matcher import Matcher
from frizbee_spark.kernel import match_batch

CHARSET = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 /.,_-:")
BOUNDARY_LENGTHS = [1, 7, 8, 15, 16, 31, 32, 63, 64, 127, 128, 1023, 1024, 1025]


def _rand_string(rng: random.Random, max_len: int) -> str:
    if rng.random() < 0.4:
        length = rng.choice([b for b in BOUNDARY_LENGTHS if b <= max_len])
    else:
        length = rng.randint(0, max_len)
    return "".join(rng.choice(CHARSET) for _ in range(length))


def _assert_parity(needle: str, haystacks: list[str], config: Config) -> None:
    oracle = Matcher(needle, config.with_(sort=SortStrategy.INDEX_ASC))
    expected = {m.index: m for m in oracle.match_list(haystacks)}
    got = match_batch(needle, haystacks, config)
    for i, _h in enumerate(haystacks):
        want = expected.get(i)
        if want is None:
            assert not got.matched[i], (needle, haystacks[i], config.max_typos)
        else:
            assert got.matched[i], (needle, haystacks[i], config.max_typos)
            assert int(got.score[i]) == want.score, (
                needle,
                haystacks[i],
                config.max_typos,
                int(got.score[i]),
                want.score,
            )
            assert bool(got.exact[i]) == want.exact


@pytest.mark.parametrize("seed", range(8))
def test_kernel_matches_oracle_random(seed):
    rng = random.Random(12345 + seed)
    for max_typos in [0, 1, 2, None]:
        needle = ""
        while not needle:
            needle = _rand_string(rng, 8)
        haystacks = [_rand_string(rng, 96) for _ in range(60)]
        # plant guaranteed hits
        haystacks += [needle, "x" + needle, needle + "x", needle.upper()]
        config = Config(max_typos=max_typos)
        _assert_parity(needle, haystacks, config)


@pytest.mark.parametrize("casing", [CaseMatching.IGNORE, CaseMatching.SMART, CaseMatching.RESPECT])
def test_kernel_matches_oracle_casing(casing):
    rng = random.Random(777)
    needle = "FoO"
    haystacks = [_rand_string(rng, 48) for _ in range(40)]
    haystacks += ["foo", "FOO", "FoO", "xxFoOxx", "f_o_O"]
    _assert_parity(needle, haystacks, Config(max_typos=1, casing=casing))


def test_kernel_long_haystacks_greedy_path():
    rng = random.Random(999)
    needle = "abc"
    haystacks = [
        "x" * 1020 + "abc",
        "x" * 1022 + "abc",
        "a" + "z" * 1100 + "bc",
        "a" + "z" * 1100 + "b",
        _rand_string(rng, 2000),
    ]
    _assert_parity(needle, haystacks, Config(max_typos=1))
    _assert_parity(needle, haystacks, Config(max_typos=None))


def test_kernel_empty_needle():
    got = match_batch("", ["a", "b"], Config())
    assert got.matched.all()
    assert (got.score == 0).all()


def test_kernel_unicode_fallback_parity():
    haystacks = ["é", "xé", "éx", "e", "née", "naïve", ""]
    _assert_parity("é", haystacks, Config(max_typos=0))


def test_kernel_scores_are_u16():
    got = match_batch("abc", ["abcabcabc"], Config(max_typos=None))
    assert got.score.dtype == np.uint16


def test_kernel_u8_narrowing_parity():
    """The u8 fast path (mod.rs:92-116) must be numerically identical to
    the u16 path; force both dtypes on the same inputs and compare."""
    from frizbee_spark.kernel import AsciiKernel

    rng = random.Random(4242)
    needle = "spark"
    haystacks = [_rand_string(rng, rng.randint(1, 200)) for _ in range(300)]
    haystacks += ["spark", "SPARK", "s-p-a-r-k", "sp ark", "xxspakrxx"]
    cfg = Config(max_typos=None)
    k = AsciiKernel(needle, cfg)
    assert k.dtype == np.uint8  # default scoring + short needle fits u8
    res8 = k.match_batch(haystacks)
    k.dtype = np.uint16
    res16 = k.match_batch(haystacks)
    assert (res8.matched == res16.matched).all()
    assert (res8.score == res16.score).all()
    assert (res8.exact == res16.exact).all()


def test_kernel_u8_ineligible_long_needle():
    from frizbee_spark.kernel import AsciiKernel

    k = AsciiKernel("a" * 64, Config(max_typos=None))
    assert k.dtype == np.uint16


class TestUnicodeKernelParity:
    """Batched byte-lane unicode kernel (kernel.UnicodeKernel) vs the
    scalar oracle matcher — same contract the ascii kernel is held to."""

    def test_unicode_fuzz_vs_scalar_matcher(self):
        import random

        from frizbee_spark.core.config import CaseMatching, Config
        from frizbee_spark.core.matcher import Matcher
        from frizbee_spark.core.pattern import Pattern
        from frizbee_spark.kernel import match_batch

        random.seed(5)
        alphabet = "aäbßcçdđeéfğhійk лm中n文o😀p- _/ABÇD"
        needles = ["ä", "ßen", "çok", "文中", "éfğ", "naïve", "ÉF", "a文b", "ß中ж😀"]
        cfgs = [
            Config(),
            Config(max_typos=None),
            Config(max_typos=2),
            Config(casing=CaseMatching.RESPECT),
            Config(max_typos=0),
        ]
        for needle in needles:
            texts = [
                "".join(random.choice(alphabet) for _ in range(random.randint(0, 40)))
                for _ in range(120)
            ]
            texts += [needle, " " + needle, needle.upper(), needle + "x", ""]
            for cfg in cfgs:
                matcher = Matcher([Pattern.new(needle)], cfg)
                got = match_batch(needle, texts, cfg)
                for i, t in enumerate(texts):
                    r = matcher.match_one(t, i)
                    exp = (r.score, r.exact) if r else None
                    g = (
                        (int(got.score[i]), bool(got.exact[i]))
                        if got.matched[i]
                        else None
                    )
                    assert g == exp, (needle, cfg.max_typos, t, g, exp)

    def test_unicode_uses_vectorized_kernel(self):
        from frizbee_spark.core.config import Config
        from frizbee_spark.kernel import UnicodeKernel

        k = UnicodeKernel("ßen", Config())
        res = k.match_batch(["die straßen", "no match here...", "ßen"])
        assert bool(res.matched[0]) and bool(res.matched[2])
        assert bool(res.exact[2])


class TestLiteralKernelParity:
    """Vectorized LiteralKernel == scalar LiteralMatcher (via Matcher) for
    every literal matching mode (literal/algo.rs:229-313)."""

    @pytest.mark.parametrize("mode_name", ["EXACT", "PREFIX", "SUFFIX", "SUBSTRING"])
    @pytest.mark.parametrize("casing", [CaseMatching.IGNORE, CaseMatching.RESPECT, CaseMatching.SMART])
    def test_literal_fuzz_vs_scalar(self, mode_name, casing):
        from frizbee_spark.core.config import Matching

        rng = random.Random(4242)
        mode = getattr(Matching, mode_name)
        for needle in ["spark", "Spark", "a", "the Scan", "x/y.z", "0_1"]:
            haystacks = [_rand_string(rng, 64) for _ in range(50)]
            haystacks += [
                needle, needle.lower(), needle.upper(),
                "xx" + needle, needle + "yy", "xx" + needle + "yy",
                needle + " " + needle, "", "x",
                "Xx" + needle.upper() + needle.lower(),
            ]
            cfg = Config(matching=mode, casing=casing)
            _assert_parity(needle, haystacks, cfg)

    def test_literal_uses_vectorized_kernel(self):
        from frizbee_spark.core.config import Matching
        from frizbee_spark.kernel import LiteralKernel

        k = LiteralKernel("abc", Config(matching=Matching.SUBSTRING))
        res = k.match_batch(["xxabcxx", "noope", "abc"])
        assert list(res.matched) == [True, False, True]
        assert bool(res.exact[2]) and not bool(res.exact[0])

    def test_literal_multibyte_haystack(self):
        from frizbee_spark.core.config import Matching

        # ASCII needle over utf-8 haystacks: byte-level comparisons must
        # never match continuation bytes, and bonuses use raw byte classes
        for mode in [Matching.SUBSTRING, Matching.PREFIX, Matching.SUFFIX]:
            _assert_parity(
                "ab",
                ["日本ab語", "ab日本", "日本ab", "日aβb本", "åb"],
                Config(matching=mode),
            )


class TestEndCol:
    """end_col surface (src/lib.rs:150-152, `match_end_col` feature):
    expectations transcribed from the reference's own tests
    (matcher/algo.rs:472-478, matcher/mod.rs:853-863)."""

    def test_end_col_with_prefilter_trim(self):
        # matcher/algo.rs:473-478: trim must not shift offsets
        res = match_batch("abc", ["xxabcxx"], Config(max_typos=0))
        assert bool(res.matched[0]) and int(res.end_col[0]) == 4

    def test_end_col_all_scores(self):
        # matcher/mod.rs:854-863
        res = match_batch("abc", ["xabcx", "abcdef", "xxabc"], Config(max_typos=None))
        assert list(res.matched) == [True, True, True]
        assert [int(x) for x in res.end_col] == [3, 2, 4]

    def test_end_col_literal_substring(self):
        from frizbee_spark.core.config import Matching

        res = match_batch("abc", ["xxabcxx", "abc"], Config(matching=Matching.SUBSTRING))
        # literal/algo.rs:112-114: pos + needle_len - 1
        assert [int(x) for x in res.end_col] == [4, 2]

    def test_end_col_via_match_list_udf(self, tmp_path):
        import numpy as np

        from frizbee_spark.udfs import fuzzy_match_udf

        _ = np  # udf-level coverage happens in spark tests; here check struct shape
        udf = fuzzy_match_udf("abc", Config(max_typos=0))
        assert "end_col" in [f.name for f in udf.returnType.fields]


class TestLiteralKernelUnicode:
    """Unicode needles on the vectorized LiteralKernel: per-codepoint piece
    comparison with the fold guards of prefilter/mod.rs:71-96.
    Expectations transcribed from the reference's own literal unicode tests
    (src/literal/mod.rs:296-350)."""

    def _score(self, needle, haystack, mode_name="SUBSTRING", casing=None):
        from frizbee_spark.core.config import CaseMatching, Matching

        cfg = Config(
            matching=getattr(Matching, mode_name),
            casing=casing or CaseMatching.SMART,
        )
        res = match_batch(needle, [haystack], cfg)
        return int(res.score[0]) if res.matched[0] else None

    def test_unicode_chars_score_as_characters(self):
        from frizbee_spark.core.config import Scoring

        s = Scoring()
        # literal/mod.rs:301-305: "éx" == "éx" scores two CHARS, not 3 bytes
        assert self._score("éx", "éx") == (
            2 * s.match_score + 2 * s.matching_case_bonus
            + s.prefix_bonus + s.exact_match_bonus
        )
        # literal/mod.rs:307-308: interior occurrence scores only the char
        assert self._score("é", "xé") == s.match_score + s.matching_case_bonus

    def test_unicode_case_insensitive_fold(self):
        from frizbee_spark.core.config import CaseMatching

        # literal/mod.rs:311-325: é/É, Cyrillic и/И, Greek α/Α
        for needle, upper in [("é", "É"), ("и", "И"), ("α", "Α")]:
            assert self._score(needle, upper, casing=CaseMatching.IGNORE) is not None
            assert self._score(needle, upper, casing=CaseMatching.RESPECT) is None

    def test_unicode_rejects_hybrid_case_bytes(self):
        from frizbee_spark.core.config import CaseMatching

        # literal/mod.rs:327-343: 'Ꭰ' E1 8E A0 / 'ꭰ' EA AD B0 — the hybrid
        # byte sequence E1 AD B0 (U+1B70) must NOT match per-codepoint
        assert self._score("Ꭰ", "᭰", casing=CaseMatching.IGNORE) is None
        assert self._score("Ꭰ", "ꭰ", casing=CaseMatching.IGNORE) is not None

    def test_unicode_length_changing_fold_is_case_sensitive(self):
        from frizbee_spark.core.config import CaseMatching

        # literal/mod.rs:345-350: ß folds to SS (length change) -> matches
        # only itself
        assert self._score("ß", "ß", casing=CaseMatching.IGNORE) is not None
        assert self._score("ß", "SS", casing=CaseMatching.IGNORE) is None
        assert self._score("ß", "ss", casing=CaseMatching.IGNORE) is None

    def test_unicode_end_col_spans_whole_utf8_run(self):
        from frizbee_spark.core.config import Matching

        # literal/mod.rs:352-360: "é다" in "xxé다yy" ends at byte 6
        res = match_batch("é다", ["xxé다yy"], Config(matching=Matching.SUBSTRING))
        assert bool(res.matched[0]) and int(res.end_col[0]) == 6

    @pytest.mark.parametrize("mode_name", ["EXACT", "PREFIX", "SUFFIX", "SUBSTRING"])
    @pytest.mark.parametrize(
        "casing", [CaseMatching.IGNORE, CaseMatching.RESPECT, CaseMatching.SMART]
    )
    def test_unicode_literal_fuzz_vs_scalar(self, mode_name, casing):
        from frizbee_spark.core.config import Matching

        rng = random.Random(777)
        mode = getattr(Matching, mode_name)
        uni_chars = "éÉüÜßи И αΑ 다本₺𝄞abcXYZ ./_0"
        for needle in ["é", "Éx", "и да", "ß0", "α/β", "x다"]:
            haystacks = []
            for _ in range(40):
                n = rng.randint(0, 12)
                haystacks.append("".join(rng.choice(uni_chars) for _ in range(n)))
            haystacks += [
                needle, needle.lower(), needle.upper(),
                "xx" + needle, needle + "yy", "é" + needle + "다",
                needle + " " + needle, "", "x",
            ]
            cfg = Config(matching=mode, casing=casing)
            _assert_parity(needle, haystacks, cfg)
