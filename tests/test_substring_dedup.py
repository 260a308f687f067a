"""Winnowing substring-dedup operator tests."""

import numpy as np
import pytest

from frizbee_spark.operators.substring_dedup import (
    _longest_common_substring_len,
    _winnow,
    substring_dedup_pairs,
)

pytestmark = pytest.mark.spark


def test_winnow_guarantee():
    # any shared substring of length >= k + w - 1 shares a fingerprint
    rng = np.random.RandomState(3)
    k, w = 8, 9
    shared = bytes(rng.randint(97, 123, size=40, dtype=np.uint8))
    a = bytes(rng.randint(97, 123, size=60, dtype=np.uint8)) + shared
    b = shared + bytes(rng.randint(97, 123, size=80, dtype=np.uint8))
    fa = _winnow(np.frombuffer(a, dtype=np.uint8), k, w)
    fb = _winnow(np.frombuffer(b, dtype=np.uint8), k, w)
    assert len(np.intersect1d(fa, fb)) > 0


def test_lcs_substring_len():
    assert _longest_common_substring_len(b"xxhello worldyy", b"zzhello worldqq", 4) == len(
        b"hello world"
    )
    assert _longest_common_substring_len(b"abcdef", b"uvwxyz", 3) == 0


def test_substring_dedup_pairs(spark):
    shared = "q" * 10 + "the exact shared boilerplate paragraph repeated verbatim here" + "p" * 10
    rows = [
        (0, "intro text one " * 5 + shared),
        (1, shared + " outro text two " * 5),
        (2, "completely unrelated content with no long overlap at all " * 3),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = substring_dedup_pairs(df, min_len=48, k=24).collect()
    pairs = {(r.a, r.b): r.common_len for r in got}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] >= len(shared)
    assert not any(2 in p for p in pairs)


def test_lcs_periodic_text_all_occurrences():
    """Periodic texts whose k-grams also occur in shorter earlier runs must
    not under-report: the anchor extension covers all (capped) occurrence
    pairs, not just the first (ADVICE r01)."""
    from frizbee_spark.operators.substring_dedup import (
        _longest_common_substring_len,
    )

    # the shared k-grams of the long run also appear in the short run
    # first; first-occurrence anchoring would extend only around the short
    # early run and miss the long one
    a = b"ab" * 6 + b"XXXX" + b"ab" * 40 + b"YYYY"
    b_ = b"ab" * 6 + b"QQQQ" + b"ab" * 40 + b"ZZZZ"
    got = _longest_common_substring_len(a, b_, 8)
    assert got >= 80  # the "ab"*40 run
