"""Spark-side match_list parity: the pandas-UDF pipeline through a local
SparkSession must agree row-for-row with the scalar oracle matcher
(FIXTURES.md §3 parity harness, Spark leg)."""

import pytest

from frizbee_spark.core.config import Config, SortStrategy
from frizbee_spark.core.matcher import Matcher
from frizbee_spark.operators.match_list import match_list, match_query

pytestmark = pytest.mark.spark


def _spark_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _check(spark, needle, texts, config):
    df = _spark_df(spark, texts)
    got = match_list(df, needle, config, ordered=True).collect()
    want = Matcher(needle, config).match_list(texts)
    assert [(r.doc_id, r.score, r.exact) for r in got] == [
        (m.index, m.score, m.exact) for m in want
    ]


def test_spark_match_list_basic(spark):
    texts = ["fooBar", "foo_bar", "barfoo", "prelude", "println!", "foo"]
    _check(spark, "foo", texts, Config())


def test_spark_match_list_typos(spark):
    texts = ["deadbeef", "deadbf", "deadbeefg", "deadbe", "nomatch"]
    _check(spark, "deadbe", texts, Config(max_typos=1))


def test_spark_match_list_no_prefilter(spark):
    texts = ["abc", "xbc", "zzz", "cab", ""]
    _check(spark, "abc", texts, Config(max_typos=None))


def test_spark_match_list_sort_strategies(spark):
    texts = ["foo", "xfoo", "f_o_o", "nomatch", "foo"]
    for sort in SortStrategy:
        _check(spark, "foo", texts, Config(sort=sort))


def test_spark_match_list_documents(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = df.select("doc_id", "text").orderBy("doc_id").collect()
    texts = [r.text for r in rows]
    config = Config(max_typos=1)
    got = match_list(df, "spark join", config).collect()
    want = Matcher("spark join", config).match_list(texts)
    # doc_id == position because doc_ids are 0..n-1 sorted
    assert [(r.doc_id, r.score) for r in got] == [(m.index, m.score) for m in want]
    assert len(got) > 0


def test_spark_match_query_multi_pattern(spark):
    texts = ["foobar", "foo", "barfoo", "bar", "qux", "food bar"]
    df = _spark_df(spark, texts)
    config = Config()
    got = match_query(df, "foo !bar", config).collect()
    want = Matcher.from_query("foo !bar", config).match_list(texts)
    assert [(r.doc_id, r.score, r.exact) for r in got] == [
        (m.index, m.score, m.exact) for m in want
    ]


def test_spark_match_query_empty(spark):
    texts = ["a", "b"]
    df = _spark_df(spark, texts)
    got = match_query(df, "", Config()).collect()
    assert [(r.doc_id, r.score) for r in got] == [(0, 0), (1, 0)]


def test_null_text_never_matches_single_pattern(spark):
    """Documented null rule (ADVICE r4): NULL text rows never match; empty
    strings are real content and behave normally."""
    df = spark.createDataFrame(
        [(0, "foo"), (1, None), (2, "")], ["doc_id", "text"]
    )
    # with max_typos=None the SW path matches "" at score 0 (reference
    # semantics — no prefilter rejects it); the NULL row alone is dropped
    got = {r.doc_id for r in match_list(df, "foo", Config(max_typos=None)).collect()}
    assert got == {0, 2}
    # with a typo budget the length prefilter also rejects ""
    got = {r.doc_id for r in match_list(df, "foo", Config(max_typos=0)).collect()}
    assert got == {0}


def test_null_text_never_matches_all_negated_query(spark):
    """The all-negated corner the round-3 rewrite changed: `!foo` keeps
    empty strings (real content without 'foo') but still drops NULLs —
    null is unknown content, not empty content."""
    df = spark.createDataFrame(
        [(0, "has foo inside"), (1, None), (2, ""), (3, "bar only")],
        ["doc_id", "text"],
    )
    got = {r.doc_id for r in match_query(df, "!foo", Config()).collect()}
    assert got == {2, 3}
