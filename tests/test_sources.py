"""Sources: line reader and table writer round-trips."""

import pytest

from frizbee_spark.sources.readers import read_lines, read_web_pages, write_table

pytestmark = pytest.mark.spark


def test_read_lines_stable_index(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbravo\ncharlie\n")
    df = read_lines(spark, str(p))
    rows = df.orderBy("line_id").collect()
    assert [(r.line_id, r.text) for r in rows] == [
        (0, "alpha"),
        (1, "bravo"),
        (2, "charlie"),
    ]
    # re-read gives identical indices (stable, unlike raw monotonically_increasing_id)
    rows2 = read_lines(spark, str(p)).orderBy("line_id").collect()
    assert rows == rows2


def test_read_lines_multi_file_offsets(spark, tmp_path):
    # line ids continue across files in lexicographic file order
    (tmp_path / "a.txt").write_text("a0\na1\n")
    (tmp_path / "b.txt").write_text("b0\nb1\nb2\n")
    rows = read_lines(spark, str(tmp_path)).orderBy("line_id").collect()
    assert [(r.line_id, r.text) for r in rows] == [
        (0, "a0"),
        (1, "a1"),
        (2, "b0"),
        (3, "b1"),
        (4, "b2"),
    ]


def test_write_and_read_web_pages(spark, tmp_path):
    from datetime import datetime

    df = spark.createDataFrame(
        [("u1", datetime(2025, 1, 1), b"<html/>", "body text", "en")],
        ["url", "warc_ts", "html", "text", "lang"],
    )
    target = str(tmp_path / "pages_out")
    write_table(df, target)
    back = read_web_pages(spark, target)
    row = back.collect()[0]
    assert row.url == "u1" and row.text == "body text"
    assert bytes(row.html) == b"<html/>"
