"""Sources: line reader and table writer round-trips."""

import pytest

from frizbee_spark.sources.readers import read_lines, read_web_pages, write_table

pytestmark = pytest.mark.spark


def test_read_lines_stable_index(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbravo\ncharlie\n")
    df = read_lines(spark, str(p))
    rows = df.orderBy("index").collect()
    assert [(r.index, r.text) for r in rows] == [
        (0, "alpha"),
        (1, "bravo"),
        (2, "charlie"),
    ]
    # re-read gives identical indices (stable, unlike raw monotonically_increasing_id)
    rows2 = read_lines(spark, str(p)).orderBy("index").collect()
    assert rows == rows2


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
