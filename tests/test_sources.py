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


def test_spark_submit_pyfiles_smoke(tmp_path):
    """The cluster-deploy artifact works for real: build the --py-files
    zip, then run a minimal dedup job through an actual `spark-submit`
    in a fresh JVM that imports frizbee_spark ONLY from the zip."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).parent.parent
    sys.path.insert(0, str(repo / "tools"))
    from make_pyfiles_zip import build

    zip_path = build(tmp_path / "frizbee_spark.zip")
    job = tmp_path / "job.py"
    job.write_text(
        """
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import frizbee_spark
assert "frizbee_spark.zip" in frizbee_spark.__file__, frizbee_spark.__file__
from frizbee_spark.operators.dedup import exact_duplicates

df = spark.createDataFrame(
    [(0, "the same text"), (1, "the same text"), (2, "different")],
    ["doc_id", "text"],
)
groups = exact_duplicates(df).collect()
assert len(groups) == 1, groups
assert groups[0].canonical_id == 0 and groups[0].n_dups == 2, groups
print("PYFILES_OK")
spark.stop()
"""
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            "spark-submit",
            "--py-files",
            str(zip_path),
            "--conf",
            "spark.jars.ivy=/tmp/.ivy_empty",
            str(job),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # not the repo: frizbee_spark/ must not be on sys.path
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "PYFILES_OK" in proc.stdout, proc.stdout[-2000:]
