"""Mimics the driver's correctness gate: runs every __spark_entry__ query at
sf0.001/sf0.01 and compares against the DuckDB oracle SQL (row count +
order-insensitive values), plus smoke-checks entry()."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.spark

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(rows):
    out = []
    for row in rows:
        cells = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    cells.append("nan")
                else:
                    cells.append(f"{v:.4f}")
            elif hasattr(v, "quantize"):  # Decimal
                cells.append(f"{float(v):.2f}")
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    return sorted(out)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "score", "exact"}


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01"])
def test_queries_against_duckdb(spark, sf_dir):
    oracles = entry_mod.oracle_sql()
    con = _duck(sf_dir)
    failures = []
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        spark_rows = df.collect()
        sql = oracles.get(name)
        if sql is None:
            # rows-only check
            assert spark_rows is not None
            continue
        duck_rows = con.execute(sql).fetchall()
        duck_cols = [d[0] for d in con.description]
        if sorted(df.columns) != sorted(duck_cols):
            failures.append(f"{name}: columns {df.columns} != {duck_cols}")
            continue
        # reorder duck columns to match spark column order
        idx = [duck_cols.index(c) for c in df.columns]
        duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]
        a = _normalize([tuple(r) for r in spark_rows])
        b = _normalize(duck_rows)
        if len(a) != len(b):
            failures.append(f"{name}: row count {len(a)} != {len(b)}")
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append(f"{name}: value mismatch, e.g. {diff}")
    assert not failures, "\n".join(failures)
