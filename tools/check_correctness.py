"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() in DuckDB at
sf0.01, compare row count, schema (column names), and a canonicalized
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else repr(v))
    rows = sorted(tuple(r) for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    import __spark_entry__ as em
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = em.queries()
    oracles = em.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        entry: dict = {}
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            entry["spark_rows"] = len(sdf)
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"spark: {type(e).__name__}: {e}"
            results[name] = entry
            print(f"{name}: SPARK ERROR {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            entry["err"] = "no_oracle"
            results[name] = entry
            print(f"{name}: no_oracle ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"oracle: {type(e).__name__}: {e}"
            results[name] = entry
            print(f"{name}: ORACLE ERROR {e}")
            continue
        entry["oracle_rows"] = len(odf)
        entry["rows_match"] = len(sdf) == len(odf)
        entry["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        try:
            entry["hash_match"] = canon(sdf) == canon(odf)
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"canon: {type(e).__name__}: {e}"
            entry["hash_match"] = None
        results[name] = entry
        status = "OK" if entry.get("hash_match") else "FAIL"
        print(
            f"{name}: {status} rows {len(sdf)}/{len(odf)} "
            f"schema={entry['schema_match']} hash={entry.get('hash_match')}"
        )
    spark.stop()
    n_ok = sum(1 for v in results.values() if v.get("hash_match"))
    print(json.dumps({"ok": n_ok, "total": len(results)}))


if __name__ == "__main__":
    main()
