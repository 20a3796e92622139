"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, schema (column names) and a value hash (columns sorted by name,
rows sorted, floats as emitted).

Usage: python scripts/check_oracles.py [entry ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as E
from refimage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs = E.queries()
    os_ = E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: SPARK ERR {ex}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"{name}: rows={len(got)} (no oracle)")
            continue
        try:
            want = con.execute(os_[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ORACLE ERR {ex}")
            failed.append(name)
            continue
        g, w = _canon(got), _canon(want)
        schema_ok = list(g.columns) == list(w.columns)
        rows_ok = len(g) == len(w)
        try:
            hash_ok = schema_ok and rows_ok and g.astype(str).equals(w.astype(str))
        except Exception:  # noqa: BLE001
            hash_ok = False
        status = "OK" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failed.append(name)
            print(f"{name}: {status} rows {len(g)}/{len(w)} schema_ok={schema_ok}")
            if schema_ok and rows_ok:
                diff = (g.astype(str) != w.astype(str)).any(axis=1)
                print("  spark:", g[diff].head(3).to_dict("records"))
                print("  oracle:", w[diff].head(3).to_dict("records"))
            else:
                print("  spark cols:", list(g.columns), "oracle cols:", list(w.columns))
        else:
            print(f"{name}: OK ({len(g)} rows)")
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
