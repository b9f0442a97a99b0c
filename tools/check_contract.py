"""Local stand-in for the driver's correctness gate: runs each
__spark_entry__ query on Spark and its oracle on DuckDB at sf0.01,
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified)."""

from __future__ import annotations

import hashlib
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(
            lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NA
            else (f"{v:.6f}" if isinstance(v, float) else str(v)))
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def value_hash(pdf: pd.DataFrame) -> str:
    n = norm_frame(pdf)
    return hashlib.md5(n.to_csv(index=False).encode()).hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import __spark_entry__ as E
    from mms_rdf_spark.session import get_spark

    spark = get_spark("contract-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(got)})")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        if ok_hash:
            print(f"PASS {name}: {len(got)} rows")
        else:
            failures.append(name)
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}, "
                  f"cols {sorted(got.columns)} vs {sorted(want.columns)}")
            if ok_rows and ok_cols:
                g, w = norm_frame(got), norm_frame(want)
                diff = g.compare(w) if g.shape == w.shape else None
                if diff is not None and len(diff):
                    print(diff.head(5))
    print("\n==>", "ALL PASS" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return failures


if __name__ == "__main__":
    # usage: check_contract.py [sf_dir] [query ...] — a leading arg that
    # is a directory selects the scale factor (previously it was
    # silently swallowed into the query filter and every CLI run used
    # the sf0.01 default, whatever the caller thought they asked for)
    import os

    args = sys.argv[1:]
    if args and (os.path.isdir(args[0]) or args[0].startswith("/")):
        sf_dir, only = args[0], args[1:] or None
        failures = main(sf_dir=sf_dir, only=only)
    else:
        failures = main(only=args or None)
    sys.exit(1 if failures else 0)
