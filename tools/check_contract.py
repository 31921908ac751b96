"""Local mirror of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 and compare against its oracle_sql via
DuckDB — row count, sorted column names, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from scylla_cdc_java_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(
                (tuple(norm(r[c]) for c in scols) for r in spark_rows),
                key=repr,
            )
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_rows)} rows, cols={scols}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error {e}")
            continue
        ocols = sorted(odf.columns.tolist())
        orecs = odf.where(odf.notna(), None).to_dict("records")
        oset = sorted(
            (tuple(norm(r[c]) for c in ocols) for r in orecs),
            key=repr,
        )
        if scols != ocols:
            failures.append((name, f"cols differ: spark={scols} oracle={ocols}"))
            print(f"[FAIL] {name}: cols spark={scols} oracle={ocols}")
        elif len(sset) != len(oset):
            failures.append((name, f"rowcount {len(sset)} vs {len(oset)}"))
            print(f"[FAIL] {name}: rowcount {len(sset)} vs {len(oset)}")
        elif sset != oset:
            diff = [i for i, (a, b) in enumerate(zip(sset, oset)) if a != b][:3]
            detail = [(sset[i], oset[i]) for i in diff]
            failures.append((name, f"values differ, first diffs: {detail}"))
            print(f"[FAIL] {name}: values differ {detail}")
        else:
            print(f"[OK]   {name}: {len(sset)} rows")
    print("\n==", "ALL OK" if not failures else f"{len(failures)} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
