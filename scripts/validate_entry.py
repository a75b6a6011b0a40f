"""Local mimic of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and an order-insensitive multiset of rows.

Usage: python scripts/validate_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from fs_crawler_spark.session import get_spark  # noqa: E402

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


# duckdb's DB-API description exposes only generic type classes, so the
# comparison is at that granularity (what a duckdb-based driver can see).
_SPARK_TO_CLASS = {
    "int": "NUMBER",
    "bigint": "NUMBER",
    "double": "NUMBER",
    "float": "NUMBER",
    "string": "STRING",
    "boolean": "bool",
    "timestamp": "DATETIME",
}


def type_mismatches(sdf, ocols_raw, otypes) -> list[str]:
    spark_types = dict(sdf.dtypes)
    out = []
    for c, ot in zip(ocols_raw, otypes):
        st = spark_types.get(c)
        if st is None:
            continue
        want = _SPARK_TO_CLASS.get(st)
        if want is None:
            continue  # arrays/structs: skip
        if str(ot).upper() != want.upper():
            out.append(f"{c}: spark={st} duck={ot}")
    return out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, bool):
        return int(v)
    return v


def run(sf_dir: str, only: list[str]) -> int:
    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"[FAIL] {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols_raw = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error {str(e)[:300]}")
            failures += 1
            continue
        ocols = sorted(ocols_raw)
        if scols != ocols:
            print(f"[FAIL] {name}: columns differ spark={scols} duck={ocols}")
            failures += 1
            continue
        otypes = [d[1] for d in res.description]
        tmis = type_mismatches(sdf, ocols_raw, otypes)
        if tmis:
            print(f"[FAIL] {name}: column types differ: {tmis}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"[FAIL] {name}: rowcount spark={len(srows)} duck={len(orows)}")
            failures += 1
            continue
        sset = sorted(
            tuple(norm(r[c]) for c in scols) for r in (row.asDict() for row in srows)
        )
        oset = sorted(
            tuple(norm(dict(zip(ocols_raw, row))[c]) for c in scols) for row in orows
        )
        if sset != oset:
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            print(f"[FAIL] {name}: values differ; first diffs: {diffs}")
            failures += 1
        else:
            print(f"[ok] {name}: {len(srows)} rows match")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if run(sf, sys.argv[2:]) else 0)
