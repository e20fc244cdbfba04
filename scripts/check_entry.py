"""Local mimic of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB oracle side-by-side,
compare row count / schema-insensitive sorted values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    out.append("nan")
                else:
                    out.append(f"{v:.9g}")
            else:
                out.append(str(v))
        rows.append(tuple(out))
    return cols, sorted(rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pcgraph.session import get_spark

    spark = get_spark(app_name="check-entry", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        sc, sv = normalize(spark_pdf)
        dc, dv = normalize(duck_pdf)
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns {sc} vs {dc}")
        elif len(sv) != len(dv):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(sv)} vs {len(dv)}")
        elif sv != dv:
            failures.append(name)
            bad = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
            print(f"FAIL  {name}: values differ, first diffs:")
            for i in bad:
                print(f"      spark={sv[i]}")
                print(f"      duck ={dv[i]}")
        else:
            print(f"OK    {name}: {len(sv)} rows")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
