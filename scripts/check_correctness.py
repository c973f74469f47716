#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 AND its
``oracle_sql()`` DuckDB mirror, then compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 6 significant decimals). Queries with no oracle get a
rows-only check (must return >= 0 rows without error).

Run: python scripts/check_correctness.py [sf_dir] [query ...]
(extra args restrict the run to those query names)
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, value hash) for a pandas frame."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        parts = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                parts.append("\\N")
            elif isinstance(v, float):
                parts.append(f"{v:.6g}")
            elif isinstance(v, bytes):
                parts.append(v.hex())
            else:
                parts.append(str(v))
        rows.append("\x01".join(parts))
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as E
    from unified_ocr_pipeline_spark.plans.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(app_name="check_correctness", cores=8, shuffle_partitions=8)
    qmap, omap = E.queries(), E.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(qmap)
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
        qmap = {k: v for k, v in qmap.items() if k in only}

    failures = []
    for name, fn in qmap.items():
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in omap:
            print(f"ok(rows-only)  {name}: {len(sp)} rows")
            continue
        try:
            du = con.execute(omap[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        ns, cs, hs = canon(sp)
        nd, cd, hd = canon(du)
        if ns != nd:
            failures.append(name)
            print(f"FAIL  {name}: rows spark={ns} duck={nd}")
        elif cs != cd:
            failures.append(name)
            print(f"FAIL  {name}: cols spark={cs} duck={cd}")
        elif hs != hd:
            failures.append(name)
            print(f"FAIL  {name}: value hash spark={hs} duck={hd} ({ns} rows)")
            # show a small diff sample
            try:
                import pandas as pd

                sp2 = sp[sorted(sp.columns)].sort_values(sorted(sp.columns))
                du2 = du[sorted(du.columns)].sort_values(sorted(du.columns))
                print("  spark head:\n", sp2.head(3).to_string())
                print("  duck  head:\n", du2.head(3).to_string())
            except Exception:
                pass
        else:
            print(f"ok    {name}: {ns} rows hash={hs}")

    print(f"\n{len(qmap) - len(failures)}/{len(qmap)} passed")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
