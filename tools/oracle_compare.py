"""Driver-style oracle compare for selected registry queries.

Usage: python tools/oracle_compare.py [query ...]   (default: all)
Runs each Spark query and its DuckDB oracle twin at sf0.01 and
compares rows / schema / values exactly (NULL==NULL), mirroring the
driver's CORRECTNESS gate.  Run from anywhere; imports the repo copy.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb
    import numpy as np
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    names = sys.argv[1:] or list(E.queries())
    failures = 0
    for name in names:
        q = E.queries()[name]
        sql = E.oracle_sql().get(name)
        sdf = q(spark, SF_DIR).toPandas()
        if sql is None:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE SQL ERROR {exc}")
            failures += 1
            continue
        cols = sorted(sdf.columns)
        if sorted(ddf.columns) != cols:
            print(f"{name}: SCHEMA name mismatch {cols} vs {sorted(ddf.columns)}")
            failures += 1
            continue
        a = sdf[cols].sort_values(cols).reset_index(drop=True)
        b = ddf[cols].sort_values(cols).reset_index(drop=True)
        if len(a) != len(b):
            print(f"{name}: ROWS {len(a)} vs {len(b)}")
            failures += 1
            continue
        bad = []
        for c in cols:
            if a[c].dtype.kind in "fiu" and b[c].dtype.kind in "fiu":
                x = a[c].astype("float64").values
                y = b[c].astype("float64").values
                ok = bool(((x == y) | (np.isnan(x) & np.isnan(y))).all())
            else:
                ok = bool((a[c].astype(str).values == b[c].astype(str).values).all())
            if not ok:
                bad.append(c)
        if bad:
            print(f"{name}: VALUE mismatch in {bad}")
            for c in bad[:2]:
                x, y = a[c].values, b[c].values
                import pandas as pd  # noqa: F401
                diff_idx = [i for i in range(len(x)) if str(x[i]) != str(y[i])][:3]
                for i in diff_idx:
                    print(f"   row {i}: spark={x[i]!r} duck={y[i]!r}")
            failures += 1
        else:
            print(f"{name}: OK ({len(a)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
