"""Local simulation of the external driver's correctness check:
runs registry queries at a given SF and compares with the DuckDB
oracle through a pandas canonicalizer (sort_values over all columns —
the exact step that crashes on unhashable cells). Usage:

    python tests/driver_sim.py [sf_dir] [name ...]

With no names, checks every oracle-backed entry.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        return float(f"{v:.9g}")
    if hasattr(v, "item"):
        return _norm(v.item())
    return v


def _canon(pdf: pd.DataFrame) -> list:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return [tuple(_norm(v) for v in row) for row in pdf.itertuples(index=False)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    from miniodb_spark.queries import get_registry
    from miniodb_spark.session import get_spark

    spark = get_spark("driver_sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    registry = get_registry()
    targets = names or [n for n, s in registry.items() if s.oracle is not None]
    failures = 0
    for name in targets:
        spec = registry[name]
        t0 = time.perf_counter()
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
            if spec.oracle is None:
                print(f"{name}: rows-only ({len(spark_pdf)} rows, "
                      f"{time.perf_counter()-t0:.2f}s)")
                continue
            duck_pdf = con.execute(spec.oracle).df()
            rows_ok = len(spark_pdf) == len(duck_pdf)
            cols_ok = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
            vals_ok = _canon(spark_pdf) == _canon(duck_pdf)
            status = "OK" if (rows_ok and cols_ok and vals_ok) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(f"{name}: {status} rows={rows_ok}({len(spark_pdf)}/"
                  f"{len(duck_pdf)}) cols={cols_ok} vals={vals_ok} "
                  f"{time.perf_counter()-t0:.2f}s")
            if not cols_ok:
                print(f"  spark={sorted(spark_pdf.columns)} "
                      f"duck={sorted(duck_pdf.columns)}")
        except Exception as e:  # driver records the error string
            failures += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print(f"\n{len(targets) - failures}/{len(targets)} green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
