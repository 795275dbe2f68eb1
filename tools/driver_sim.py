"""Local replica of the driver's correctness harness.

Runs every `queries()` entry in a FRESH, plain SparkSession (none of
session.py's configs — exactly like the driver), runs the paired
`oracle_sql()` in DuckDB over the same parquet tables, canonicalizes both
result sets the way the driver does (columns sorted by name, rows sorted by
all columns), and compares rows / schema / values.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape:
        return False
    for col in a.columns:
        va, vb = a[col], b[col]
        try:
            if pd.api.types.is_float_dtype(va) and pd.api.types.is_float_dtype(vb):
                import numpy as np

                if not np.allclose(va.fillna(0), vb.fillna(0), rtol=0, atol=0, equal_nan=True):
                    # exact match required (driver hashes values)
                    return False
                continue
            # everything else: exact equality after stringify fallback
            if not (va.astype(str).values == vb.astype(str).values).all():
                return False
        except Exception:
            return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as ent

    from pyspark.sql import SparkSession

    # Plain session — mirrors the driver: no session.py configs.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("driver_sim")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = _canon(sdf.toPandas())
            rec["spark_rows"] = len(spdf)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark: {type(e).__name__}: {e}"
            results[name] = rec
            print(f"FAIL {name}: {rec['err'][:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            rec["err"] = "no_oracle"
            rec["rows_only"] = True
            results[name] = rec
            print(f"rows-only {name}: {rec['spark_rows']} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            opdf = _canon(con.execute(sql).fetchdf())
            rec["oracle_rows"] = len(opdf)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"oracle: {type(e).__name__}: {e}"
            results[name] = rec
            print(f"FAIL {name}: {rec['err'][:200]}")
            continue
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = list(spdf.columns) == list(opdf.columns)
        rec["values_match"] = rec["rows_match"] and rec["schema_match"] and _values_match(spdf, opdf)
        ok = rec["rows_match"] and rec["schema_match"] and rec["values_match"]
        results[name] = rec
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: spark={rec['spark_rows']} oracle={rec['oracle_rows']} "
              f"schema={rec['schema_match']} values={rec['values_match']} ({time.time()-t0:.1f}s)")
        if not ok and rec["rows_match"] and rec["schema_match"]:
            # show first differing cells to diagnose value mismatches
            for col in spdf.columns:
                try:
                    neq = spdf[col].astype(str).values != opdf[col].astype(str).values
                    if neq.any():
                        i = neq.argmax()
                        print(f"    col {col} row {i}: spark={spdf[col].iloc[i]!r} "
                              f"oracle={opdf[col].iloc[i]!r}")
                except Exception as e:  # noqa: BLE001
                    print(f"    col {col}: compare error {e}")

    bad = [n for n, r in results.items() if r.get("err") or not r.get("values_match", True)]
    print(f"\n{len(results) - len(bad)}/{len(results)} green; failing: {bad}")
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(results, f, indent=1, default=str)


if __name__ == "__main__":
    main()
