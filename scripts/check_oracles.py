"""Local twin of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB at sf0.01, sort columns by name,
sort rows, and compare values exactly (with float-diff diagnostics)."""

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402

import os

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def main():
    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    n_ok = n_bad = 0
    for name in names:
        if name not in oq:
            print(f"SKIP {name} (rows-only: no oracle; driver does rows-only check)")
            continue
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            ddf = con.sql(oq[name]).df()
            scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
            if scols != dcols:
                print(f"FAIL {name}: columns {scols} vs {dcols}")
                n_bad += 1
                continue
            s_rows = sorted(tuple(norm(v) for v in row) for row in sdf[scols].itertuples(index=False))
            d_rows = sorted(tuple(norm(v) for v in row) for row in ddf[dcols].itertuples(index=False))
            if len(s_rows) != len(d_rows):
                print(f"FAIL {name}: rows {len(s_rows)} vs {len(d_rows)}")
                n_bad += 1
                continue
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            if diffs:
                print(f"FAIL {name}: {len(diffs)} differing rows; first: \n  S={diffs[0][0]}\n  D={diffs[0][1]}")
                n_bad += 1
            else:
                print(f"OK   {name}  ({len(s_rows)} rows)")
                n_ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad of {len(names)}")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
