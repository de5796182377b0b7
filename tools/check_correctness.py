"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle on the same
parquet, compares row count, sorted-column schema, and an
order-insensitive value hash.  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from sap_data_pipeline_spark.session import get_spark  # noqa: E402
from sap_data_pipeline_spark.sources.readers import TABLES  # noqa: E402


def value_hash(pdf) -> str:
    """Order-insensitive hash: sort columns by name, round floats,
    stringify rows, sort, md5."""
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False):
        parts = []
        for v in row:
            if isinstance(v, float):
                parts.append(f"{v:.6f}")
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        sh, oh = value_hash(sdf), value_hash(odf)
        ok_hash = sh == oh
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(sdf)}/{len(odf)} cols_match={ok_cols} "
            f"hash_match={ok_hash} [{time.time()-t0:.1f}s]"
        )
        if not ok_hash and ok_rows and ok_cols and len(sdf) > 0:
            s = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).head(3)
            o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).head(3)
            print("  spark:", s.to_dict("records"))
            print("  duck :", o.to_dict("records"))
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
