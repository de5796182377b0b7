"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle on the same
parquet, compares row count, sorted-column schema, and an
order-insensitive value hash.  Usage:

    python tools/check_correctness.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a durable per-query artifact in the
driver CORRECTNESS_r{N}.json entry shape (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err, plus rows_only and
elapsed_sec) — committed each round as CORRECTNESS_FULL_r{N}.json so
the full catalog's evidence, not just the driver's 50-query window, is
inspectable (r9 verdict #1).
"""

from __future__ import annotations

import hashlib
import json
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
    argv = sys.argv[1:]
    json_out: str | None = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    record: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        entry = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
            "rows_only": name not in oracles,
        }
        record[name] = entry
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            entry["err"] = f"spark error: {str(e)[:300]}"
            entry["elapsed_sec"] = round(time.time() - t0, 1)
            print(f"FAIL  {name}: {entry['err']}")
            continue
        entry["spark_rows"] = len(sdf)
        if name not in oracles:
            entry["rows_match"] = len(sdf) >= 0
            entry["elapsed_sec"] = round(time.time() - t0, 1)
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            entry["err"] = f"duckdb error: {str(e)[:300]}"
            entry["elapsed_sec"] = round(time.time() - t0, 1)
            print(f"FAIL  {name}: {entry['err']}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        sh, oh = value_hash(sdf), value_hash(odf)
        ok_hash = sh == oh
        entry.update(
            rows_match=ok_rows, schema_match=ok_cols, hash_match=ok_hash,
            oracle_rows=len(odf), elapsed_sec=round(time.time() - t0, 1),
        )
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
    if json_out:
        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(record),
            "n_oracled": sum(1 for e in record.values() if not e["rows_only"]),
            "n_rows_only": sum(1 for e in record.values() if e["rows_only"]),
            "failures": failures,
            "queries": record,
        }
        Path(json_out).write_text(json.dumps(payload, indent=1) + "\n")
        print(f"wrote {json_out}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
