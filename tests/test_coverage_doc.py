"""COVERAGE.md ↔ catalog consistency — the file is ~260 hand-maintained
lines and one rename away from drifting (r5 verdict #7).

Checks, without any Spark session:
  1. every registered catalog query name appears in COVERAGE.md;
  2. every backticked catalog-query mention on a ``✓oracle`` row really
     has a registered DuckDB oracle;
  3. every query COVERAGE.md marks rows-only really has NO oracle
     (a query gaining an oracle must also upgrade its coverage row);
  4. the header's query/oracle counts match the live catalog.
"""

from __future__ import annotations

import re
from pathlib import Path

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def _catalog():
    from sap_data_pipeline_spark.plans import catalog, catalog_ext  # noqa: F401

    return catalog.QUERIES, catalog.ORACLES


def test_every_catalog_query_is_documented():
    queries, _ = _catalog()
    text = COVERAGE.read_text()
    missing = [n for n in queries if f"`{n}`" not in text]
    assert not missing, f"catalog queries absent from COVERAGE.md: {missing}"


def test_oracle_claims_match_registry():
    """A row claiming ✓oracle must only name queries with registered
    oracles; a row claiming rows-only must only name queries without."""
    queries, oracles = _catalog()
    bogus_oracle_claims = []
    bogus_rows_only_claims = []
    for line in COVERAGE.read_text().splitlines():
        if not line.startswith("|"):
            continue  # prose; claims live in table rows only
        named = [
            n for n in re.findall(r"`([a-z0-9_]+)`", line) if n in queries
        ]
        if not named:
            continue
        if "✓oracle" in line:
            bogus_oracle_claims += [n for n in named if n not in oracles]
        elif "rows-only" in line:
            bogus_rows_only_claims += [n for n in named if n in oracles]
    assert not bogus_oracle_claims, (
        f"COVERAGE.md claims ✓oracle for queries with no registered "
        f"oracle: {sorted(set(bogus_oracle_claims))}"
    )
    assert not bogus_rows_only_claims, (
        f"COVERAGE.md claims rows-only for queries that HAVE oracles "
        f"(upgrade the row): {sorted(set(bogus_rows_only_claims))}"
    )


def test_header_counts_match_catalog():
    queries, oracles = _catalog()
    text = COVERAGE.read_text()
    m = re.search(
        r"catalog registers (\d+) queries \((\d+) with DuckDB oracles, "
        r"(\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md header count sentence missing or reworded"
    total, with_oracle, rows_only = map(int, m.groups())
    assert total == len(queries), (total, len(queries))
    assert with_oracle == len(oracles), (with_oracle, len(oracles))
    assert rows_only == len(queries) - len(oracles)


def test_full_catalog_correctness_artifact_covers_every_query():
    """The committed CORRECTNESS_FULL_r{N}.json (r9 verdict #1 — the
    durable full-catalog oracle artifact written at round close via
    `tools/check_correctness.py --json`) must cover EVERY registered
    query: all oracled ones hash-green, the rows-only ones enumerated
    with zero errors.  The newest artifact is the binding one."""
    import json

    queries, oracles = _catalog()
    root = COVERAGE.parent
    arts = sorted(root.glob("CORRECTNESS_FULL_r*.json"))
    assert arts, "no CORRECTNESS_FULL_r{N}.json committed at repo root"
    data = json.loads(arts[-1].read_text())
    recorded = set(data["queries"])
    assert recorded == set(queries), (
        f"artifact {arts[-1].name} out of date with the catalog: "
        f"missing={sorted(set(queries) - recorded)} "
        f"extra={sorted(recorded - set(queries))} — regenerate with "
        f"tools/check_correctness.py --json"
    )
    assert data["failures"] == [], data["failures"]
    for name, e in data["queries"].items():
        if e["rows_only"]:
            assert name not in oracles and e["err"] is None, (name, e)
        else:
            assert e["hash_match"] and e["rows_match"] and e["schema_match"], (
                name, e,
            )
