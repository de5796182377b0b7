from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sap_data_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def star(spark):
    from sap_data_pipeline_spark.sources.readers import load_star

    return load_star(spark, SF_SMOKE)


def count_hash_exchanges(plan: str) -> int:
    """``Exchange hashpartitioning`` nodes excluding the fact-scan
    spread-key rebalance.  The rebalance is an explicit repartition
    (shuffle origin ``REPARTITION_BY_NUM``) keyed on the table's raw
    spread key (r13) — previously RoundRobinPartitioning, which these
    plan-shape counts never included either.  Framework-inserted
    exchanges (the ones these tests pin) print ``ENSURE_REQUIREMENTS``.

    The exclusion is restricted to the reader's OWN spread keys (r13
    advice): a blanket REPARTITION_BY_NUM exclusion would let a future
    explicit numbered repartition of a data-sized frame inside an
    operator slip past every plan-shape pin."""
    from sap_data_pipeline_spark.sources.readers import _REBALANCE_TABLES

    spread_keys = {k for keys in _REBALANCE_TABLES.values() for k in keys}
    return sum(
        1 for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        and not (
            "REPARTITION_BY_NUM" in ln
            and any(f"({k}#" in ln for k in spread_keys)
        )
    )
