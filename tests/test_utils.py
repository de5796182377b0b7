"""retry_call and ProcessedLedger — the reference's operational contract."""

from __future__ import annotations

import pytest

from sap_data_pipeline_spark.sources.ledger import ProcessedLedger
from sap_data_pipeline_spark.utils import retry_call


def test_retry_call_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert retry_call(flaky, attempts=3, delay_s=0.0) == "ok"
    assert calls["n"] == 3


def test_retry_call_strict_raises_after_exhaustion():
    def always():
        raise OSError("down")

    with pytest.raises(OSError):
        retry_call(always, attempts=2, delay_s=0.0)
    assert retry_call(always, attempts=2, delay_s=0.0, strict=False) is None


def test_processed_ledger_roundtrip(tmp_path):
    led = ProcessedLedger(str(tmp_path / "flow_done.txt"))
    files = ["a.txt", "b.txt", "c.txt"]
    assert led.filter_new(files) == files
    led.record("a.txt")
    assert led.is_done("a.txt") and not led.is_done("b.txt")
    assert led.filter_new(files) == ["b.txt", "c.txt"]
    led.record_all(["b.txt", "c.txt"])
    assert led.filter_new(files) == []  # idempotent re-run: nothing to do
