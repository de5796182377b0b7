"""Processed-files ledger — batch-mode exactly-once ingestion.

The streaming path gets this from the checkpoint WAL; batch runs (the
reference's scheduled mode) need the explicit ledger the reference keeps
per flow: ``record_done`` / ``is_already_done`` over a ``{flow}_done.txt``
key file (``sap_scripts/sap_utils.py:20-31``).  Keys here are arbitrary
strings (file paths, extraction-window ids).

Driver-side by design: the ledger is consulted once per batch to pick the
file list, never per row — O(processed files) text, not a data-plane
concern.
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Sequence


class ProcessedLedger:
    """Append-only key ledger with atomic-enough appends (O_APPEND)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def _keys(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path, encoding="utf-8") as fh:
            return {line.rstrip("\n") for line in fh if line.strip()}

    def is_done(self, key: str) -> bool:
        return key in self._keys()

    def record(self, key: str) -> None:
        with open(self.path, "a", encoding="utf-8") as fh:
            fh.write(key + "\n")

    def filter_new(self, keys: Sequence[str]) -> list[str]:
        """Keys not yet processed, input order preserved (the reference
        processes files in sorted glob order — caller sorts)."""
        done = self._keys()
        return [k for k in keys if k not in done]

    def record_all(self, keys: Iterable[str]) -> None:
        with open(self.path, "a", encoding="utf-8") as fh:
            for k in keys:
                fh.write(k + "\n")
