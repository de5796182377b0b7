"""Round-close hygiene in one command (r9 verdict #1/#7 discipline):

1. regenerate the durable full-catalog correctness artifact
   (``CORRECTNESS_FULL_r{N}.json`` via ``check_correctness --json``);
2. regenerate ``PLANS.md`` (``dump_plans``);
3. prune artifact-store entries not served in 7 days.

Usage:  python tools/round_close.py N   (the round number)

Exits non-zero if the correctness gate reports any failure, so a CI or
driver hook can gate on it.  Runs serially — do not run concurrently
with bench.py (timing contention).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    n = int(sys.argv[1])
    out = REPO / f"CORRECTNESS_FULL_r{n:02d}.json"

    rc = subprocess.call(
        [sys.executable, str(REPO / "tools" / "check_correctness.py"),
         "--json", str(out), "/root/testdata/sf0.01"],
        cwd=REPO,
    )
    if rc:
        print(f"round_close: correctness gate FAILED (rc={rc}); "
              f"see {out} for the per-query record")
        return rc

    rc = subprocess.call(
        [sys.executable, str(REPO / "tools" / "dump_plans.py")], cwd=REPO
    )
    if rc:
        print(f"round_close: dump_plans failed (rc={rc})")
        return rc

    sys.path.insert(0, str(REPO))
    from sap_data_pipeline_spark.sources.artifacts import prune

    for p in prune(keep_seconds=7 * 86400):
        print(f"round_close: pruned {p}")
    print(f"round_close: OK — {out.name}, PLANS.md, artifact prune done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
