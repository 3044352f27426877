"""One-off audit (r11): find catalog queries whose physical plan derives
the same expensive work MORE THAN ONCE — the bug class fixed twice this
round (semdedup and semdedup_jl re-ran their assignment kernel for every
consuming branch until the intermediate was persisted).

Two heuristics over the executed-plan string of every non-fixture
catalog key at sf0.001:

  kernels — a Python/Arrow kernel node (MapInPandas / MapInArrow /
            FlatMapGroupsInPandas / ArrowEvalPython) appearing >= 2
            times: each occurrence is a separate Arrow round-trip of
            (usually) the same kernel.
  rescans — one parquet relation scanned >= 3 times (2 is a legitimate
            self-join; 3+ usually means branches re-deriving a shared
            parent).

Heuristic, human-reviewed output — InMemoryTableScan relation
descriptions can echo kernel names without re-running them, so every
hit needs a manual plan read before it is called a bug.

Usage: python scripts/replan_audit.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
KERNELS = ("MapInPandas", "MapInArrow", "FlatMapGroupsInPandas", "ArrowEvalPython")


def main() -> None:
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark import get_spark
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.catalog import QUERIES
    from tests.test_plan_audit import _SKIP_PREFIXES

    spark = get_spark(app_name="replan_audit")
    findings = []
    checked = 0
    for name, fn in QUERIES.items():
        if any(name.startswith(p) for p in _SKIP_PREFIXES):
            continue
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # fixture-dependent key that slipped the skip list
            findings.append((name, f"PLAN ERROR: {type(e).__name__}: {e}"))
            continue
        checked += 1
        for k in KERNELS:
            # DISTINCT node signatures only: a persisted intermediate's
            # kernel is echoed verbatim (same expression ids) inside
            # every InMemoryTableScan's relation description, while a
            # genuinely re-derived kernel gets FRESH expression ids per
            # derivation — dedup on the normalized line text.
            # prefix only: nested echoes truncate the SAME node at
            # different widths, and the distinguishing expression ids
            # appear early in the signature
            sigs = {
                m.group(0).strip()[:60]
                for m in re.finditer(rf"{k}\b[^\n]*", plan)
            }
            if len(sigs) >= 2:
                findings.append((name, f"{k} x{len(sigs)} distinct derivations"))
        # same idea for scans: one relation scanned by N branches yields
        # N FileScan nodes with DIFFERENT output attribute ids; count
        # distinct (location, output-ids) pairs per location.
        scans: dict[str, set] = {}
        for m in re.finditer(
            r"FileScan parquet [^\n]*?\[([^\]]*)\][^\n]*Location: InMemoryFileIndex(?:\(\d+ paths\))?\[([^\],]+)",
            plan,
        ):
            scans.setdefault(m.group(2), set()).add(m.group(1))
        for loc, outs in scans.items():
            if len(outs) >= 3:
                findings.append(
                    (name, f"rescan x{len(outs)}: {loc.rsplit('/', 1)[-1]}")
                )
    print(f"checked {checked} plans")
    for name, msg in findings:
        print(f"  {name}: {msg}")
    if not findings:
        print("  no repeated-derivation candidates")


if __name__ == "__main__":
    main()
