"""Plan-level ``require_partition_filter`` enforcement.

The reference makes unfiltered reads of the landing table impossible at
the TABLE level (``require_partition_filter=TRUE``,
bq_create_table_ddl.sql:12): any query that does not constrain the
partitioning column is rejected by the engine before it runs. The
API-level guard in :func:`..operators.sink.read_landing_table` covers the
supported read path, but a direct ``spark.read.parquet(table_root)``
bypasses it. This module closes that hole the way BigQuery does —
pre-execution, against the query plan itself:

* landing roots are REGISTERED (``create_partitioned_table`` and
  ``read_landing_table`` do this automatically);
* :func:`assert_partition_filtered` inspects the df's PHYSICAL plan: every
  file scan whose location lies under a registered root must carry at
  least one partition filter (``PartitionFilters`` non-empty — i.e. the
  scan is partition-pruned). Unfiltered scans raise
  :class:`PartitionFilterRequiredError` before any task launches.

Checking the physical plan (not the user's API calls) means the guard is
route-independent: ``spark.read.parquet(root)``, SQL over a temp view, or
a join that buries the scan three operators deep are all caught, and a
filter that Catalyst pushes down to the scan passes no matter where in
the query it was written. Cost is one driver-side plan inspection — no
job runs, nothing is scanned.

Scale note: this is exactly the guarantee that keeps a 100 TB landing
table safe from accidental full scans — the reference's motivation for
the DDL flag.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Module-level registry: landing-table roots under partition-filter
# enforcement. Keyed by normalized absolute path (no scheme, no trailing
# slash) so `file:/x`, `file:///x` and `/x` all match.
_GUARDED_ROOTS: set[str] = set()


class PartitionFilterRequiredError(RuntimeError):
    """A query scans a guarded landing root without any partition filter
    (reference parity: ``require_partition_filter=TRUE``)."""


def _normalize(path: str) -> str:
    # strip URI scheme (file:, hdfs://host) down to the path component
    p = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "", path)
    return p.rstrip("/")


def register_landing_root(table_root: str) -> None:
    """Put ``table_root`` under plan-level partition-filter enforcement."""
    _GUARDED_ROOTS.add(_normalize(table_root))


def unregister_landing_root(table_root: str) -> None:
    _GUARDED_ROOTS.discard(_normalize(table_root))


def guarded_roots() -> frozenset[str]:
    return frozenset(_GUARDED_ROOTS)


# One FileScan node prints as a single line in the physical-plan string:
#   FileScan parquet [...] Batched: true, ..., Location: InMemoryFileIndex
#   (1 paths)[file:/tmp/sg_tbl], PartitionFilters: [isnotnull(year#5), ...],
#   PushedFilters: ..., ReadSchema: ...
_LOCATION_RE = re.compile(r"Location: \w+(?:\(\d+ paths?\))?\[([^\]]*)\]")
_PART_FILTERS_RE = re.compile(r"PartitionFilters: \[([^\]]*)\]")


def _scan_violations(plan_text: str) -> list[str]:
    """Return the registered roots scanned without partition filters."""
    violations = []
    for line in plan_text.splitlines():
        if "FileScan" not in line:
            continue
        loc = _LOCATION_RE.search(line)
        if not loc:
            continue
        paths = [_normalize(p.strip()) for p in loc.group(1).split(",") if p.strip()]
        hit_roots = {
            root
            for root in _GUARDED_ROOTS
            for p in paths
            if p == root or p.startswith(root + "/")
        }
        if not hit_roots:
            continue
        pf = _PART_FILTERS_RE.search(line)
        if pf is None or not pf.group(1).strip():
            violations.extend(sorted(hit_roots))
    return violations


def assert_partition_filtered(df: DataFrame) -> DataFrame:
    """Pre-execution check: raise if ``df``'s plan scans any registered
    landing root without a partition filter. Returns ``df`` unchanged so
    it composes as a pass-through gate::

        df = assert_partition_filtered(spark.read.parquet(root).filter(...))

    Driver-side only — inspects the planned physical plan, launches no
    job.
    """
    if not _GUARDED_ROOTS:
        return df
    # The FileScan Location metadata is truncated at
    # spark.sql.maxMetadataStringLength (default 100 chars) — long table
    # paths would lose their closing bracket and dodge the check. Widen it
    # for the duration of the plan render.
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    prev = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try:
        plan_text = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, prev)
    violations = _scan_violations(plan_text)
    if violations:
        raise PartitionFilterRequiredError(
            "query scans landing table(s) without a partition filter: "
            f"{sorted(set(violations))} — filter on year/month/day/hour "
            "(reference parity: require_partition_filter=TRUE)"
        )
    return df
