"""Warehouse hygiene audit (r12 verdict task 7, CI-shape): a clean
``bench.py`` + ``pytest`` run must leave ONLY catalog-fixture stores in
``spark-warehouse/`` — everything else is a leak (a crashed probe, an
un-swept test store, an orphaned versioned-store stage).

Allowed residents (all process-cached catalog fixtures, re-persisted
per process by design — see queries/catalog.py ``_FIXTURES``):

* ``corpus_bands_<md5-8>``          — persisted corpus MinHash bands
* ``corpus_cells_<md5-8>``          — seed-quantizer semantic cells store
* ``corpus_cells_tr_<md5-8>``       — trained-quantizer store
* ``corpus_cells_mt_<md5-8>``       — maintenance-lifecycle store
* ``stream_sem_corpus_cells``       — streaming semantic dedup store
* ``stream_sem_amort_cells``        — its amortized-trigger twin

each optionally suffixed ``__v<N>`` / ``__v<N>__centroids`` (versioned
store layout, operators/similarity.py) or holding a ``.parquet`` dir.

Anything else — ``t_*`` / ``test_*`` (pytest stores the conftest sweep
should have dropped), ``scale_probe_*`` (probe stores the drop-on-
success path should have dropped), or an unrecognized name — fails the
audit loudly with the listing.

Usage: python scripts/warehouse_audit.py [warehouse_dir]
Exit 0 = clean; exit 1 = leaks found (printed).
"""

from __future__ import annotations

import os
import re
import sys

ALLOWED = re.compile(
    r"^(?:"
    r"corpus_bands_[0-9a-f]{8}"
    r"|corpus_cells_(?:tr_|mt_)?[0-9a-f]{8}"
    r"|stream_sem_corpus_cells"
    r"|stream_sem_amort_cells"
    r")(?:__v\d+(?:__centroids)?)?$"
)


def audit(warehouse: str) -> list[str]:
    if not os.path.isdir(warehouse):
        return []
    return [d for d in sorted(os.listdir(warehouse)) if not ALLOWED.match(d)]


def main() -> int:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse"
    leaks = audit(warehouse)
    if leaks:
        print(f"LEAKED stores in {warehouse} ({len(leaks)}):")
        for d in leaks:
            print(f"  {d}")
        return 1
    n = len(os.listdir(warehouse)) if os.path.isdir(warehouse) else 0
    print(f"clean: {n} entries in {warehouse}, all catalog fixtures")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
