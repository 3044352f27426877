"""Evidence-driven driver-window rotation.

The external correctness harness sweeps the catalog in dict order and
checks the FIRST 50 keys only, so the front of the dict must rotate each
round toward the keys that most need a fresh driver row. Hand-editing
that list each round is error-prone (rounds 4-6 each shipped keys that
missed their window); this module derives it from the committed evidence
instead:

- ``CORRECTNESS_r{N}.json`` files at the repo root record, per key, the
  driver's verdict for the round-``N`` window. A key's *evidence age* is
  the latest round in which it earned a fully green row (rows + schema +
  value hash all matched). Keys that have never earned one age as 0 and
  therefore sort first.
- The window is: the explicitly queued new keys of the current round
  (first driver rows), then every other catalog key
  oldest-evidence-first (ties broken by name). Exactly ``size`` keys.

The derivation is a pure function of committed files, so the window is
stable within a round and rotates automatically when the driver commits
the next CORRECTNESS file: every key is re-checked at least every
ceil(n_keys / size) rounds with no hand-maintained list. Keys whose
implementation changes mid-round lose nothing — their old green rows
stay valid as *evidence of the old code*, and the standing rotation
re-checks them within the cycle; a key whose semantics changed should be
added to the round's ``new_keys`` queue to jump the line.
"""

from __future__ import annotations

import glob
import json
import os
import re
import warnings
from typing import Dict, Iterable, List

# repo root = parent of the package dir (…/repo/<pkg>/queries/rotation.py)
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def last_green_round(repo_root: str | None = None) -> Dict[str, int]:
    """Map each catalog key to the latest round whose driver row was
    fully green (rows_match, schema_match and hash_match all True —
    rows-only checks don't count as value evidence). Unreadable files
    are skipped: a missing or corrupt evidence file must degrade to
    'more keys look stale', never break the catalog import."""
    root = repo_root or _REPO_ROOT
    rounds: Dict[str, int] = {}
    parsed = 0
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rn = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        parsed += 1
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            )
            if green:
                rounds[key] = max(rounds.get(key, 0), rn)
    if parsed == 0:
        # A misrooted checkout / installed package / CI layout has no
        # evidence files: the window then degrades to queue + name
        # order. That degradation must be VISIBLE, not a silent
        # reordering away from any verified window.
        warnings.warn(
            f"no CORRECTNESS_r*.json evidence found under {root}; "
            "driver window falls back to queue + alphabetical order",
            stacklevel=2,
        )
    return rounds


def build_driver_window(
    query_keys: Iterable[str],
    new_keys: Iterable[str] = (),
    size: int = 50,
    repo_root: str | None = None,
    queue_round: int | None = None,
) -> List[str]:
    """Derive the first-``size`` driver window: queued ``new_keys``
    first (in the given order), then all remaining catalog keys
    oldest-evidence-first, name-tie-broken. ``new_keys`` not present in
    ``query_keys`` are ignored (typo guard lives in the caller, which
    knows whether the key SHOULD exist).

    ``queue_round`` is the round the queue was declared FOR (a static
    constant next to the queue, not derived from the evidence files). A
    queued key RETIRES from the front once the committed evidence shows
    it green in round ``queue_round`` or later: its slot has done its
    job (the row the queue demanded is on disk), and pinning it further
    would burn rotation slots re-checking the freshest evidence while
    the stale tail waits. Keying retirement to the DECLARED round — not
    to "newest committed round" — keeps the jump-the-line hatch intact
    for keys whose implementation changed: their green rows from
    EARLIER rounds attest the old code and must not satisfy the queue.
    The moment the demanded CORRECTNESS file lands, the satisfied queue
    drains and the freed slots go to the stale tail; committing
    evidence is therefore self-correcting, never window-corrupting.
    With ``queue_round=None`` the queue never retires (a standing
    queue)."""
    keys = list(query_keys)
    key_set = set(keys)
    evidence = last_green_round(repo_root)
    window: List[str] = [
        k
        for k in new_keys
        if k in key_set
        and (queue_round is None or evidence.get(k, 0) < queue_round)
    ]
    seen = set(window)
    rest = sorted(
        (k for k in keys if k not in seen),
        key=lambda k: (evidence.get(k, 0), k),
    )
    window.extend(rest[: max(0, size - len(window))])
    return window
