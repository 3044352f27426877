"""Bounded caching for operators that legitimately persist mid-plan.

Several operators cache a small intermediate that multiple downstream
branches re-derive (a term-frequency table, a funnel aggregate). A
plain ``.persist()`` with no matching ``unpersist`` leaks: in a
long-lived session that invokes the operator repeatedly (the catalog
sweep, a notebook, a service), every invocation pins another copy in
executor storage until the session dies.

``scoped_persist`` bounds that to AT MOST ONE live cache per scope key:
persisting under a key first unpersists whatever the previous
invocation cached under the same key. The previous result stays
CORRECT if someone still holds it (Spark recomputes from lineage on
the next action), it just stops being cached — the right trade for a
cache whose only purpose is intra-plan reuse within one invocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: dict[str, DataFrame] = {}


def scoped_persist(df: DataFrame, scope: str) -> DataFrame:
    """Persist ``df``, releasing the cache the previous call with the
    same ``scope`` created. Returns the persisted frame.

    Re-invoking an operator with the IDENTICAL plan (a repeated sweep,
    a retried report) returns the previous scope's frame instead of
    re-persisting: the warm cache is served, nothing is dropped, and
    the bound of one live cache per scope still holds. Only a CHANGED
    plan evicts the old cache.

    STALENESS CONTRACT: the fast-path compares PLANS, not data — a
    session that rewrites the underlying files at the same path (a
    regenerated fixture, refreshed embeddings) and re-runs the identical
    plan is served the stale cache. Callers that rebuild inputs
    in-session must call :func:`release_scope` (or
    ``spark.catalog.refreshByPath``) after the rewrite; steady-state
    pipelines reading immutable snapshot paths are unaffected."""
    prev = _SCOPED.get(scope)
    if prev is not None:
        try:
            if prev._jdf.queryExecution().analyzed().sameResult(
                df._jdf.queryExecution().analyzed()
            ):
                return prev
        except Exception:
            pass  # session of the previous frame may already be gone
        _SCOPED.pop(scope, None)
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass
    out = df.persist()
    _SCOPED[scope] = out
    return out


def release_scope(scope: str) -> None:
    """Eagerly drop the cache held under ``scope`` (optional cleanup for
    callers that know the consuming action has finished)."""
    prev = _SCOPED.pop(scope, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass


def release_all_scopes() -> None:
    """Drop EVERY scoped cache (and forget the frames, so the next
    invocation re-persists instead of serving a warm or evicted frame).

    Timing harnesses call this between passes so a repeated invocation
    of the same query measures cold-plan execution — including the
    cache-fill cost — instead of reading the previous pass's
    already-materialized cache through the plan-identity fast path
    (r18 verdict: the fast path systematically under-timed every
    persist-using key from pass 2 on)."""
    for scope in list(_SCOPED):
        release_scope(scope)
