"""Data-quality expectation suite: declarative row-level rules checked
in ONE pass, plus referential integrity as a join-shaped rule.

The pre-load validation step every warehouse pipeline runs (Great
Expectations / dbt-test shaped): rather than one scan per rule, every
row-level expectation compiles to a conditional-count column of a
single aggregation, so a 50-rule suite still costs exactly one corpus
scan collapsing map-side to one row. Referential rules are inherently
two-table and run as a separate anti-join count per rule — a
shuffle-or-broadcast join each, the minimum any engine pays.

Rules are (name, Column<boolean>) pairs where the column is TRUE when
the row VIOLATES the expectation. Output: one row per rule with its
violation count — the table a gate compares against zero.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_expectations", "referential_violations", "null_violates"]


def null_violates(pred: Column) -> Column:
    """NULL-safe coercion for violation predicates: a rule evaluating to
    NULL (``value > 200`` with value NULL) cannot prove the row clean,
    so it COUNTS AS A VIOLATION. Without this, SQL three-valued logic
    silently waves every NULL-bearing row through the gate — the exact
    malformed rows a quality suite exists to catch. Applied at
    compilation time by every consumer (batch counters, Observation
    metrics, the streaming quarantine tag) so rule authors never have
    to hand-write isNull branches."""
    return F.coalesce(pred, F.lit(True))


def check_expectations(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Evaluate row-level rules in one aggregation. ``rules`` maps rule
    name -> violation predicate (NULL predicate = violation, see
    :func:`null_violates`). Returns (rule, n_violations) rows in
    rule order."""
    if not rules:
        raise ValueError("at least one expectation required")
    agg = df.agg(
        *[
            F.sum(null_violates(pred).cast("long")).alias(f"__r{i}")
            for i, (_, pred) in enumerate(rules)
        ]
    )
    # one-row wide frame -> (rule, count) long frame via stack (no shuffle)
    stack_expr = ", ".join(
        f"'{name}', __r{i}" for i, (name, _) in enumerate(rules)
    )
    return agg.selectExpr(
        f"stack({len(rules)}, {stack_expr}) as (rule, n_violations)"
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Count child rows whose key has no parent — the FK expectation.
    Plain anti-join (Catalyst picks broadcast vs shuffle by parent
    size); returns a single (rule, n_violations) row unionable with
    :func:`check_expectations` output."""
    n = (
        child.join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit(f"fk_{child_key}_in_{parent_key}").alias("rule"),
            F.col("n").cast("long").alias("n_violations"),
        )
    )
    return n


def check_expectations_observed(
    df: DataFrame, rules: list[tuple[str, Column]], name: str = "expectations"
):
    """Attach the rule violation counters to ``df`` as an Observation:
    the metrics are computed DURING whatever action consumes the frame
    (the ingest write itself), so the quality numbers cost zero extra
    scans — the accumulator-style production shape, vs
    :func:`check_expectations`'s standalone audit pass. Returns
    ``(observed_df, observation)``; read ``observation.get`` after the
    action completes."""
    from pyspark.sql import Observation

    if not rules:
        raise ValueError("at least one expectation required")
    obs = Observation(name)
    metrics = [
        F.sum(null_violates(pred).cast("long")).alias(rule_name)
        for rule_name, pred in rules
    ] + [F.count(F.lit(1)).alias("__n_rows")]
    return df.observe(obs, *metrics), obs
