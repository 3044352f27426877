"""Z-order (Morton) clustering: multi-column scan locality.

The reference's landing table clusters on up to four columns
(``bq_create_table_ddl.sql:8-9``) — BigQuery clustering sorts storage
blocks by the concatenated key, which gives great skipping on the FIRST
cluster key and progressively less on later ones. Z-ordering is the
standard improvement when queries filter on *either* of two columns
(Delta Lake ``OPTIMIZE ZORDER BY``, the classic Morton-curve layout):
interleave the bits of the normalized column values so that sorting by
the single interleaved integer keeps rows that are close in ANY keyed
dimension close in file order. Parquet row-group min/max stats then
prune reads for predicates on every z-ordered column, not just the
leading one.

Spark-first design:

* the z-value is a pure Catalyst bit-arithmetic expression
  (``shiftright``/``bitwiseAND``/``shiftleft``/``bitwiseOR`` folded over
  ``bits`` terms) — JVM whole-stage-codegen, no UDF;
* clustering a table = ``repartitionByRange(z)`` (one range shuffle,
  balanced output files via range sampling) then
  ``sortWithinPartitions(z)`` (file-local sort, no extra shuffle);
* :func:`zvalue_sql` emits the IDENTICAL arithmetic as ANSI SQL so an
  external engine (the DuckDB oracle) reproduces every z-value
  bit-exactly — the same twin-expression pattern as the md5 family in
  :mod:`.dedup` / :mod:`.similarity`.

At 100 TB: the range shuffle is the only wide stage and its partition
count is the file-size knob; the curve quality (how tight per-file
min/max bounds get) is independent of data volume, so skipping ratios
observed at sf0.01 carry to the full table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_col(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each (non-negative integer)
    column into one BIGINT z-value.

    Bit ``i`` of column ``j`` lands at output position ``i*k + j`` for
    ``k`` columns — the canonical Morton layout. Columns must already be
    normalized to non-negative ints that fit in ``bits`` bits (callers
    rank/bucket arbitrary values first; see ``q_cluster_zorder``).
    """
    k = len(cols)
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, c in enumerate(cs)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zval")


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton interleave as an ANSI-SQL expression string.

    Every term mirrors :func:`zvalue_col` bit-for-bit; CASTs pin BIGINT
    so DuckDB does not promote shifted literals to HUGEINT.
    """
    k = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def cluster_zorder(
    df: DataFrame,
    int_cols: list[str],
    bits: int = 16,
    num_files: int = 8,
) -> DataFrame:
    """Lay ``df`` out along the Morton curve of ``int_cols``.

    ``repartitionByRange`` on the z-value splits the curve into
    ``num_files`` contiguous segments (range sampling keeps them
    balanced); the within-partition sort makes Parquet row-group stats
    tight on EVERY clustered column. Writing the result with
    ``.write.parquet`` yields files whose per-file min/max bounds on
    each dimension shrink ~``num_files**(1/k)``-fold versus an
    unclustered layout — the skipping win :mod:`.zonemap` exploits.
    """
    z = zvalue_col(list(int_cols), bits)
    return (
        df.withColumn("zval", z)
        .repartitionByRange(num_files, F.col("zval"))
        .sortWithinPartitions("zval")
    )
