"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The modern extension point for sources Spark has no built-in reader for
(internal services, bespoke formats, synthetic generators): implement
``DataSource`` + ``DataSourceReader``, register once per session, then
``spark.read.format(name)`` like any native source. The reader declares
its OWN partitioning (``partitions()``), so ingestion is
executor-parallel from the first byte — each partition's ``read`` runs
on a worker, never the driver — which is the property that lets a
custom source feed a 1000-executor cluster.

Here: a deterministic synthetic-events generator (id-derived bucket and
score via the same arithmetic-hash family as :mod:`..operators.sampling`
— no ``rand()``), so any SQL engine can reproduce the emitted rows and
the full read path is value-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_HASH_K = 2654435761


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")``; options: ``rows`` (total row
    count, default 1000), ``numPartitions`` (default 8)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id bigint, bucket int, score double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(
            rows=int(self.options.get("rows", 1000)),
            num_partitions=int(self.options.get("numpartitions", 8)),
        )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, rows: int, num_partitions: int) -> None:
        self.rows = rows
        self.num_partitions = max(1, num_partitions)

    def partitions(self):
        # contiguous id ranges — split boundaries are a pure function of
        # (rows, num_partitions), so a retried task regenerates exactly
        # its own slice (idempotent re-read, the engine-wide guarantee)
        per = -(-self.rows // self.num_partitions)  # ceil
        return [
            InputPartition((p * per, min((p + 1) * per, self.rows)))
            for p in range(self.num_partitions)
            if p * per < self.rows
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, int((i * _HASH_K) % 10), ((i * _HASH_K) % 1000) / 1000.0)
