"""Ops CLI — parity with the reference's bash command surface
(commands.sh:17-90: create_landing_table, workflow:run / workflow:run:partition
backfill, plus the maintenance verbs a Spark landing table needs).

Each subcommand prints ONE JSON line so shell pipelines can consume it,
mirroring how the reference's commands compose with gcloud output.

Usage:
  python scripts/ops.py create-table  TABLE_ROOT
  python scripts/ops.py partitions    TABLE_ROOT
  python scripts/ops.py probe         SOURCE_ROOT PARTITION
  python scripts/ops.py ingest        SOURCE_ROOT TABLE_ROOT PARTITION --schema DDL
                                      [--format csv] [--option k=v ...] [--cluster-by col]
  python scripts/ops.py backfill      SOURCE_ROOT TABLE_ROOT START END --schema DDL
                                      [--format csv] [--option k=v ...] [--cluster-by col]
  python scripts/ops.py compact       TABLE_ROOT PARTITION [--cluster-by col]
  python scripts/ops.py vacuum        TABLE_ROOT RETAIN_FROM
  python scripts/ops.py merge         TABLE_ROOT PARTITION UPDATES_PATH --schema DDL
                                      --key COL [--key COL ...] [--format parquet]

PARTITION strings are compact YYYYMMDDHH (the reference's BQ decorator
format); --schema takes DDL like "event_id LONG, ts TIMESTAMP, ...".
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_options(pairs: list[str]) -> dict:
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--option must be k=v, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(prog="ops", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("create-table")
    p.add_argument("table_root")

    p = sub.add_parser("partitions")
    p.add_argument("table_root")

    p = sub.add_parser("probe")
    p.add_argument("source_root")
    p.add_argument("partition")

    for name in ("ingest", "backfill"):
        p = sub.add_parser(name)
        p.add_argument("source_root")
        p.add_argument("table_root")
        if name == "ingest":
            p.add_argument("partition")
        else:
            p.add_argument("start_partition")
            p.add_argument("end_partition")
        p.add_argument("--schema", required=True, help='DDL, e.g. "a LONG, b STRING"')
        p.add_argument("--format", default="csv")
        p.add_argument("--option", action="append", default=[], metavar="K=V")
        p.add_argument("--cluster-by", action="append", default=[], metavar="COL")

    p = sub.add_parser("compact")
    p.add_argument("table_root")
    p.add_argument("partition")
    p.add_argument("--cluster-by", action="append", default=[], metavar="COL")
    p.add_argument("--zorder-by", action="append", default=[], metavar="COL")

    p = sub.add_parser("vacuum")
    p.add_argument("table_root")
    p.add_argument("retain_from")

    p = sub.add_parser("repair-rollup")
    p.add_argument("table_root")
    p.add_argument("rollup_root")
    p.add_argument("--group-by", action="append", required=True, metavar="COL")
    p.add_argument(
        "--agg", action="append", required=True, metavar="NAME=SQL",
        help='aggregate output column, e.g. "n_rows=count(*)"',
    )

    p = sub.add_parser("merge")
    p.add_argument("table_root")
    p.add_argument("partition")
    p.add_argument("updates_path")
    p.add_argument("--schema", required=True, help='DDL, e.g. "a LONG, b STRING"')
    p.add_argument("--key", action="append", required=True, metavar="COL")
    p.add_argument("--format", default="parquet")
    p.add_argument("--option", action="append", default=[], metavar="K=V")

    args = ap.parse_args(argv)

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark import get_spark
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sink import (
        compact_partition,
        create_partitioned_table,
        list_table_partitions,
        vacuum_partitions,
    )
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.ingest import (
        backfill_partition_range,
        plan_partition_ingest,
        run_partition_ingest,
    )
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.probe import partition_exists

    spark = get_spark(app_name=f"ops-{args.cmd}")

    if args.cmd == "create-table":
        create_partitioned_table(spark, args.table_root)
        result = {"cmd": "create-table", "table_root": args.table_root, "ok": True}
    elif args.cmd == "partitions":
        result = {
            "cmd": "partitions",
            "table_root": args.table_root,
            "partitions": list_table_partitions(spark, args.table_root),
        }
    elif args.cmd == "probe":
        result = {
            "cmd": "probe",
            "partition": args.partition,
            "exists": partition_exists(spark, args.source_root, args.partition),
        }
    elif args.cmd == "ingest":
        from pyspark.sql import types as T

        schema = T.StructType.fromDDL(args.schema)
        cfg = {"format": args.format, **_parse_options(args.option)}
        plan = plan_partition_ingest(args.source_root, args.table_root, args.partition, cfg)
        meta = run_partition_ingest(
            spark, plan, schema, cluster_by=args.cluster_by or None
        )
        result = {
            "cmd": "ingest",
            "job_id": meta.job_id,
            "partition": meta.partition,
            "status": meta.status.name,
            "error_msg": meta.error_msg,
        }
    elif args.cmd == "backfill":
        from pyspark.sql import types as T

        schema = T.StructType.fromDDL(args.schema)
        cfg = {"format": args.format, **_parse_options(args.option)}
        metas = backfill_partition_range(
            spark,
            args.source_root,
            args.table_root,
            args.start_partition,
            args.end_partition,
            schema,
            job_config=cfg,
            cluster_by=args.cluster_by or None,
        )
        result = {
            "cmd": "backfill",
            "n_partitions": len(metas),
            "statuses": {m.partition: m.status.name for m in metas},
        }
    elif args.cmd == "compact":
        n_files = compact_partition(
            spark,
            args.table_root,
            args.partition,
            cluster_by=args.cluster_by or None,
            zorder_by=args.zorder_by or None,
        )
        result = {"cmd": "compact", "partition": args.partition, "n_files": n_files}
    elif args.cmd == "vacuum":
        dropped, kept = vacuum_partitions(spark, args.table_root, args.retain_from)
        result = {"cmd": "vacuum", "dropped": dropped, "kept": kept}
    elif args.cmd == "repair-rollup":
        from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sink import repair_rollup

        aggs = dict(kv.split("=", 1) for kv in args.agg)
        repaired = repair_rollup(
            spark, args.table_root, args.rollup_root, args.group_by, aggs
        )
        result = {"cmd": "repair-rollup", "repaired": repaired}
    elif args.cmd == "merge":
        from pyspark.sql import types as T

        from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sink import merge_upsert_partition

        schema = T.StructType.fromDDL(args.schema)
        updates = (
            spark.read.format(args.format)
            .schema(schema)
            .options(**_parse_options(args.option))
            .load(args.updates_path)
        )
        state = merge_upsert_partition(
            spark, args.table_root, updates, args.partition, args.key
        )
        result = {
            "cmd": "merge",
            "partition": args.partition,
            "n_updates": updates.count(),
            "status": state.name,
        }
    else:  # pragma: no cover
        raise SystemExit(f"unknown command {args.cmd}")

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
