"""Managed-table lifecycle helper shared by the persisted-store
operators (corpus MinHash bands, corpus semantic cells).

A managed-table directory can outlive the metastore that created it
(each session gets a fresh local metastore); ``saveAsTable`` refuses to
reuse such an orphaned location, so writers must drop both the catalog
entry and the stale dir before overwriting. EXTERNAL table locations
are never deleted — a name collision with an external table must not
destroy shared data this code does not own.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["drop_managed_table"]


def drop_managed_table(spark: SparkSession, table_name: str) -> None:
    """Drop ``table_name`` if present and delete its directory ONLY when
    the table is (or defaults to) MANAGED — see module docstring."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def _delete_dir(path_str: str) -> None:
        p = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = p.getFileSystem(hconf)
        if fs.exists(p):
            fs.delete(p, True)

    if spark.catalog.tableExists(table_name):
        # Known to THIS metastore: resolve real location/type from the
        # catalog (correct for qualified names and non-default
        # LOCATIONs), drop, then sweep the dir only for MANAGED tables.
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
        locs = [r["data_type"] for r in desc if r["col_name"] == "Location"]
        types = [r["data_type"] for r in desc if r["col_name"] == "Type"]
        managed = bool(types) and types[0].strip().upper() == "MANAGED"
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        if managed:
            for loc in locs:
                _delete_dir(loc)
    elif table_name.isidentifier():
        # Not in the metastore: the only dir we may own is the default
        # managed location of an UNQUALIFIED simple name directly under
        # the warehouse root — for qualified/exotic names no path is
        # derivable, so nothing is deleted.
        warehouse = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
        _delete_dir(f"{warehouse}/{table_name.lower()}")
