"""Druid SQL metadata introspection: INFORMATION_SCHEMA + sys tables.

Druid SQL exposes ``INFORMATION_SCHEMA.SCHEMATA/TABLES/COLUMNS`` and
``sys.segments`` for BI-tool introspection (public Druid SQL docs; the
SQL layer itself is declared at query/query-module-overview.md:48-49).
Spark temp views cannot carry dotted names, so the SQL front-end
rewrites the dotted spellings to underscore views
(``sqlcompat.rewrite_druid_sql``) and this module materializes those
views from the engine catalog — metadata only, no data scans:

 - ``information_schema_schemata``  — the three schemas.
 - ``information_schema_tables``   — one row per registered dataSource.
 - ``information_schema_columns``  — per-column name/type/position with
   Druid-style type names (TIMESTAMP/BIGINT/DOUBLE/VARCHAR/ARRAY/...).
 - ``sys_segments``               — one row per ``__dt`` partition
   directory of a path-backed dataSource (its size in bytes summed from
   the filesystem), or one whole-table row when unpartitioned;
   DataFrame-registered sources get a single row with NULL size.

Views refresh only when the catalog's table registry changes (version
key), and only when a statement actually references them — the hot SQL
path never pays for introspection.
"""

from __future__ import annotations

import os
from datetime import date as _date, timedelta as _timedelta

from pyspark.sql import SparkSession

_DRUID_TYPE = {
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
    "long": "BIGINT",
    "integer": "INTEGER",
    "short": "SMALLINT",
    "byte": "TINYINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "binary": "VARBINARY",
}


def _druid_type(dt) -> str:
    name = dt.typeName()
    if name == "array":
        return "ARRAY"
    if name.startswith("decimal"):
        return "DECIMAL"
    return _DRUID_TYPE.get(name, name.upper())


_META_VERSIONS: dict[tuple[str, int], int] = {}


def references_metadata(statement: str) -> bool:
    s = statement.lower()
    return "information_schema_" in s or "sys_segments" in s or "sys_tasks" in s


def register_metadata_views(spark: SparkSession, catalog) -> None:
    """sys.tasks rebuilds every call (task statuses churn independently
    of the table registry and the frame is registry-sized); the
    catalog-derived views are idempotent per (session, catalog,
    registry-version)."""
    from coolplaydruid_spark.sources.batch import REGISTRY

    tasks = [
        (t.task_id, t.task_type, t.status, t.created_at, t.detail)
        for t in REGISTRY.all()
    ]
    spark.createDataFrame(
        tasks,
        "task_id string, `type` string, status string, created_time string, "
        "error_msg string",
    ).createOrReplaceTempView("sys_tasks")

    version = catalog.registry_version
    key = (spark.sparkContext.applicationId, id(catalog))
    if _META_VERSIONS.get(key) == version:
        return

    schemata = [("druid", "druid"), ("druid", "INFORMATION_SCHEMA"), ("druid", "sys")]
    spark.createDataFrame(
        schemata, "CATALOG_NAME string, SCHEMA_NAME string"
    ).createOrReplaceTempView("information_schema_schemata")

    tables = [("druid", "druid", name, "TABLE") for name in catalog.names()]
    spark.createDataFrame(
        tables,
        "TABLE_CATALOG string, TABLE_SCHEMA string, TABLE_NAME string, TABLE_TYPE string",
    ).createOrReplaceTempView("information_schema_tables")

    columns = []
    for name in catalog.names():
        df = catalog.table(name)
        for i, f in enumerate(df.schema.fields):
            columns.append(
                ("druid", "druid", name, f.name, i + 1, _druid_type(f.dataType),
                 "YES" if f.nullable else "NO")
            )
    spark.createDataFrame(
        columns,
        "TABLE_CATALOG string, TABLE_SCHEMA string, TABLE_NAME string, "
        "COLUMN_NAME string, ORDINAL_POSITION int, DATA_TYPE string, "
        "IS_NULLABLE string",
    ).createOrReplaceTempView("information_schema_columns")

    segments = []
    for name in catalog.names():
        src = catalog.source(name)
        path = getattr(src, "path", None)
        if path and os.path.isdir(path):
            parts = sorted(
                d for d in os.listdir(path) if d.startswith("__dt=")
            )
            if parts:
                for d in parts:
                    day = d.split("=", 1)[1]
                    size = _dir_size(os.path.join(path, d))
                    # Druid day-segment intervals end at the NEXT day's
                    # T00:00:00 — many ISO-8601 parsers reject hour 24.
                    try:
                        nxt = (
                            _date.fromisoformat(day) + _timedelta(days=1)
                        ).isoformat()
                    except ValueError:
                        nxt = day
                    segments.append(
                        (f"{name}_{day}", name, f"{day}T00:00:00.000Z",
                         f"{nxt}T00:00:00.000Z", size, "1", 1)
                    )
                continue
        size = _dir_size(path) if path and os.path.exists(path) else None
        segments.append((f"{name}_0", name, None, None, size, "1", 1))
    spark.createDataFrame(
        segments,
        "segment_id string, datasource string, start string, `end` string, "
        "size bigint, version string, num_replicas int",
    ).createOrReplaceTempView("sys_segments")

    _META_VERSIONS[key] = version


def _dir_size(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total
