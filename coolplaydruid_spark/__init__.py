"""coolplaydruid_spark — a PySpark-native OLAP engine with the query and
data-processing capabilities of Apache Druid v0.12.1, as documented by the
reference repo ``coolplaydata/coolplaydruid``.

Architecture (SURVEY.md §7): one SparkSession + a small catalog of
"dataSources" (time-partitioned Parquet tables); a query layer that parses
Druid-style JSON query specs and plans them onto DataFrame operations;
batch/streaming ingest that writes the same table layout. Catalyst replaces
the broker/historical scatter-gather (reference:
query/query-internal-procedure.md), Spark's scheduler replaces the indexing
service (reference: arch/indexing-service/*), and a Structured Streaming
sink replaces realtime handoff (reference: arch/druid-arch.md:29-32).
"""

from coolplaydruid_spark.catalog import Catalog, DataSource
from coolplaydruid_spark.engine import DruidEngine

__all__ = ["Catalog", "DataSource", "DruidEngine"]
__version__ = "0.1.0"
