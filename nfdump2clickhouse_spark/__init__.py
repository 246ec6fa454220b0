"""spark-flows: a PySpark-native analytics engine with the query and
data-processing capabilities of ``poorting/nfdump2clickhouse``.

The reference (see ``/root/reference/README.md:1-3`` — migration tombstone)
is a Python daemon that watches directories for rotated NetFlow capture
files, projects them to a fixed flow-record schema, and bulk-loads them
into ClickHouse. This package re-expresses that dataflow — and the
analytical SQL surface the resulting table serves — Spark-first:

- ``session``     SparkSession builder tuned for the engine
- ``schemas``     explicit StructTypes (never inferSchema)
- ``catalog``     fixture-table loaders / temp-view registration
- ``registry``    the query-key registry backing ``__spark_entry__``
- ``operators/``  the SURVEY §2 operator inventory, grouped by family
- ``functions/``  column-function libraries (ip, text, similarity)
- ``sources/``    ingest (flows CSV/parquet) and sinks (parquet, JDBC)
- ``streaming/``  Structured Streaming pipeline (file source → sink)
"""

__version__ = "0.1.0"
