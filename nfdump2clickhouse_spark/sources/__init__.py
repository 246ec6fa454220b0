"""Ingest sources and sinks: the reference's ETL dataflow re-expressed
Spark-first (SURVEY §3.2). flows.py models the nfcapd→CSV→typed-projection
path; sinks.py the partitioned sorted parquet layout, retention, and the
idempotent JDBC/ClickHouse sink."""
