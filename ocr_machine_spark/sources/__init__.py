"""Sources/sinks: pages-table generation and lake I/O (parquet; Iceberg when
a catalog is configured)."""
