"""Sources/sinks: synthetic pages corpus, table IO (Iceberg w/ parquet fallback)."""
