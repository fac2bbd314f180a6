"""Sources/sinks: parquet table loaders, graph view, import/export."""
