"""Sources/sinks: pruned Parquet readers for the shared table layouts."""
