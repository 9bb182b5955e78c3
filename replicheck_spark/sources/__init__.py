"""Table IO abstraction: Parquet paths in the sandbox, Iceberg in production."""
