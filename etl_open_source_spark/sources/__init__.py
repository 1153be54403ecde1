"""Sources and sinks — readers/writers for parquet, CSV, JSON, JDBC."""
