"""Sources & sinks: synthetic pages source, iceberg-lite snapshot tables."""
